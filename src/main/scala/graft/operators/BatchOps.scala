package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Typed batch-processing API — the Scala analog of PySpark's
  * `mapInPandas`/`mapInArrow` batch contract, built on `mapPartitions`
  * (the JVM-native path: no Python worker, no serialization across a
  * socket, rows stay in Tungsten format until the batch boundary).
  *
  * Vectorized kernels (codec FFI calls, model inference, SIMD scoring)
  * amortize per-call overhead across a batch but must NOT be handed an
  * entire partition at once — a 100 TB run sizes partitions in the
  * hundreds of MB, and materializing one as objects is an OOM. The
  * contract here mirrors `spark.sql.execution.arrow.maxRecordsPerBatch`:
  * the caller picks a `batchSize` bounding peak memory (batch cost =
  * batchSize × row width), the framework streams batches lazily off the
  * partition iterator, and downstream consumption stays pipelined —
  * only one batch per task is live at any moment.
  */
object BatchOps {

  /** Map over fixed-size row batches within each partition. `f` sees at
    * most `batchSize` rows at a time (the final batch of a partition may
    * be smaller) and can allocate per-batch buffers freely; per-partition
    * setup (decoder handles, model sessions) belongs in a lazy val
    * captured by `f` or in [[mapBatchesWithSetup]]. */
  def mapBatches[T, U: Encoder](ds: Dataset[T], batchSize: Int)(
      f: IndexedSeq[T] => IterableOnce[U]): Dataset[U] = {
    require(batchSize > 0, "batchSize must be positive")
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(b => f(b.toIndexedSeq).iterator)
    }
  }

  /** [[mapBatches]] with once-per-partition setup: `setup()` runs once
    * per task (decoder/session init — the expensive part a vectorized
    * UDF exists to amortize), its handle is passed to every batch call.
    * Spark tasks are single-threaded per partition, so the handle needs
    * no synchronization. */
  def mapBatchesWithSetup[S, T, U: Encoder](ds: Dataset[T], batchSize: Int)(
      setup: () => S)(f: (S, IndexedSeq[T]) => IterableOnce[U]): Dataset[U] = {
    require(batchSize > 0, "batchSize must be positive")
    ds.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val handle = setup()
        rows.grouped(batchSize).flatMap(b => f(handle, b.toIndexedSeq).iterator)
      }
    }
  }
}
