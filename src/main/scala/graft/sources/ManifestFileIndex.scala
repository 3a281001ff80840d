package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] whose file inventory comes from MANIFEST-RECORDED
  * metadata instead of filesystem listing — the scale fix for the one
  * driver-side cost of the manifested layout that grew with table
  * width (VERDICT r17 #1): resolving a full-table read used to list
  * every referenced partition dir (O(partitions) FS round-trips —
  * minutes-to-hours at 10⁵–10⁶ partitions on an object store), even
  * though every epoch dir is immutable and its file set was known the
  * moment the merge published it. With the `#files` manifest lines
  * ([[graft.operators.Upsert]]) carrying name+size per partition
  * snapshot, resolution is manifest-read-shaped: ZERO filesystem
  * calls here, at any table width.
  *
  * Partition pruning is preserved — [[listFiles]] evaluates the
  * planner's static partition filters against each partition's value
  * row exactly the way Spark's own `PartitioningAwareFileIndex
  * .prunePartitions` does (bind by name, interpreted predicate), and
  * dynamic (DPP) filters are applied downstream by
  * `FileSourceScanExec.dynamicallySelectedPartitions` over what this
  * returns, so both pruning tiers behave as with a listed index.
  * `sizeInBytes` sums the recorded file lengths, so broadcast
  * decisions see the same evidence a listing would produce.
  *
  * Trust contract: epoch dirs are immutable once published and the
  * sweep never reclaims a dir the active manifest references, so the
  * recorded inventory IS the directory content. A reader lagging past
  * the retention window can still hit a swept file at SCAN time —
  * the same staleness contract (FileNotFoundException → re-resolve)
  * the listing-based reader documents.
  */
private[graft] final class ManifestFileIndex(
    epochDir: Path,
    override val partitionSchema: StructType,
    // (partition value row, file statuses) per recorded partition dir
    parts: Seq[(InternalRow, Array[FileStatus])])
  extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(epochDir)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val selected =
      if (partitionFilters.isEmpty) parts
      else {
        // PartitioningAwareFileIndex.prunePartitions' exact device:
        // the planner REMOVES static partition filters from after-scan
        // evaluation, trusting the index — so they must be honored
        // here, not approximated
        val predicate = partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.indexWhere(
              _.name.equalsIgnoreCase(a.name))
            require(i >= 0, s"partition filter references '${a.name}' " +
              s"which is not in partition schema $partitionSchema")
            BoundReference(i, partitionSchema(i).dataType,
              partitionSchema(i).nullable)
        }
        val bound = Predicate.createInterpreted(predicate)
        bound.initialize(0)
        parts.filter { case (values, _) => bound.eval(values) }
      }
    selected.map { case (values, files) =>
      PartitionDirectory(values, files)
    }
  }

  override def inputFiles: Array[String] =
    parts.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = ()

  override val sizeInBytes: Long =
    parts.iterator.flatMap(_._2.iterator.map(_.getLen)).sum
}

private[graft] object ManifestFileIndex {

  /** Recursive nullability erasure (StructType.asNullable is
    * private[spark]) — see the call site for why it is load-bearing.
    * Shared with [[graft.operators.Upsert]]'s schema-evolution check,
    * where two types equal up to nullability must compare equal (the
    * `#ddl` round-trip drops nullability, so a natural
    * Seq[Array[Float]] batch's containsNull=false meets the stored
    * nullable form on every merge after the first). */
  private[graft] def asNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = asNullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }
  private def asNullable(s: StructType): StructType =
    asNullable(s: org.apache.spark.sql.types.DataType)
      .asInstanceOf[StructType]

  /** One epoch group of a manifested table as a DataFrame, resolved
    * entirely from recorded metadata. `schema` is the group's
    * PHYSICAL read schema (current logical types under the epoch's
    * physical names — widening promotion happens in the parquet scan
    * exactly as with a listed read); `partitionCol` must be one of
    * its fields (never renamed — the layout refuses partition-column
    * renames). `dirs` carries, per partition dir name (`col=value`,
    * path-escaped), that snapshot's parquet files as (name, size). */
  def readFiles(spark: SparkSession, epochDir: String,
      schema: StructType, partitionCol: String,
      dirs: Seq[(String, Seq[(String, Long)])]): DataFrame = {
    val pField = schema.fields.find(_.name.equalsIgnoreCase(partitionCol))
      .getOrElse(throw new IllegalArgumentException(
        s"partition column $partitionCol not in $schema"))
    // all-nullable, exactly as DataSource.resolveRelation's asNullable
    // before building its HadoopFsRelation: a dead/absent physical
    // column must read NULL (the vectorized reader REFUSES a missing
    // required column), and a stored null under a NOT NULL-recorded
    // type must not let codegen skip null checks and surface garbage
    val partitionSchema = asNullable(StructType(Seq(pField)))
    val dataSchema = asNullable(StructType(
      schema.fields.filterNot(_.name.equalsIgnoreCase(partitionCol))))
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val base = new Path(epochDir)
    def buildPart(dirName: String, files: Seq[(String, Long)])
        : (InternalRow, Array[FileStatus]) = {
      val raw = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(dirName.drop(dirName.indexOf('=') + 1))
      // the dir-name string under the RECORDED type — the same
      // cast-never-infer rule the listing-based readers pin, so "01"
      // stays the string "01" when the column is a string
      val v = Cast(Literal(UTF8String.fromString(raw), StringType),
        pField.dataType, Some(tz)).eval(null)
      val row = InternalRow.fromSeq(Seq(v))
      val statuses = files.map { case (name, size) =>
        new FileStatus(size, false, 1, 128L * 1024 * 1024, 0L,
          new Path(new Path(base, dirName), name))
      }.toArray
      (row, statuses)
    }
    // chunked parallel construction: at 10⁵–10⁶ recorded partitions
    // the unescape/cast/row/status loop is the dominant driver-side
    // resolution cost — each chunk is independent (fresh Cast per
    // value, no shared state)
    val parts =
      if (dirs.size < 4096) dirs.map { case (d, f) => buildPart(d, f) }
      else {
        val chunks = dirs.grouped(
          math.max(1, dirs.size / 32)).toSeq
        val pool = java.util.concurrent.Executors
          .newFixedThreadPool(math.min(16, chunks.size))
        try chunks.map(c => pool.submit(
            new java.util.concurrent.Callable[
                Seq[(InternalRow, Array[FileStatus])]] {
              def call() = c.map { case (d, f) => buildPart(d, f) }
            })).flatMap(_.get())
        finally pool.shutdown()
      }
    val index = new ManifestFileIndex(base, partitionSchema, parts)
    val relation = HadoopFsRelation(index, partitionSchema, dataSchema,
      None, new ParquetFileFormat,
      Map.empty[String, String])(spark)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(relation)
  }
}
