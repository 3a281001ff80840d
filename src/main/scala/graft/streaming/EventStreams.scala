package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream transforms (SURVEY §2.9 + the engine's streaming surface):
  * watermarked tumbling/sliding windows, event-time duplicate suppression,
  * and session windows. Each takes/returns a DataFrame and works
  * identically on a batch frame (tests, backfills) and a streaming frame
  * (`readStream`) — the Spark-native way to keep one codepath for both.
  *
  * Scale: all three shuffle once on (key, window); state size is bounded
  * by the watermark horizon — late rows beyond it are dropped (ST4), so
  * executor state does not grow with stream lifetime.
  */
object EventStreams {

  /** Tumbling (slide == size) or sliding windowed counts + measure sum
    * per event_type. `withWatermark` bounds state and drops stale rows
    * (ST4 — the reference's freshness-window invalidation). */
  def windowedAgg(events: DataFrame, tsCol: String, size: String,
                  slide: Option[String] = None,
                  watermark: String = "30 minutes"): DataFrame = {
    val w = slide.map(s => window(col(tsCol), size, s))
      .getOrElse(window(col(tsCol), size))
    events
      .withWatermark(tsCol, watermark)
      .groupBy(w.as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("win.start").as("window_start"),
        col("win.end").as("window_end"), col("event_type"),
        col("n"), col("total"))
  }

  /** ST3: event-time duplicate suppression — first arrival per key wins
    * within the watermark horizon. On a streaming frame this is
    * `dropDuplicatesWithinWatermark` (state expires with the watermark);
    * on a batch frame that operator is unavailable, so the equivalent
    * batch semantics (plain dropDuplicates) apply. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           tsCol: String, watermark: String): DataFrame = {
    val marked = events.withWatermark(tsCol, watermark)
    if (events.isStreaming) marked.dropDuplicatesWithinWatermark(keys)
    else marked.dropDuplicates(keys)
  }

  /** Streaming NEAR-dup suppression for a document stream: drop docs
    * whose 64-bit SimHash equals an already-seen signature within the
    * watermark horizon. Signature computation is a stateless projection
    * ([[graft.operators.Dedup.withSimhash]] works unchanged on a
    * streaming frame — token votes, no aggregation across rows), so the
    * only state is the watermark-bounded signature set the dedup keeps:
    * near-dup filtering at stream rate, independent of corpus size.
    *
    * Identical-signature is the high-precision streaming regime (token
    * reorderings and case changes collapse to one signature); Hamming-
    * distance matching needs cross-doc chunk joins and belongs to the
    * batch path ([[graft.operators.Dedup.simhashPairs]]). */
  def nearDupWithinWatermark(docs: DataFrame, textCol: String,
                             tsCol: String, watermark: String): DataFrame =
    dedupWithinWatermark(
      graft.operators.Dedup.withSimhash(docs, textCol, "_sim"),
      Seq("_sim"), tsCol, watermark).drop("_sim")

  /** Streaming Hamming-radius near-dup PAIRS: each arriving doc is
    * paired with earlier docs (inside the event-time horizon) whose
    * SimHash is within `maxDist` bits. Blocking is the batch path's
    * 16-bit chunk pigeonhole ([[graft.operators.Dedup.simhashPairs]] —
    * exhaustive for maxDist ≤ 3), executed as a watermarked stream-
    * stream SELF-join on the chunk key through [[intervalJoin]]: join
    * state is rate × horizon per side, never corpus-sized, and no
    * `flatMapGroupsWithState` is involved (trap-safe in this container).
    *
    * Emission is exactly-once per co-horizon pair occurrence via the
    * FIRST-MATCHING-CHUNK rule: a pair sharing several chunk keys (an
    * identical-signature pair shares all four — the boilerplate-heavy
    * hot case the batch path collapses to representatives) joins once
    * per shared chunk, but only the match at the smallest chunk index
    * whose lower-indexed chunks all DIFFER survives the post-join
    * filter. That kills the 4× hot-signature emission multiplicity
    * statelessly — no second stateful collapse stage — and the
    * downstream `distinct()` consumers already apply stays correct (it
    * now only absorbs cross-micro-batch redelivery). Join STATE is
    * still 4 chunk rows per doc per side (rate × horizon bounded). */
  def nearDupPairsStream(docs: DataFrame, idCol: String, textCol: String,
                         tsCol: String, within: String, maxDist: Int,
                         watermark: String = "30 minutes"): DataFrame = {
    require(maxDist <= 3,
      "16-bit-chunk blocking is exhaustive only for maxDist <= 3")
    val sim = graft.operators.Dedup.withSimhash(docs, textCol, "_sim")
    def chunkOf(simCol: org.apache.spark.sql.Column, c: Int) =
      shiftrightunsigned(simCol, c * 16).bitwiseAND(lit(0xFFFFL))
    def chunked(idAs: String, simAs: String, tsAs: String,
                ci: Option[String]) = sim
      .select(col(idCol).as(idAs), col("_sim").as(simAs), col(tsCol).as(tsAs))
      .select(col(idAs), col(simAs), col(tsAs),
        posexplode(array((0 until 4).map(c =>
          concat_ws(":", lit(c), chunkOf(col(simAs), c))): _*))
          .as(Seq(ci.getOrElse("_cidrop"), "_ck")))
      .drop("_cidrop")
    val joined = intervalJoin(
      chunked("id_a", "_sima", "_tsa", Some("_ci")),
      chunked("id_b", "_simb", "_tsb", None), "_ck", "_tsa", "_tsb",
      within, watermark)
    // first-match rule: the joined chunk index is the pair's smallest
    // matching chunk iff every lower-indexed chunk differs
    val firstMatch = (0 until 4).map { c =>
      (0 until c).map(p => chunkOf(col("_sima"), p) =!= chunkOf(col("_simb"), p))
        .foldLeft(col("_ci") === c)(_ && _)
    }.reduce(_ || _)
    joined
      .filter(col("id_a") =!= col("id_b"))
      .filter(firstMatch)
      // anchor on the LATER doc; equal-timestamp pairs keep one direction
      .filter(col("_tsb") < col("_tsa") ||
        (col("_tsb") === col("_tsa") && col("id_b") < col("id_a")))
      .select(col("id_b").as("id_earlier"), col("id_a").as("id_later"),
        bit_count(col("_sima").bitwiseXOR(col("_simb"))).as("hamming"),
        col("_tsa").as("ts"))
      .filter(col("hamming") <= maxDist)
  }

  /** Stream-stream inner join with an event-time interval condition:
    * pair each left row with right rows for the same key whose timestamp
    * falls in [left.ts - within, left.ts]. Watermarks on BOTH sides are
    * what make this feasible on unbounded streams — each side buffers
    * only rows newer than (watermark - within), so join state is bounded
    * by rate × horizon, not stream lifetime. Column names must be
    * disjoint apart from `key`; left must carry `ltsCol`, right `rtsCol`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   ltsCol: String, rtsCol: String, within: String,
                   watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark(ltsCol, watermark).alias("l")
    val r = right.withWatermark(rtsCol, watermark).alias("r")
    l.join(r, expr(
        s"l.$key = r.$key AND $rtsCol >= $ltsCol - INTERVAL '$within' " +
          s"AND $rtsCol <= $ltsCol"))
      .drop(col(s"r.$key"))
  }

  /** Stream-static enrichment: left-join each streaming row to the
    * latest version of a slowly-changing dimension row (point-in-NOW
    * lookup — the streaming sibling of [[graft.operators.AsofJoin]]).
    * The dim is first reduced to one row per key (greatest `versionTs`
    * wins) and broadcast: the stream side never shuffles, so enrichment
    * adds zero stage boundaries to the streaming query. The static
    * plan is re-executed per micro-batch by Structured Streaming, so a
    * dim backed by a transactional table picks up updates between
    * batches without restarting the stream.
    *
    * Scale: broadcast is right for dimension-sized tables (the
    * reference's geo/category lookups). For a fact-sized enrichment
    * source, land it as a watermarked stream and use [[intervalJoin]]
    * instead — a static join that big would re-shuffle per batch. */
  def enrichLatest(stream: DataFrame, dim: DataFrame, keys: Seq[String],
                   versionTs: Option[String] = None): DataFrame = {
    val latest = versionTs match {
      case Some(ts) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col(ts).desc)
        dim.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn", ts)
      case None => dim
    }
    stream.join(broadcast(latest), keys, "left")
  }

  /** Session windows: rows gapped less than `gap` apart merge into one
    * session per user (`session_window` — works batch and streaming). */
  def sessionize(events: DataFrame, tsCol: String, gap: String,
                 watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total"))
      .select(col("user_id"), col("sess.start").as("session_start"),
        col("sess.end").as("session_end"), col("n_events"), col("total"))

  /** Open session per entity: start/last-event micros, row count, sum. */
  final case class SessState(start: Long, last: Long, n: Long, total: Double)

  /** One weighted session emission: `w = +1` publishes a provisional
    * session, `w = -1` retracts the provisional it supersedes. */
  final case class SessRow(user: Long, start: Long, end: Long,
                           n: Long, total: Double, w: Long)

  /** Stateful streaming form of [[sessionize]]'s gap-merge: per entity,
    * an event within `gapMicros` of the open session's last event extends
    * it, otherwise it closes the session and opens a new one — O(1) state
    * (one open session) per entity via flatMapGroupsWithState. Append mode
    * cannot retract, so every extension is COMPENSATED: each event emits
    * the extended session provisionally (`w=+1`) after retracting the
    * provisional it replaces (`w=-1`); the retraction duplicates the prior
    * emission's exact accumulated values (same sequential arithmetic, so
    * bit-identical doubles), and the downstream stateless finalization
    * `group by session, sum(w) > 0` keeps exactly the final sessions —
    * the same converge-at-drain algebra as [[slidingDistinctStream]].
    * Session end is last-event + gap ([[org.apache.spark.sql.functions.session_window]]
    * semantics). Same per-entity ordering contract as [[funnelStream]];
    * a straggler behind the open session's last event is dropped. Null
    * values accumulate as 0 (the corpus has none; SQL `sum` would skip
    * them). */
  def sessionsStream(events: DataFrame, userCol: String, tsCol: String,
                     valueCol: String, gapMicros: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val typed = events.select(
        col(userCol).cast("long").as("_u"),
        unix_micros(col(tsCol)).as("_t"),
        coalesce(col(valueCol).cast("double"), lit(0.0)).as("_v"))
      .as[(Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[SessRow]
          rows.toSeq.sortBy(_._2).foreach { case (_, t, v) =>
            if (st == null || t - st.last >= gapMicros) {
              // gap break (or first event): the previous provisional IS
              // the closed session — leave its +1 standing; open fresh
              st = SessState(t, t, 1L, v)
              out += SessRow(user, st.start, t + gapMicros, 1L, v, 1L)
            } else if (t >= st.last) {
              out += SessRow(user, st.start, st.last + gapMicros,
                st.n, st.total, -1L)
              st = SessState(st.start, t, st.n + 1L, st.total + v)
              out += SessRow(user, st.start, t + gapMicros,
                st.n, st.total, 1L)
            } // else: straggler behind the open session — dropped
          }
          if (st != null) state.update(st)
          out.result().iterator
      }.toDF()
  }

  /** Per-key histogram sketch state: rows seen + fixed bucket counts. */
  final case class QuantState(n: Long, hist: Array[Long])

  /** One quantile estimate emission; `processed` is the rows-seen
    * watermark that makes "keep the last row per (key, q)" a
    * deterministic, batch-split-invariant finalization. */
  final case class QuantEst(key: String, processed: Long, q: Double,
                            est: Double)

  /** Streaming per-key quantile estimates from a fixed equi-width
    * histogram sketch — the mergeable-summary shape (a KLL/t-digest
    * sibling with deterministic, engine-replayable arithmetic): state
    * is `buckets` longs per key regardless of stream length, inserts
    * are O(1), and the estimate for quantile q is the midpoint of the
    * first bucket whose cumulative count reaches ceil(q·n). Each
    * micro-batch emits the CURRENT estimates stamped with the rows-seen
    * count; the final row per key (max processed = total rows) is
    * independent of how the stream was batched, so the stateless
    * keep-last finalization lands on exactly the batch-histogram
    * answer — which is what the oracle recomputes. Out-of-range values
    * clamp into the edge buckets. Pick `lo/hi/buckets` so `width` is a
    * power of two and every bucket edge / midpoint is an exact double
    * (the gate uses [0, 512) × 256 → width 2.0). */
  def quantileStream(events: DataFrame, keyCol: String, valCol: String,
                     lo: Double, hi: Double, buckets: Int,
                     qs: Seq[Double]): DataFrame = {
    require(buckets > 0 && hi > lo, "need a positive bucket grid")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val width = (hi - lo) / buckets
    val typed = events.select(col(keyCol).cast("string").as("_k"),
        col(valCol).cast("double").as("_v"))
      .as[(String, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[QuantState, QuantEst](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state) =>
          val st = state.getOption
            .getOrElse(QuantState(0L, new Array[Long](buckets)))
          var n = st.n
          val hist = st.hist.clone()
          rows.foreach { case (_, v) =>
            val b = math.min(buckets - 1,
              math.max(0, math.floor((v - lo) / width).toInt))
            hist(b) += 1
            n += 1
          }
          state.update(QuantState(n, hist))
          qs.iterator.map { q =>
            val rank = math.min(n, math.max(1L, math.ceil(q * n).toLong))
            var cum = 0L
            var b = 0
            while (b < buckets - 1 && cum + hist(b) < rank) {
              cum += hist(b); b += 1
            }
            QuantEst(key, n, q, lo + (b + 0.5) * width)
          }
      }.toDF()
  }

  /** Per-key bounded bucket histogram state: rows seen + counts. */
  final case class HistState(n: Long, hist: Array[Long])

  /** One emitted histogram row, stamped for keep-last finalization. */
  final case class HistEmit(key: String, processed: Long, bucket: Int,
                            n: Long)

  /** Streaming per-key bucket histogram: for each group key (e.g. the
    * event day) the running count per bucket of a caller-computed
    * BOUNDED bucketing — the streaming substrate for online
    * distribution monitoring (drift/PSI against a reference snapshot,
    * [[graft.operators.Profile.psi]]). State is one `buckets`-long
    * count array per key — O(buckets), never O(rows) — and updates are
    * O(1) per row. Every micro-batch emits each touched key's FULL
    * current histogram (all `buckets` rows, zeros included, so the
    * downstream spine needs no re-densify) stamped with the rows-seen
    * counter; the stateless keep-last finalization (rows whose
    * `processed` equals the key's max) is batch-split-invariant and
    * equals the batch `groupBy(key, bucket).count()` exactly — the
    * stream==batch law the oracle checks. Out-of-range buckets fail
    * loudly (the refuse-loudly idiom): a silent clamp here would make
    * drift invisible exactly where it appears. */
  def histogramStream(events: DataFrame, keyCol: String,
                      bucketCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= 100000,
      s"buckets out of range: $buckets")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val typed = events.select(col(keyCol).cast("string").as("_k"),
        col(bucketCol).cast("int").as("_b"))
      .as[(String, Int)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[HistState, HistEmit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state) =>
          val st = state.getOption
            .getOrElse(HistState(0L, new Array[Long](buckets)))
          var n = st.n
          val hist = st.hist.clone()
          rows.foreach { case (_, b) =>
            if (b < 0 || b >= buckets)
              throw new IllegalStateException(
                s"histogramStream: bucket $b for key '$key' outside " +
                  s"[0, $buckets) — fix the caller's bucketing instead " +
                  "of letting a clamp hide the drift this operator " +
                  "exists to surface")
            hist(b) += 1
            n += 1
          }
          state.update(HistState(n, hist))
          (0 until buckets).iterator.map(b => HistEmit(key, n, b, hist(b)))
      }.toDF()
  }

  /** Per-key rolling value counts (bounded by the value vocabulary). */
  final case class TopKState(n: Long, counts: Map[String, Long])

  /** One emitted top-k ranking row, stamped with rows-seen. */
  final case class TopKEmit(key: String, processed: Long, rank: Int,
                            value: String, n: Long)

  /** Streaming per-key top-k: for each group key (e.g. the event day),
    * the k most frequent values of `valCol` seen so far. State is the
    * full count map per key — bounded by the VALUE VOCABULARY (event-
    * type-sized), not by rows — and inserts are O(1). Each micro-batch
    * emits the key's current ranking stamped with the rows-seen count,
    * so the stateless keep-last finalization (max processed per
    * (key, rank)) is independent of how the stream was batched and
    * lands exactly on the batch answer. Ties rank (count desc, value
    * asc) — every rank deterministic. This is the EXACT form for
    * bounded vocabularies; an unbounded-vocabulary posture belongs to
    * a space-saving/CMS sketch state (see
    * [[graft.operators.Sketches]]), not a bigger map. That contract is
    * MECHANICAL, not advisory: a key whose distinct-value count would
    * exceed `maxVocab` fails the query loudly (naming the key and the
    * sketch alternative) instead of letting state grow unbounded until
    * an executor OOMs mid-stream — the one way this operator could
    * have become a 100 TB scale-killer. */
  def topKStream(events: DataFrame, keyCol: String, valCol: String,
                 k: Int, maxVocab: Int = 100000): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000]: $k")
    require(maxVocab >= 1, s"maxVocab must be positive: $maxVocab")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val typed = events.select(col(keyCol).cast("string").as("_k"),
        col(valCol).cast("string").as("_v"))
      .as[(String, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[TopKState, TopKEmit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state) =>
          val st = state.getOption.getOrElse(TopKState(0L, Map.empty))
          var n = st.n
          var counts = st.counts
          rows.foreach { case (_, v) =>
            if (!counts.contains(v) && counts.size >= maxVocab)
              throw new IllegalStateException(
                s"topKStream: key '$key' exceeded maxVocab=$maxVocab " +
                  "distinct values — this exact-counts operator is for " +
                  "bounded vocabularies; route unbounded ones through " +
                  "the sketch family (Sketches.cmsHeavyHitters)")
            counts = counts.updated(v, counts.getOrElse(v, 0L) + 1L)
            n += 1
          }
          state.update(TopKState(n, counts))
          counts.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
            .iterator.zipWithIndex.map { case ((v, c), i) =>
              TopKEmit(key, n, i + 1, v, c)
            }
      }.toDF()
  }

  /** Bottom-k sampler state: rows seen + the k smallest coordinates. */
  final case class SampleKState(processed: Long,
                                keep: Vector[(String, Long)])

  /** One bottom-k emission row, stamped for keep-last finalization. */
  final case class SampleKEmit(bucket: Long, processed: Long,
                               hex: String, key: Long)

  /** Streaming exactly-k sampler: the k smallest md5 coordinates seen
    * so far — bottom-k of the SAME portable coordinate every batch
    * sampler orders by. That choice is what makes this "reservoir"
    * deterministic, arrival-order-independent, mergeable, and
    * redelivery-proof (a re-delivered key lands on its existing
    * coordinate and changes nothing). State is k entries per hash
    * bucket (`buckets`·k total — never corpus-sized, and distributed
    * across tasks rather than funneled through one global group).
    * Every batch emits each touched bucket's current bottom-k stamped
    * with its rows-processed counter; the stateless finalization —
    * keep each bucket's LAST emission, then the global bottom-k over
    * the ≤ buckets·k survivors — is batch-split-invariant and equals
    * [[graft.operators.Sampling.exactSample]] row-for-row, which is
    * exactly what the oracle checks. */
  def sampleKStream(rows: DataFrame, keyCol: String, k: Int,
                    buckets: Int = 8): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(buckets >= 1 && buckets <= 4096,
      s"buckets out of range: $buckets")
    val spark = rows.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val typed = rows.select(
        pmod(xxhash64(col(keyCol)), lit(buckets.toLong)).as("_b"),
        graft.operators.Sampling.hashHex(col(keyCol)).as("_hex"),
        col(keyCol).cast("long").as("_key"))
      .as[(Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SampleKState, SampleKEmit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket, it, state) =>
          val st = state.getOption
            .getOrElse(SampleKState(0L, Vector.empty))
          // fold rows one at a time into a k-bounded ordered set —
          // O(log k) per row and O(k) memory however large the
          // micro-batch (materializing the batch would make task
          // memory ∝ batch size, the thing bounded state exists to
          // avoid)
          val keep = scala.collection.mutable.TreeSet.empty[(String, Long)]
          keep ++= st.keep
          var processed = st.processed
          it.foreach { r =>
            processed += 1
            val e = (r._2, r._3)
            if (keep.size < k) keep += e
            else if (Ordering[(String, Long)].lt(e, keep.last)) {
              keep += e
              if (keep.size > k) keep -= keep.last
            }
          }
          val merged = keep.toVector
          state.update(SampleKState(processed, merged))
          merged.iterator.map { case (hex, key) =>
            SampleKEmit(bucket, processed, hex, key) }
      }.toDF()
  }

  /** Last seen event per entity, carried across micro-batches. */
  final case class LastEvent(t: String, o: Long)

  /** One extracted transition step. */
  final case class Step(user: Long, from_type: String, to_type: String)

  /** Streaming step extraction for the transition matrix
    * ([[graft.operators.EventAnalytics.transitions]]): per entity,
    * each consecutive (prev → next) type pair emits once, with ONE
    * (type, order-id) tuple of state per live entity. The matrix
    * itself is a downstream stateless aggregation of the emitted
    * steps — the stateful part is exactly the lag the batch form
    * computes with a window. Same ordering contract and straggler
    * rule as [[funnelStream]]. */
  def transitionsStream(events: DataFrame, userCol: String,
                        typeCol: String, orderCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val typed = events.select(
        col(userCol).cast("long").as("_u"),
        col(typeCol).cast("string").as("_t"),
        col(orderCol).cast("long").as("_o"))
      .as[(Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, Step](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state) =>
          var last = state.getOption.orNull
          val out = Seq.newBuilder[Step]
          rows.toSeq.sortBy(_._3).foreach { case (_, t, o) =>
            if (last == null || o > last.o) {
              if (last != null) out += Step(user, last.t, t)
              last = LastEvent(t, o)
            }
          }
          if (last != null) state.update(last)
          out.result().iterator
      }.toDF()
  }

  /** Cohort membership carried across micro-batches: the entity's
    * first-seen bucket and the buckets already emitted. */
  final case class CohortState(first: Long, seen: List[Long])

  /** One first-activity-in-bucket observation. */
  final case class CohortHit(user: Long, cohort: Long, week: Long)

  /** Streaming form of
    * [[graft.operators.EventAnalytics.cohortRetention]]'s stateful
    * core: per entity, the first event pins the cohort bucket, and
    * each bucket is emitted exactly once on the entity's first
    * activity in it — the (user, bucket) `distinct` plus the
    * min-first-seen join of the batch form, as one pass of per-entity
    * state. The retention matrix is a downstream stateless aggregation
    * of the emitted hits. State is O(active buckets) per entity —
    * bounded by calendar buckets, not event volume. Same ordering
    * contract as [[funnelStream]]: in-order per entity across batches
    * (a straggler older than the pinned cohort keeps the pinned
    * cohort — no retraction in Append mode).
    *
    * @param weekCol a DATE column holding each event's bucket start
    *                (e.g. `date_trunc("week", ts).cast("date")`)
    */
  def cohortStream(events: DataFrame, userCol: String,
                   weekCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val typed = events.select(
        col(userCol).cast("long").as("_u"),
        datediff(col(weekCol), lit("1970-01-01").cast("date"))
          .cast("long").as("_w"))
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[CohortState, CohortHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state) =>
          val ws = rows.map(_._2).toSeq.distinct.sorted
          if (ws.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(CohortState(ws.head, Nil))
            val out = Seq.newBuilder[CohortHit]
            ws.foreach { w =>
              if (!st.seen.contains(w)) {
                st = CohortState(st.first, w :: st.seen)
                out += CohortHit(user, st.first, w)
              }
            }
            state.update(st)
            out.result().iterator
          }
      }.toDF()
  }

  /** Last activity day per entity, carried across micro-batches. */
  final case class DayState(last: Long)

  /** One ±1 contribution to the rolling-actives delta stream;
    * `act` marks true activity (+1 at an activity day) vs
    * provisional/compensating rows. */
  final case class DayDelta(day: Long, delta: Long, act: Boolean)

  /** Streaming form of
    * [[graft.operators.TimeSeries.slidingDistinct]]'s interval
    * algebra: per entity, each activity day emits +1 at the day and a
    * PROVISIONAL −1 at day+W (the close if no further activity comes);
    * when the next activity day a′ arrives inside the window, a
    * compensating pair (−1 at a′, +1 at the provisional position)
    * moves the close to a′ — append-only, so Append mode needs no
    * retraction, and the summed deltas converge to exactly the batch
    * operator's delta table at drain. State is ONE epoch-day long per
    * entity; emissions are ≤4 rows per activity day. The per-day
    * distinct count is a downstream stateless aggregation (day-grain
    * net + running sum over the calendar spine), identical to the
    * batch tail. Same ordering contract as [[funnelStream]]; a
    * straggler at or behind the entity's last activity day is dropped.
    */
  def slidingDistinctStream(events: DataFrame, userCol: String,
      dayCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val typed = events.select(
        col(userCol).cast("long").as("_u"),
        col(dayCol).cast("long").as("_d"))
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[DayState, DayDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state) =>
          var last = state.getOption.map(_.last).getOrElse(Long.MinValue)
          val out = Seq.newBuilder[DayDelta]
          rows.map(_._2).toSeq.distinct.sorted.foreach { a =>
            if (a > last) {
              if (last != Long.MinValue && a < last + windowDays) {
                // the provisional close at last+W was too late —
                // compensate it back and close at a instead
                out += DayDelta(a, -1L, act = false)
                out += DayDelta(last + windowDays, 1L, act = false)
              }
              out += DayDelta(a, 1L, act = true)
              out += DayDelta(a + windowDays, -1L, act = false)
              last = a
            }
          }
          state.update(DayState(last))
          out.result().iterator
      }.toDF()
  }

  /** Last non-conversion touch (null = none yet) and the processed
    * frontier, carried across micro-batches. */
  final case class TouchState(t: String, frontier: Long)

  /** One attributed conversion. */
  final case class Conv(user: Long, channel: String, value: Double,
                        o: Long)

  /** Streaming form of
    * [[graft.operators.EventAnalytics.lastTouchAttribution]]'s
    * stateful core: per entity, every non-conversion event updates the
    * remembered last touch, and every conversion emits once, credited
    * to that touch (`(direct)` when none precedes) — the ignore-nulls
    * last window of the batch form as TWO fields of per-entity state.
    * The channel totals are a downstream stateless aggregation of the
    * emitted conversions. Same ordering contract and straggler rule as
    * [[funnelStream]]: in-order per entity across batches; an event at
    * or behind the frontier is dropped (no time travel, no
    * retraction in Append mode). */
  def attributionStream(events: DataFrame, userCol: String,
      typeCol: String, orderCol: String, valueCol: String,
      conversionType: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val typed = events.select(
        col(userCol).cast("long").as("_u"),
        col(typeCol).cast("string").as("_t"),
        col(orderCol).cast("long").as("_o"),
        col(valueCol).cast("double").as("_v"))
      .as[(Long, String, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[TouchState, Conv](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state) =>
          var st = state.getOption
            .getOrElse(TouchState(null, Long.MinValue))
          val out = Seq.newBuilder[Conv]
          rows.toSeq.sortBy(_._3).foreach { case (_, t, o, v) =>
            if (o > st.frontier) {
              if (t == conversionType) {
                val ch = if (st.t == null) "(direct)" else st.t
                out += Conv(user, ch, v, o)
                st = TouchState(st.t, o)
              } else st = TouchState(t, o)
            }
          }
          state.update(st)
          out.result().iterator
      }.toDF()
  }

  /** Per-entity funnel progress carried across micro-batches: the
    * order ids matched so far, one per completed stage. */
  final case class FunnelProgress(matched: List[Long])

  /** One completed funnel: the entity and its k matched stage ids. */
  final case class FunnelDone(user: Long, matched: List[Long])

  /** The streaming form of
    * [[graft.operators.EventAnalytics.funnel]]: a per-entity stage
    * state machine in `flatMapGroupsWithState` (NoTimeout — see
    * [[AttemptTracker]] for why not ProcessingTimeTimeout here).
    * Emits ONE row per entity at the moment its FINAL stage matches.
    * Append-stable by construction: greedy first-match ids can never
    * be revised by later events, so a completion is final and is never
    * re-emitted. State is O(stages) longs per live entity — stream
    * lifetime does not grow it.
    *
    * Ordering contract: events are processed in `orderCol` order
    * WITHIN each micro-batch (the group's batch slice is sorted —
    * bounded by the entity's per-batch volume); across batches the
    * source must deliver in order (true of an append-only id-ordered
    * log replayed in file order). An out-of-order straggler whose id
    * precedes the current frontier does not match — the same
    * no-time-travel rule every at-arrival funnel applies. */
  def funnelStream(events: DataFrame, userCol: String, typeCol: String,
                   orderCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, s"a funnel needs at least 2 stages: $stages")
    require(stages.distinct.size == stages.size,
      s"repeated stage types are ambiguous: $stages")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val k = stages.size
    val stageOf = stages.zipWithIndex.toMap
    val typed = events.select(
        col(userCol).cast("long").as("_u"),
        col(typeCol).cast("string").as("_t"),
        col(orderCol).cast("long").as("_o"))
      .as[(Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelProgress, FunnelDone](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state) =>
          var matched =
            state.getOption.map(_.matched).getOrElse(List.empty[Long])
          val already = matched.size >= k
          rows.toSeq.sortBy(_._3).foreach { case (_, t, o) =>
            if (matched.size < k &&
                stageOf.get(t).contains(matched.size) &&
                (matched.isEmpty || o > matched.head)) {
              matched = o :: matched // head = frontier, reversed order
            }
          }
          state.update(FunnelProgress(matched))
          if (!already && matched.size >= k)
            Iterator(FunnelDone(user, matched.reverse))
          else Iterator.empty
      }.toDF()
  }
}
