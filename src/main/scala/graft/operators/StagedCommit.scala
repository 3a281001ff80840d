package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Exactly-once delta append for raw-parquet artifacts — the recovery
  * story behind [[Dedup.refreshArtifacts]], [[LshIndex.append]] and
  * [[IvfIndex.append]], which previously documented "a killed refresh
  * leaves partial files and a blind retry double-appends; recovery is
  * rebuild".
  *
  * Protocol, per (artifact dir, delta token):
  *
  *   1. `_delta_<token>_SUCCESS` present → the delta is already fully
  *      committed; the call is a no-op (idempotent retry).
  *   2. Self-heal: delete any `delta_<token>_*` files a killed commit
  *      of the SAME token left behind (the token names every file the
  *      protocol may create, so cleanup is exact).
  *   3. Stage: write the delta into the hidden `_stage_<token>` child
  *      dir (underscore-prefixed — Spark's parquet reader and the
  *      oracle's `*.parquet` globs both ignore it), partitioned like
  *      the artifact.
  *   4. Commit: rename each staged part file into the live tree under
  *      its partition subpath as `delta_<token>_<i>.parquet`, then
  *      create the marker and drop the staging dir.
  *
  * A kill at ANY point leaves a state a retry with the same token
  * repairs to exactly-once content: before the marker, the retry
  * deletes its own partials and redoes the work; after, it no-ops.
  * Tokens derive from the delta's CONTENT ([[idToken]]), so "retry"
  * needs no coordination — re-running the same refresh IS the retry.
  *
  * Reader isolation: a plain `spark.read.parquet(path)` between a kill
  * mid-step-4 and its retry can observe a committed-partial delta;
  * [[readCommitted]] closes that window by loading only base files plus
  * marker-committed delta files (full transactional semantics across
  * OVERWRITES would still need a table format — appends are covered).
  * Scale posture: staging doubles only the DELTA's IO, never the
  * artifact's, and the rename loop is O(delta files) driver-side
  * metadata ops.
  */
object StagedCommit {

  /** Content-derived token: order-independent pair of wrapping hash
    * sums + count over the given columns. Two refreshes of the same
    * delta share a token (and therefore commit once); distinct deltas
    * collide with negligible probability. */
  def idToken(delta: DataFrame, cols: String*): String = {
    require(cols.nonEmpty, "idToken needs at least one column")
    val key = concat_ws("", cols.map(c => col(c).cast("string")): _*)
    // decimal(38,0) sums: order-independent and overflow-free under
    // ANSI mode (a plain long sum of hashes throws ARITHMETIC_OVERFLOW)
    val r = delta.select(
      sum(xxhash64(key).cast("decimal(38,0)")).as("s1"),
      sum(xxhash64(concat(lit("g"), key)).cast("decimal(38,0)")).as("s2"),
      count(lit(1)).as("n")).head()
    if (r.isNullAt(0)) "empty_0"
    else s"${r.getDecimal(0).toBigInteger.toString(36)}_" +
      s"${r.getDecimal(1).toBigInteger.toString(36)}_${r.getLong(2)}"
  }

  /** Reader isolation over an appendOnce-maintained artifact: load ONLY
    * files whose commit COMPLETED — base files (any name without the
    * `delta_` prefix, covered by their own build's directory-level
    * atomicity) plus delta files whose `_delta_<token>_SUCCESS` marker
    * exists. A reader overlapping a killed-mid-rename commit (or its
    * retry's self-heal sweep) never observes the partial delta that
    * `spark.read.parquet(path)` would — closing the committed-partial
    * window [[appendOnce]]'s scaladoc documents, without a table format.
    *
    * Partition values survive: the read passes `basePath`, so
    * `part=x/delta_tok_00001.parquet` still yields the `part` column.
    *
    * Scale: a per-directory listStatus walk over the LIVE tree only
    * (hidden `_stage_`/`_temporary` subtrees are never enumerated —
    * see [[walkParquet]]) + a driver-side set probe per file; on an
    * object store that is O(directories) listing round-trips, the
    * same metadata cost any partition-discovering parquet read pays.
    * Token extraction strips the `_<i>.parquet` suffix, so it is O(1)
    * per file regardless of how many deltas ever committed. */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = fs.makeQualified(new Path(path))
    // a torn base swap (kill between [[swapBase]]'s delete and rename
    // phases) is rolled FORWARD here before the file set is trusted —
    // one name-probe against the listing the marker scan takes anyway
    val listing0 = fs.listStatus(dir)
    val listing =
      if (listing0.exists(_.getPath.getName == SwapIntent)) {
        recoverSwap(fs, dir); fs.listStatus(dir)
      } else listing0
    val committed = listing.map(_.getPath.getName)
      .collect { case n if n.startsWith("_delta_") && n.endsWith("_SUCCESS") =>
        n.stripPrefix("_delta_").stripSuffix("_SUCCESS") }.toSet ++
      manifestTokens(fs, dir)
    val keep = scala.collection.mutable.Buffer.empty[String]
    walkParquet(fs, dir) { st =>
      deltaToken(st.getPath.getName) match {
        case None => keep += st.getPath.toString
        case Some(token) =>
          if (committed.contains(token)) keep += st.getPath.toString
      }
    }
    if (keep.isEmpty) throw new NoCommittedFiles(path)
    spark.read.option("basePath", dir.toString).parquet(keep.toSeq: _*)
  }

  /** TYPED empty-artifact shape (ADVICE r19, low): [[readCommitted]]
    * throws this when `path` holds no committed parquet file, so a
    * consumer that must absorb a cold start (the verify-CDF batch-0
    * probe in [[graft.streaming.IndexSink]]) matches the CLASS, not
    * the message text — a rewording can no longer silently turn the
    * cold-start skip into a stream crash. IllegalArgumentException
    * subtype with the same message keeps every legacy catch/assert
    * working. */
  final class NoCommittedFiles(path: String)
    extends IllegalArgumentException(
      s"no committed parquet files under $path")

  /** Depth-first parquet-file walk that NEVER DESCENDS into
    * underscore-prefixed directories (`_stage_<token>/`, and the
    * `_temporary/` trees Spark's commit protocol creates and deletes
    * inside them). A flat recursive `listFiles(dir, true)` stats every
    * child it discovers, so a reader racing an in-flight append blew
    * up on a `_temporary` entry that vanished between discovery and
    * stat (caught by Scd2ManifestSpec's concurrent-reader test); not
    * entering hidden subtrees removes the race instead of retrying
    * around it. Partition dirs are recognized by their `=` — an
    * underscore-prefixed partition COLUMN (`_bkt=3/`, TextIndex's
    * layout) must still be walked, while `_stage_<token>/` and
    * `_merge_tmp/` never contain one. */
  private[operators] def walkParquet(fs: org.apache.hadoop.fs.FileSystem,
                                     dir: Path)(
      f: org.apache.hadoop.fs.FileStatus => Unit): Unit =
    fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory) {
        if (!name.startsWith("_") || name.contains("="))
          walkParquet(fs, st.getPath)(f)
        else if (!name.startsWith("_stage_") && name != "_temporary" &&
            hasParquet(fs, st.getPath))
          // loud, not silent: a future artifact nesting real parquet
          // under an underscore-named NON-partition dir would be
          // dropped from every committed read without an error —
          // surface the skip so the layout bug is findable (ADVICE
          // r13). _stage_/_temporary are the protocol's own transients
          // and stay quiet.
          System.err.println(s"[StagedCommit] WARNING: skipping hidden " +
            s"directory ${st.getPath} which contains .parquet files — " +
            "committed reads never descend into underscore-prefixed " +
            "non-partition directories")
      } else if (name.endsWith(".parquet")) f(st)
    }

  /** Does `dir` (recursively) hold any .parquet file? Bounded probe
    * used only on the warning path above. */
  private def hasParquet(fs: org.apache.hadoop.fs.FileSystem,
                         dir: Path): Boolean =
    try {
      val it = fs.listFiles(dir, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    } catch { case _: Throwable => false }

  /** Filesystem-safe form of a commit token — the SINGLE home of the
    * sanitization rule [[appendOnce]] applies before a token names any
    * file. Callers that RECORD tokens for later comparison against
    * [[deltaToken]] output (the SCD2 manifest) must record THIS form:
    * a private re-implementation would silently diverge the moment the
    * rule changes, making committed deltas invisible to their readers
    * (ADVICE r13). */
  def safeToken(token: String): String =
    token.replaceAll("[^A-Za-z0-9_-]", "_")

  /** The commit token encoded in a delta part file's name, or None for
    * a non-delta (base build) file. ONE home for the name scheme —
    * every committed-only reader (readCommitted, the SCD2 manifest
    * reader) must extract tokens identically or a naming change would
    * silently exclude files from whichever copy was forgotten.
    * `{5,}`: appendOnce's f"%05d" widens past 5 digits at index
    * 100000+ — a fixed-width match would drop those files (ADVICE
    * r12). */
  def deltaToken(fileName: String): Option[String] =
    if (!fileName.startsWith("delta_") || !fileName.endsWith(".parquet"))
      None
    else Some(fileName.stripPrefix("delta_")
      .replaceAll("_\\d{5,}\\.parquet$", ""))

  /** Is `token`'s delta fully committed at `path`? (Marker probe —
    * the same `_delta_<token>_SUCCESS` certificate [[appendOnce]]
    * writes last, or the folded-marker manifest [[foldMarkers]]
    * absorbed it into.) Lets a multi-artifact protocol resume after a
    * crash by asking which halves landed, instead of re-deriving the
    * answer from content that other writers may have changed since. */
  def hasDelta(spark: org.apache.spark.sql.SparkSession,
               path: String, token: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val safe = safeToken(token)
    fs.exists(new Path(p, s"_delta_${safe}_SUCCESS")) ||
      manifestTokens(fs, p).contains(safe)
  }

  private val TokensManifest = "_tokens_manifest"

  /** Tokens the folded-marker manifest records as committed (empty
    * when no fold ever ran). One small file read. */
  private def manifestTokens(fs: org.apache.hadoop.fs.FileSystem,
                             dir: Path): Set[String] = {
    val p = new Path(dir, TokensManifest)
    if (!fs.exists(p)) return Set.empty
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toSet
    finally in.close()
  }

  /** MARKER-GROWTH BOUND (VERDICT r17 #3): `_delta_*_SUCCESS` markers
    * accumulate one per append ever — compaction folds DATA files but
    * must preserve the redelivery fence, and the committed-read
    * listing pays for every marker (measured:
    * `probes/r18/marker_scale.json` — resolution 0.08 → 0.12 → 0.60 s
    * at 100/1k/10k markers, linear; a month-long micro-batch tail
    * reaches 10⁵). This folds all but the newest `keepNewest` marker
    * FILES into one `_tokens_manifest` line file: every committed-
    * probe ([[hasDelta]], [[readCommitted]], [[appendOnce]]'s
    * redelivery check) consults the union, so exactly-once survives
    * the fold, while the listing returns O(keepNewest) marker entries
    * plus one manifest read forever. The newest K stay as files — the
    * active redelivery window (a replaying consumer's recent batches)
    * keeps its O(1) exists-probe, and the fold itself needs no
    * coordination with in-flight appends of NEW tokens. Crash-safe:
    * the manifest (old ∪ folded, tmp+rename) lands BEFORE the marker
    * files are deleted — a token present in both reads committed from
    * either; a retry re-folds idempotently. Call it from the artifact
    * owner's maintenance path (the family compacts do). Do NOT fold
    * TRANSIENT marker dirs that are cleared wholesale (index tombstone
    * dirs, the CDF feed): their protocols delete markers to mean
    * "gone", and a manifest would resurrect them. Returns the number
    * of markers folded. */
  def foldMarkers(spark: org.apache.spark.sql.SparkSession,
                  path: String, keepNewest: Int = 64): Int = {
    require(keepNewest >= 1, s"keepNewest must be >= 1: $keepNewest")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0
    val markers = fs.listStatus(p).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && n.startsWith("_delta_") && n.endsWith("_SUCCESS")
    }
    if (markers.size <= keepNewest) return 0
    val fold = markers.sortBy(_.getModificationTime)
      .dropRight(keepNewest)
    val tokens = manifestTokens(fs, p) ++ fold.map(st =>
      st.getPath.getName.stripPrefix("_delta_")
        .stripSuffix("_SUCCESS"))
    val tmp = new Path(p, s"$TokensManifest.tmp")
    val out = fs.create(tmp, true)
    try out.write(tokens.toSeq.sorted.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(p, TokensManifest)
    if (fs.exists(dst)) fs.delete(dst, false)
    require(fs.rename(tmp, dst) || fs.exists(dst),
      s"could not persist token manifest under $path")
    fold.foreach(st => fs.delete(st.getPath, false))
    fold.size
  }

  private val SwapIntent = "_swap_intent"
  private val SwapIntentTmp = "_swap_intent.tmp"
  private val SwapStage = "_stage_swap"
  private val LeaseFile = "_maintenance_lease"

  /** How long a maintenance lease may sit untouched before another
    * maintainer may break it (a crashed holder's lease; the mtime is
    * refreshed after staging, so a healthy long-running swap whose
    * STAGE phase exceeds this is still fenced — see the commit-point
    * check in [[runSwap]]). */
  val DefaultLeaseStaleMs: Long = 15L * 60 * 1000

  private def jvmId: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName

  private def readSmall(fs: org.apache.hadoop.fs.FileSystem,
                        p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** MAINTENANCE LEASE (VERDICT r18 #2) — closes the pre-intent swap
    * race: two maintainers racing BEFORE the intent's create-if-absent
    * gate used to share the stage dir. [[swapBase]]/[[swapFiles]] now
    * run their ENTIRE protocol (stage included) under a
    * create-if-absent `_maintenance_lease`, so the second of two
    * racing swaps refuses loudly at entry instead of interleaving.
    *
    * Break rules, in order:
    *   - the holder is THIS JVM and its thread is the current one or
    *     no longer alive → a crashed (exception- or kill-injected)
    *     earlier attempt in this process; break immediately. Thread
    *     ids can in principle be recycled by the JVM — accepted: the
    *     misjudged case is a same-process concurrent maintainer,
    *     which the single-owner contract already forbids.
    *   - the lease file's mtime is older than `staleMs` → a crashed
    *     holder in another process; break, and the caller's
    *     recover-at-entry then rolls any torn swap forward BEFORE new
    *     work (the VERDICT-mandated ordering).
    *   - otherwise → throw: another maintainer is active.
    *
    * The lease content (`jvm\tthread\ttoken`) doubles as the FENCING
    * token: [[runSwap]] re-reads it immediately before the intent
    * rename (the commit point) and aborts if it is no longer ours —
    * a paused holder whose lease a competitor broke can therefore
    * never start deleting live files. A reader of a mid-write lease
    * (create→close window) sees unparseable content: treated as held
    * (mtime is fresh), never broken-by-parse-failure. */
  /** Same-JVM serialization for the lease create: Hadoop's local
    * `create(path, overwrite = false)` is CHECK-then-create, not
    * atomic, so two threads of one JVM could both "win" the file.
    * One interned monitor per lease path closes that in-process.
    * Cross-process (VERDICT r19 #5): on LOCAL filesystems the create
    * goes through nio CREATE_NEW — a single open(O_CREAT|O_EXCL)
    * syscall, so exactly one process can win and no read-back is
    * needed (the old create-then-read-back arbitration had a
    * both-pass window: A could read back before B's overwrite
    * landed). On HDFS and object stores the FileSystem create is
    * itself atomic and the read-back remains as belt-and-braces. */
  /** Interned-monitor entry, REFERENCE-COUNTED (VERDICT r19 #7): the
    * refs field is mutated only inside the map's per-key `compute`
    * lock, and the entry is removed when the last in-flight
    * acquireLease for its path releases it — a long-lived driver
    * churning ephemeral table paths no longer grows the map forever.
    * Monitor identity is stable for the whole acquire (retained
    * before the retry loop, released after), so two same-JVM threads
    * racing one path always synchronize on the SAME object. */
  private final class LeaseMonitor { var refs = 0 }
  private val leaseLocks =
    new java.util.concurrent.ConcurrentHashMap[String, LeaseMonitor]()

  private def retainMonitor(key: String): LeaseMonitor =
    leaseLocks.compute(key, (_, v) => {
      val m = if (v == null) new LeaseMonitor else v
      m.refs += 1; m
    })

  private def releaseMonitor(key: String): Unit =
    leaseLocks.compute(key, (_, v) =>
      if (v == null) null
      else { v.refs -= 1; if (v.refs <= 0) null else v })

  private[graft] def leaseMonitorCount: Int = leaseLocks.size()

  private[graft] def isLocalFs(
      fs: org.apache.hadoop.fs.FileSystem): Boolean =
    fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]

  private def acquireLease(fs: org.apache.hadoop.fs.FileSystem,
                           dir: Path, staleMs: Long): String = {
    val lease = new Path(dir, LeaseFile)
    val token = java.util.UUID.randomUUID().toString
    val me = jvmId
    val myThread = Thread.currentThread().getId
    val lock = retainMonitor(lease.toString)
    try {
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      val created = lock.synchronized {
        if (isLocalFs(fs)) {
          // ATOMIC create-if-absent on the local FS (VERDICT r19 #5):
          // Hadoop's local create(overwrite = false) is CHECK-then-
          // create, so two PROCESSES could both pass it — and the old
          // content read-back arbitration had a both-pass window (A
          // reads back before B's overwrite lands). CREATE_NEW is one
          // open(O_CREAT|O_EXCL) syscall: exactly one process wins,
          // and the winner's content is its own by construction — no
          // read-back needed.
          try {
            val nio = java.nio.file.Paths.get(lease.toUri.getPath)
            if (nio.getParent != null)
              java.nio.file.Files.createDirectories(nio.getParent)
            java.nio.file.Files.write(nio, s"$me\t$myThread\t$token"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8),
              java.nio.file.StandardOpenOption.CREATE_NEW,
              java.nio.file.StandardOpenOption.WRITE)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
            case _: java.io.IOException => false
          }
        } else try {
          val out = fs.create(lease, false)
          try out.write(s"$me\t$myThread\t$token"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      }
      if (created) {
        if (isLocalFs(fs)) return token // atomic create: ours, done
        // cross-process arbitration for FSes whose create we cannot
        // prove atomic: if another writer's create overwrote ours in
        // the non-atomic window, exactly one content survives — only
        // its writer proceeds (HDFS/object-store creates are atomic
        // and this is belt-and-braces there)
        val back =
          try readSmall(fs, lease).trim
          catch { case _: java.io.IOException => "" }
        if (back == s"$me\t$myThread\t$token") return token
      }
      val st =
        try Some(fs.getFileStatus(lease))
        catch { case _: java.io.FileNotFoundException => None }
      st.foreach { s =>
        val content =
          try readSmall(fs, lease).trim
          catch { case _: java.io.IOException => "" }
        val parts = content.split("\t", -1)
        val ownJvmDeadThread = parts.length == 3 && parts(0) == me && {
          val tid =
            try parts(1).toLong catch { case _: NumberFormatException => -1L }
          tid == myThread || {
            import scala.jdk.CollectionConverters._
            !Thread.getAllStackTraces.keySet.asScala
              .exists(t => t.getId == tid && t.isAlive)
          }
        }
        val ageMs = System.currentTimeMillis() - s.getModificationTime
        if (ownJvmDeadThread || ageMs > staleMs)
          fs.delete(lease, false) // break, then re-race the create
        else throw new IllegalStateException(
          s"maintenance lease under $dir is held by '$content' " +
            s"(age ${ageMs} ms, stale after ${staleMs} ms) — another " +
            "maintainer is active; refusing to run a concurrent swap")
      }
    }
    throw new IllegalStateException(
      s"could not acquire maintenance lease under $dir after " +
        s"$attempts attempts (repeated create/break races)")
    } finally releaseMonitor(lease.toString)
  }

  /** Refresh the lease file's mtime. A long-running holder calls this
    * right before a long Spark write (the merge's epoch-dir Overwrite,
    * runSwap's post-staging window) so a HEALTHY writer whose write
    * outlives `DefaultLeaseStaleMs` is not misjudged crashed and
    * clobbered by a lease-breaking competitor targeting the same epoch
    * dir (ADVICE r19, medium). Token-checked BEST-EFFORT: the
    * leaseHeld probe and the setTimes are not atomic, so a competitor
    * that breaks a stale lease and plants its own in that window may
    * get its (genuinely fresh) lease touched once — harmless, since a
    * freshened fresh lease changes no decision (ADVICE r20). The
    * post-write fence is the correctness backstop. */
  private[graft] def refreshLease(fs: org.apache.hadoop.fs.FileSystem,
                                  dir: Path, token: String): Unit =
    try {
      if (leaseHeld(fs, dir, token))
        fs.setTimes(new Path(dir, LeaseFile),
          System.currentTimeMillis(), -1)
    } catch { case _: java.io.IOException => () }

  /** Drop the lease IF it is still ours (token-checked — never deletes
    * a competitor's lease after ours was broken). */
  private def releaseLease(fs: org.apache.hadoop.fs.FileSystem,
                           dir: Path, token: String): Unit = {
    val lease = new Path(dir, LeaseFile)
    try {
      if (readSmall(fs, lease).trim.endsWith("\t" + token))
        fs.delete(lease, false)
    } catch { case _: java.io.IOException => () }
  }

  /** Run `body` holding the maintenance lease. Released on success and
    * on ordinary failure (`NonFatal` — the retry may proceed at once);
    * deliberately NOT on a fatal error ([[graft.FailPoint.Kill]] is an
    * Error precisely so injected kills leave durable state as a
    * process kill would — the lease stays, and the retry takes the
    * own-JVM-dead-thread or stale-timeout break path, exactly like a
    * real crashed holder). */
  /** The lease as a reusable primitive: [[graft.operators.Upsert]]'s
    * manifested-table writers serialize on it too (one lease per
    * table root), so two concurrent merges can never share an epoch
    * data dir — the loser refuses loudly at entry. */
  private[graft] def withMaintenanceLease[T](
      fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      staleMs: Long = DefaultLeaseStaleMs)(body: String => T): T =
    withLease(fs, dir, staleMs)(body)

  /** Is the lease at `dir` still held under `token`? The fencing
    * re-check a long-running holder runs immediately before its
    * commit point. */
  private[graft] def leaseHeld(fs: org.apache.hadoop.fs.FileSystem,
                               dir: Path, token: String): Boolean =
    try readSmall(fs, new Path(dir, LeaseFile)).trim
      .endsWith("\t" + token)
    catch { case _: java.io.IOException => false }

  private def withLease[T](fs: org.apache.hadoop.fs.FileSystem,
                           dir: Path, staleMs: Long)(
      body: String => T): T = {
    val token = acquireLease(fs, dir, staleMs)
    val r =
      try body(token)
      // Exception, NOT NonFatal: NonFatal matches plain Error
      // subclasses, so it would release the lease on an injected
      // [[graft.FailPoint.Kill]] — certifying a crash state (lease
      // gone) a real process kill cannot produce
      catch { case e: Exception =>
        releaseLease(fs, dir, token); throw e }
    releaseLease(fs, dir, token)
    r
  }

  /** CRASH-SAFE BASE-FILE SWAP — closes the one family-wide seam the
    * compacts documented as "kill mid-swap → mixed listing, recovery
    * is rebuild" ([[graft.operators.BqIndex]]'s base rewrite, the
    * stats fold in [[graft.operators.TextIndex.compactScoredPostings]]).
    * Replaces every `.parquet` file at `path`'s ROOT (flat artifacts
    * only — partitioned compacts go through Spark's dynamic partition
    * overwrite instead) with `snap` coalesced to `outFiles` files,
    * through a write-ahead intent:
    *
    *   0. acquire the `_maintenance_lease` (see [[acquireLease]] —
    *      closes the pre-intent window where two maintainers could
    *      share the stage dir; a second concurrent swap refuses
    *      loudly HERE, before any work);
    *   1. roll forward any PRIOR torn swap (see [[recoverSwap]]) and
    *      sweep a dead holder's `_swap_intent.tmp`;
    *   2. stage `snap` into the hidden `_stage_swap` child (skipped
    *      by [[walkParquet]], so no reader ever sees it);
    *   3. write the intent to `_swap_intent.tmp` and RENAME it to
    *      `_swap_intent` (atomic visibility — a visible intent is
    *      always complete; its `end` line is the commit point),
    *      after a fencing re-read of the lease: the exact old names
    *      to delete and staged→target renames to perform — target
    *      names carry a generation counter so they can never collide
    *      with surviving old files;
    *   4. delete the old files;  5. rename staged files in;
    *   6. drop the intent, then the stage dir, then the lease.
    *
    * A kill before the intent's `end` line leaves the old state
    * intact (recovery discards the unterminated intent and stage
    * dir); a kill after it leaves a state ANY subsequent
    * [[readCommitted]] (or the next swap) rolls forward to completion
    * — the torn window that used to require a rebuild is gone. Marker files, the token manifest, and
    * hidden dirs are untouched: the redelivery fence survives the
    * fold exactly as before. Deletes and renames are tolerant
    * (`delete` may find the file gone, `rename` accepts
    * target-already-present), so a reader-triggered recovery racing
    * the writer's own continuation converges instead of throwing. */
  def swapBase(spark: org.apache.spark.sql.SparkSession, path: String,
               snap: DataFrame, outFiles: Int = 1,
               leaseStaleMs: Long = DefaultLeaseStaleMs): Unit = {
    require(outFiles >= 1, s"outFiles must be >= 1: $outFiles")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = fs.makeQualified(new Path(path))
    withLease(fs, dir, leaseStaleMs) { leaseToken =>
      if (fs.exists(new Path(dir, SwapIntent))) recoverSwap(fs, dir)
      // a dead holder's pre-commit-point debris: safe to sweep only
      // UNDER the lease (a live writer would still hold it)
      fs.delete(new Path(dir, SwapIntentTmp), false)
      val oldRel = fs.listStatus(dir).toSeq.filter(st =>
          st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.getName)
      val stage = new Path(dir, SwapStage)
      fs.delete(stage, true)
      snap.coalesce(outFiles).write.mode(SaveMode.Overwrite)
        .parquet(stage.toString)
      runSwap(fs, dir, path, oldRel, leaseToken)
    }
  }

  /** [[swapBase]]'s PARTITIONED twin — the crash-safe replacement for
    * the dynamic-partition-overwrite compact/purge rewrites, whose
    * job-commit window (some partition dirs replaced, others deleted
    * but not yet refilled) was the family's last "recovery is
    * rebuild" contract. Replaces every `.parquet` file under the
    * given partition subdirs (relative paths like `tbl=1/bucket=2`)
    * with `snap` written `partitionBy(partitionCols)`, through the
    * same write-ahead intent: the intent records partition-relative
    * paths, so [[recoverSwap]] rolls a torn rewrite forward
    * file-for-file across every affected dir. A partition whose rows
    * all folded away stages nothing — its old files are deleted and
    * the now-empty dir is dropped (the purge's dead-partition case,
    * previously a hand-rolled sweep). Staged output MUST stay within
    * the declared dirs (require — a snap straying outside would land
    * files the intent never accounted for). */
  def swapFiles(spark: org.apache.spark.sql.SparkSession, path: String,
                snap: DataFrame, partitionCols: Seq[String],
                partDirs: Seq[String],
                leaseStaleMs: Long = DefaultLeaseStaleMs): Unit = {
    require(partitionCols.nonEmpty, "swapFiles needs partition columns")
    if (partDirs.isEmpty) return
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = fs.makeQualified(new Path(path))
    withLease(fs, dir, leaseStaleMs) { leaseToken =>
      if (fs.exists(new Path(dir, SwapIntent))) recoverSwap(fs, dir)
      fs.delete(new Path(dir, SwapIntentTmp), false)
      val oldRel = partDirs.flatMap { d =>
        val p = new Path(dir, d)
        if (!fs.exists(p)) Seq.empty[String]
        else fs.listStatus(p).toSeq.filter(st =>
            st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map(st => s"$d/${st.getPath.getName}")
      }
      val stage = new Path(dir, SwapStage)
      fs.delete(stage, true)
      snap.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCols: _*).parquet(stage.toString)
      val declared = partDirs.toSet
      listParquetRel(fs, stage).foreach { s =>
        val sub = s.substring(0, math.max(0, s.lastIndexOf('/')))
        require(declared.contains(sub),
          s"swapFiles: staged partition '$sub' is outside the declared " +
            s"set under $path — the snap must be restricted to partDirs")
      }
      runSwap(fs, dir, path, oldRel, leaseToken)
      // dead partitions: everything folded away — drop the empty dir so
      // partition discovery never resurrects it
      partDirs.foreach { d =>
        val p = new Path(dir, d)
        if (fs.exists(p) && fs.listStatus(p).isEmpty) fs.delete(p, true)
      }
    }
  }

  /** Every `.parquet` under `base`, as `base`-relative paths. */
  private def listParquetRel(fs: org.apache.hadoop.fs.FileSystem,
                             base: Path): Seq[String] = {
    val q = fs.makeQualified(base).toString + "/"
    val out = scala.collection.mutable.Buffer.empty[String]
    if (fs.exists(base)) {
      val it = fs.listFiles(base, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          out += st.getPath.toString.stripPrefix(q)
      }
    }
    out.toSeq
  }

  /** The shared intent-commit-execute core behind [[swapBase]] and
    * [[swapFiles]]: stage dir already written; `oldRel` are the
    * dir-relative files to replace. See [[swapBase]] for the protocol
    * and crash contract. */
  private def runSwap(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
                      path: String, oldRel: Seq[String],
                      leaseToken: String): Unit = {
    val stage = new Path(dir, SwapStage)
    val staged = listParquetRel(fs, stage)
    // staging a large snapshot may have outlived a chunk of the stale
    // window — refresh the lease mtime so a healthy swap is not
    // misjudged crashed between here and the commit point
    try fs.setTimes(new Path(dir, LeaseFile),
      System.currentTimeMillis(), -1)
    catch { case _: java.io.IOException => () }
    // generation counter: strictly above every surviving compacted_
    // name so a roll-forward can never rename onto a file it is also
    // instructed to delete
    val GenName = "compacted_(\\d+)_\\d+\\.parquet".r
    val gen = oldRel.map(r => r.substring(r.lastIndexOf('/') + 1))
      .collect { case GenName(g) => g.toLong }.foldLeft(-1L)(math.max) + 1
    val moves = staged.zipWithIndex.map { case (s, i) =>
      val cut = s.lastIndexOf('/')
      val sub = if (cut < 0) "" else s.substring(0, cut + 1)
      (s, s"${sub}compacted_${gen}_$i.parquet")
    }
    // the trailing "end" line is the intent's commit point: deletes
    // start only after a COMPLETE intent is on disk, so recovery can
    // roll a terminated intent forward and discard an unterminated one
    // (nothing destructive ran yet — rolling back is trivially safe)
    val intentBody = (oldRel.map(r => s"del\t$r") ++
      moves.map { case (s, t) => s"mv\t$s\t$t" } ++
      Seq("end")).mkString("\n")
    // ATOMIC INTENT VISIBILITY (ADVICE r18, high): the intent is
    // written to a `.tmp` name and RENAMED into place, so a reader's
    // recoverSwap can never observe a live writer's half-written
    // intent (create→close window) and mistake it for dead debris —
    // the old in-place create let a concurrent committed read roll
    // BACK a live swap, deleting the staged files out from under the
    // writer. Any VISIBLE `_swap_intent` is now complete; the
    // unterminated-rollback branch in recoverSwap only covers
    // pre-r19 debris or external interference. The tmp create is
    // create-if-absent: under the lease no live competitor exists
    // (a dead holder's tmp was swept at entry), so a collision here
    // is external interference and dies loudly.
    val intent = new Path(dir, SwapIntent)
    val tmp = new Path(dir, SwapIntentTmp)
    val out =
      try fs.create(tmp, false)
      catch { case e: java.io.IOException =>
        throw new IllegalStateException(
          s"swap intent tmp already present under $path — external " +
            "interference with the maintenance lease held", e) }
    try out.write(intentBody
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    graft.FailPoint.hit("swap_tmp_intent")
    // FENCING CHECK at the commit point: if our lease was broken (a
    // competitor judged us crashed — stale mtime — and took over), we
    // must not publish an intent whose deletes would interleave with
    // theirs. Nothing destructive has run; abort cleanly.
    val leaseNow =
      try readSmall(fs, new Path(dir, LeaseFile)).trim
      catch { case _: java.io.IOException => "" }
    if (!leaseNow.endsWith("\t" + leaseToken)) {
      fs.delete(tmp, false)
      fs.delete(stage, true)
      throw new IllegalStateException(
        s"maintenance lease under $path was broken while we staged " +
          s"(now '$leaseNow') — a competing maintainer took over; " +
          "aborting before the commit point, old state intact")
    }
    if (fs.exists(intent)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"a swap intent appeared under $path while we held the " +
          "lease — external interference; aborting")
    }
    require(fs.rename(tmp, intent),
      s"could not publish swap intent under $path")
    graft.FailPoint.hit("swap_after_intent")
    oldRel.foreach(r => fs.delete(new Path(dir, r), false))
    graft.FailPoint.hit("swap_after_delete")
    moves.foreach { case (s, t) =>
      val dst = new Path(dir, t)
      fs.mkdirs(dst.getParent)
      require(fs.rename(new Path(stage, s), dst) || fs.exists(dst),
        s"swap rename failed: $s -> $dst")
    }
    fs.delete(intent, false)
    fs.delete(stage, true)
  }

  /** Public recovery entry: roll forward any torn [[swapBase]] at
    * `path` (no-op when no intent file exists). [[readCommitted]]
    * already does this — call it from maintenance paths that COUNT or
    * sweep raw data files before reading, so a torn dir is healed
    * before the listing is trusted. */
  def recoverSwapAt(spark: org.apache.spark.sql.SparkSession,
                    path: String): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, fs.makeQualified(new Path(path)))
  }

  /** Roll a torn [[swapBase]] FORWARD from its intent file: delete
    * old names still present, rename staged files still in the stage
    * dir (a target already in place means that move completed), then
    * drop the intent and stage dir. Idempotent and race-tolerant —
    * see [[swapBase]]. A `mv` whose staged source AND target are both
    * missing means external interference; fail loudly rather than
    * serve a silently short file set. */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                          dir: Path): Unit = {
    val intent = new Path(dir, SwapIntent)
    if (!fs.exists(intent)) return
    // TOCTOU (ADVICE r18): two readers can both see the intent; the
    // one that loses the recovery race finds it gone at open — that
    // means recovery COMPLETED, not an error
    val in =
      try fs.open(intent)
      catch { case _: java.io.FileNotFoundException => return }
    val raw =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toVector
      finally in.close()
    val stage = new Path(dir, SwapStage)
    if (raw.lastOption.contains("end")) () else {
      // unterminated intent: with the tmp+rename publish a VISIBLE
      // intent is always complete, so this is pre-r19 debris or
      // external interference — either way no delete or rename ever
      // ran under it, the old state is intact, and the safe recovery
      // is to roll BACK (discard). NEVER touches `_swap_intent.tmp`:
      // that may belong to a LIVE writer mid-publish; only a lease
      // holder sweeps it.
      fs.delete(intent, false)
      fs.delete(stage, true)
      return
    }
    val lines = raw.dropRight(1)
    lines.foreach { line =>
      line.split("\t", -1) match {
        case Array("del", name) => fs.delete(new Path(dir, name), false)
        case Array("mv", s, t) =>
          val dst = new Path(dir, t)
          if (!fs.exists(dst)) {
            val src = new Path(stage, s)
            fs.mkdirs(dst.getParent)
            require(fs.rename(src, dst) || fs.exists(dst),
              s"swap recovery cannot place $dst: staged file $src is " +
                s"gone — external interference under $dir")
          }
        case _ => throw new IllegalStateException(
          s"unparseable swap-intent line under $dir: '$line'")
      }
    }
    fs.delete(intent, false)
    fs.delete(stage, true)
  }

  /** EXACTLY the rows `token`'s committed delta contributed to `path`
    * (None if the token never committed). The content is frozen at
    * first commit, so a retry that lost its input state (e.g. a
    * crashed two-artifact delete whose ids are meanwhile covered by
    * OTHER batches' tombstones) can still re-derive its own second
    * half from what IT committed — the repair primitive behind
    * [[graft.operators.TextIndex.deleteScoredPostings]]. */
  def readDelta(spark: org.apache.spark.sql.SparkSession,
                path: String, token: String): Option[DataFrame] = {
    if (!hasDelta(spark, path, token)) return None
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = fs.makeQualified(p)
    val safe = safeToken(token)
    val mine = scala.collection.mutable.Buffer.empty[String]
    walkParquet(fs, dir) { st =>
      if (deltaToken(st.getPath.getName).contains(safe))
        mine += st.getPath.toString
    }
    // a marker with zero part files is legal (empty delta): shape an
    // empty frame is impossible without a schema, so refuse loudly —
    // no caller commits empty deltas today (they early-return)
    require(mine.nonEmpty,
      s"readDelta: token $token is marked committed under $path but " +
        "has no delta part files")
    Some(spark.read.option("basePath", dir.toString).parquet(mine.toSeq: _*))
  }

  /** Marker-gated committed tombstone set at `path`, or None when no
    * delete ever committed there. The marker check runs BEFORE
    * readCommitted so a killed FIRST delete (stage dir or unmarked
    * renamed files, no marker) reads as "no tombstones" instead of
    * throwing — the shared device behind every index family's delete
    * support (IVF cells, BQ rows, LSH rows, BM25 postings). */
  def readTombstones(spark: org.apache.spark.sql.SparkSession,
                     path: String): Option[DataFrame] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else if (!fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      n.startsWith("_delta_") && n.endsWith("_SUCCESS")
    }) None
    else Some(readCommitted(spark, path))
  }

  /** Record `ids` (one column, de-duplicated here) as an exactly-once
    * tombstone delta at `path` — content-derived token, so a
    * redelivered id set no-ops (returns false). Content-keyed
    * once-ever, like every appendOnce artifact. */
  def tombstoneOnce(path: String, ids: DataFrame,
                    idCol: String): Boolean = {
    val d = ids.select(org.apache.spark.sql.functions.col(idCol))
      .distinct()
    appendOnce(path, idToken(d, idCol), Seq.empty, d)
  }

  /** Append `delta` to the parquet artifact at `path` exactly once per
    * `token`. Returns false if the token was already committed. */
  def appendOnce(path: String, token: String, partitionCols: Seq[String],
                 delta: DataFrame): Boolean = {
    val spark = delta.sparkSession
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = fs.makeQualified(new Path(path))
    val safe = safeToken(token)
    val marker = new Path(dir, s"_delta_${safe}_SUCCESS")
    // the redelivery fence consults the folded-marker manifest too —
    // without this, a redelivered token whose marker [[foldMarkers]]
    // absorbed would pass the exists-probe, SELF-HEAL-DELETE its own
    // committed (possibly since-compacted) files, and re-append
    if (fs.exists(marker) ||
        manifestTokens(fs, dir).contains(safe)) return false
    val prefix = s"delta_${safe}_"
    // self-heal: a killed commit of this token left some renamed files.
    // Stale deltas live only in the LIVE tree, so the hidden-subtree-
    // skipping walk covers them — the flat recursive listFiles here
    // would stat _stage_/_temporary entries and hit the vanished-child
    // race the readers were cured of.
    if (fs.exists(dir)) {
      val stale = scala.collection.mutable.Buffer.empty[Path]
      walkParquet(fs, dir) { st =>
        if (st.getPath.getName.startsWith(prefix)) stale += st.getPath
      }
      stale.foreach(p => fs.delete(p, false))
    }
    val stage = fs.makeQualified(new Path(dir, s"_stage_$safe"))
    val writer = delta.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(stage.toString)
    // move staged part files into the live tree, partition subpaths kept
    val staged = scala.collection.mutable.Buffer.empty[Path]
    val it = fs.listFiles(stage, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) staged += st.getPath
    }
    staged.zipWithIndex.foreach { case (src, i) =>
      val rel = src.toString.stripPrefix(stage.toString + "/")
      val relDir = rel.lastIndexOf('/') match {
        case -1 => ""
        case n  => rel.substring(0, n + 1)
      }
      val dst = new Path(dir, f"$relDir$prefix$i%05d.parquet")
      fs.mkdirs(dst.getParent)
      require(fs.rename(src, dst), s"staged-commit rename failed: $src -> $dst")
    }
    fs.create(marker, true).close()
    fs.delete(stage, true)
    true
  }
}
