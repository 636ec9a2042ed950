package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Landing-zone ingestion with a durable manifest — the Spark-side
  * analogue of the reference's fetch-and-land loop
  * (services/workers/tasks/queue_for_fetch.py: API fetch into object
  * storage; queue_for_delta.py:353 `_download_from_storage`): files
  * arrive in a landing directory, and the manifest — itself a
  * [[VersionedTable]], so manifest updates are atomic commits — records
  * every file already consumed. A crashed run re-processes only the
  * files whose manifest entry never committed; a replayed run is a
  * no-op.
  *
  * Delivery semantics, stated honestly: the guarantee is AT-LEAST-ONCE
  * with effective exactly-once for IDEMPOTENT sinks. `process(df)`
  * runs BEFORE the file's manifest entry commits, so a crash in the
  * window between the two re-runs `process` for that file on the next
  * run. With a merge-style sink ([[VersionedTable.merge]] /
  * [[VersionedTable.mergePartitioned]] — latest-wins on the key) the
  * replay converges to the same table and the composition is
  * exactly-once end to end; with a NON-idempotent sink (a blind
  * append) a crash in that window double-appends — pair appends with
  * a downstream dedup or use a keyed merge. (Committing data and
  * manifest in one transaction would need both to live in one
  * [[VersionedTable]] commit — a layering the reference's Delta
  * pipeline gets by writing the manifest INTO the table's own log.)
  *
  * The sandbox has no network, so the flaky part of a real source
  * (HTTP 429/503, object-store eventual consistency) is modeled by
  * [[withRetry]] — exponential-backoff retry around any fetch/process
  * closure — which the ingest loop wraps around per-file processing.
  * The landing directory itself stands in for the object-store bucket:
  * the listing/manifest/idempotency plumbing is identical either way.
  */
object Landing {

  /** Permanent-failure marker — the engine-side form of the
    * reference's retryable/non-retryable error taxonomy
    * (services/workers/exceptions.py:9-25; queue_for_fetch.py:86-87
    * "Non-retryable errors: immediately transition to FAILED; max
    * retries exceeded: transition to FAILED"). A `process` closure
    * throws this for errors retrying cannot fix — auth failures,
    * malformed payloads, resource-not-found — and the ingest loop
    * dead-letters the file IMMEDIATELY instead of burning the
    * backoff budget first. Any other exception is presumed
    * transient (the 429/503 class) and retried to `maxAttempts`. */
  final class NonRetryableError(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause) {
    def this(msg: String) = this(msg, null)
  }

  /** Retry `f` up to `maxAttempts` times with exponential backoff
    * (`backoffMs * 2^attempt`), rethrowing the final failure. A
    * [[NonRetryableError]] short-circuits: it rethrows on the first
    * attempt (retrying a permanent failure only delays the verdict).
    * The standard client-side answer to transient source errors;
    * attempts are reported via the returned (value, attempts). */
  def withRetry[T](maxAttempts: Int = 3, backoffMs: Long = 100)(f: => T): (T, Int) = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return (f, attempt)
      catch {
        case e: NonRetryableError => throw e
        case e: Throwable =>
          if (attempt >= maxAttempts) throw e
          Thread.sleep(backoffMs << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The manifest slice covering `shards` — reads ONLY those shard
    * partitions of a sharded manifest (absent shards skipped: a new
    * arrival date has no partition yet). None when the manifest table
    * doesn't exist or none of the shards do. */
  private[graft] def manifestSlice(spark: SparkSession, manifestRoot: String,
                                   shards: Seq[String]): Option[DataFrame] = {
    val v = VersionedTable.currentVersion(spark, manifestRoot)
    if (v.isEmpty) return None
    // an UNSHARDED manifest must fail loudly: treating it as "no shard
    // exists yet" would report every already-ingested file as pending
    // and re-run their side effects
    require(VersionedTable.partitionNative(spark, manifestRoot, v.get),
      s"manifest at $manifestRoot is not sharded (unscoped dirs); " +
      "pending/ingest with shardOf would reprocess every recorded file — " +
      "use a fresh manifest root for the sharded layout")
    try Some(VersionedTable.readPartitions(spark, manifestRoot, shards.distinct, v))
    catch { case _: java.io.FileNotFoundException => None } // no listed shard exists yet
  }

  /** Files under `landingDir` matching `glob` that have NO committed
    * manifest entry yet. The listing is anti-joined against the
    * manifest TABLE distributed-side, and only the surviving pending
    * names — bounded by the batch, not the table — are collected: at
    * 10^7+ landed files the manifest never materializes on the driver.
    *
    * `shardOf` (file name → shard, e.g. an arrival-date prefix) makes
    * the anti-join read ONLY the manifest shards the listing touches
    * ([[manifestSlice]]): with a date-partitioned landing prefix each
    * run lists one bounded shard and scans one manifest partition,
    * however many years of history the manifest holds. Use the same
    * `shardOf` for every pending/ingest call against one manifest —
    * it is the manifest's partition layout, not a per-call filter.
    */
  def pending(spark: SparkSession, landingDir: String, glob: String,
              manifestRoot: String,
              shardOf: Option[String => String] = None): Seq[String] = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(landingDir), spark.sparkContext.hadoopConfiguration)
    val listed = fs.globStatus(new org.apache.hadoop.fs.Path(s"$landingDir/$glob"))
      .map(_.getPath.getName).toSeq
    if (listed.isEmpty) return Nil
    val manifest = shardOf match {
      case Some(f) => manifestSlice(spark, manifestRoot, listed.map(f))
      case None => VersionedTable.currentVersion(spark, manifestRoot)
        .map(_ => VersionedTable.read(spark, manifestRoot))
    }
    manifest match {
      case None => listed.sorted
      case Some(m) =>
        // a redriven dead-letter is pending again; every other
        // recorded state (done, dead) is consumed. Legacy manifests
        // without a state column count every entry as consumed.
        val consumed =
          if (m.columns.contains("state"))
            m.filter(coalesce(col("state"), lit("done")) =!= lit("redrive"))
          else m
        listed.toDF("file").join(consumed.select(col("file")), Seq("file"), "left_anti")
          .collect().map(_.getString(0)).toSeq.sorted
    }
  }

  /** The manifest's dead-letter slice: files whose ingest failed
    * permanently (a [[NonRetryableError]], or retries exhausted) —
    * (file, attempts, error[, shard]). These files stop consuming
    * retries: [[pending]] excludes them, so subsequent ingest runs
    * skip them entirely until an operator [[redrive]]s them. */
  def deadLetters(spark: SparkSession, manifestRoot: String): DataFrame = {
    val m = VersionedTable.read(spark, manifestRoot)
    require(m.columns.contains("state"),
      s"manifest at $manifestRoot predates the dead-letter taxonomy")
    m.filter(col("state") === lit("dead"))
      .drop("rows", "state")
  }

  /** Re-admit dead-lettered files (all of them, or the named subset):
    * their manifest entries flip to `redrive`, which [[pending]]
    * treats as not-consumed, so the next [[ingest]] run reprocesses
    * them with a fresh retry budget — the operational redrive loop of
    * every dead-letter queue. Returns the files redriven. */
  def redrive(spark: SparkSession, manifestRoot: String,
              files: Seq[String] = Nil): Seq[String] = {
    import spark.implicits._
    val dead = deadLetters(spark, manifestRoot)
      .select(col("file")).as[String].collect().toSeq
    val chosen = if (files.isEmpty) dead else dead.filter(files.contains)
    if (chosen.isEmpty) return Nil
    val m = VersionedTable.read(spark, manifestRoot)
    val sharded = m.columns.contains("shard")
    val entries = m.filter(col("file").isin(chosen: _*))
      .withColumn("state", lit("redrive"))
    if (sharded)
      VersionedTable.mergePartitioned(spark, manifestRoot, entries,
        keys = Seq("file"), partitionCol = "shard")
    else
      VersionedTable.merge(spark, manifestRoot, entries, keys = Seq("file"))
    chosen.sorted
  }

  /** Ingest every pending file: `process(file df)` runs under retry,
    * then the file's manifest entry (name, rows, attempts, state,
    * error) commits atomically. Returns the file names SUCCESSFULLY
    * processed this run (empty on replay — the manifest gate).
    *
    * Failure taxonomy (the reference's queue_for_fetch contract): a
    * [[NonRetryableError]] from `process` — or from reading the file
    * itself — dead-letters the file IMMEDIATELY; any other exception
    * retries with exponential backoff and dead-letters when
    * `maxAttempts` exhaust. A dead-lettered file's manifest entry
    * (state `dead`, the error message, attempts consumed) commits
    * just like a success, so the file STOPS consuming retries on
    * every subsequent run — one poisoned payload cannot wedge the
    * feed, and the run continues with the remaining files.
    * [[deadLetters]] lists them; [[redrive]] re-admits them.
    *
    * Per-file manifest commits mean a crash mid-run loses no
    * completed work: the next run resumes at the first unrecorded
    * file — and re-runs `process` for the one file whose processing
    * finished but whose entry never committed, which is why the sink
    * must be idempotent for end-to-end exactly-once (see class doc).
    */
  def ingest(spark: SparkSession, landingDir: String, glob: String,
             manifestRoot: String, process: DataFrame => Unit,
             maxAttempts: Int = 3, backoffMs: Long = 10,
             shardOf: Option[String => String] = None): Seq[String] = {
    import spark.implicits._
    val todo = pending(spark, landingDir, glob, manifestRoot, shardOf)
    val done = scala.collection.mutable.ArrayBuffer.empty[String]
    todo.foreach { name =>
      val path = s"$landingDir/$name"
      var attempts = 0
      var failure: Throwable = null
      var rows = -1L
      var ok = false
      while (!ok && failure == null) {
        attempts += 1
        try {
          val df = spark.read.parquet(path)
          process(df)
          rows = df.count()
          ok = true
        } catch {
          case e: NonRetryableError => failure = e
          case scala.util.control.NonFatal(e) =>
            if (attempts >= maxAttempts) failure = e
            else Thread.sleep(backoffMs << (attempts - 1))
        }
      }
      val state = if (ok) "done" else "dead"
      val error =
        if (ok) null
        else s"${failure.getClass.getSimpleName}: ${Option(failure.getMessage).getOrElse("")}".take(300)
      shardOf match {
        case Some(f) =>
          val entry = Seq((name, rows, attempts.toLong, state, error, f(name)))
            .toDF("file", "rows", "attempts", "state", "error", "shard")
          VersionedTable.mergePartitioned(spark, manifestRoot, entry,
            keys = Seq("file"), partitionCol = "shard")
        case None =>
          val entry = Seq((name, rows, attempts.toLong, state, error))
            .toDF("file", "rows", "attempts", "state", "error")
          VersionedTable.merge(spark, manifestRoot, entry, keys = Seq("file"))
      }
      if (ok) done += name
    }
    done.toSeq
  }
}
