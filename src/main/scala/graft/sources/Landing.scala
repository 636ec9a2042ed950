package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Landing-zone ingestion with a durable manifest — the Spark-side
  * analogue of the reference's fetch-and-land loop
  * (services/workers/tasks/queue_for_fetch.py: API fetch into object
  * storage; queue_for_delta.py:353 `_download_from_storage`): files
  * arrive in a landing directory, and each is processed EXACTLY ONCE
  * across any number of ingest runs, because the manifest — itself a
  * [[VersionedTable]], so manifest updates are atomic commits — records
  * every file already consumed. A crashed run re-processes only the
  * files whose manifest entry never committed; a replayed run is a
  * no-op.
  *
  * The sandbox has no network, so the flaky part of a real source
  * (HTTP 429/503, object-store eventual consistency) is modeled by
  * [[withRetry]] — exponential-backoff retry around any fetch/process
  * closure — which the ingest loop wraps around per-file processing.
  * The landing directory itself stands in for the object-store bucket:
  * the listing/manifest/idempotency plumbing is identical either way.
  */
object Landing {

  /** Retry `f` up to `maxAttempts` times with exponential backoff
    * (`backoffMs * 2^attempt`), rethrowing the final failure. The
    * standard client-side answer to transient source errors; attempts
    * are reported to the caller via the returned (value, attempts).
    */
  def withRetry[T](maxAttempts: Int = 3, backoffMs: Long = 100)(f: => T): (T, Int) = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return (f, attempt)
      catch {
        case e: Throwable =>
          if (attempt >= maxAttempts) throw e
          Thread.sleep(backoffMs << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Files under `landingDir` matching `glob` that have NO committed
    * manifest entry yet. */
  def pending(spark: SparkSession, landingDir: String, glob: String,
              manifestRoot: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(landingDir), spark.sparkContext.hadoopConfiguration)
    val listed = fs.globStatus(new org.apache.hadoop.fs.Path(s"$landingDir/$glob"))
      .map(_.getPath.getName).toSeq.sorted
    val done: Set[String] =
      if (VersionedTable.currentVersion(spark, manifestRoot).isEmpty) Set.empty
      else VersionedTable.read(spark, manifestRoot)
        .select(col("file")).collect().map(_.getString(0)).toSet
    listed.filterNot(done)
  }

  /** Ingest every pending file exactly once: `process(file df)` runs
    * under retry, then the file's manifest entry (name, rows, ingest
    * batch) commits atomically. Returns the file names processed this
    * run (empty on replay — the idempotency contract). Per-file
    * manifest commits mean a crash mid-run loses no completed work:
    * the next run resumes at the first unrecorded file.
    */
  def ingest(spark: SparkSession, landingDir: String, glob: String,
             manifestRoot: String, process: DataFrame => Unit,
             maxAttempts: Int = 3, backoffMs: Long = 10): Seq[String] = {
    import spark.implicits._
    val todo = pending(spark, landingDir, glob, manifestRoot)
    todo.foreach { name =>
      val df = spark.read.parquet(s"$landingDir/$name")
      val (_, attempts) = withRetry(maxAttempts, backoffMs)(process(df))
      val entry = Seq((name, df.count(), attempts.toLong))
        .toDF("file", "rows", "attempts")
      VersionedTable.merge(spark, manifestRoot, entry, keys = Seq("file"))
    }
    todo
  }
}
