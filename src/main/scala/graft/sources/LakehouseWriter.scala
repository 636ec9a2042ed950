package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned parquet writer — the lakehouse layout for the unified
  * records table (the reference writes one Delta table keyed on
  * (ticker, record_type, period_end_date); queue_for_delta.py:680-714).
  *
  * Layout choices that matter at 100 TB:
  *  - partition directories by record_type + period month: queries
  *    that filter either (the dominant access paths: "metadata for
  *    ticker X", "financials since date D") prune whole directories;
  *  - repartition on the partition columns before the write so each
  *    output directory is written by few tasks (no
  *    thousands-of-small-files problem);
  *  - sortWithinPartitions on the key so parquet row-group min/max
  *    stats make point lookups cheap.
  */
object LakehouseWriter {

  /** Write `records` (schema: key, record_type, period_end_date, ...)
    * partitioned by record_type and period month. */
  def writeUnified(records: DataFrame, path: String,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    records
      .withColumn("period_month",
        coalesce(date_format(col("period_end_date"), "yyyy-MM"), lit("none")))
      .repartition(col("record_type"), col("period_month"))
      .sortWithinPartitions(col("suppkey"))
      .write.mode(mode)
      .partitionBy("record_type", "period_month")
      .parquet(path)
  }

  /** Merge-and-rewrite: upsert source into the stored table (the
    * batch-parquet equivalent of the reference's Delta MERGE) and
    * write back partitioned. One shuffle on the merge key.
    *
    * Crash semantics (a real lakehouse uses a transaction log; this is
    * the batch-parquet stand-in): the swap is two renames, so there is
    * a window where `path` does not exist. A marker file
    * `<path>_MERGE_INPROGRESS` brackets that window — if a process
    * dies mid-swap, the marker plus whichever of `<path>`,
    * `<path>_old`, `<path>_staging` survive tell the operator (or a
    * repair script) exactly which rename to replay: data is ALWAYS
    * present at one of the three. A failed staging write cleans up
    * after itself and leaves the serving path untouched.
    *
    * Guarantees and boundaries vs the reference's delta-rs table
    * (services/workers/tasks/queue_for_delta.py:680-799):
    *  - IDEMPOTENT: replaying the same batch is a no-op by
    *    construction (latest-wins on the same keys/values — spec:
    *    "mergeInto is idempotent"), the property the reference leans
    *    on for its retried Celery tasks.
    *  - NOT concurrent-writer safe: there is no transaction log, no
    *    optimistic-concurrency commit, no time travel. Two
    *    simultaneous mergeInto calls race on the rename swap; the
    *    marker makes the crash window OBSERVABLE, not serialized.
    *    Callers must serialize writers per table path (one writer per
    *    table is also how the reference's queue partitions its work).
    */
  def mergeInto(spark: org.apache.spark.sql.SparkSession, path: String,
                source: DataFrame, keys: Seq[String], tieBreak: Seq[String]): Unit = {
    val target = spark.read.parquet(path).drop("period_month")
    val merged = graft.operators.Relational.mergeUpsert(target, source, keys, tieBreak)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val tmp = path + "_staging"
    try writeUnified(merged, tmp)
    catch { case e: Throwable => fs.delete(p(tmp), true); throw e }
    val old = path + "_old"
    val marker = p(path + "_MERGE_INPROGRESS")
    fs.delete(p(old), true)
    fs.create(marker, true).close()
    if (!fs.rename(p(path), p(old))) {
      fs.delete(marker, false)
      throw new java.io.IOException(s"could not move $path aside to $old")
    }
    if (!fs.rename(p(tmp), p(path))) {
      fs.rename(p(old), p(path)) // restore
      fs.delete(marker, false)
      throw new java.io.IOException(s"could not move $tmp into place at $path")
    }
    fs.delete(p(old), true)
    fs.delete(marker, false)
  }
}
