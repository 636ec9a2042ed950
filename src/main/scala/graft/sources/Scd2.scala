package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Type-2 (history-preserving) MERGE over a [[VersionedTable]] — the
  * warehouse-grade upgrade of the reference's metadata upsert
  * (update_stock_metadata.py overwrites the stocks dim in place;
  * an SCD2 dim keeps every attribute version with validity ranges).
  * q29 shows the READ side (deriving SCD2 ranges from an event log);
  * this is the WRITE side: each merge closes the validity window of
  * changed keys and inserts the new version, so `asOf` reconstruction
  * is a filter, not a replay.
  *
  * Table layout: business columns + `valid_from`, `valid_to`
  * (null = open) and `is_current`. Merge semantics per batch key:
  * unchanged → untouched (its valid_from does NOT move); changed →
  * current row closed at `effTs`, new current row inserted; new key →
  * inserted current. Keys absent from the batch are untouched (an
  * SCD2 merge is an upsert, not a sync — deletions are a tombstone
  * attribute, not a row removal).
  *
  * Contracts, stated honestly: a batch carrying real changes must be
  * strictly later than the table's newest valid_from (checked;
  * out-of-order batches are rejected, not silently applied); a batch
  * whose every effect is already in the table — a REPLAY from the
  * Landing at-least-once crash window, or a no-op refresh — commits
  * nothing and returns the current version (idempotent); the source
  * is deduped per key deterministically (all non-key columns as
  * tie-break, the [[VersionedTable.merge]] convention) so re-executed
  * merges cannot diverge. The rewrite is O(table) like
  * [[VersionedTable.merge]]; a partition-scoped variant would follow
  * [[VersionedTable.mergePartitioned]]'s dir-carrying shape (NOT
  * implemented here).
  *
  * Scale shape: ONE shuffle of current rows + batch on the key
  * (change detection); history rows are unioned through untouched —
  * never joined, never compared.
  */
object Scd2 {
  val From = "valid_from"
  val To = "valid_to"
  val Current = "is_current"

  /** SCD2-merge `source` (business columns only) at effective time
    * `effTs` (an ISO timestamp literal); returns the committed
    * version. */
  def mergeScd2(spark: SparkSession, root: String, source: DataFrame,
                keys: Seq[String], effTs: String): Long = {
    val ets = lit(effTs).cast("timestamp")
    val attrs = source.columns.toSeq.filterNot(keys.contains)
    require(attrs.nonEmpty, "SCD2 needs at least one non-key attribute")
    // deterministic per-key dedupe of the batch (same convention as
    // VersionedTable.merge's default tie-break)
    val src = graft.operators.Relational
      .mergeUpsert(source.limit(0), source, keys, attrs)
      .localCheckpoint(eager = false)
    val base = VersionedTable.currentVersion(spark, root)
    if (base.isEmpty) {
      val init = src.withColumn(From, ets)
        .withColumn(To, lit(null).cast("timestamp"))
        .withColumn(Current, lit(true))
      return VersionedTable.commit(spark, root, init, -1L)
    }
    val snap = VersionedTable.readAsOf(spark, root, base.get)
    val cur = snap.filter(col(Current))
    val hist = snap.filter(!col(Current))
    // change detection FIRST: ONE equi-join of current rows vs the
    // batch. A batch whose every effect is already in the table (a
    // replayed merge — the Landing at-least-once crash window — or a
    // pure no-op refresh) commits NOTHING and returns the current
    // version: idempotent, and no version churn. Only a batch with
    // real changes is then held to the monotonic-time contract.
    val srcR = src.select(
      (keys.map(col) ++ attrs.map(c => col(c).as(s"${c}__new"))): _*)
    val cmp = cur.join(srcR, keys)
    val differs = attrs.map(c => !(col(c) <=> col(s"${c}__new")))
      .reduce(_ || _)
    val changedKeys = cmp.filter(differs).select(keys.map(col): _*)
      .localCheckpoint(eager = false)
    val newKeys = src.join(cur, keys, "left_anti")
    if (changedKeys.isEmpty && newKeys.isEmpty) return base.get
    require(cur.filter(col(From) >= ets).isEmpty,
      s"SCD2 merge at $effTs is not after the table's newest valid_from — " +
      "out-of-order batches would corrupt validity ranges")
    val closed = cur.join(changedKeys, keys, "left_semi")
      .withColumn(To, ets).withColumn(Current, lit(false))
    val keptCurrent = cur.join(changedKeys, keys, "left_anti")
    val inserts = newKeys
      .unionByName(src.join(changedKeys, keys, "left_semi"))
      .withColumn(From, ets)
      .withColumn(To, lit(null).cast("timestamp"))
      .withColumn(Current, lit(true))
    val result = hist.unionByName(closed).unionByName(keptCurrent)
      .unionByName(inserts)
    VersionedTable.commit(spark, root, result, base.get)
  }

  /** The dimension as of time `ts` — a filter over validity ranges,
    * no replay: rows with valid_from <= ts < valid_to (open = ∞). */
  def asOf(spark: SparkSession, root: String, ts: String): DataFrame = {
    val t = lit(ts).cast("timestamp")
    VersionedTable.read(spark, root)
      .filter(col(From) <= t && (col(To).isNull || col(To) > t))
  }
}
