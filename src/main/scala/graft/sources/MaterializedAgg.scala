package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a keyed count/sum aggregate under
  * lakehouse upserts — the Spark analogue of the reference's
  * "invalidate the serving cache on write" loop (the reference
  * recomputes its cached list views whenever a write lands,
  * services/api/cache_utils.py:47-146 + services/api/signals.py).
  * Here the write triggers an INCREMENTAL refresh instead of a full
  * recompute: subtract the contribution of the target rows whose keys
  * the batch touches, add the contribution of their merged
  * replacements. Only the batch and the affected target rows (one
  * semi-join on the merge keys, prunable to the touched partitions)
  * are ever read — the 100 TB property: refresh cost scales with the
  * BATCH, not the table.
  *
  * Works for decomposable aggregates (count/sum here; min/max would
  * need a re-scan of shrinking groups). The merged winners of the
  * affected keys are recomputed with the SAME
  * [[graft.operators.Relational.mergeUpsert]] the write path uses, so
  * the winner choice cannot drift between the table and the view.
  */
object MaterializedAgg {

  /** The maintained view: per-group row count and value sum. */
  def fullAgg(df: DataFrame, groupCol: String, sumCol: String): DataFrame =
    df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"), sum(col(sumCol)).as("total"))

  /** Refresh `prevAgg` (= fullAgg of the pre-merge table) to reflect
    * mergeUpsert(targetBefore, source, keys, tieBreak), without
    * rescanning the table: delta = agg(merged affected slice) -
    * agg(affected slice before). Groups whose count reaches zero drop
    * out, matching a recomputed aggregate's absent groups.
    */
  def refreshAfterUpsert(prevAgg: DataFrame, targetBefore: DataFrame,
                         source: DataFrame, keys: Seq[String],
                         tieBreak: Seq[String],
                         groupCol: String, sumCol: String): DataFrame = {
    val srcKeys = source.select(keys.map(col): _*).distinct()
    val affectedBefore = targetBefore.join(srcKeys, keys, "left_semi")
    val affectedAfter =
      graft.operators.Relational.mergeUpsert(affectedBefore, source, keys, tieBreak)
    val minus = fullAgg(affectedBefore, groupCol, sumCol)
      .select(col("grp"), (-col("n")).as("n"), (-col("total")).as("total"))
    val plus = fullAgg(affectedAfter, groupCol, sumCol)
    prevAgg.unionByName(minus).unionByName(plus)
      .groupBy(col("grp"))
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
      .filter(col("n") > 0)
  }

  /** Groups the most recent [[applyChangeFeedMax]] call had to rescan
    * — spec evidence that the table re-read is confined to groups
    * whose extremum was actually retracted, not the view. */
  @volatile var lastMaxDirtyGroups: Long = 0L

  /** The maintained extremum view: per-group row count and value max. */
  def fullMax(df: DataFrame, groupCol: String, maxCol: String): DataFrame =
    df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"), max(col(maxCol)).as("mx"))

  /** Feed-refresh for a MAX view — the aggregate [[applyChangeFeed]]'s
    * scaladoc names as NOT decomposable under retraction, handled the
    * way every incremental view maintainer handles it: inserts and
    * raises fold in monotonically (greatest of view max and feed
    * post-images — no table access), but a feed that RETRACTS a value
    * >= its group's current max may have removed the extremum (or a
    * duplicate of it — indistinguishable without data), so exactly
    * those DIRTY groups recompute from the post-image `table`, semi-
    * joined down to the dirty keys (prunable to their partitions at
    * 100 TB). Refresh cost: O(feed) + O(dirty groups' rows) — and a
    * workload that only ever raises maxima never touches the table.
    * Counts are maintained decomposably as in [[applyChangeFeed]];
    * groups reaching n == 0 drop out like a recompute's absent
    * groups.
    */
  def applyChangeFeedMax(prevAgg: DataFrame, feed: DataFrame, table: DataFrame,
                         groupCol: String, maxCol: String): DataFrame = {
    def side(image: String, c: String): Column = {
      val payload = feed.schema(image).dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      if (payload.fieldNames.contains(c)) col(s"$image.$c") else col(c)
    }
    val prev = prevAgg.localCheckpoint(eager = false)
    // count deltas: decomposable, same shape as applyChangeFeed
    val dn = feed.select(
      when(col("change_type") === "inserted", side("_new", groupCol))
        .when(col("change_type") === "deleted", side("_old", groupCol))
        .otherwise(side("_new", groupCol)).as("grp"), // updated: post group...
      when(col("change_type") === "inserted", lit(1L))
        .when(col("change_type") === "deleted", lit(-1L))
        .otherwise(lit(0L)).as("dn"))
    // ...unless the update MOVED groups: retract one, add the other
    val moves = feed.filter(col("change_type") === "updated" &&
        !(side("_old", groupCol) <=> side("_new", groupCol)))
      .select(side("_old", groupCol).as("og"), side("_new", groupCol).as("ng"))
      .localCheckpoint(eager = false)
    val moveDeltas = moves.select(col("og").as("grp"), lit(-1L).as("dn"))
      .unionByName(moves.select(col("ng").as("grp"), lit(1L).as("dn")))
    val counts = prev.select(col("grp"), col("n").as("dn"))
      .unionByName(dn).unionByName(moveDeltas)
      .groupBy(col("grp")).agg(sum(col("dn")).as("n"))
    // monotone raises: post-images of inserted/updated rows
    val raises = feed.filter(col("change_type").isin("inserted", "updated"))
      .groupBy(side("_new", groupCol).as("grp"))
      .agg(max(side("_new", maxCol)).as("raise"))
    // dirty: a retracted pre-image whose value could have BEEN the
    // group's max (>= view max; null-safe — all-null groups stay
    // clean because null retractions can't lower a max). An in-place
    // update that does NOT lower its own value cannot lower the max
    // either — without this exclusion every touch of the max row
    // would rescan its group and the pure-raise-never-reads-the-table
    // property below would be false.
    val retracts = feed.filter(col("change_type").isin("deleted", "updated"))
      .filter(!(col("change_type") === "updated" &&
        (side("_old", groupCol) <=> side("_new", groupCol)) &&
        side("_new", maxCol).isNotNull &&
        side("_new", maxCol) >= side("_old", maxCol)))
      .select(side("_old", groupCol).as("grp"), side("_old", maxCol).as("rv"))
    // every join below is NULL-SAFE on the group key: fullMax groups
    // null like any other value, so a null group must flow through
    // refresh like any other group — plain equi-joins would silently
    // null its max and never mark it dirty. The right side's key is
    // RENAMED first: several of these frames share attribute lineage
    // (counts is built from prev), and frame-apply disambiguation
    // would resolve both sides to the same attribute — a trivially
    // true predicate.
    def joinNs(l: DataFrame, r: DataFrame, how: String): DataFrame =
      l.join(r.withColumnRenamed("grp", "_rgrp"),
             col("grp") <=> col("_rgrp"), how).drop("_rgrp")
    val dirty = joinNs(retracts, prev, "inner")
      .filter(col("rv").isNotNull && (col("mx").isNull || col("rv") >= col("mx")))
      .select(col("grp")).distinct().localCheckpoint()
    lastMaxDirtyGroups = dirty.count()
    val rescanned = fullMax(
      table.join(dirty, table(groupCol) <=> dirty("grp"), "left_semi"),
      groupCol, maxCol).select(col("grp"), col("mx").as("re_mx"))
    joinNs(joinNs(joinNs(joinNs(
      counts.filter(col("n") > 0),
      prev.select(col("grp"), col("mx")), "left"),
      raises, "left"),
      dirty.withColumn("is_dirty", lit(true)), "left"),
      rescanned, "left")
      .select(col("grp"), col("n"),
        when(col("is_dirty"), col("re_mx"))
          .otherwise(greatest(col("mx"), col("raise"))).as("mx"))
  }

  /** Refresh the view from a CHANGE DATA FEED
    * ([[VersionedTable.changeFeed]]) instead of from the table — the
    * fully decoupled consumer: a deleted row retracts its (group,
    * value) contribution from the pre-image, an inserted row adds the
    * post-image, and an update is retract + add (which also handles a
    * row MOVING between groups). The consumer never reads any table
    * snapshot after its initial seed — refresh cost scales with the
    * DELTA, and at 100 TB the feed is the only thing that crosses
    * from the write side to the serving side.
    */
  def applyChangeFeed(prevAgg: DataFrame, feed: DataFrame,
                      groupCol: String, sumCol: String): DataFrame = {
    // a column used in the view may be a PAYLOAD field (pre/post image
    // inside _old/_new) or a KEY column (top-level in the feed, one
    // coalesced value per row — identical for both images by
    // definition); resolve whichever the feed carries
    def side(image: String, c: String): Column = {
      val payload = feed.schema(image).dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      if (payload.fieldNames.contains(c)) col(s"$image.$c") else col(c)
    }
    val minus = feed.filter(col("change_type").isin("deleted", "updated"))
      .select(side("_old", groupCol).as("grp"),
              lit(-1L).as("n"), (-side("_old", sumCol)).as("total"))
    val plus = feed.filter(col("change_type").isin("inserted", "updated"))
      .select(side("_new", groupCol).as("grp"),
              lit(1L).as("n"), side("_new", sumCol).as("total"))
    prevAgg.unionByName(minus).unionByName(plus)
      .groupBy(col("grp"))
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
      .filter(col("n") > 0)
  }
}

/** The closed write->serve loop over REAL commits — the reference's
  * cache-invalidation cycle (services/api/cache_utils.py:47-146 +
  * signals.py: every write invalidates and refreshes the serving
  * cache) as a streaming foreachBatch sink: each micro-batch MERGES
  * into a [[VersionedTable]], then the maintained aggregate refreshes
  * from the table's CHANGE FEED between the view's version and the
  * post-commit version. After seeding, the serving side never reads a
  * table snapshot again — per-batch refresh cost is O(feed), and the
  * feed is the only thing that crosses from the write side to the
  * serving side (the 100 TB property; the view itself is
  * group-cardinality-bounded and localCheckpointed per refresh, the
  * iterative-frame rule).
  *
  * Version tracking is explicit (`atVersion`), so a foreign writer
  * committing between refreshes is folded in by the next feed — the
  * full-outer snapshot diff between ANY two versions is the net delta,
  * no matter how many commits lie between.
  */
final class ServingView(spark: SparkSession, root: String,
                        keys: Seq[String], groupCol: String, sumCol: String,
                        tieBreak: Seq[String] = Nil) {
  @volatile private var atVersion: Long =
    VersionedTable.currentVersion(spark, root).getOrElse(-1L)
  @volatile private var state: DataFrame =
    if (atVersion < 0) null
    else MaterializedAgg.fullAgg(
      VersionedTable.readAsOf(spark, root, atVersion), groupCol, sumCol).localCheckpoint()

  /** The maintained view (seed + every applied feed). */
  def view: DataFrame = {
    require(state != null, s"no committed data at $root yet")
    state
  }

  /** The table version the view currently reflects. */
  def version: Long = atVersion

  /** foreachBatch body: commit the batch, then feed-refresh the view.
    * Empty batches are no-ops (no empty commits). */
  def sink(batch: DataFrame, batchId: Long): Unit = {
    val recs = batch.localCheckpoint()
    if (recs.count() > 0) {
      val to = VersionedTable.merge(spark, root, recs, keys, tieBreak)
      state =
        if (state == null)
          MaterializedAgg.fullAgg(
            VersionedTable.readAsOf(spark, root, to), groupCol, sumCol).localCheckpoint()
        else
          MaterializedAgg.applyChangeFeed(state,
            VersionedTable.changeFeed(spark, root, atVersion, to, keys),
            groupCol, sumCol).localCheckpoint()
      atVersion = to
    }
  }
}
