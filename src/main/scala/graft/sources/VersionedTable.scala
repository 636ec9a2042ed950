package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A versioned parquet table with an append-only commit log — the
  * transactional semantics the reference gets from delta-rs
  * (services/workers/tasks/queue_for_delta.py:680-799: ACID merge
  * commits into a versioned Delta table), rebuilt on nothing but a
  * filesystem with atomic create:
  *
  * Layout:
  * {{{
  *   <root>/_log/v00000003.commit   // one file per version; content =
  *                                  // the data directory it publishes
  *   <root>/data/v00000003-<uuid>/  // immutable parquet snapshot
  * }}}
  *
  * Protocol (optimistic concurrency, the same shape Delta's log
  * uses):
  *  1. read the current version `b` (max committed log entry);
  *  2. stage the new snapshot under a WRITER-UNIQUE data dir — two
  *     racing writers can never collide on staging paths;
  *  3. publish by creating `_log/v{b+1}.commit` with overwrite=false
  *     — an ATOMIC lose-or-win point (HDFS create and POSIX
  *     createNewFile are atomic): the loser gets
  *     [[VersionConflictException]], cleans up its staged dir, and can
  *     retry against the fresh snapshot ([[merge]] does exactly that).
  *
  * What this buys over [[LakehouseWriter.mergeInto]]'s
  * merge-and-rewrite: readers NEVER observe a window where the table
  * is absent or half-swapped (a version is invisible until its commit
  * file exists, and data dirs are immutable); concurrent writers are
  * detected instead of silently racing the rename swap; and every
  * historical version stays readable ([[readAsOf]] — time travel)
  * until [[vacuum]] reclaims it.
  *
  * A commit file lists the data dirs a version reads (one per line):
  * [[commit]]/[[merge]] publish a single full snapshot; [[append]]
  * adds ONLY the new rows' dir to the predecessor's list — the
  * add-file action that makes appends O(delta), with [[compact]] to
  * fold a long chain back into one snapshot and [[vacuum]] deleting
  * only dirs no retained version reaches.
  *
  * Remaining boundary vs delta-rs, stated honestly: merges still
  * rewrite the full snapshot (no remove-file actions / copy-on-write
  * file pruning, so upsert cost is O(table) where Delta rewrites only
  * touched files) — at 100 TB you partition the table and version
  * each partition's slice, or step up to a real Delta/Iceberg log;
  * checkpoint/compaction of the log itself is not implemented.
  */
object VersionedTable {

  final class VersionConflictException(val version: Long)
    extends RuntimeException(s"version $version was committed concurrently")

  private def fs(spark: SparkSession, root: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  private def verName(v: Long) = f"v$v%08d"

  /** Highest committed version, or None for an absent/empty table. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val ld = p(s"$root/_log")
    if (!f.exists(ld)) None
    else {
      val vs = f.listStatus(ld).map(_.getPath.getName)
        .filter(_.matches("v\\d{8}\\.commit"))
        .map(_.stripPrefix("v").stripSuffix(".commit").toLong)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** The RELATIVE data dirs a version's commit file publishes — one
    * for a full-snapshot commit, several for an append chain. */
  private def dataRelsOf(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val f = fs(spark, root)
    val in = f.open(p(s"$root/_log/${verName(v)}.commit"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    finally in.close()
  }

  /** Time travel: the immutable snapshot a given version published. */
  def readAsOf(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(dataRelsOf(spark, root, version).map(r => s"$root/$r"): _*)

  /** The latest committed snapshot. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(s"no committed version at $root"))
    readAsOf(spark, root, v)
  }

  /** Stage `df` and atomically publish it as version `base + 1`.
    * Throws [[VersionConflictException]] (after cleaning up the staged
    * snapshot) if another writer committed `base + 1` first. `base` is
    * the version the caller's snapshot was READ at (-1 for creating an
    * absent table) — passing it explicitly is what makes the check an
    * optimistic-concurrency guard rather than a last-writer-wins race.
    */
  def commit(spark: SparkSession, root: String, df: DataFrame, base: Long): Long =
    stageAndCommit(spark, root, df, base, carryOver = Nil)

  /** O(delta) APPEND: stage ONLY the new rows and publish a commit
    * whose dir list = the base version's dirs + the new dir. The
    * delta-rs analogue of an add-file action: an append of B rows to
    * a T-row table writes O(B), not O(T) — the path a landing-zone
    * ingest loop should take at 100 TB, where daily arrivals are a
    * fraction of a percent of the table. Readers are unchanged
    * (readAsOf unions the dir list); [[compact]] folds a long append
    * chain back into one dir when small-file count starts to hurt
    * scan planning. Same optimistic-concurrency protocol as
    * [[commit]].
    */
  def append(spark: SparkSession, root: String, df: DataFrame, base: Long): Long =
    stageAndCommit(spark, root, df, base,
      carryOver = if (base < 0) Nil else dataRelsOf(spark, root, base))

  /** Fold the current version's dir list into a single full snapshot
    * — commits a NEW version (history stays time-travelable until
    * vacuum). The maintenance pass that bounds small-file growth
    * under an append-heavy workload. */
  def compact(spark: SparkSession, root: String): Long = {
    val base = currentVersion(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(s"no committed version at $root"))
    commit(spark, root, readAsOf(spark, root, base), base)
  }

  private def stageAndCommit(spark: SparkSession, root: String, df: DataFrame,
                             base: Long, carryOver: Seq[String]): Long = {
    val f = fs(spark, root)
    val next = base + 1
    val rel = s"data/${verName(next)}-${java.util.UUID.randomUUID()}"
    val staged = s"$root/$rel"
    try df.write.mode("errorifexists").parquet(staged)
    catch { case e: Throwable => f.delete(p(staged), true); throw e }
    f.mkdirs(p(s"$root/_log"))
    val commitFile = p(s"$root/_log/${verName(next)}.commit")
    val out =
      try f.create(commitFile, /* overwrite = */ false)
      catch { case _: java.io.IOException =>
        f.delete(p(staged), true)
        throw new VersionConflictException(next)
      }
    try out.write((carryOver :+ rel).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    next
  }

  /** MERGE `source` into the table under optimistic concurrency: read
    * the latest snapshot, upsert with the shared
    * [[graft.operators.Relational.mergeUpsert]] (so winner semantics
    * cannot drift from the rest of the write path), attempt the
    * commit; on conflict, re-read the FRESH snapshot and retry — the
    * loser's work is recomputed against the winner's table, never
    * silently dropped or doubled. Replaying an already-applied batch
    * commits a new version with identical content (idempotent by
    * latest-wins), mirroring the reference's retried Celery merges.
    */
  def merge(spark: SparkSession, root: String, source: DataFrame,
            keys: Seq[String], tieBreak: Seq[String] = Nil,
            maxRetries: Int = 3): Long = {
    var attempt = 0
    while (true) {
      val base = currentVersion(spark, root).getOrElse(-1L)
      val merged =
        if (base < 0) source
        else graft.operators.Relational.mergeUpsert(
          readAsOf(spark, root, base), source, keys, tieBreak)
      try return commit(spark, root, merged, base)
      catch {
        case _: VersionConflictException if attempt < maxRetries =>
          attempt += 1
      }
    }
    -1L // unreachable
  }

  /** CHANGE DATA FEED between two committed versions — the real
    * version of what q37 ([[graft.operators.Relational.snapshotDiff]])
    * demonstrates on synthetic snapshots: every row inserted, deleted,
    * or updated going from `fromVersion` to `toVersion`, classified by
    * full-outer join on the key columns (unchanged rows are dropped —
    * a feed consumer only wants the delta). `_old`/`_new` carry the
    * pre/post images of the non-key columns as structs.
    *
    * Scale shape: one shuffle of each snapshot on the key. Both sides
    * are snapshots of the SAME table written by the same path, so at
    * 100 TB they share partition layout and the join co-locates; the
    * unchanged-row filter drops the overwhelming majority of rows
    * before anything downstream. Struct comparison is null-safe
    * (`<=>`), and a `_present` marker distinguishes a join miss from
    * an all-null payload (and keeps the struct lit-valid for
    * key-only tables).
    */
  def changeFeed(spark: SparkSession, root: String,
                 fromVersion: Long, toVersion: Long,
                 keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    def imaged(df: DataFrame, as: String) = {
      val dataCols = df.columns.filterNot(keys.contains).toSeq
      df.select(keys.map(col) :+
        struct(lit(1).as("_present") +: dataCols.map(col): _*).as(as): _*)
    }
    imaged(readAsOf(spark, root, fromVersion), "_old")
      .join(imaged(readAsOf(spark, root, toVersion), "_new"), keys, "full_outer")
      .withColumn("change_type",
        when(col("_old").isNull, "inserted")
          .when(col("_new").isNull, "deleted")
          .when(!(col("_old") <=> col("_new")), "updated")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
  }

  /** Reclaim history: drop all but the last `keepLast` versions (their
    * log entries, and any data dir no RETAINED version still
    * references — append chains share dirs across versions, so
    * reachability, not ownership, decides what dies). The current
    * version is always kept. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 1): Unit = {
    val f = fs(spark, root)
    currentVersion(spark, root).foreach { cur =>
      val cutoff = cur - math.max(1, keepLast) + 1
      val ld = p(s"$root/_log")
      val versions = f.listStatus(ld).map(_.getPath.getName)
        .filter(_.matches("v\\d{8}\\.commit"))
        .map(_.stripPrefix("v").stripSuffix(".commit").toLong)
      val retained: Set[String] = versions.filter(_ >= cutoff)
        .flatMap(v => dataRelsOf(spark, root, v)).toSet
      versions.filter(_ < cutoff).foreach { v =>
        val rels = dataRelsOf(spark, root, v)
        f.delete(p(s"$root/_log/${verName(v)}.commit"), false)
        rels.filterNot(retained).foreach(r => f.delete(p(s"$root/$r"), true))
      }
    }
  }
}
