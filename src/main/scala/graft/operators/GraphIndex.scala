package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** The PERSISTED kNN-graph index — s20's graph stored the way
  * [[VecIndex]] stores cells and [[LexIndex]] stores postings: THE
  * ADJACENCY LISTS ARE PARTITION DIRS. Edges commit partition-native
  * on `bucket = pmod(hash(src), NumBuckets)`, so each beam-walk hop
  * opens ONLY the frontier's source buckets (dir-pruned IO before any
  * scan) instead of scanning N·k edges; the s21 k-center entry points
  * commit alongside as a tiny seeds table. Probe = the deterministic
  * [[Similarity.beamWalk]] (fixed beam, lowest-id tie-break), scoring
  * candidates against the corpus scan (production's forward-index
  * point lookup).
  *
  * This is the graph-ANN serving shape: build the graph ONCE
  * (s20's one cell-key shuffle), then answer queries with a handful
  * of bounded adjacency fetches + exact scores — the recall/cost
  * point [[Similarity.recallSweep]]'s `graph[...]` row measures
  * beside LSH/IVF/PQ. Maintenance: [[ingest]] adds arrival batches
  * incrementally with bidirectional edge insertion (s27); old nodes'
  * own lists are not re-ranked, so rebuild on the s04 retrain cadence
  * restores build quality after long arrival runs.
  *
  * Reference: the engine-side index family the survey motivates as
  * "graph-ANN base layers" over the s20 kNN join. */
object GraphIndex {

  /** Times a graph index was actually BUILT (not probed) — the d12/s24
    * evidence that repeated retrieval runs are probe-only. */
  @volatile var indexBuilds: Long = 0L

  /** Per-hop count of edge-bucket dirs the last [[probe]] actually
    * opened — the spec's dir-pruning evidence (each hop must open ≤
    * frontier-id buckets, never the full bucket set). */
  @volatile var lastProbeBucketCounts: Seq[Int] = Nil

  /** Adjacency bucket count: a hop opens ≤ min(frontier ids, this)
    * dirs. Production sizes this so a bucket dir is a few GB. */
  val NumBuckets = 32

  private def edgeRoot(root: String) = s"$root/edges"
  private def seedRoot(root: String) = s"$root/seeds"
  private def retireRoot(root: String) = s"$root/retired"

  /** The graveyard set — empty when no delete has run. */
  private def retiredDf(spark: SparkSession, root: String): DataFrame =
    VersionedTable.currentVersion(spark, retireRoot(root)) match {
      case Some(_) => VersionedTable.read(spark, retireRoot(root))
        .select(col("vec_id").as("c_id")).distinct()
      case None => spark.range(0).select(col("id").as("c_id"))
    }

  private def bucketCol(c: org.apache.spark.sql.Column) =
    pmod(hash(c), lit(NumBuckets)).cast("string")

  /** Build: one s20 kNN join (the single cell-key shuffle), committed
    * partition-native on the source-id bucket; one s21 farthest-first
    * pass for the entry points. */
  def build(spark: SparkSession, root: String, embeddings: DataFrame,
            graphK: Int = 3, nProbe: Int = 2, nSeeds: Int = 8,
            centIds: Seq[Long] = Similarity.centroidIds): Unit = {
    indexBuilds += 1
    val edges = Similarity.knnJoin(embeddings, graphK, nProbe, centIds)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .withColumn("bucket", bucketCol(col("src")))
    val ev = VersionedTable.currentVersion(spark, edgeRoot(root)).getOrElse(-1L)
    VersionedTable.commitPartitioned(spark, edgeRoot(root), edges, "bucket", ev)
    val sv = VersionedTable.currentVersion(spark, seedRoot(root)).getOrElse(-1L)
    VersionedTable.commit(spark, seedRoot(root),
      Similarity.kcenterSeed(embeddings, nSeeds).select(col("vec_id")), sv)
  }

  /** Probe: the shared [[Similarity.graphWalkTopK]] walk, with each
    * hop's adjacency fetch DIR-PRUNED to the frontier's buckets — the
    * per-hop driver-side collect is the distinct bucket list, bounded
    * by queries × beam (≤ NumBuckets strings). Results are identical
    * to the inline [[Similarity.graphAnnTopK]] arm by construction
    * (same kernels, same walk, spec-pinned). */
  def probe(spark: SparkSession, root: String, embeddings: DataFrame,
            maxQueryId: Long = 8, k: Int = 3, beam: Int = 4,
            hops: Int = 3): DataFrame = {
    val retired = retiredDf(spark, root).localCheckpoint()
    val seeds = VersionedTable.read(spark, seedRoot(root))
      .select(col("vec_id").as("c_id"))
      .join(retired, Seq("c_id"), "left_anti") // a retired entry point dies
    lastProbeBucketCounts = Nil
    Similarity.graphWalkTopK(embeddings, maxQueryId, k, beam, hops, seeds,
      fr => {
        val buckets = fr.select(bucketCol(col("c_id")).as("b")).distinct()
          .collect().map(_.getString(0)).sorted.toSeq
        lastProbeBucketCounts = lastProbeBucketCounts :+ buckets.size
        if (buckets.isEmpty) fr.select(col("q_id"), col("c_id")).limit(0)
        else {
          val slice = VersionedTable.readPartitions(
            spark, edgeRoot(root), buckets)
          fr.join(slice, fr("c_id") === slice("src"))
            .select(fr("q_id"), slice("dst").as("c_id"))
            // dangling edges to retired nodes are filtered at fetch
            // time (the graveyard read path); [[compact]] purges them
            .join(broadcast(retired), Seq("c_id"), "left_anti")
        }
      })
  }

  /** DELETE (retire) vectors — the graveyard pattern real graph
    * indexes use, because edges POINTING AT a victim live in every
    * other node's list and finding them eagerly would scan the whole
    * edge table: delete APPENDS the victim ids to a tiny retired set,
    * O(batch); probes filter candidates and entry points against it
    * (retired nodes never appear in results and are never expanded —
    * their out-edges become unreachable without being touched).
    * Contract, stated honestly: unlike LexIndex/VecIndex, a graph
    * delete is NOT "equal to an index that never held the victim" —
    * the victim influenced its neighbors' top-k lists at build time,
    * and retiring it leaves HOLES, not repairs (survivors keep their
    * remaining edges; a rebuild restores build quality). Idempotent:
    * re-retiring is a no-op set union. [[compact]] purges the
    * graveyard physically. */
  def delete(spark: SparkSession, root: String, victimIds: DataFrame): Unit = {
    val vs = victimIds.select(col("vec_id")).distinct()
    val rv = VersionedTable.currentVersion(spark, retireRoot(root))
    rv match {
      case None => VersionedTable.commit(spark, retireRoot(root), vs, -1L)
      case Some(v) => VersionedTable.append(spark, retireRoot(root), vs, v)
    }
    ()
  }

  /** Fold append-fragmented edge chains AND purge the graveyard: one
    * distributed anti-join drops every edge whose src or dst is
    * retired, the result commits partition-native, the retired set
    * empties. Cost O(edge table) — the periodic maintenance pass, vs
    * delete's O(batch) online path. Probe results are unchanged by
    * construction (the probe already filtered what compact purges). */
  def compact(spark: SparkSession, root: String): Unit = {
    val retired = retiredDf(spark, root).localCheckpoint()
    val ev = VersionedTable.currentVersion(spark, edgeRoot(root)).getOrElse(
      throw new IllegalStateException(s"no graph index built at $root"))
    if (!retired.isEmpty) {
      val live = VersionedTable.read(spark, edgeRoot(root))
        .join(retired.select(col("c_id").as("src")), Seq("src"), "left_anti")
        .join(retired.select(col("c_id").as("dst")), Seq("dst"), "left_anti")
        .withColumn("bucket", bucketCol(col("src")))
      VersionedTable.commitPartitioned(spark, edgeRoot(root), live, "bucket", ev)
      val rv = VersionedTable.currentVersion(spark, retireRoot(root)).get
      VersionedTable.commit(spark, retireRoot(root),
        retired.select(col("c_id").as("vec_id")).limit(0), rv)
    }
    VersionedTable.compactPartitioned(spark, edgeRoot(root))
    ()
  }

  /** INGEST an arrival batch (s27): the batch's edges are its top-k
    * over the GROWN corpus (the same cell probe the build uses),
    * appended O(batch·k) into the touched source buckets — PLUS the
    * REVERSED edges into the neighbors' buckets, the bidirectional
    * insertion real graph builds (HNSW) do, because without it an
    * arrival has out-edges but nothing points AT it: it would be
    * unreachable by every walk. Contract and boundaries, stated
    * honestly: `corpus` is the grown corpus (the index stores
    * topology; vectors live in the corpus table) and `newVecs` ⊆
    * corpus must be NEW ids; old nodes' own lists are NOT re-ranked
    * (their stale edges dilute as arrivals accumulate — rebuild on
    * the s04 retrain cadence restores build quality); reverse
    * insertion lets touched lists grow past graphK (the walk
    * re-scores exactly, so extra edges cost IO, never correctness);
    * seeds stay the pre-ingest picks. Within-batch mutual pairs are
    * deduped before the append. */
  def ingest(spark: SparkSession, root: String, corpus: DataFrame,
             newVecs: DataFrame, graphK: Int = 3, nProbe: Int = 2,
             centIds: Seq[Long] = Similarity.centroidIds): Unit = {
    val fwd = Similarity.knnEdgesFor(corpus, newVecs, graphK, nProbe, centIds)
    val rev = fwd.select(col("dst").as("src"), col("src").as("dst"))
    val edges = fwd.unionByName(rev).distinct()
      .withColumn("bucket", bucketCol(col("src")))
    val ev = VersionedTable.currentVersion(spark, edgeRoot(root)).getOrElse(
      throw new IllegalStateException(s"no graph index built at $root"))
    VersionedTable.appendPartitioned(spark, edgeRoot(root), edges, "bucket", ev)
    ()
  }

  private val cache = new Caching.BoundedCache[
      (SparkSession, String), String](4,
    onEvict = dir =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)))

  /** s27's managed lifecycle: build on the corpus MINUS the arrival
    * slice (vec_id % 9 == 0 — a residue no oracle-pinned centroid id
    * occupies), ingest the arrivals against the grown corpus, probe
    * the grown index. The built+ingested fixture is cached per corpus
    * (ingest-vs-build is the spec's live half); the probe is the
    * timed/oracled half. */
  def ingestDemoAuto(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 3,
                     beam: Int = 4, hops: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    def buildIngested(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft-graphing").toString
      val root = s"$dir/ix"
      build(spark, root, embeddings.filter(pmod(col("vec_id"), lit(9)) =!= 0))
      ingest(spark, root, embeddings,
        embeddings.filter(pmod(col("vec_id"), lit(9)) === 0))
      root
    }
    val (root, ephemeral) =
      if (!Caching.bareScan(embeddings)) (buildIngested(), true)
      else {
        val stamp = Caching.stamp(embeddings)
        if (stamp.isEmpty) (buildIngested(), true)
        else (cache.getOrElseUpdate((spark, stamp + "#ingest"))(buildIngested()),
              false)
      }
    val res = probe(spark, root, embeddings, maxQueryId, k, beam, hops)
    if (ephemeral) {
      val out = res.localCheckpoint()
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(new java.io.File(root).getParent))
      out
    } else res
  }

  /** Build-once-per-corpus probe (the s24 lifecycle wrapper): cached
    * on the corpus scan stamp; uncacheable frames get an ephemeral
    * index torn down after the probe materializes. */
  def probeAuto(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 3,
                beam: Int = 4, hops: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    def buildTemp(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft-graphidx").toString
      build(spark, s"$dir/ix", embeddings)
      s"$dir/ix"
    }
    val (root, ephemeral) =
      if (!Caching.bareScan(embeddings)) (buildTemp(), true)
      else {
        val stamp = Caching.stamp(embeddings)
        if (stamp.isEmpty) (buildTemp(), true)
        else (cache.getOrElseUpdate((spark, stamp))(buildTemp()), false)
      }
    val res = probe(spark, root, embeddings, maxQueryId, k, beam, hops)
    if (ephemeral) {
      val out = res.localCheckpoint()
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(new java.io.File(root).getParent))
      out
    } else res
  }
}
