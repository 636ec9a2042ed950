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
  * commit alongside as a tiny seeds table; and the corpus VECTORS
  * commit alongside as an id-bucketed FORWARD INDEX
  * (`pmod(hash(vec_id), NumBuckets)` partition dirs — the same layout
  * the edge table uses), so scoring a hop's candidates is a
  * dir-pruned point lookup, never a corpus scan. Probe = the
  * deterministic [[Similarity.beamWalk]] (fixed beam, lowest-id
  * tie-break); BOTH per-hop fetches — adjacency and candidate
  * vectors — open ≤ the frontier's bucket dirs
  * ([[lastProbeBucketCounts]] / [[lastVecBucketCounts]] pin it on
  * actual IO).
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

  /** Per-score-pass count of VECTOR-bucket dirs the last [[probe]]
    * opened (one entry for the seed scoring + one per hop) — the
    * forward-index dir-pruning evidence: each pass must open ≤ the
    * candidate-id buckets (≤ seeds, then ≤ beam·graphK per hop),
    * never the full bucket set. */
  @volatile var lastVecBucketCounts: Seq[Int] = Nil

  /** Adjacency/vector bucket count: a fetch opens ≤ min(wanted ids,
    * this) dirs. Production sizes this so a bucket dir is a few GB. */
  val NumBuckets = 32

  /** Recommend a rebuild when post-build churn (arrivals whose
    * insertion never re-ranked old lists + retirements whose holes
    * compact cannot repair) exceeds this fraction of the corpus at
    * the last [[build]] — the same contract as
    * [[VecIndex.RebuildFraction]] / [[GramIndex.rebuildRecommended]]. */
  val RebuildFraction = 0.25

  private def edgeRoot(root: String) = s"$root/edges"
  private def seedRoot(root: String) = s"$root/seeds"
  private def retireRoot(root: String) = s"$root/retired"
  private def vecRoot(root: String) = s"$root/vectors"
  private def metaPath(root: String) = s"$root/_graph_meta"

  private def hfs(spark: SparkSession, root: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  private def readMeta(spark: SparkSession, root: String): Option[(Long, Long, Long)] =
    try {
      val f = hfs(spark, root)
      val in = f.open(new org.apache.hadoop.fs.Path(metaPath(root)))
      val kv = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        .split("\n").map(_.trim).filter(_.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k -> v.toLong }.toMap
      finally in.close()
      Some((kv("built_vecs"), kv("ingested_vecs"), kv("retired_vecs")))
    } catch { case _: Exception => None }

  private def writeMeta(spark: SparkSession, root: String, builtVecs: Long,
                        ingestedVecs: Long, retiredVecs: Long): Unit = {
    val f = hfs(spark, root)
    val out = f.create(new org.apache.hadoop.fs.Path(metaPath(root)),
      /* overwrite = */ true)
    try out.write(
      (s"built_vecs=$builtVecs\ningested_vecs=$ingestedVecs\n" +
       s"retired_vecs=$retiredVecs\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Whether a rebuild is DUE. Graph-specific churn semantics, stated
    * honestly: [[ingest]] inserts arrivals bidirectionally but never
    * re-ranks OLD nodes' lists (their edges go stale as the corpus
    * grows), and [[delete]] leaves holes in survivors' lists that
    * [[compact]] purges physically but cannot re-fill — so BOTH count
    * toward churn and compact does NOT reset it; only [[build]]
    * (re-ranking every list from the current corpus) does. No meta =
    * unknown drift = recommend conservatively. */
  def rebuildRecommended(spark: SparkSession, root: String): Boolean =
    readMeta(spark, root) match {
      case Some((built, ingested, retired)) =>
        ingested + retired > built.max(1L) * RebuildFraction
      case None => true
    }

  /** The graveyard set — empty when no delete has run. */
  private def retiredDf(spark: SparkSession, root: String): DataFrame =
    VersionedTable.currentVersion(spark, retireRoot(root)) match {
      case Some(_) => VersionedTable.read(spark, retireRoot(root))
        .select(col("vec_id").as("c_id")).distinct()
      case None => spark.range(0).select(col("id").as("c_id"))
    }

  private def bucketCol(c: org.apache.spark.sql.Column) =
    pmod(hash(c), lit(NumBuckets)).cast("string")

  /** Build (or REBUILD): one s20 kNN join (the single cell-key
    * shuffle), committed partition-native on the source-id bucket;
    * one s21 farthest-first pass for the entry points; one
    * id-bucketed commit of the corpus vectors (the forward index
    * [[probe]] scores against). A rebuild RESETS the retired
    * graveyard — every list is re-ranked from `embeddings`, so a
    * previously-retired id that is still in the corpus is live again
    * (callers wanting it gone must exclude it from the corpus), and
    * resets the churn meta [[rebuildRecommended]] reads. */
  def build(spark: SparkSession, root: String, embeddings: DataFrame,
            graphK: Int = 3, nProbe: Int = 2, nSeeds: Int = 8,
            centIds: Seq[Long] = Similarity.centroidIds): Unit = {
    indexBuilds += 1
    val edges = Similarity.knnJoin(embeddings, graphK, nProbe, centIds)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .withColumn("bucket", bucketCol(col("src")))
    val ev = VersionedTable.currentVersion(spark, edgeRoot(root)).getOrElse(-1L)
    VersionedTable.commitPartitioned(spark, edgeRoot(root), edges, "bucket", ev)
    val vecs = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", bucketCol(col("vec_id")))
    val vv = VersionedTable.currentVersion(spark, vecRoot(root)).getOrElse(-1L)
    VersionedTable.commitPartitioned(spark, vecRoot(root), vecs, "bucket", vv)
    val sv = VersionedTable.currentVersion(spark, seedRoot(root)).getOrElse(-1L)
    VersionedTable.commit(spark, seedRoot(root),
      Similarity.kcenterSeed(embeddings, nSeeds).select(col("vec_id")), sv)
    VersionedTable.currentVersion(spark, retireRoot(root)).foreach { rv =>
      VersionedTable.commit(spark, retireRoot(root),
        spark.range(0).select(col("id").as("vec_id")), rv)
    }
    writeMeta(spark, root, builtVecs = embeddings.count(),
      ingestedVecs = 0L, retiredVecs = 0L)
  }

  /** Probe: the shared [[Similarity.graphWalkTopK]] walk, with each
    * hop's adjacency fetch AND candidate-vector fetch DIR-PRUNED to
    * the frontier's buckets — the per-fetch driver-side collect is
    * the distinct bucket list, bounded by queries × beam × graphK
    * (≤ NumBuckets strings). Candidate vectors come from the index's
    * own forward table, never a corpus scan: `embeddings` supplies
    * ONLY the query vectors (one predicate-pushed scan, read once).
    *
    * Consistency: every table version is resolved ONCE at probe
    * start — the walk's hops all read the edge/vector tables AT those
    * pinned versions, so a probe concurrent with [[ingest]] or
    * [[compact]] sees a wholly-pre- or wholly-post-mutation snapshot,
    * never a mixed one (the LexIndex manifest contract, applied with
    * per-table pins since the tables here mutate independently). */
  def probe(spark: SparkSession, root: String, embeddings: DataFrame,
            maxQueryId: Long = 8, k: Int = 3, beam: Int = 4,
            hops: Int = 3): DataFrame = {
    val ev = VersionedTable.currentVersion(spark, edgeRoot(root)).getOrElse(
      throw new IllegalStateException(s"no graph index built at $root"))
    val vv = VersionedTable.currentVersion(spark, vecRoot(root)).getOrElse(
      throw new IllegalStateException(s"no vector forward index at $root"))
    val retired = retiredDf(spark, root).localCheckpoint()
    val seeds = VersionedTable.read(spark, seedRoot(root))
      .select(col("vec_id").as("c_id"))
      .join(retired, Seq("c_id"), "left_anti") // a retired entry point dies
    lastProbeBucketCounts = Nil
    lastVecBucketCounts = Nil
    val fetchVecs: DataFrame => DataFrame = ids => {
      val buckets = ids.select(bucketCol(col("c_id")).as("b")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      lastVecBucketCounts = lastVecBucketCounts :+ buckets.size
      if (buckets.isEmpty)
        ids.select(col("c_id"))
          .withColumn("ce", lit(null).cast("array<float>")).limit(0)
      else VersionedTable.readPartitions(spark, vecRoot(root), buckets,
          version = Some(vv))
        .select(col("vec_id").as("c_id"), col("embedding").as("ce"))
    }
    Similarity.graphWalkTopK(embeddings, maxQueryId, k, beam, hops, seeds,
      fr => {
        val buckets = fr.select(bucketCol(col("c_id")).as("b")).distinct()
          .collect().map(_.getString(0)).sorted.toSeq
        lastProbeBucketCounts = lastProbeBucketCounts :+ buckets.size
        if (buckets.isEmpty) fr.select(col("q_id"), col("c_id")).limit(0)
        else {
          val slice = VersionedTable.readPartitions(
            spark, edgeRoot(root), buckets, version = Some(ev))
          fr.join(slice, fr("c_id") === slice("src"))
            .select(fr("q_id"), slice("dst").as("c_id"))
            // dangling edges to retired nodes are filtered at fetch
            // time (the graveyard read path); [[compact]] purges them
            .join(broadcast(retired), Seq("c_id"), "left_anti")
        }
      }, fetchVecs = Some(fetchVecs))
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
    val vs = victimIds.select(col("vec_id")).distinct().localCheckpoint()
    val rv = VersionedTable.currentVersion(spark, retireRoot(root))
    rv match {
      case None => VersionedTable.commit(spark, retireRoot(root), vs, -1L)
      case Some(v) => VersionedTable.append(spark, retireRoot(root), vs, v)
    }
    readMeta(spark, root).foreach { case (b, i, r) =>
      writeMeta(spark, root, b, i, r + vs.count()) }
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
      val vv = VersionedTable.currentVersion(spark, vecRoot(root)).get
      val liveVecs = VersionedTable.read(spark, vecRoot(root))
        .join(retired.select(col("c_id").as("vec_id")), Seq("vec_id"), "left_anti")
        .withColumn("bucket", bucketCol(col("vec_id")))
      VersionedTable.commitPartitioned(spark, vecRoot(root), liveVecs, "bucket", vv)
      val rv = VersionedTable.currentVersion(spark, retireRoot(root)).get
      VersionedTable.commit(spark, retireRoot(root),
        retired.select(col("c_id").as("vec_id")).limit(0), rv)
    }
    VersionedTable.compactPartitioned(spark, edgeRoot(root))
    VersionedTable.compactPartitioned(spark, vecRoot(root))
    // churn meta survives on purpose: purging holes is not re-filling
    // them — [[rebuildRecommended]] stays due until a [[build]]
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
    // the arrivals' vectors join the forward index: O(batch) add-files
    // into their id buckets, so the very next probe can score them
    val arrivals = newVecs.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", bucketCol(col("vec_id"))).localCheckpoint()
    val vv = VersionedTable.currentVersion(spark, vecRoot(root)).getOrElse(
      throw new IllegalStateException(s"no vector forward index at $root"))
    VersionedTable.appendPartitioned(spark, vecRoot(root), arrivals, "bucket", vv)
    readMeta(spark, root).foreach { case (b, i, r) =>
      writeMeta(spark, root, b, i + arrivals.count(), r) }
    ()
  }

  // caches the createTempDirectory PARENT (the index lives at
  // '$dir/ix'), so eviction deletes the whole tree — caching the
  // child leaked the parent dir on every eviction
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
      dir
    }
    val (dir, ephemeral) =
      if (!Caching.bareScan(embeddings)) (buildIngested(), true)
      else {
        val stamp = Caching.stamp(embeddings)
        if (stamp.isEmpty) (buildIngested(), true)
        else (cache.getOrElseUpdate((spark, stamp + "#ingest"))(buildIngested()),
              false)
      }
    val res = probe(spark, s"$dir/ix", embeddings, maxQueryId, k, beam, hops)
    if (ephemeral) {
      val out = res.localCheckpoint()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
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
      dir
    }
    val (dir, ephemeral) =
      if (!Caching.bareScan(embeddings)) (buildTemp(), true)
      else {
        val stamp = Caching.stamp(embeddings)
        if (stamp.isEmpty) (buildTemp(), true)
        else (cache.getOrElseUpdate((spark, stamp))(buildTemp()), false)
      }
    val res = probe(spark, s"$dir/ix", embeddings, maxQueryId, k, beam, hops)
    if (ephemeral) {
      val out = res.localCheckpoint()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      out
    } else res
  }
}
