package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication suite over the documents table: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale shapes (the part that must survive 100 TB):
  *  - signatures/shingles are computed map-side in one projection —
  *    no shuffle until candidate generation;
  *  - candidate generation is a shuffle on a *bucket key* (LSH band,
  *    simhash chunk, hyperplane bucket), never an all-pairs join;
  *  - verification joins back to the (doc_id -> set) frame on doc_id.
  *
  * All hashes are explicit 31-base polynomial arithmetic mod 2^31-1
  * (see TextOps.shingleHashFragment) so the DuckDB oracle reproduces
  * them exactly; both sides are generated from Dialect.
  */
object Dedup {
  val P = 2147483647L

  // deterministic MinHash permutation constants (j = 0..15)
  val NumPerms = 16
  val minhashA: IndexedSeq[Long] =
    (0 until NumPerms).map(j => ((1103515245L * (j + 7) + 12345L) % P).max(1L))
  val minhashB: IndexedSeq[Long] =
    (0 until NumPerms).map(j => (69069L * (j + 3) + 98765L) % P)
  val NumBands = 4 // 4 bands x 4 rows
  val RowsPerBand: Int = NumPerms / NumBands

  /** d01: exact dedup on normalized text — hash-groupBy keep-min-id.
    * Grouping key is a sha-256 of the normalized text, so the shuffle
    * carries 32-byte digests instead of documents (collision odds at
    * 2^-128 scale are below hardware error rates); the oracle groups
    * by the text itself and the outputs are identical.
    */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(sha2(lower(trim(col("text"))), 256).as("norm_digest"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"))
      .orderBy(col("canonical_id"))

  val exactOracle: String =
    """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
       FROM documents GROUP BY lower(trim(text)) ORDER BY canonical_id"""

  /** d06: content-digest dedup — the at-scale form of d01: group on a
    * 32-byte sha-256 of the normalized text so the shuffle carries
    * digests, not documents. This is how exact dedup actually runs on
    * a 100 TB corpus (the reference's composite-key idempotency plays
    * the same role, queue_for_delta.py:741-757).
    */
  def digest(documents: DataFrame): DataFrame =
    documents
      .groupBy(sha2(lower(trim(col("text"))), 256).as("digest"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("digest"), col("canonical_id"), col("n_copies"))
      .orderBy(col("canonical_id"))

  val digestOracle: String =
    """SELECT sha256(lower(trim(text))) AS digest,
       min(doc_id) AS canonical_id, count(*) AS n_copies
       FROM documents GROUP BY 1 ORDER BY canonical_id"""

  /** d19: PREFIX (head) dedup — group documents by a digest of their
    * first `k` normalized words: the boilerplate-head equivalence
    * class (mirrored articles with divergent tails, templated pages,
    * wire copy re-published with edits) that exact-digest dedup (d06)
    * misses entirely and pairwise near-dup (d02) only finds when the
    * tails stay similar enough for Jaccard. On this corpus the
    * divergence is LIVE the other way too: at sf0.001 there are ZERO
    * exact dups but 20+ prefix families (spec-pinned), so the two
    * rows answer different questions.
    *
    * Scale shape: identical to d06 — the digest is a map-side
    * projection (split/slice/hash fuse into the scan) and the ONE
    * shuffle carries 32-byte digests + small ints, never text. The
    * keep-min-id convention matches d01/d06 so downstream apply
    * stages compose unchanged.
    */
  def prefixDedup(documents: DataFrame, k: Int = 8): DataFrame =
    documents
      .groupBy(sha2(lower(trim(concat_ws(" ",
          slice(split(trim(col("text")), " "), 1, k)))), 256).as("prefix_digest"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("prefix_digest"), col("canonical_id"), col("n_copies"))
      .orderBy(col("canonical_id"))

  def prefixDedupOracle(k: Int = 8): String =
    s"""SELECT sha256(lower(trim(list_aggregate(
         string_split(trim(text), ' ')[1:$k], 'string_agg', ' ')))) AS prefix_digest,
       min(doc_id) AS canonical_id, count(*) AS n_copies
       FROM documents GROUP BY 1 ORDER BY canonical_id"""

  // ---- shared shingle-set frame --------------------------------------

  private def shinglesExpr(d: Dialect): String = {
    val hash = TextOps.shingleHashFragment("text")
    d.distinct(d.transform(d.range("1", "length(text)-4"), s"i -> $hash"))
  }

  private def jaccardExpr(d: Dialect, a: String, b: String): String =
    s"CAST(${Dialect.intersectSize(d, a, b)} AS DOUBLE) / ${d.unionSize(a, b)}"

  // ---- the materialized pipeline (persist point) ----------------------

  /** How many times the LSH candidate stage was actually BUILT (not
    * served from cache) — spec-pinned evidence that d02/d04/d07/d10/d11
    * share ONE pipeline execution per corpus instead of re-running the
    * signature+banding stage each (see PlanShapeSpec "pipeline built
    * once"). */
  @volatile var pipelineBuilds: Long = 0L

  // LRU-bounded (a long session iterating over many corpora/thresholds
  // must not pin checkpointed blocks forever) and keyed on the file
  // STAMP (name+len+mtime), so an in-place corpus rewrite misses the
  // cache instead of serving stale checkpoints.
  private val pipelineCache =
    new Caching.BoundedCache[(org.apache.spark.sql.SparkSession, String, Double), DedupPipeline](8)

  /** Drop every cached pipeline (their checkpoint blocks are reclaimed
    * by the ContextCleaner once unreferenced). */
  def invalidatePipelines(): Unit = pipelineCache.clear()

  /** The dedup persist-point: candidate pairs, verified pairs and the
    * cluster map are computed ONCE per (corpus, threshold) and
    * localCheckpointed; d02/d04/d07/d10/d11 are all views over these
    * frames. This mirrors how the 100 TB pipeline actually runs — pair
    * generation is one job whose output is materialized storage, and
    * clustering / census / estimator-eval consume it — and is what the
    * reference's once-per-batch merge idempotency corresponds to
    * (queue_for_delta.py:741-757: the expensive step runs once, every
    * consumer reads its output).
    *
    * Caching is keyed by (session, input-file stamp, threshold) and
    * applies ONLY when `documents` is a bare table scan (a leaf plan):
    * a filtered/synthetic frame has no stable identity, so it gets a
    * fresh un-shared pipeline rather than a wrong cache hit.
    */
  def pipeline(documents: DataFrame, minJaccard: Double = 0.3): DedupPipeline = {
    // bareScan first: an uncacheable frame must not pay per-file stats
    if (!Caching.bareScan(documents))
      return new DedupPipeline(documents, minJaccard)
    val stamp = Caching.stamp(documents)
    if (stamp.isEmpty) new DedupPipeline(documents, minJaccard)
    else pipelineCache.getOrElseUpdate(
      (documents.sparkSession, stamp, minJaccard))(
      new DedupPipeline(documents, minJaccard))
  }

  /** d02: MinHash + LSH banding near-duplicate pairs.
    * sig = 16 permutation minima over the shingle set; NumBands bands
    * of RowsPerBand rows (4x4 — retuned from 8x2 after the same-vocab
    * corpus collapsed 2-row bands into a 1841-doc bucket); candidates
    * = docs sharing any band key; verified with true shingle
    * Jaccard >= minJaccard. All heavy lifting lives in [[pipeline]].
    */
  def minhashLsh(documents: DataFrame, minJaccard: Double = 0.3): DataFrame =
    pipeline(documents, minJaccard).pairs
      .orderBy(col("doc_a"), col("doc_b"))

  /** The shared CTE chain producing `verified(doc_a, doc_b, jac)` —
    * reused by the d02 oracle and the d07 cluster oracle so the edge
    * definition cannot drift between them. */
  private def minhashLshCtes: String = {
    val d = Dialect.duck
    val sigExprs = (0 until NumPerms).map { j =>
      d.amin(d.transform("hs", s"h -> (${minhashA(j)} * h + ${minhashB(j)}) % $P")) + s" AS m$j"
    }.mkString(",\n         ")
    val bandSelects = (0 until NumBands).map { b =>
      val rows = (0 until RowsPerBand).map(r => s"m${RowsPerBand * b + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws('_', $rows) AS bkey FROM sig"
    }.mkString("\n         UNION ALL ")
    s"""sh AS (SELECT doc_id, ${shinglesExpr(d)} AS hs FROM documents),
       sig AS (SELECT doc_id, $sigExprs FROM sh),
       bands AS ($bandSelects),
       pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       verified AS (SELECT doc_a, doc_b,
           ${jaccardExpr(Dialect.duck, "a.hs", "b.hs")} AS jac
         FROM pairs JOIN sh a ON doc_a = a.doc_id JOIN sh b ON doc_b = b.doc_id)"""
  }

  /** The DuckDB replay of st11's streaming curation drain (the Spark
    * side is StreamOps.streamCurationDrain; the oracle lives here
    * because it composes [[minhashLshCtes]] with TextOps's battery
    * fragments): seed = doc_id%3==0 indexed raw; arrival batch 0 =
    * %3==1, batch 1 = %3==2; an arrival is admitted iff it passes the
    * battery AND has no band-candidate verified pair (jac >= t) with
    * any SEED OR EARLIER-ADMITTED doc — within-batch near-dups are
    * both admitted, exactly the BandIndex.ingest contract (the probe
    * sees the index at batch start). */
  def streamCurationOracle(minJaccard: Double = 0.3): String =
    s"""WITH $minhashLshCtes,
       ${TextOps.batteryMetricsCte},
       k AS (SELECT doc_id, lang, n_chars FROM m
         WHERE ${TextOps.batteryKeepWhere}),
       seed AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
       b1 AS (SELECT doc_id, lang, n_chars FROM k WHERE doc_id % 3 = 1),
       b2 AS (SELECT doc_id, lang, n_chars FROM k WHERE doc_id % 3 = 2),
       vp AS (SELECT doc_a AS d, doc_b AS o FROM verified WHERE jac >= $minJaccard
              UNION ALL
              SELECT doc_b AS d, doc_a AS o FROM verified WHERE jac >= $minJaccard),
       adm1 AS (SELECT * FROM b1 WHERE NOT EXISTS (
         SELECT 1 FROM vp JOIN seed s ON vp.o = s.doc_id WHERE vp.d = b1.doc_id)),
       idx2 AS (SELECT doc_id FROM seed UNION ALL SELECT doc_id FROM adm1),
       adm2 AS (SELECT * FROM b2 WHERE NOT EXISTS (
         SELECT 1 FROM vp JOIN idx2 i ON vp.o = i.doc_id WHERE vp.d = b2.doc_id)),
       landed AS (SELECT CAST(0 AS BIGINT) AS arrival_batch, lang, n_chars FROM adm1
                  UNION ALL
                  SELECT CAST(1 AS BIGINT), lang, n_chars FROM adm2)
       SELECT arrival_batch, lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM landed GROUP BY 1, 2 ORDER BY arrival_batch, lang"""

  def minhashLshOracle(minJaccard: Double = 0.3): String =
    s"""WITH $minhashLshCtes
       SELECT doc_a, doc_b, round(jac, 4) AS jac FROM verified
       WHERE jac >= $minJaccard ORDER BY doc_a, doc_b"""

  // ---- d07: dedup cluster resolution (connected components) -----------

  /** d07: resolve the near-dup PAIRS into canonical CLUSTERS — the
    * step every real dedup pipeline runs after pair generation (you
    * keep one doc per component, not one per pair). Connected
    * components via distributed min-label propagation (the loop lives
    * in [[DedupPipeline.clusters]]); the verified-pair frame comes from
    * the shared pipeline, so running d02 then d07 pays the LSH stage
    * once.
    */
  def dedupClusters(documents: DataFrame, minJaccard: Double = 0.3): DataFrame =
    pipeline(documents, minJaccard).clusters
      .orderBy(col("doc_id"))

  /** Observability: rounds the last dedupClusters call took to converge
    * (the quantity to watch if component diameters grow at scale). */
  @volatile var lastIters: Int = 0

  /** Oracle: transitive closure by recursive CTE (UNION dedups, so the
    * recursion terminates on cycles); cluster id = min reachable id.
    * Tractable because near-dup components are small — the closure is
    * |C|^2 per component, which is exactly why the SPARK side uses
    * label propagation instead.
    */
  /** Shared recursive-closure CTE chain ending in
    * `cl(doc_id, cluster_id)` — reused by the d07 oracle and the d10
    * dedup-apply oracle so the cluster definition cannot drift. */
  private def clusterCtes(minJaccard: Double): String =
    s"""$minhashLshCtes,
       dup AS (SELECT doc_a, doc_b FROM verified WHERE jac >= $minJaccard),
       edges AS (SELECT doc_a AS a, doc_b AS b FROM dup
                 UNION ALL SELECT doc_b, doc_a FROM dup),
       reach(a, b) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       cl AS (SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id
              FROM reach GROUP BY a)"""

  def dedupClustersOracle(minJaccard: Double = 0.3): String =
    s"""WITH RECURSIVE ${clusterCtes(minJaccard)}
       SELECT doc_id, cluster_id FROM cl ORDER BY doc_id"""

  // ---- d10: dedup APPLY (the cleaned corpus) --------------------------

  /** d10: apply the cluster resolution to the corpus — the step that
    * actually SHRINKS the data: keep the canonical (minimum-id) member
    * of every near-dup cluster plus every unclustered document, and
    * report the per-language admission census. This is the output a
    * training pipeline consumes; d02/d07 are its intermediate stages.
    *
    * Scale shape: the cluster map is one row per CLUSTERED doc. On a
    * lightly-duplicated corpus that is a few percent of rows and the
    * join should broadcast so the corpus never shuffles — but the
    * clustered fraction is data-dependent (a crawl corpus can be
    * 30-50% near-dups), so the join carries NO broadcast hint: a
    * forced broadcast of an unbounded-fraction frame OOMs at 100 TB
    * instead of falling back. The cluster map is materialized
    * (localCheckpoint in the shared pipeline), so AQE sees its REAL
    * size at runtime and upgrades the join to broadcast exactly when
    * it fits — the same hint-free rule as q40's per-user frames.
    */
  def dedupApply(documents: DataFrame, minJaccard: Double = 0.3): DataFrame = {
    val clusters = pipeline(documents, minJaccard).clusters
      .select(col("doc_id").as("m_doc_id"), col("cluster_id"))
    documents
      .join(clusters, col("doc_id") === col("m_doc_id"), "left")
      .withColumn("keep",
        col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .groupBy(col("lang"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
           sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("chars_kept"))
      .orderBy(col("lang"))
  }

  def dedupApplyOracle(minJaccard: Double = 0.3): String =
    s"""WITH RECURSIVE ${clusterCtes(minJaccard)}
       SELECT lang,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
       FROM (SELECT d.lang, d.n_chars,
               (cl.cluster_id IS NULL OR cl.cluster_id = d.doc_id) AS keep
             FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id) t
       GROUP BY lang ORDER BY lang"""

  // ---- d16: quality-aware canonical selection -------------------------

  /** d16: choose each near-dup cluster's SURVIVOR BY QUALITY — d10
    * keeps the minimum-id member (an arbitrary convention); a
    * production pipeline keeps the BEST member (highest t02 quality
    * score, ties broken by lowest id), because near-dup clusters mix
    * clean originals with truncated/boilerplate-wrapped copies and
    * min-id keeps whichever crawled first. One row per cluster with
    * both policies side by side: `policy_differs` marks clusters
    * where quality-keep picks a different survivor than min-id — the
    * measurable evidence the policy matters on this corpus.
    *
    * Scale shape: the cluster map (pipeline persist point) joins the
    * per-doc quality projection on doc_id — hint-free, AQE broadcasts
    * the map when it fits (the d10 rule); the argmax window and the
    * per-cluster agg share ONE partitioning on cluster_id (the agg is
    * a partition refinement of the window — no second exchange).
    * Contract: members with n_chars = 0 carry no quality score (t02
    * drops them identically in both engines) and cannot win.
    */
  def dedupBestKeep(documents: DataFrame, minJaccard: Double = 0.3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = pipeline(documents, minJaccard).clusters
    val q = TextOps.qualityScore(documents).select(col("doc_id"), col("quality"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    clusters.join(q, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
           max(when(col("rn") === 1, col("doc_id"))).as("kept_doc"),
           max(when(col("rn") === 1, col("quality"))).as("kept_quality"),
           min(col("doc_id")).as("minid_doc"))
      .withColumn("policy_differs", col("kept_doc") =!= col("minid_doc"))
      .orderBy(col("cluster_id"))
  }

  def dedupBestKeepOracle(minJaccard: Double = 0.3): String =
    s"""WITH RECURSIVE ${clusterCtes(minJaccard)},
       q AS (SELECT doc_id, quality FROM (${TextOps.qualityOracle})),
       scored AS (SELECT cl.doc_id, cl.cluster_id, q.quality,
           row_number() OVER (PARTITION BY cluster_id
             ORDER BY quality DESC, cl.doc_id) AS rn
         FROM cl JOIN q USING (doc_id))
       SELECT cluster_id, count(*) AS n_members,
         CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS kept_doc,
         max(CASE WHEN rn = 1 THEN quality END) AS kept_quality,
         CAST(min(doc_id) AS BIGINT) AS minid_doc,
         max(CASE WHEN rn = 1 THEN doc_id END) <> min(doc_id) AS policy_differs
       FROM scored GROUP BY cluster_id ORDER BY cluster_id"""

  // ---- t19: leakage-safe train/val/test split -------------------------

  /** t19: CONTAMINATION-SAFE split — t07 hashes each doc independently,
    * so two near-duplicates can land in train and test and leak the
    * evaluation (the classic dedup-then-split bug: eval scores inflate
    * on memorized near-copies). Fix: hash the CLUSTER, not the doc —
    * split key = cluster_id for clustered docs, doc_id otherwise, so a
    * near-dup cluster moves as one unit and can never straddle splits
    * BY CONSTRUCTION. Same affine hash and 800/100/100 buckets as t07.
    * Output: per-split census (docs, clustered docs, whole clusters).
    * The spec proves the guarantee and that the naive doc-hash split
    * DOES leak on this corpus — the bug is real, not hypothetical.
    *
    * Scale shape: identical to d10 — the cluster map joins hint-free
    * onto a doc-id projection (AQE broadcasts when it fits), routing
    * is a map-side expression, census is one partial agg on the
    * 3-value split key.
    */
  def leakSafeSplit(documents: DataFrame, minJaccard: Double = 0.3): DataFrame = {
    val clusters = pipeline(documents, minJaccard).clusters
      .select(col("doc_id").as("m_doc"), col("cluster_id"))
    val keyed = documents.select(col("doc_id"))
      .join(clusters, col("doc_id") === col("m_doc"), "left")
      .withColumn("skey", coalesce(col("cluster_id"), col("doc_id")))
    val bucket = (col("skey") * lit(1103515245L) + lit(12345L)) % TextOps.P % 1000
    keyed
      .withColumn("split",
        when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("cluster_id").isNotNull, 1L).otherwise(0L)).as("n_clustered_docs"),
           countDistinct(col("cluster_id")).as("n_clusters"))
      .orderBy(col("split"))
  }

  def leakSafeSplitOracle(minJaccard: Double = 0.3): String =
    s"""WITH RECURSIVE ${clusterCtes(minJaccard)},
       keyed AS (SELECT d.doc_id, cl.cluster_id,
           coalesce(cl.cluster_id, d.doc_id) AS skey
         FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
       b AS (SELECT doc_id, cluster_id,
           (skey * 1103515245 + 12345) % ${TextOps.P} % 1000 AS bucket
         FROM keyed)
       SELECT CASE WHEN bucket < 800 THEN 'train'
                   WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
         count(*) AS n_docs,
         CAST(sum(CASE WHEN cluster_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clustered_docs,
         CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
       FROM b GROUP BY 1 ORDER BY split"""

  // ---- t23: the curation pipeline as ONE query ------------------------

  /** t23: end-to-end corpus curation — the composition a training-data
    * team actually ships, as ONE declarative plan: Gopher-family rule
    * battery (t20's `keep`, SHARED code via TextOps.batteryMetrics) →
    * NEAR-dup dedup over the MinHash-LSH cluster map (d07's clusters;
    * survivor = lowest-id admitted member of each cluster, d10's
    * convention restricted to the filtered set) → contamination-safe
    * train/val/test routing on the CLUSTER key (t19's discipline: a
    * near-dup family can never straddle splits) → per-(split, language)
    * census of the final corpus with the dedup loss attributed to each
    * stratum (`n_dups_dropped`). The s18 discipline applied to
    * curation: every stage is an existing row's kernel, so the
    * composite cannot drift from its parts.
    *
    * Scale shape: battery + routing are map-side projections on the
    * scan; the cluster map is the pipeline persist point (built once
    * per corpus, a few % of rows on a lightly-duplicated corpus) and
    * joins hint-free (AQE broadcasts it from its real size); the
    * survivor window shuffles (cluster-key, small ints) — never text;
    * the census is one partial agg bounded by the split × lang grid.
    * At 100 TB this prices as d10 plus a grid-bounded rollup. Census
    * values are BIGINT sums — order-free, no rounding surface.
    */
  def curationPipeline(documents: DataFrame, minJaccard: Double = 0.3): DataFrame = {
    val kept = TextOps.batteryMetrics(documents)
      .select(col("doc_id"), col("lang"), col("n_words"), col("n_chars"), col("keep"))
      .filter(col("keep"))
    val clusters = pipeline(documents, minJaccard).clusters
      .select(col("doc_id").as("m_doc"), col("cluster_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ckey")).orderBy(col("doc_id"))
    val bucket = (col("ckey") * lit(1103515245L) + lit(12345L)) % TextOps.P % 1000
    kept
      .join(clusters, col("doc_id") === col("m_doc"), "left")
      .withColumn("ckey", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("rn", row_number().over(w))
      .withColumn("split",
        when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_docs"),
           sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dups_dropped"),
           sum(when(col("rn") === 1, col("n_words")).otherwise(0L)).as("n_tokens"),
           sum(when(col("rn") === 1, col("n_chars")).otherwise(0L)).as("total_chars"))
      .orderBy(col("split"), col("lang"))
  }

  def curationPipelineOracle(minJaccard: Double = 0.3): String =
    s"""WITH RECURSIVE ${clusterCtes(minJaccard)},
       ${TextOps.batteryMetricsCte},
       k AS (SELECT doc_id, lang, n_chars, n_words FROM m
         WHERE ${TextOps.batteryKeepWhere}),
       keyed AS (SELECT k.*, cl.cluster_id,
           coalesce(cl.cluster_id, k.doc_id) AS ckey
         FROM k LEFT JOIN cl ON k.doc_id = cl.doc_id),
       g AS (SELECT *,
         row_number() OVER (PARTITION BY ckey ORDER BY doc_id) AS rn,
         CASE WHEN (ckey * 1103515245 + 12345) % ${TextOps.P} % 1000 < 800 THEN 'train'
              WHEN (ckey * 1103515245 + 12345) % ${TextOps.P} % 1000 < 900 THEN 'val'
              ELSE 'test' END AS split
         FROM keyed)
       SELECT split, lang,
         CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups_dropped,
         CAST(sum(CASE WHEN rn = 1 THEN n_words ELSE 0 END) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS total_chars
       FROM g GROUP BY 1, 2 ORDER BY split, lang"""

  // ---- d11: MinHash estimation accuracy -------------------------------

  /** d11: how good is the 16-permutation MinHash estimate? For every
    * verified near-dup pair, compare the signature-agreement fraction
    * (the MinHash Jaccard estimator) against the true shingle Jaccard
    * — the evaluation that justifies the permutation count (the
    * dedup-suite analogue of s06's ANN recall eval). Estimator
    * variance ~ sqrt(J(1-J)/16): the spec asserts the observed error
    * stays within 3 sigma. Signatures come from the same native
    * kernel the LSH path uses, so this also pins kernel/oracle
    * agreement per permutation; everything runs on the tiny verified-
    * pair frame (sigs broadcast into it).
    */
  def minhashEstimate(documents: DataFrame, minJaccard: Double = 0.3): DataFrame = {
    import graft.functions.GraftFunctions._
    val pl = pipeline(documents, minJaccard)
    val pairs = pl.pairs.select(col("doc_a"), col("doc_b"), col("jac"))
    // signature kernel re-runs ONLY on docs that appear in a verified
    // pair (the checkpointed pairs frame bounds the semi-join); the
    // joins carry no broadcast hint — pair-member frames are bounded by
    // the pair count, which AQE can see at runtime, not by a constant
    val sigs = pl.restrictToCandidates(documents)
      .select(col("doc_id"), minhash_sig(col("text"), minhashA, minhashB).as("sig"))
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("n_agree",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b))").cast("long"))
      .withColumn("est", Rounding.roundN(col("n_agree").cast("double") / NumPerms, 4))
      .withColumn("abs_err", Rounding.roundN(abs(col("est") - col("jac")), 4))
      .select(col("doc_a"), col("doc_b"), col("jac"), col("n_agree"),
              col("est"), col("abs_err"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def minhashEstimateOracle(minJaccard: Double = 0.3): String = {
    val agree = (0 until NumPerms)
      .map(j => s"(CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $minhashLshCtes,
       vp AS (SELECT doc_a, doc_b, round(jac, 4) AS jac FROM verified
              WHERE jac >= $minJaccard),
       est AS (SELECT doc_a, doc_b, jac,
           CAST($agree AS BIGINT) AS n_agree
         FROM vp JOIN sig a ON doc_a = a.doc_id JOIN sig b ON doc_b = b.doc_id)
       SELECT doc_a, doc_b, jac, n_agree,
         round(CAST(n_agree AS DOUBLE) / $NumPerms, 4) AS est,
         round(abs(round(CAST(n_agree AS DOUBLE) / $NumPerms, 4) - jac), 4) AS abs_err
       FROM est ORDER BY doc_a, doc_b"""
  }

  // ---- d08: benchmark decontamination ---------------------------------

  /** d08: decontamination — flag corpus documents that share any
    * long (n-token) exact word sequence with a benchmark set, the
    * standard "remove eval-set overlap from training data" pass. The
    * benchmark here is the docs with id < benchMaxId (standing in for
    * an external eval suite). Long n-grams make overlap meaningful on
    * a same-vocab corpus: 10-token exact runs only occur in true
    * copies, not by chance.
    *
    * Scale shape: benchmark n-grams are TINY next to the corpus —
    * they distinct down and BROADCAST, so the corpus side explodes
    * its grams map-side and probes locally; the only shuffle is the
    * per-doc hit count. Grams are 8-byte Rabin-Karp hashes over the
    * per-token poly hashes (the WordGramHashes kernel — no per-gram
    * string construction), and the oracle runs the identical
    * arithmetic so collisions merge the same grams on both engines.
    */
  def decontaminate(documents: DataFrame, benchMaxId: Long = 50, n: Int = 10): DataFrame = {
    import graft.functions.GraftFunctions.word_gram_hashes
    val g = documents.select(col("doc_id"),
      explode(word_gram_hashes(col("text"), n)).as("gram"))
    val bench = g.filter(col("doc_id") < benchMaxId).select(col("gram")).distinct()
    g.filter(col("doc_id") >= benchMaxId)
      .join(broadcast(bench), "gram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  def decontaminateOracle(benchMaxId: Long = 50, n: Int = 10): String = {
    val charHash = "list_reduce(list_transform(generate_series(1, length(s)), " +
      s"k -> CAST(ascii(substring(s, k, 1)) AS BIGINT)), (acc, c) -> (acc * 31 + c) % $P)"
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       th AS (SELECT doc_id, len(toks) AS nt,
           list_transform(toks, s -> $charHash) AS th FROM t),
       g AS (SELECT doc_id, unnest(CASE WHEN nt < $n THEN CAST([] AS BIGINT[])
           ELSE list_distinct(list_transform(generate_series(1, nt - $n + 1),
                i -> list_reduce(th[i:i+$n-1], (a, b) -> (a * 131 + b) % $P))) END) AS gram
         FROM th),
       bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < $benchMaxId)
       SELECT g.doc_id, count(DISTINCT g.gram) AS n_hits
       FROM g JOIN bench USING (gram) WHERE g.doc_id >= $benchMaxId
       GROUP BY g.doc_id ORDER BY g.doc_id"""
  }

  // ---- d09: fuzzy key matching (entity resolution) --------------------

  /** d09: blocked fuzzy key matching — surface keys within edit
    * distance 1 of each other (the entity-resolution pass the
    * reference's ticker normalization hints at: catching near-miss
    * identifiers, not just case/whitespace variants).
    *
    * Blocking is the DELETION NEIGHBORHOOD (symmetric-delete): each
    * key of length L explodes into {key} ∪ {key with one char
    * deleted} — L+1 bounded block values. Two keys within ED <= 1
    * ALWAYS share a block (equal → the key itself; substitution at i
    * → both deletion-at-i variants; insert/delete → the longer key's
    * deletion variant equals the shorter key), so recall over ED-1 is
    * COMPLETE — unlike prefix blocking ("all but the last char"),
    * which silently drops every pair differing before the final
    * character (round-3 shape; a spec now pins one such pair).
    *
    * Verification carries NO string DP: each variant keeps its
    * deletion POSITION, and for maxDist = 1 the positions classify
    * the match exactly — a shared variant with i == j is an equal
    * pair (i = j = 0) or a substitution at i (same-length keys
    * agreeing everywhere but position i); a shared variant with
    * i = 0 (resp. j = 0) means one key IS the other's deletion
    * variant, i.e. a pure insert/delete; and a shared variant with
    * 0 < i ≠ j is reachable only at ED 2 (two different deletions),
    * so it is rejected. Levenshtein on every candidate (round-3
    * shape) re-derived what the block structure already knew and was
    * 60% of d09's runtime; the DuckDB oracle still verifies with
    * true levenshtein, so the oracle compare independently re-proves
    * this classification pair by pair at every SF. Pairs that meet
    * in several blocks are deduped BEFORE the census so each
    * neighbor counts once. Block sizes stay bounded: a block
    * collects only keys one deletion away from a common string,
    * never a quadratic scan. Output is the per-key fuzzy-neighbor
    * census (count + smallest matching key), the compact resolution
    * table. For maxDist > 1 the positional shortcut is not exact and
    * a thresholded (early-exit) levenshtein verifies instead; recall
    * is then bounded by single-deletion blocking, stated here.
    */
  def fuzzyKeys(customer: DataFrame, maxDist: Int = 1): DataFrame =
    fuzzyPairs(customer, maxDist)
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_fuzzy"), min(col("match_key")).as("first_match"))
      .orderBy(col("c_custkey"))

  // d09's blocking join is the d09/d20 persist point (the pipeline /
  // bpeTrain discipline): the deletion-neighborhood self-join runs
  // once per (session, file stamp, maxDist) and both rows read the
  // checkpointed pair set.
  private val fuzzyCache = new Caching.BoundedCache[
    (org.apache.spark.sql.SparkSession, String, Int), DataFrame](4)

  /** The d09 blocking alone: distinct candidate pairs (c_custkey <
    * match_key) whose normalized names are within `maxDist` edits —
    * shared by d09's census and d20's Fellegi-Sunter scoring. */
  private[graft] def fuzzyPairs(customer: DataFrame, maxDist: Int = 1): DataFrame = {
    if (!Caching.bareScan(customer))
      return fuzzyPairsUncached(customer, maxDist)
    val stamp = Caching.stamp(customer)
    if (stamp.isEmpty) fuzzyPairsUncached(customer, maxDist)
    else fuzzyCache.getOrElseUpdate(
      (customer.sparkSession, stamp, maxDist))(
      fuzzyPairsUncached(customer, maxDist).localCheckpoint())
  }

  private def fuzzyPairsUncached(customer: DataFrame, maxDist: Int): DataFrame = {
    val k = customer.select(col("c_custkey"), upper(trim(col("c_name"))).as("k"))
    val blocks = k
      .select(col("c_custkey"), col("k"), explode(expr(
        """transform(sequence(0, length(k)),
           i -> struct(i AS i, CASE WHEN i = 0 THEN k
                ELSE concat(substring(k, 1, i - 1), substring(k, i + 1, length(k))) END AS blk))""")).as("bd"))
      .select(col("c_custkey"), col("k"), col("bd.i").as("i"), col("bd.blk").as("blk"))
    val edTest =
      if (maxDist == 1)
        col("x.i") === col("y.i") || col("x.i") === 0 || col("y.i") === 0
      else // early-exit DP: -1 past the threshold, the distance within it
        levenshtein(col("x.k"), col("y.k"), maxDist) >= 0
    blocks.as("x").join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.c_custkey") < col("y.c_custkey") &&
        edTest)
      .select(col("x.c_custkey").as("c_custkey"), col("y.c_custkey").as("match_key"))
      .distinct()
  }

  /** The d09 blocking chain `k, b, p` ending at the distinct
    * levenshtein-verified candidate pairs — ONE text shared by the
    * d09 and d20 oracles (the spanCtes discipline) so the staged
    * replay (scripts/compare.py) can derive the pair set once per
    * corpus and serve both. */
  private def fuzzyPairCtes(maxDist: Int): String =
    s"""k AS (SELECT c_custkey, upper(trim(c_name)) AS k FROM customer),
       b AS (SELECT c_custkey, k,
           unnest(list_distinct(list_transform(generate_series(0, length(k)),
             i -> CASE WHEN i = 0 THEN k
                  ELSE substring(k, 1, i - 1) || substring(k, i + 1, length(k)) END))) AS blk
         FROM k),
       p AS (SELECT DISTINCT x.c_custkey AS c_custkey, y.c_custkey AS match_key
         FROM b x JOIN b y ON x.blk = y.blk AND x.c_custkey < y.c_custkey
           AND levenshtein(x.k, y.k) <= $maxDist)"""

  def fuzzyKeysOracle(maxDist: Int = 1): String =
    s"""WITH ${fuzzyPairCtes(maxDist)}
       SELECT c_custkey, count(*) AS n_fuzzy, min(match_key) AS first_match
       FROM p GROUP BY c_custkey ORDER BY c_custkey"""

  // ---- d20: Fellegi-Sunter entity-resolution scoring ------------------

  /** d20: FELLEGI-SUNTER match scoring over d09's blocked candidate
    * pairs — the probabilistic record-linkage step (Fellegi & Sunter
    * 1969) between fuzzy blocking and a merge decision: each pair
    * gets a log-likelihood-ratio score Σ_f [agree ? ln(m/u_f) :
    * ln((1−m)/(1−u_f))] over four fields (nation, market segment,
    * account-balance bucket, exact normalized name), with the
    * u-probabilities — the chance two RANDOM records agree on field
    * f — estimated FROM THE DATA as Σ_v n_v² / N² (exact BIGINT sums;
    * the only doubles are the four ln terms, summed in fixed field
    * order). m is pinned at 0.95. Verdicts threshold the ROUNDED
    * score at ±4.6 (≈ ln 100: hundred-to-one odds either way).
    *
    * Scale shape: candidate generation is d09's deletion-neighborhood
    * equi-join (never all-pairs); the u-statistics are four tiny
    * aggregates broadcast as one scalar row; scoring is map-side over
    * the bounded pair set. */
  def erScore(customer: DataFrame): DataFrame = {
    val attrs = customer.select(col("c_custkey"),
      upper(trim(col("c_name"))).as("k"), col("c_nationkey"),
      col("c_mktsegment"),
      floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
    def s2(c: String, alias: String) =
      attrs.groupBy(col(c)).agg(count(lit(1)).as("nv"))
        .agg(sum(col("nv") * col("nv")).as(alias))
    val uRow = attrs.agg(count(lit(1)).as("n"))
      .crossJoin(s2("c_nationkey", "s2_nat"))
      .crossJoin(s2("c_mktsegment", "s2_seg"))
      .crossJoin(s2("bal_bucket", "s2_bal"))
      .crossJoin(s2("k", "s2_name"))
    val aL = attrs.select(col("c_custkey"), col("k").as("ka"),
      col("c_nationkey").as("nat_a"), col("c_mktsegment").as("seg_a"),
      col("bal_bucket").as("bal_a"))
    val bR = attrs.select(col("c_custkey").as("match_key"),
      col("k").as("kb"), col("c_nationkey").as("nat_b"),
      col("c_mktsegment").as("seg_b"), col("bal_bucket").as("bal_b"))
    fuzzyPairs(customer, 1)
      .join(aL, "c_custkey").join(bR, "match_key")
      .crossJoin(broadcast(uRow))
      .withColumn("agree_nation", col("nat_a") === col("nat_b"))
      .withColumn("agree_segment", col("seg_a") === col("seg_b"))
      .withColumn("agree_balance", col("bal_a") === col("bal_b"))
      .withColumn("exact_name", col("ka") === col("kb"))
      .withColumn("score", Rounding.roundN(expr(
        """(CASE WHEN agree_nation THEN ln(0.95 / (CAST(s2_nat AS DOUBLE) / (n * n)))
                 ELSE ln(0.05 / (1.0 - CAST(s2_nat AS DOUBLE) / (n * n))) END)
           + (CASE WHEN agree_segment THEN ln(0.95 / (CAST(s2_seg AS DOUBLE) / (n * n)))
                 ELSE ln(0.05 / (1.0 - CAST(s2_seg AS DOUBLE) / (n * n))) END)
           + (CASE WHEN agree_balance THEN ln(0.95 / (CAST(s2_bal AS DOUBLE) / (n * n)))
                 ELSE ln(0.05 / (1.0 - CAST(s2_bal AS DOUBLE) / (n * n))) END)
           + (CASE WHEN exact_name THEN ln(0.95 / (CAST(s2_name AS DOUBLE) / (n * n)))
                 ELSE ln(0.05 / (1.0 - CAST(s2_name AS DOUBLE) / (n * n))) END)"""), 4))
      .withColumn("verdict",
        when(col("score") >= 4.6, "match")
          .when(col("score") <= -4.6, "non_match")
          .otherwise("possible"))
      .select(col("c_custkey"), col("match_key"), col("agree_nation"),
        col("agree_segment"), col("agree_balance"), col("exact_name"),
        col("score"), col("verdict"))
      .orderBy(col("c_custkey"), col("match_key"))
  }

  /** DuckDB twin of [[erScore]]: the d09 blocking CTE + the identical
    * u-estimates and score expression, term order preserved. */
  val erScoreOracle: String =
    s"""WITH ${fuzzyPairCtes(1)},
       ka AS (SELECT c_custkey, upper(trim(c_name)) AS k, c_nationkey,
           c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
         FROM customer),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ka),
       un AS (SELECT CAST(sum(nv * nv) AS BIGINT) AS s2_nat FROM
         (SELECT count(*) AS nv FROM ka GROUP BY c_nationkey) z),
       us AS (SELECT CAST(sum(nv * nv) AS BIGINT) AS s2_seg FROM
         (SELECT count(*) AS nv FROM ka GROUP BY c_mktsegment) z),
       ub AS (SELECT CAST(sum(nv * nv) AS BIGINT) AS s2_bal FROM
         (SELECT count(*) AS nv FROM ka GROUP BY bal_bucket) z),
       uk AS (SELECT CAST(sum(nv * nv) AS BIGINT) AS s2_name FROM
         (SELECT count(*) AS nv FROM ka GROUP BY k) z),
       j AS (SELECT p.c_custkey, p.match_key,
           a.c_nationkey = bb.c_nationkey AS agree_nation,
           a.c_mktsegment = bb.c_mktsegment AS agree_segment,
           a.bal_bucket = bb.bal_bucket AS agree_balance,
           a.k = bb.k AS exact_name
         FROM p JOIN ka a ON a.c_custkey = p.c_custkey
              JOIN ka bb ON bb.c_custkey = p.match_key),
       f AS (SELECT c_custkey, match_key, agree_nation, agree_segment,
           agree_balance, exact_name,
           round(
             (CASE WHEN agree_nation THEN ln(0.95 / (CAST(s2_nat AS DOUBLE) / (n * n)))
                   ELSE ln(0.05 / (1.0 - CAST(s2_nat AS DOUBLE) / (n * n))) END)
             + (CASE WHEN agree_segment THEN ln(0.95 / (CAST(s2_seg AS DOUBLE) / (n * n)))
                   ELSE ln(0.05 / (1.0 - CAST(s2_seg AS DOUBLE) / (n * n))) END)
             + (CASE WHEN agree_balance THEN ln(0.95 / (CAST(s2_bal AS DOUBLE) / (n * n)))
                   ELSE ln(0.05 / (1.0 - CAST(s2_bal AS DOUBLE) / (n * n))) END)
             + (CASE WHEN exact_name THEN ln(0.95 / (CAST(s2_name AS DOUBLE) / (n * n)))
                   ELSE ln(0.05 / (1.0 - CAST(s2_name AS DOUBLE) / (n * n))) END), 4)
             AS score
         FROM j CROSS JOIN nn CROSS JOIN un CROSS JOIN us
              CROSS JOIN ub CROSS JOIN uk)
       SELECT c_custkey, match_key, agree_nation, agree_segment,
         agree_balance, exact_name, score,
         CASE WHEN score >= 4.6 THEN 'match'
              WHEN score <= -4.6 THEN 'non_match'
              ELSE 'possible' END AS verdict
       FROM f ORDER BY c_custkey, match_key"""

  // ---- d03: SimHash ---------------------------------------------------

  /** 64-bit (62 usable) SimHash over the shingle-hash set: each 31-bit
    * shingle hash is widened to 62 bits via two affine mixes mod P
    * (lo | hi<<31), then the classic per-bit +1/-1 vote. 62 bits
    * instead of 32 exists for the LSH chunking below: 16-bit chunk
    * keys (65536-way buckets) instead of 8-bit ones (256-way). On a
    * clustered corpus the 8-bit buckets collapse — at sf0.1 they
    * enumerated 7.3M candidate pairs; at 100 TB they'd be quadratic
    * death. Same arithmetic as TextKernels.simhash64.
    */
  /** Widen each 31-bit shingle hash in `hs` to 62 bits (column `m`). */
  def simhashMixExpr(d: Dialect): String = {
    import graft.functions.TextKernels.{MixA1, MixA2, MixB1, MixB2}
    d.transform("hs", s"h -> (($MixA1 * h + $MixB1) % $P) + " +
      s"((($MixA2 * h + $MixB2) % $P) * CAST(2147483648 AS BIGINT))")
  }

  /** Per-bit +1/-1 vote sum over the widened hashes in column `m`. */
  def simhashVoteExpr(d: Dialect): String =
    (0 until 62).map { i =>
      val vote = d.sumLong(d.transform("m", s"v -> 2 * (${d.shiftR("v", i.toString)} & 1) - 1"))
      s"(CASE WHEN $vote > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  /** Number of 16-bit chunks; pigeonhole guarantees full recall for
    * hamming <= NumChunks - 1 = 3. */
  val NumChunks = 4

  def simhash(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val d = Dialect.spark
    import graft.functions.GraftFunctions.{simhash64 => simhash64c}
    val sim = documents.select(col("doc_id"), simhash64c(col("text")).as("sim64"))
    val chunkStructs = (0 until NumChunks).map { c =>
      struct(lit(c).as("chunk"),
             expr(s"${d.shiftR("sim64", (16 * c).toString)} & 65535").as("ckey"))
    }
    val chunks = sim
      .select(col("doc_id"), col("sim64"), explode(array(chunkStructs: _*)).as("ch"))
      .select(col("doc_id"), col("sim64"), col("ch.chunk").as("chunk"), col("ch.ckey").as("ckey"))
    // hamming test INSIDE the join predicate: filtering before the
    // distinct means the dedup runs on the few survivors, not the
    // chunk-collision candidates (row-wise filter commutes with
    // DISTINCT, so the result is unchanged).
    chunks.as("x")
      .join(chunks.as("y"),
            col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey") &&
            col("x.doc_id") < col("y.doc_id") &&
            expr(s"bit_count(${d.xor("x.sim64", "y.sim64")})") <= maxHamming)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              expr(s"CAST(bit_count(${d.xor("x.sim64", "y.sim64")}) AS BIGINT)").as("hamming"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def simhashOracle(maxHamming: Int = 3): String = {
    val d = Dialect.duck
    val chunkSelects = (0 until NumChunks).map { c =>
      s"SELECT doc_id, sim64, $c AS chunk, ${d.shiftR("sim64", (16 * c).toString)} & 65535 AS ckey FROM sim"
    }.mkString("\n         UNION ALL ")
    s"""WITH sh AS (SELECT doc_id, ${shinglesExpr(d)} AS hs FROM documents),
       mixed AS (SELECT doc_id, ${simhashMixExpr(d)} AS m FROM sh),
       sim AS (SELECT doc_id, ${simhashVoteExpr(d)} AS sim64 FROM mixed),
       chunks AS ($chunkSelects),
       pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(bit_count(${d.xor("x.sim64", "y.sim64")}) AS BIGINT) AS hamming
         FROM chunks x JOIN chunks y
           ON x.chunk = y.chunk AND x.ckey = y.ckey AND x.doc_id < y.doc_id
           AND bit_count(${d.xor("x.sim64", "y.sim64")}) <= $maxHamming)
       SELECT doc_a, doc_b, hamming
       FROM pairs ORDER BY doc_a, doc_b"""
  }

  // ---- d04: word-bigram Jaccard ---------------------------------------

  /** n-gram (word-bigram) Jaccard — the VERIFICATION kernel of the
    * dedup suite, scored over the shared pipeline's LSH candidate
    * pairs. Round 3 blocked on (lang, source): a low-cardinality key
    * whose blocks are O(corpus) at 100 TB, making the self-join
    * quadratic. The bounded-candidate form runs the bigram metric only
    * on pairs that already share a MinHash band (|candidates| ~ the
    * near-dup rate x corpus, never B^2), which is how a second,
    * finer-grained similarity metric is actually deployed next to LSH:
    * LSH proposes, the n-gram metric disposes.
    *
    * Recall contract: a pair is scored only if char-shingle MinHash
    * banding proposed it (P[proposed] = 1-(1-j^4)^4 for shingle
    * Jaccard j) — identical to d02's contract, and the per-band bucket
    * census spec bounds the candidate count as the corpus grows.
    */
  private def bigramsExpr(d: Dialect): String = {
    val toks = s"${d.splitFn}(lower(text), ' ')"
    val grams = d.distinct(d.transform(
      d.range("1", s"${d.size(toks)} - 1"),
      s"i -> concat(${d.elem(toks, "i")}, '_', ${d.elem(toks, "i+1")})"))
    // <2 tokens: the guarded range would index out of bounds (DuckDB
    // concats past-the-end NULL into 'tok_', Spark ANSI throws) — an
    // explicit empty set matches the native WordBigrams kernel instead
    val empty = if (d eq Dialect.spark) "CAST(array() AS ARRAY<STRING>)" else "[]"
    s"(CASE WHEN ${d.size(toks)} < 2 THEN $empty ELSE $grams END)"
  }

  /** q46: the PURE-SQL surface — the identical engine reached the way
    * a SQL user reaches it: a registered view + the `graft_*`
    * function names ([[graft.functions.GraftFunctions.registerAll]]
    * programmatically, or `spark.sql.extensions=graft.GraftExtensions`
    * config-only), with the query text written as a SQL user would
    * write it. Within-language candidate pairs scored by word-bigram
    * Jaccard on the native kernels. The row pins API-surface
    * completeness twice over: the spec asserts the SQL result is
    * row-identical to the same computation through the DataFrame API
    * (one engine, two front doors), and the DuckDB oracle replays it
    * independently like every other row. The id cap keeps the demo
    * pair set bounded; the production near-dup path is d02/d04's
    * LSH-candidate restriction, not an all-pairs join.
    *
    * Rounding is written as `round(x * 1e4) / 1e4` INLINE — the
    * portable form [[Rounding.roundN]] expands to, spelled out
    * because raw SQL bypasses the Column helper. */
  def sqlApi(documents: DataFrame, maxDoc: Long = 40): DataFrame = {
    val spark = documents.sparkSession
    graft.functions.GraftFunctions.registerAll(spark, minhashA, minhashB)
    documents.createOrReplaceTempView("graft_docs_sql")
    spark.sql(s"""
      SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b,
        round(graft_arr_jaccard(graft_word_bigrams(d1.text),
                                graft_word_bigrams(d2.text)) * 1e4) / 1e4 AS jac
      FROM graft_docs_sql d1
      JOIN graft_docs_sql d2
        ON d1.lang = d2.lang AND d1.doc_id < d2.doc_id
      WHERE d1.doc_id < $maxDoc AND d2.doc_id < $maxDoc
      ORDER BY doc_a, doc_b""")
  }

  def sqlApiOracle(maxDoc: Long = 40): String = {
    val d = Dialect.duck
    s"""WITH b AS (SELECT doc_id, lang, ${bigramsExpr(d)} AS bg
           FROM documents WHERE doc_id < $maxDoc)
       SELECT b1.doc_id AS doc_a, b2.doc_id AS doc_b,
         round(${jaccardExpr(d, "b1.bg", "b2.bg")}, 4) AS jac
       FROM b b1 JOIN b b2 ON b1.lang = b2.lang AND b1.doc_id < b2.doc_id
       ORDER BY doc_a, doc_b"""
  }

  def ngramJaccard(documents: DataFrame, minJaccard: Double = 0.05): DataFrame = {
    // hashed-bigram sets: 8-byte elements instead of strings, so the
    // pairwise merge-Jaccard and the join shuffle both shrink ~3x.
    // Hash collisions merge identically on both engines (dedup is
    // applied AFTER hashing on both sides) so parity is unaffected.
    // The bigram kernel runs ONLY on candidate-pair members.
    val pl = pipeline(documents)
    val bg = pl.restrictToCandidates(documents).select(col("doc_id"),
      graft.functions.GraftFunctions.word_bigram_hashes(col("text")).as("bg"))
    pl.candidates
      .join(bg.select(col("doc_id").as("doc_a"), col("bg").as("bg_a")), "doc_a")
      .join(bg.select(col("doc_id").as("doc_b"), col("bg").as("bg_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
              graft.functions.GraftFunctions.arr_jaccard(col("bg_a"), col("bg_b")).as("jac"))
      .filter(col("jac") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), Rounding.roundN(col("jac"), 4).as("jac"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Raw (pre-distinct) bigram list + per-string poly hash, then
    * distinct — must mirror WordBigramHashes exactly. */
  private def bigramHashesDuck: String = {
    val toks = "string_split(lower(text), ' ')"
    val raw = s"list_transform(generate_series(1, greatest(len($toks) - 1, 1)), i -> concat($toks[i], '_', $toks[i+1]))"
    val hash = "list_reduce(list_transform(generate_series(1, length(s)), k -> CAST(ascii(substring(s, k, 1)) AS BIGINT)), (acc, c) -> (acc * 31 + c) % " + P + ")"
    s"""(CASE WHEN len($toks) < 2 THEN CAST([] AS BIGINT[])
        ELSE list_distinct(list_transform($raw, s -> $hash)) END)"""
  }

  def ngramJaccardOracle(minJaccard: Double = 0.05): String = {
    val d = Dialect.duck
    // reuses the d02 candidate CTE chain (`pairs`); the `verified` CTE
    // in it goes unreferenced and DuckDB never evaluates it
    s"""WITH $minhashLshCtes,
       bg AS (SELECT doc_id, $bigramHashesDuck AS bg FROM documents)
       SELECT doc_a, doc_b, round(jac, 4) AS jac FROM (
         SELECT p.doc_a, p.doc_b, ${jaccardExpr(d, "a.bg", "b.bg")} AS jac
         FROM pairs p JOIN bg a ON p.doc_a = a.doc_id
                      JOIN bg b ON p.doc_b = b.doc_id) t
       WHERE jac >= $minJaccard ORDER BY doc_a, doc_b"""
  }

  // ---- d12: incremental dedup (new batch vs existing corpus) ----------

  /** LSH index rows (doc_id, band, bkey) for a document frame —
    * factored out so the one-shot pipeline build and the incremental
    * probe path share the exact banding definition (a drift here
    * would silently change which pairs ever meet). */
  private[operators] def bandFrame(df: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions._
    val sigArr = df.select(col("doc_id"),
      minhash_sig(col("text"), minhashA, minhashB).as("sig"))
    val sigCols = (0 until NumPerms).map(j => element_at(col("sig"), j + 1).as(s"m$j"))
    val sig = sigArr.select(col("doc_id") +: sigCols: _*)
    val bandStructs = (0 until NumBands).map { b =>
      val rows = (0 until RowsPerBand).map(r => col(s"m${RowsPerBand * b + r}"))
      struct(lit(b).as("band"), concat_ws("_", rows: _*).as("bkey"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bkey").as("bkey"))
  }

  /** d12's per-corpus index roots (see [[BandIndex.indexBuilds]] for
    * the build counter). Eviction DELETES the temp index dirs — these
    * are on-disk tables, not GC-tracked checkpoint blocks, so dropping
    * the path alone would orphan a full corpus index per eviction. */
  private val indexCache =
    new Caching.BoundedCache[(org.apache.spark.sql.SparkSession, String, Int), String](4,
      onEvict = root =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        catch { case _: Exception => () })

  /** d12: INCREMENTAL dedup — a new batch of documents probed against
    * the corpus's PERSISTED LSH band index ([[BandIndex]]): the index
    * (band, bkey, doc_id) plus the shingle store live as
    * [[graft.sources.VersionedTable]]s, built ONCE per corpus and
    * probed per batch — no corpus re-banding, no corpus re-pairing,
    * no corpus document re-scan on the probe path. This is how dedup
    * actually runs at 100 TB: daily arrivals are a fraction of a
    * percent of the table, admission = "no verified match in the
    * index", and admitted docs' bands APPEND to the index (the closed
    * loop — [[BandIndex.ingest]], spec-tested with two successive
    * batches). Only the batch's bands shuffle; shingle verification
    * touches exactly the candidate members (batch side shingled
    * fresh, corpus side read from the store).
    *
    * The batch/corpus split here is deterministic (doc_id % batchMod)
    * so DuckDB can replay it; the membership filter is the ONLY
    * difference from a real ingest frame. The index build is cached
    * per (session, corpus stamp, batchMod) under the same policy as
    * [[pipeline]] — repeated runs (and bench steady-state) pay
    * probe-only cost. Output: every verified (batch doc, corpus doc)
    * near-dup pair — the batch docs absent from it are the admitted
    * ones (d10's census applies downstream).
    */
  def dedupIncremental(documents: DataFrame, minJaccard: Double = 0.3,
                       batchMod: Int = 17): DataFrame = {
    val spark = documents.sparkSession
    val isBatch = col("doc_id") % batchMod === 0
    val batch = documents.filter(isBatch)
    val corpus = documents.filter(!isBatch)
    def buildTemp(): String = {
      val root = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
      BandIndex.build(spark, root, corpus)
      root
    }
    // uncacheable corpora (derived frames, no stable stamp) get an
    // EPHEMERAL index: probe materializes eagerly and the dir is
    // deleted before returning — otherwise every call leaks one full
    // on-disk index into the temp dir
    val (root, ephemeral) =
      if (!Caching.bareScan(documents)) (buildTemp(), true)
      else {
        val stamp = Caching.stamp(documents)
        if (stamp.isEmpty) (buildTemp(), true)
        else (indexCache.getOrElseUpdate((spark, stamp, batchMod))(buildTemp()), false)
      }
    val res = BandIndex.probe(spark, root, batch, minJaccard)
      .orderBy(col("batch_doc"), col("corpus_doc"))
    if (ephemeral) {
      val out = res.localCheckpoint()
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      catch { case _: Exception => () }
      out
    } else res
  }

  // ---- d13: containment (subset) duplication --------------------------

  /** d13: containment near-dup pairs over the shared LSH candidates —
    * |A∩B|/|A| and |A∩B|/|B|, keeping pairs where EITHER side is
    * mostly contained in the other. The asymmetric complement to
    * d02's symmetric Jaccard: quoting, boilerplate-wrapping and
    * truncation produce subset pairs whose Jaccard is small (|A|/|B|
    * for A ⊂ B) but whose containment is ~1 — at the default
    * threshold this corpus surfaces 18 such pairs at sf0.01 that the
    * Jaccard gate never sees. Same candidates, same materialized
    * shingle frame, different scoring expression — the marginal cost
    * over d02 is one projection. Recall is bounded by LSH banding
    * (MinHash collides on the SYMMETRIC overlap), stated here: at
    * 100 TB a dedicated containment index would band over the
    * SHORTER side's shingles.
    */
  def dedupContainment(documents: DataFrame, minContain: Double = 0.5): DataFrame =
    pipeline(documents).containmentPairs(minContain)
      .orderBy(col("doc_a"), col("doc_b"))

  def dedupContainmentOracle(minContain: Double = 0.5): String =
    s"""WITH $minhashLshCtes,
       x AS (SELECT doc_a, doc_b,
           CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) AS inter,
           CAST(len(a.hs) AS DOUBLE) AS la, CAST(len(b.hs) AS DOUBLE) AS lb
         FROM pairs JOIN sh a ON doc_a = a.doc_id JOIN sh b ON doc_b = b.doc_id)
       SELECT doc_a, doc_b, round(inter / la, 4) AS contain_ab,
         round(inter / lb, 4) AS contain_ba
       FROM x WHERE greatest(inter / la, inter / lb) >= $minContain
       ORDER BY doc_a, doc_b"""

  // ---- d18: bloom-gated exact-dedup admission -------------------------

  /** d18: BLOOM-GATED admission — exact-digest dedup of an arriving
    * batch against the corpus with a two-tier membership test: a
    * corpus-digest bloom filter broadcasts with the plan and each
    * batch row probes it MAP-SIDE ([[graft.functions.BloomContainsStr]],
    * k hash probes, no join); rows the filter rejects are DEFINITELY
    * new (bloom guarantee: no false negative) and admit immediately,
    * and only the "possibly seen" remainder — true duplicates plus
    * the fpp sliver — pays the exact confirmation anti-join. The
    * RESULT is exactly the plain anti-join (spec-asserted equal, and
    * the oracle IS the anti-join — the bloom changes cost, never
    * semantics), which is what makes this oracle-able where sketch
    * VALUES (q35/t15) are not.
    *
    * The batch is the Landing replay mixture: genuinely new docs
    * (doc_id % batchMod == 0) plus RE-SUBMITTED corpus docs
    * (corpus ∩ doc_id % replayMod == 0) — at-least-once delivery's
    * duplicate arm, live by construction at every SF.
    *
    * Scale shape: at 100 TB the corpus digest set is the persisted
    * index (BandIndex's argument) and the bloom is its cheap summary
    * — ~10 bits/key means a 10^10-doc corpus's filter fits in
    * executor memory while the digest table does not. The gate
    * bounds the anti-join's LEFT side to dup_rate + fpp of the
    * batch; the right side stays the bucketed digest index. For the
    * typical mostly-new batch that removes almost the whole shuffle.
    */
  def dedupBloomGate(documents: DataFrame, batchMod: Int = 17,
                     replayMod: Int = 13): DataFrame = {
    import graft.functions.GraftFunctions.bloom_contains
    val dig = documents.select(col("doc_id"),
      sha2(lower(trim(col("text"))), 256).as("digest"))
    val isNew = col("doc_id") % batchMod === 0
    val corpus = dig.filter(!isNew)
    val batch = dig.filter(isNew)
      .unionByName(corpus.filter(col("doc_id") % replayMod === 0))
    val nc = corpus.count()
    val bloom = corpus.stat.bloomFilter("digest", math.max(nc, 1024L), 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // NULL text -> NULL digest: such a row can never equal any corpus
    // digest (SQL equality), so it is DEFINITELY new — routed around
    // the bloom probe, whose three-valued NULL result would otherwise
    // drop the row from BOTH arms while the oracle's NOT EXISTS
    // admits it (ternary-logic divergence, not a bloom property).
    val might = bloom_contains(col("digest"), bos.toByteArray)
    val definite = batch.filter(col("digest").isNull || !might)
    val possible = batch.filter(col("digest").isNotNull && might)
    val confirmedNew = possible.join(
      corpus.select(col("digest")).distinct(), Seq("digest"), "left_anti")
    definite.select(col("doc_id"), col("digest"))
      .unionByName(confirmedNew.select(col("doc_id"), col("digest")))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the exact anti-join over the same batch construction —
    * bloom-free by design (the gate is a cost optimization whose
    * output must be indistinguishable from exact membership). */
  def dedupBloomGateOracle(batchMod: Int = 17, replayMod: Int = 13): String =
    s"""WITH dig AS (SELECT doc_id, sha256(lower(trim(text))) AS digest
           FROM documents),
       corpus AS (SELECT doc_id, digest FROM dig WHERE doc_id % $batchMod <> 0),
       batch AS (SELECT doc_id, digest FROM dig WHERE doc_id % $batchMod = 0
         UNION ALL
         SELECT doc_id, digest FROM corpus WHERE doc_id % $replayMod = 0)
       SELECT doc_id, digest FROM batch b
       WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.digest = b.digest)
       ORDER BY doc_id"""

  /** Oracle: the full-corpus verified pairs restricted to pairs with
    * exactly one batch member — a (batch, corpus) pair shares a band
    * iff the unordered pair does, so the incremental probe must equal
    * this filter of d02's edge set. */
  def dedupIncrementalOracle(minJaccard: Double = 0.3, batchMod: Int = 17): String =
    s"""WITH $minhashLshCtes
       SELECT CASE WHEN doc_a % $batchMod = 0 THEN doc_a ELSE doc_b END AS batch_doc,
              CASE WHEN doc_a % $batchMod = 0 THEN doc_b ELSE doc_a END AS corpus_doc,
              round(jac, 4) AS jac
       FROM verified
       WHERE jac >= $minJaccard
         AND ((doc_a % $batchMod = 0) <> (doc_b % $batchMod = 0))
       ORDER BY batch_doc, corpus_doc"""

  // ---- d14: duplicated spans (substring-level dedup) ------------------

  /** d14: duplicated-SPAN detection — maximal runs of tokens shared
    * VERBATIM between two documents, the substring modality that
    * document-level Jaccard (d02) and containment (d13) structurally
    * miss: a 30-token quote inside two otherwise-unrelated documents
    * moves set similarity almost nowhere but is exactly what
    * substring-level training-data dedup must remove (the
    * suffix-array ExactSubstr pass of "Deduplicating Training Data
    * Makes Language Models Better", Lee et al. 2022 — re-expressed
    * here without the un-distributable global suffix array).
    *
    * Shape: positional n-gram hashes (WordGramPosHashes — one
    * arithmetic kernel shared with d08, emitted in token order) give
    * the posting list (doc, pos, gram); only grams seen in >= 2
    * documents survive (the inverted-index gate — unique grams, the
    * overwhelming mass at any scale, are dropped MAP-SIDE after one
    * partial agg); surviving postings equi-join on gram (never
    * all-pairs); and matched coordinates merge into maximal spans by
    * gaps-and-islands on each (doc_a, doc_b) diagonal (pos_a - pos_b
    * constant, consecutive pos_a ⟺ one contiguous shared run —
    * q42's island trick on match coordinates). A span of L shared
    * tokens is L - n + 1 consecutive diagonal matches, so
    * span_toks = max(pos_a) - min(pos_a) + n exactly.
    *
    * Scale guards, stated honestly: `dfCap` drops grams appearing in
    * more than dfCap documents — boilerplate n-grams otherwise
    * explode the postings self-join quadratically (the classic
    * inverted-index hot key; Lee et al. handle it by suffix-array
    * construction, we bound it explicitly and the oracle applies the
    * same cap). At 100 TB the posting join shuffles only
    * duplicated-gram postings (hash-partitioned by gram), and the
    * island window partitions by (doc pair, diagonal) — bounded by
    * matched coordinates, never by corpus size.
    */
  def dupSpans(documents: DataFrame, n: Int = 8, minTokens: Int = 16,
               dfCap: Int = 64): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val g = documents.select(col("doc_id"),
      posexplode(word_gram_pos_hashes(col("text"), n)).as(Seq("pos", "gram")))
    val dup = g.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= dfCap)
      .select(col("gram"))
    // the gated postings are the operator's persist point: without it
    // the full posting subtree (scan + gram kernel + gram shuffle)
    // re-executes for BOTH sides of the self-join below; after the
    // gate the frame is duplicated-gram postings only — pair rows,
    // not corpus — the same storage-boundary shape as DedupPipeline.
    // Lazy: fills on the join's own first pass over it.
    val gd = g.join(dup, Seq("gram")).localCheckpoint(eager = false)
    val m = gd.as("a").join(gd.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.pos").cast("long").as("pos_a"), col("b.pos").cast("long").as("pos_b"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag")).orderBy(col("pos_a"))
    m.withColumn("diag", col("pos_a") - col("pos_b"))
      .withColumn("isl", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("isl"))
      .agg(min(col("pos_a")).as("a_start"), min(col("pos_b")).as("b_start"),
           (max(col("pos_a")) - min(col("pos_a")) + lit(n.toLong)).as("span_toks"))
      .filter(col("span_toks") >= minTokens)
      .select(col("doc_a"), col("doc_b"), col("a_start"), col("b_start"), col("span_toks"))
      .orderBy(col("doc_a"), col("doc_b"), col("a_start"), col("b_start"))
  }

  // ---- d15: incremental duplicated spans (batch vs persisted index) ---

  private val gramIndexCache =
    new Caching.BoundedCache[(org.apache.spark.sql.SparkSession, String, Int), String](4,
      onEvict = root =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        catch { case _: Exception => () })

  /** d15: INCREMENTAL span dedup — d14's substring detection in d12's
    * ingest shape: the corpus posting index ([[GramIndex]]) is built
    * ONCE per corpus (persisted, cached per corpus stamp) and the
    * batch (doc_id % batchMod == 0, deterministic so DuckDB replays
    * the split) probes it — no corpus re-tokenization on the probe
    * path, and only cross (batch, corpus) spans come back. The
    * hot-gram cap is applied to CORPUS document frequency at index
    * build (what a real index does — batch arrivals can't be known
    * at build time), which is the one semantic difference from
    * d14's whole-collection gate.
    */
  def dupSpansIncremental(documents: DataFrame, n: Int = 8, minTokens: Int = 16,
                          dfCap: Int = 64, batchMod: Int = 17): DataFrame = {
    val spark = documents.sparkSession
    val isBatch = col("doc_id") % batchMod === 0
    val batch = documents.filter(isBatch)
    val corpus = documents.filter(!isBatch)
    def buildTemp(): String = {
      val root = java.nio.file.Files.createTempDirectory("graft-gramidx").toString
      GramIndex.build(spark, root, corpus, n, dfCap)
      root
    }
    // cache key carries EVERY parameter that shapes the built index
    // (n, dfCap) — a key without them would serve an n=8 index to an
    // n=4 probe, whose gram hashes never collide: silently empty
    // results. Ephemeral (uncacheable) indexes are deleted after the
    // probe materializes, like d12's.
    val (root, ephemeral) =
      if (!Caching.bareScan(documents)) (buildTemp(), true)
      else {
        val stamp = Caching.stamp(documents)
        if (stamp.isEmpty) (buildTemp(), true)
        else (gramIndexCache.getOrElseUpdate(
          (spark, s"$stamp|n=$n|cap=$dfCap", batchMod))(buildTemp()), false)
      }
    val res = GramIndex.probe(spark, root, batch, n, minTokens)
      .orderBy(col("batch_doc"), col("corpus_doc"), col("b_start"), col("c_start"))
    if (ephemeral) {
      val out = res.localCheckpoint()
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      catch { case _: Exception => () }
      out
    } else res
  }

  def dupSpansIncrementalOracle(n: Int = 8, minTokens: Int = 16,
                                dfCap: Int = 64, batchMod: Int = 17): String = {
    val charHash = "list_reduce(list_transform(generate_series(1, length(s)), " +
      s"k -> CAST(ascii(substring(s, k, 1)) AS BIGINT)), (acc, c) -> (acc * 31 + c) % $P)"
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       th AS (SELECT doc_id, len(toks) AS nt,
           list_transform(toks, s -> $charHash) AS th FROM t),
       g0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, nt - $n + 1),
           i -> {'pos': i - 1, 'gram': list_reduce(th[i:i+$n-1], (a, b) -> (a * 131 + b) % $P)})) AS s
         FROM th WHERE nt >= $n),
       g AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.gram AS gram FROM g0),
       cg AS (SELECT * FROM g WHERE doc_id % $batchMod <> 0),
       bg AS (SELECT * FROM g WHERE doc_id % $batchMod = 0),
       hot AS (SELECT gram FROM cg GROUP BY gram
               HAVING count(DISTINCT doc_id) > $dfCap),
       idx AS (SELECT * FROM cg WHERE gram NOT IN (SELECT gram FROM hot)),
       m AS (SELECT b.doc_id AS batch_doc, c.doc_id AS corpus_doc,
               b.pos AS pos_b, c.pos AS pos_c
             FROM bg b JOIN idx c ON b.gram = c.gram),
       i AS (SELECT batch_doc, corpus_doc, pos_b, pos_c, pos_b - pos_c AS diag,
               pos_b - row_number() OVER (
                 PARTITION BY batch_doc, corpus_doc, pos_b - pos_c ORDER BY pos_b) AS isl
             FROM m)
       SELECT batch_doc, corpus_doc, min(pos_b) AS b_start, min(pos_c) AS c_start,
         max(pos_b) - min(pos_b) + $n AS span_toks
       FROM i GROUP BY batch_doc, corpus_doc, diag, isl
       HAVING max(pos_b) - min(pos_b) + $n >= $minTokens
       ORDER BY batch_doc, corpus_doc, b_start, c_start"""
  }

  /** st17 oracle: [[dupSpansIncrementalOracle]] extended to TWO
    * commit-gated arrival batches — batch 0 (doc_id%3==1) probes the
    * hot-capped seed postings (%3==0 corpus, the [[GramIndex.build]]
    * gate); batch 1 (%3==2) probes the seed postings PLUS batch 0's
    * postings appended WITHOUT a cap re-check (the literal
    * [[GramIndex.append]] contract: appends never re-level the cap —
    * [[GramIndex.rebuildRecommended]] says when that drift is due).
    * Probe-before-append order makes the split deterministic per
    * commit; same span kernel as d14/d15. */
  def streamGramIngestOracle(n: Int = 8, minTokens: Int = 16,
                             dfCap: Int = 64): String = {
    val charHash = "list_reduce(list_transform(generate_series(1, length(s)), " +
      s"k -> CAST(ascii(substring(s, k, 1)) AS BIGINT)), (acc, c) -> (acc * 31 + c) % $P)"
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       th AS (SELECT doc_id, len(toks) AS nt,
           list_transform(toks, s -> $charHash) AS th FROM t),
       g0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, nt - $n + 1),
           i -> {'pos': i - 1, 'gram': list_reduce(th[i:i+$n-1], (a, b) -> (a * 131 + b) % $P)})) AS s
         FROM th WHERE nt >= $n),
       g AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.gram AS gram FROM g0),
       sg AS (SELECT * FROM g WHERE doc_id % 3 = 0),
       hot AS (SELECT gram FROM sg GROUP BY gram
               HAVING count(DISTINCT doc_id) > $dfCap),
       idx0 AS (SELECT * FROM sg WHERE gram NOT IN (SELECT gram FROM hot)),
       b1 AS (SELECT * FROM g WHERE doc_id % 3 = 1),
       b2 AS (SELECT * FROM g WHERE doc_id % 3 = 2),
       idx1 AS (SELECT * FROM idx0 UNION ALL SELECT * FROM b1),
       m AS (SELECT CAST(0 AS BIGINT) AS arrival_batch, b.doc_id AS batch_doc,
               c.doc_id AS corpus_doc, b.pos AS pos_b, c.pos AS pos_c
             FROM b1 b JOIN idx0 c ON b.gram = c.gram
             UNION ALL
             SELECT CAST(1 AS BIGINT), b.doc_id, c.doc_id, b.pos, c.pos
             FROM b2 b JOIN idx1 c ON b.gram = c.gram),
       i AS (SELECT arrival_batch, batch_doc, corpus_doc, pos_b, pos_c,
               pos_b - pos_c AS diag,
               pos_b - row_number() OVER (
                 PARTITION BY batch_doc, corpus_doc, pos_b - pos_c
                 ORDER BY pos_b) AS isl
             FROM m)
       SELECT arrival_batch, batch_doc, corpus_doc,
         min(pos_b) AS b_start, min(pos_c) AS c_start,
         max(pos_b) - min(pos_b) + $n AS span_toks
       FROM i GROUP BY arrival_batch, batch_doc, corpus_doc, diag, isl
       HAVING max(pos_b) - min(pos_b) + $n >= $minTokens
       ORDER BY arrival_batch, batch_doc, corpus_doc, b_start, c_start"""
  }

  /** The d14 span-detection CTE chain, ending at
    * `spans(doc_a, doc_b, a_start, b_start, span_toks)` — shared by
    * the d14 oracle and the d21 scrub oracle so removal is replayed
    * over the IDENTICAL detected spans. */
  private def spanCtes(n: Int, minTokens: Int, dfCap: Int): String = {
    val charHash = "list_reduce(list_transform(generate_series(1, length(s)), " +
      s"k -> CAST(ascii(substring(s, k, 1)) AS BIGINT)), (acc, c) -> (acc * 31 + c) % $P)"
    s"""t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       th AS (SELECT doc_id, len(toks) AS nt,
           list_transform(toks, s -> $charHash) AS th FROM t),
       g0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, nt - $n + 1),
           i -> {'pos': i - 1, 'gram': list_reduce(th[i:i+$n-1], (a, b) -> (a * 131 + b) % $P)})) AS s
         FROM th WHERE nt >= $n),
       g AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.gram AS gram FROM g0),
       dup AS (SELECT gram FROM g GROUP BY gram
               HAVING count(DISTINCT doc_id) BETWEEN 2 AND $dfCap),
       gd AS (SELECT g.* FROM g JOIN dup USING (gram)),
       m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
             FROM gd a JOIN gd b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       i AS (SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
               pos_a - row_number() OVER (
                 PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS isl
             FROM m),
       spans AS (
         SELECT doc_a, doc_b, min(pos_a) AS a_start, min(pos_b) AS b_start,
           max(pos_a) - min(pos_a) + $n AS span_toks
         FROM i GROUP BY doc_a, doc_b, diag, isl
         HAVING max(pos_a) - min(pos_a) + $n >= $minTokens)"""
  }

  def dupSpansOracle(n: Int = 8, minTokens: Int = 16, dfCap: Int = 64): String =
    s"""WITH ${spanCtes(n, minTokens, dfCap)}
       SELECT doc_a, doc_b, a_start, b_start, span_toks
       FROM spans ORDER BY doc_a, doc_b, a_start, b_start"""

  // ---- d21: span SCRUB (apply the d14 detection: rewrite the corpus) --

  /** d21: duplicated-span SCRUB — the REMOVAL half of substring-level
    * dedup (the step ExactSubstr dedup actually performs on the
    * training corpus, Lee et al. 2022 "Deduplicating Training Data
    * Makes Language Models Better": drop every duplicated span from
    * all but one occurrence). d14/d15 DETECT spans; this row rewrites
    * the corpus under the keep-earliest convention the d01/d06/d10
    * apply stages already use: for each detected span pair the
    * occurrence in the LOWER doc_id survives, the higher doc's token
    * range [b_start, b_start + span_toks) is scheduled for removal.
    * Per doc, the scheduled ranges are unioned (overlapping spans from
    * different partners merge — classic interval union via a
    * running-max-end island window), removed tokens are counted from
    * the union (never double-counted), and the document text is
    * reconstructed from the surviving tokens. Output: one row per
    * document — n_tokens, n_spans (merged removal intervals),
    * toks_removed, and the scrubbed text itself.
    *
    * Scale shape: spans/intervals are PAIR-bounded frames (the d14
    * output, never corpus-sized) — the interval union windows on
    * (doc, start) over those rows only; the per-doc interval array
    * joins the corpus hint-free (AQE broadcasts it from its real
    * size), and reconstruction is a MAP-SIDE higher-order filter over
    * each doc's own token array (documents never shuffle; the only
    * wide ops are d14's gram-keyed ones). Tokenization is the d14
    * kernel's (split lower(text) on ' '), so positions line up by
    * construction and the scrubbed text re-joins with single spaces.
    */
  def spanScrub(documents: DataFrame, n: Int = 8, minTokens: Int = 16,
                dfCap: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = dupSpans(documents, n, minTokens, dfCap)
    val rem = spans.select(col("doc_b").as("doc_id"), col("b_start").as("s"),
                           (col("b_start") + col("span_toks")).as("e"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val merged = rem
      .withColumn("pm", max(col("e")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk", when(col("pm").isNull || col("s") > col("pm"), 1L).otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(wOrd))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    val ivs = merged.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("ivs"),
           count(lit(1)).as("n_spans"),
           sum(col("e") - col("s")).as("toks_removed"))
    documents.select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .join(ivs, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("toks_removed"), lit(0L)).as("toks_removed"),
        when(col("ivs").isNull, concat_ws(" ", col("toks")))
          .otherwise(expr(
            """array_join(transform(
                 filter(transform(sequence(0, size(toks) - 1),
                          i -> named_struct('p', i, 'tok', toks[i])),
                        x -> NOT exists(ivs, v -> x.p >= v.s AND x.p < v.e)),
                 x -> x.tok), ' ')"""))
          .as("text_scrubbed"))
      .orderBy(col("doc_id"))
  }

  def spanScrubOracle(n: Int = 8, minTokens: Int = 16, dfCap: Int = 64): String =
    s"""WITH ${spanCtes(n, minTokens, dfCap)},
       rem AS (SELECT doc_b AS doc_id, b_start AS s, b_start + span_toks AS e
               FROM spans),
       ord AS (SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         FROM rem),
       brk AS (SELECT doc_id, s, e,
           sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY s, e) AS isl
         FROM ord),
       mi AS (SELECT doc_id, isl, min(s) AS s, max(e) AS e
              FROM brk GROUP BY doc_id, isl),
       agg AS (SELECT doc_id,
           list(struct_pack(s := s, e := e) ORDER BY s, e) AS ivs,
           count(*) AS n_spans, sum(e - s) AS toks_removed
         FROM mi GROUP BY doc_id)
       SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
         CAST(coalesce(a.toks_removed, 0) AS BIGINT) AS toks_removed,
         CASE WHEN a.doc_id IS NULL THEN array_to_string(t.toks, ' ')
           ELSE coalesce(array_to_string(list_transform(
             list_filter(generate_series(1, len(t.toks)),
               i -> len(list_filter(a.ivs,
                      v -> (i - 1) >= v.s AND (i - 1) < v.e)) = 0),
             i -> t.toks[i]), ' '), '')
         END AS text_scrubbed
       FROM t LEFT JOIN agg a USING (doc_id)
       ORDER BY t.doc_id"""
}

/** One corpus's materialized dedup pipeline: LSH candidate pairs,
  * shingle-verified pairs and the cluster map, each computed once and
  * `localCheckpoint`ed on first access. Obtain instances through
  * [[Dedup.pipeline]] (which caches per corpus+threshold); every frame
  * here is TINY relative to the corpus — pair rows, not documents — so
  * the checkpoints are the cluster-scale equivalent of writing the
  * pair/cluster tables to storage between jobs.
  */
final class DedupPipeline private[operators] (documents: DataFrame, minJaccard: Double) {
  import Dedup._
  import graft.functions.GraftFunctions._

  /** LSH band-candidate pairs (doc_a < doc_b), deduped across bands.
    * The ONE execution of the signature+banding stage; everything
    * downstream (d02 verify, d04 bigram verify, d07 clustering, d11
    * estimator eval) reads this frame. Native single-pass signature
    * kernel: min over the window-hash multiset == min over the
    * distinct set, so it matches the oracle's set-based arithmetic.
    */
  lazy val candidates: DataFrame = {
    Dedup.pipelineBuilds += 1
    val bands = Dedup.bandFrame(documents)
    bands.as("x")
      .join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .localCheckpoint()
  }

  /** Docs appearing in any candidate pair — the bounded set every
    * verification kernel runs on. */
  private lazy val candidateDocs: DataFrame =
    candidates.select(col("doc_a").as("doc_id"))
      .union(candidates.select(col("doc_b").as("doc_id")))
      .distinct()
      .localCheckpoint()

  /** Semi-join a corpus-shaped frame (with a doc_id column) down to
    * candidate-pair members, so per-doc kernels (shingles, bigrams,
    * signatures) run on candidates only — never the whole corpus a
    * second time. No broadcast hint: the candidate count scales with
    * the near-dup rate, and AQE upgrades the semi-join to broadcast
    * whenever the materialized frame actually fits.
    */
  def restrictToCandidates(df: DataFrame): DataFrame =
    df.join(candidateDocs, Seq("doc_id"), "left_semi")

  /** Shingle sets of candidate-pair members only — materialized once
    * and shared by the Jaccard verification ([[pairs]]) and the
    * containment scoring ([[containmentPairs]]). */
  private lazy val candidateShingles: DataFrame =
    restrictToCandidates(documents)
      .select(col("doc_id"), shingle_set(col("text")).as("hs"))
      .localCheckpoint()

  /** Shingle-verified near-dup pairs: true Jaccard >= minJaccard,
    * 4dp-rounded. The shingle kernel runs only on candidate docs. */
  lazy val pairs: DataFrame = {
    val sh = candidateShingles
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("jac", arr_jaccard(col("hs_a"), col("hs_b")))
      .filter(col("jac") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), Rounding.roundN(col("jac"), 4).as("jac"))
      .localCheckpoint()
  }

  /** ALL candidate pairs containment-scored (|A∩B|/|A| and /|B|),
    * unthresholded and materialized once — the asymmetric score that
    * catches SUBSET duplication (a short doc embedded in a long one),
    * which symmetric Jaccard structurally misses: for A ⊂ B,
    * containment_A = 1 while Jaccard = |A|/|B| can be arbitrarily
    * small. Candidates and shingles come from the shared materialized
    * stages; caching RAW scores keeps every threshold a cheap filter
    * over this frame (the same reason [[pairs]] checkpoints). */
  private lazy val containmentScores: DataFrame = {
    val sh = candidateShingles
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("inter",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("double"))
      .select(col("doc_a"), col("doc_b"),
              (col("inter") / size(col("hs_a"))).as("c_ab"),
              (col("inter") / size(col("hs_b"))).as("c_ba"))
      .localCheckpoint()
  }

  /** Containment pairs above `minContain` — a filter over the cached
    * scored frame; thresholding happens on the RAW ratios (mirroring
    * the oracle), rounding only on output. */
  def containmentPairs(minContain: Double): DataFrame =
    containmentScores
      .filter(greatest(col("c_ab"), col("c_ba")) >= minContain)
      .select(col("doc_a"), col("doc_b"),
              Rounding.roundN(col("c_ab"), 4).as("contain_ab"),
              Rounding.roundN(col("c_ba"), 4).as("contain_ba"))

  /** Rounds the last cluster computation took to converge. */
  @volatile var iters: Int = 0

  /** Cluster map (doc_id -> min-reachable-id) over the verified pairs:
    * connected components via distributed min-label propagation; each
    * vertex repeatedly adopts the minimum label among itself and its
    * neighbors; fixpoint in O(component diameter) rounds. Every
    * iteration materializes its frame (localCheckpoint) — an iterative
    * algorithm on an un-materialized lineage would re-execute all
    * previous rounds each round (see PLANS.md on plan re-execution).
    * Near-dup components are shallow (dozens of docs), so the round
    * count is small and each round is one tiny shuffle. Round 0 is
    * fused into initialization: label = min(self, neighbors) — for the
    * dominant shallow components (pairs, triangles, stars on the min
    * vertex) that IS the fixpoint, so the loop usually runs once to
    * confirm and once more only for chains.
    */
  lazy val clusters: DataFrame = {
    val MaxIters = 50
    val p = pairs.select(col("doc_a"), col("doc_b"))
    val edges = p.union(p.select(col("doc_b"), col("doc_a"))).toDF("a", "b")
    var labels = edges.groupBy(col("a"))
      .agg(least(min(col("b")), col("a")).as("label"))
      .select(col("a").as("id"), col("label")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < MaxIters) {
      val neigh = edges.join(labels, edges("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("label")).as("nlabel"))
      val updated = labels.as("l")
        .join(neigh.as("n"), col("l.id") === col("n.a"), "left")
        .select(col("l.id").as("id"),
                least(col("l.label"), coalesce(col("n.nlabel"), col("l.label"))).as("label"),
                (col("l.label") > coalesce(col("n.nlabel"), col("l.label")))
                  .cast("long").as("chg"))
        .localCheckpoint()
      changed = updated.agg(coalesce(sum(col("chg")), lit(0L))).head.getLong(0)
      labels = updated.select(col("id"), col("label"))
      iter += 1
    }
    iters = iter
    Dedup.lastIters = iter
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }
}
