package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search + embedding dedup over the embeddings table
  * (64-dim float vectors).
  *
  * Cosine arithmetic is an explicit left-to-right double fold on both
  * engines (Spark aggregate() with 0.0 init == DuckDB list_reduce:
  * 0+x1 is exactly x1, so the fold orders agree bit-for-bit).
  * Hyperplane signs are derived *arithmetically* from the index —
  * w(j,i) = 2*(((1103515245*(j*64+i)+12345) >> 16) & 1) - 1 — so the
  * oracle needs no literal plane arrays.
  *
  * Scale shapes: brute-force (s01) exists as the correctness baseline
  * and only ever broadcasts the small query set — O(Q*N) map-side, no
  * shuffle of the corpus. The LSH paths (s02/d05) shuffle on the
  * bucket id only; more planes => smaller buckets at 100 TB.
  */
object Similarity {
  val Dims = 64

  /** Default hyperplane count for the ORACLE-BOUND queries (pinned so
    * the DuckDB SQL stays static across corpora). Production sizing is
    * [[planesFor]] — the spec suite runs [[bucketCensus]] with derived
    * planes at every SF to prove the derived index stays bounded. */
  val NumPlanes = 4

  /** Data-dependent hyperplane count: enough planes that the EXPECTED
    * bucket occupancy n / 2^p is at most `targetBucket`, floored at
    * [[NumPlanes]] and capped at 24 (2^24 = 16M buckets serves n=10^9
    * at ~64 expected occupants — beyond that you shard the index, not
    * the plane count). This is the 100x-scale lever the fixed constant
    * lacks: 16 buckets at 100 TB would be near-all-pairs. Measured on
    * the test corpus (see BucketCensusSpec numbers in the spec): the
    * LARGEST bucket plateaus at a few percent of the corpus however
    * many planes are added — tight clusters of near-identical vectors
    * share every sign bit, which is precisely what makes sign-LSH a
    * near-dup blocker — so the census asserts avg <= target and
    * max <= 8x target rather than pretending skew away.
    */
  def planesFor(n: Long, targetBucket: Int = 64): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(24, math.max(NumPlanes, needed))
  }

  /** Data-dependent IVF centroid ids: K ~ sqrt(n) vectors stride-
    * sampled deterministically across the id space (the stand-in for
    * a sampled k-means — same K growth, same plan shape). sqrt(n)
    * cells keep BOTH sides of the search balanced: ~sqrt(n) expected
    * cell occupancy and ~sqrt(n) centroids to probe per query. */
  def centroidIdsFor(n: Long): Seq[Long] = {
    val k = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
    (0 until k).map(i => i.toLong * n / k)
  }

  /** Rank-based centroid selection: every ⌈n/k⌉-th EXISTING vector in
    * id order, k ~ sqrt(n) as above. The affine formula assumes a
    * dense 0..n id domain; on a sparse/gapped one its picks land on
    * ABSENT ids (dropped by the centroid lookup) or duplicate
    * embeddings (tie-broken to one live cell), silently shrinking
    * effective K and re-inflating the nProbe·N²/K candidate term —
    * measured on the 10× key-shifted corpus: 142 slots → 15 live
    * cells, per-doc candidates 90 → 1344 (CensusS20, PLANS round 11).
    * Selection rides the range-partitioned global rank (never a
    * single-partition sort) and collects k ~ sqrt(N) ids — bounded
    * driver state even at 100 TB (sqrt(10¹⁰) = 10⁵ longs). */
  def centroidIdsRanked(embeddings: DataFrame): Seq[Long] = {
    val n = embeddings.count()
    val k = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
    val stride = math.max(1L, n / k)
    Relational.withGlobalRank(
        embeddings.select(col("vec_id"), lit(0L).as("z")), "vec_id", "z", "r")
      .filter((col("r") - 1) % stride === 0)
      .orderBy(col("r")).limit(k)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
  }

  /** Occupancy census of the hyperplane-LSH buckets — the evidence
    * that an index sized by [[planesFor]] stays sub-quadratic as the
    * corpus grows: one row with bucket count, max/p99/avg occupancy.
    * Runs as one partial->final agg over the bucket projection. */
  def bucketCensus(embeddings: DataFrame, numPlanes: Int): DataFrame = {
    import graft.functions.GraftFunctions._
    embeddings
      .select(plane_bucket(col("embedding"), numPlanes).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_buckets"), max(col("n")).as("max_occ"),
           expr("percentile(n, 0.99)").as("p99_occ"),
           avg(col("n")).as("avg_occ"))
  }

  /** Occupancy census of the IVF cells for a given centroid set —
    * same evidence for the s03/s05 path. */
  def cellCensus(embeddings: DataFrame, cents: Seq[Long]): DataFrame =
    assignedCells(embeddings, cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_cells"), max(col("n")).as("max_occ"),
           expr("percentile(n, 0.99)").as("p99_occ"),
           avg(col("n")).as("avg_occ"))

  /** Candidate-volume census of the s20 kNN join's cell equi-join —
    * the skew-exposure metric behind that one cell-key shuffle: per
    * cell, candidates = corpus occupancy × probes into the cell (the
    * join's actual per-partition work, which occupancy alone
    * understates because a hot cell is hot on BOTH sides). Reports
    * the total candidate volume (the nProbe·N²/K term made
    * measurable), the max/p99 cell, and max/avg — the hot-cell factor
    * AQE's skew split must absorb, pinned by the s20 skew spec. */
  def knnJoinCensus(embeddings: DataFrame, nProbe: Int = 2,
                    centIds: Seq[Long] = centroidIds): DataFrame = {
    val occ = assignedCells(embeddings, centIds)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_corpus"))
    val pro = probeCells(embeddings, Long.MaxValue, nProbe, centIds)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_probes"))
    occ.join(pro, Seq("cell"))
      .select(col("cell"), (col("n_corpus") * col("n_probes")).as("cand"))
      .agg(count(lit(1)).as("n_cells"), sum(col("cand")).as("total_cand"),
           max(col("cand")).as("max_cand"),
           expr("percentile(cand, 0.99)").as("p99_cand"),
           (max(col("cand")) / avg(col("cand"))).as("hot_factor"))
  }

  private def dot(d: Dialect, a: String, b: String): String =
    if (d eq Dialect.spark)
      s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    else
      s"list_reduce(list_transform(generate_series(1, $Dims), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (acc, v) -> acc + v)"

  private def planeSign(d: Dialect, j: Int): String =
    s"(2 * (${d.shiftR(s"(CAST(1103515245 AS BIGINT) * ($j * $Dims + i) + 12345)", "16")} & 1) - 1)"

  private def planeDot(d: Dialect, e: String, j: Int): String =
    d.sumDouble(d.transform(d.range("1", Dims.toString),
      s"i -> CAST(${d.elem(e, "i")} AS DOUBLE) * ${planeSign(d, j)}"))

  /** Sign-bucket id from `numPlanes` random hyperplanes starting at
    * global plane index `offset` (table t of an OR-construction uses
    * offset = t * numPlanes — disjoint plane slices, bit positions
    * stay local to the table so bucket ids are comparable across
    * tables). */
  private def bucketExpr(d: Dialect, e: String, numPlanes: Int = NumPlanes,
                         offset: Int = 0): String =
    (0 until numPlanes).map { j =>
      s"(CASE WHEN ${planeDot(d, e, offset + j)} > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  private def normExpr(d: Dialect, e: String): String = s"sqrt(${dot(d, e, e)})"

  /** Per-vector symmetric integer codes as a DOUBLE list:
    * floor(x * levels / max|x|), levels = 127 for int8, 7 for int4.
    * floor (not round) dodges the half-boundary class entirely — a
    * 1-ulp disagreement inside round() would flip an integer code,
    * floor only moves on exact integer boundaries, unreachable from
    * a float*double product of real embedding data. Both dialects
    * fold max|x| left-to-right over the same elements. */
  private def codesExpr(d: Dialect, e: String, levels: Int): String = {
    val maxabs =
      if (d eq Dialect.spark)
        s"aggregate($e, CAST(0 AS DOUBLE), (a, y) -> greatest(a, abs(CAST(y AS DOUBLE))))"
      else
        s"list_reduce(list_transform(generate_series(1, $Dims), i -> abs(CAST($e[i] AS DOUBLE))), (a, y) -> greatest(a, y))"
    val scale = s"(CAST($levels AS DOUBLE) / greatest($maxabs, 1e-30))"
    val xf = if (d eq Dialect.spark) "transform" else "list_transform"
    s"$xf($e, x -> CAST(floor(CAST(x AS DOUBLE) * $scale) AS DOUBLE))"
  }

  /** s01: exact cosine top-k per query vector, brute force.
    * The query set is broadcast; the corpus never shuffles.
    */
  def bruteForceTopK(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 5): DataFrame = {
    import graft.functions.GraftFunctions._
    val corpus = embeddings.select(col("vec_id").as("c_id"), col("embedding").as("ce"))
      .withColumn("cn", vec_norm(col("ce")))
    val queries = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .withColumn("qn", vec_norm(col("qe")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    corpus.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id").as("neighbor_id"),
              col("rank").cast("long").as("rank"), Rounding.roundN(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  def bruteForceTopKOracle(maxQueryId: Long = 8, k: Int = 5): String = {
    val d = Dialect.duck
    s"""WITH c AS (SELECT vec_id AS c_id, embedding AS ce,
           ${normExpr(d, "embedding")} AS cn FROM embeddings),
       q AS (SELECT vec_id AS q_id, embedding AS qe,
           ${normExpr(d, "embedding")} AS qn FROM embeddings WHERE vec_id < $maxQueryId),
       scored AS (SELECT q_id, c_id, ${dot(d, "qe", "ce")} / (qn * cn) AS cos
         FROM c JOIN q ON q_id <> c_id),
       ranked AS (SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos
       FROM ranked WHERE rank <= $k ORDER BY q_id, rank"""
  }

  /** s02: LSH-bucketed approximate top-k — candidates share the
    * query's hyperplane sign bucket; equi-join on bucket id.
    */
  def lshTopK(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 3,
              numPlanes: Int = NumPlanes): DataFrame = {
    import graft.functions.GraftFunctions._
    val f = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", vec_norm(col("embedding")))
      .withColumn("bucket", plane_bucket(col("embedding"), numPlanes))
    val corpus = f.select(col("vec_id").as("c_id"), col("embedding").as("ce"),
                          col("nrm").as("cn"), col("bucket"))
    val queries = f.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
              col("nrm").as("qn"), col("bucket"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id").as("neighbor_id"),
              col("rank").cast("long").as("rank"), Rounding.roundN(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  def lshTopKOracle(maxQueryId: Long = 8, k: Int = 3,
                    numPlanes: Int = NumPlanes): String = {
    val d = Dialect.duck
    s"""WITH f AS (SELECT vec_id, embedding, ${normExpr(d, "embedding")} AS nrm,
           ${bucketExpr(d, "embedding", numPlanes)} AS bucket FROM embeddings),
       scored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           ${dot(d, "q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
         FROM f c JOIN f q ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
         WHERE q.vec_id < $maxQueryId),
       ranked AS (SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos
       FROM ranked WHERE rank <= $k ORDER BY q_id, rank"""
  }

  /** Tables and per-table plane count for the ORACLE-BOUND s19 query
    * (pinned for static SQL; the production sizing lever is the same
    * [[planesFor]] growth applied per table). */
  val NumTables = 3
  val PlanesPerTable = 6

  /** s19: multi-table OR-construction LSH top-k — the classic
    * Indyk–Motwani amplification: L independent hash tables, each
    * over its own DISJOINT slice of the hyperplane stream
    * (offset = t * planesPerTable), candidates = the UNION of
    * same-bucket pairs across tables. MORE planes per table than s02
    * (6 vs 4) cut each table's buckets 4× smaller — this is the
    * answer to the hot-bucket skew the 10×/30× soak census recorded
    * (single-table max occupancy grew 27× → 46× over average) — and
    * the OR over 3 tables recovers the recall those smaller buckets
    * would lose (a true neighbor is a candidate if it collides in
    * ANY table: miss probability (1 - p^r)^L falls exponentially
    * in L). Sign-LSH's failure mode is spread, not eliminated: a
    * vector cluster sharing every sign bit still shares it in every
    * table, so the census spec asserts the measured shape, and the
    * in-bucket work stays a per-(table,bucket) equi-join either way.
    *
    * Plan shape (100 TB): one corpus projection emits all L bucket
    * ids per vector (L codegen'd [[graft.functions.PlaneBucket]]
    * kernels in one pass — the corpus is scanned once, not L times);
    * the query side broadcasts; the (tbl, bucket) equi-join yields
    * candidate id pairs which are DISTINCT'd id-only (a pair found
    * in 2 tables scores once — dedup shuffles 16-byte pairs, never
    * vectors); the result-bounded candidate set then equi-joins the
    * corpus once for the vector fetch (hint-free — AQE broadcasts it
    * from its real size, the s17 shortlist discipline) and the
    * re-rank window sees only each query's candidates. */
  def multiTableLshTopK(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 3,
                        numTables: Int = NumTables,
                        planesPerTable: Int = PlanesPerTable): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val buckets = (0 until numTables).map(t =>
      plane_bucket(col("embedding"), planesPerTable, t * planesPerTable))
    val banded = embeddings.select(col("vec_id"),
        posexplode(array(buckets: _*)).as(Seq("tbl", "bucket")))
    val corpus = banded.select(col("vec_id").as("c_id"), col("tbl"), col("bucket"))
    val queries = banded.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    val cands = corpus.join(broadcast(queries), Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id")).distinct()
    val vecs = embeddings.select(col("vec_id"), col("embedding"),
      vec_norm(col("embedding")).as("nrm"))
    val qv = vecs.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val cv = vecs.select(col("vec_id").as("c_id"), col("embedding").as("ce"),
      col("nrm").as("cn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    cands.join(cv, Seq("c_id"))
      .join(broadcast(qv), Seq("q_id"))
      .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id").as("neighbor_id"),
              col("rank").cast("long").as("rank"), Rounding.roundN(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  def multiTableLshTopKOracle(maxQueryId: Long = 8, k: Int = 3,
                              numTables: Int = NumTables,
                              planesPerTable: Int = PlanesPerTable): String = {
    val d = Dialect.duck
    val bands = (0 until numTables).map { t =>
      s"SELECT vec_id, $t AS tbl, ${bucketExpr(d, "embedding", planesPerTable, t * planesPerTable)} AS bucket FROM embeddings"
    }.mkString("\n         UNION ALL ")
    s"""WITH bands AS ($bands),
       cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
         FROM bands q JOIN bands c ON q.tbl = c.tbl AND q.bucket = c.bucket
         WHERE q.vec_id < $maxQueryId AND q.vec_id <> c.vec_id),
       f AS (SELECT vec_id, embedding, ${normExpr(d, "embedding")} AS nrm
         FROM embeddings),
       scored AS (SELECT cand.q_id, cand.c_id,
           ${dot(d, "q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
         FROM cand JOIN f c ON cand.c_id = c.vec_id
                   JOIN f q ON cand.q_id = q.vec_id),
       ranked AS (SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos
       FROM ranked WHERE rank <= $k ORDER BY q_id, rank"""
  }

  /** Per-table occupancy census of the OR-construction's tables —
    * one row per table: bucket count, max/avg occupancy. The skew
    * evidence the multi-table design exists to improve: compare
    * max_occ here against [[bucketCensus]] of the single wider-bucket
    * table. */
  def multiTableCensus(embeddings: DataFrame,
                       numTables: Int = NumTables,
                       planesPerTable: Int = PlanesPerTable): DataFrame = {
    import graft.functions.GraftFunctions._
    val buckets = (0 until numTables).map(t =>
      plane_bucket(col("embedding"), planesPerTable, t * planesPerTable))
    embeddings.select(posexplode(array(buckets: _*)).as(Seq("tbl", "bucket")))
      .groupBy(col("tbl"), col("bucket")).agg(count(lit(1)).as("n"))
      .groupBy(col("tbl"))
      .agg(count(lit(1)).as("n_buckets"), max(col("n")).as("max_occ"),
           avg(col("n")).as("avg_occ"))
      .orderBy(col("tbl"))
  }

  /** s03: IVF-style ANN — corpus assigned to inverted-list cells by
    * nearest centroid (deterministic centroid choice: fixed vec_ids,
    * standing in for a k-means "training" step); a query probes only
    * its own cell. The cell assignment is a broadcast join against K
    * centroids + top-1 window; the search is an equi-join on cell id.
    * At 100 TB: K grows to ~sqrt(N), multi-probe = union of nearest
    * cells, centroids come from a sampled k-means — same plan shape.
    */
  /** Pinned centroid set for the ORACLE-BOUND queries (static SQL);
    * production sizing is [[centroidIdsFor]] (K ~ sqrt(n)), census-
    * checked at every SF by the spec suite. */
  val centroidIds: Seq[Long] = (100L until 108L)

  /** IVF cell assignment: every vector to its nearest centroid
    * (broadcast K centroids + top-1 window) — shared by s03 search and
    * s04 centroid refinement. */
  private def assignedCells(embeddings: DataFrame,
                            centIds: Seq[Long] = centroidIds): DataFrame =
    assignedCellsWith(embeddings,
      embeddings.filter(col("vec_id").isin(centIds: _*))
        .select(col("vec_id").as("cent_id"), col("embedding").as("cemb")))

  /** [[assignedCells]] with the centroid frame given explicitly —
    * [[knnEdgesFor]]'s `centsFrom` hook (a level-restricted corpus
    * assigned against the FULL corpus's centroid vectors). */
  private def assignedCellsWith(embeddings: DataFrame,
                                cents: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    embeddings
      .crossJoin(broadcast(cents))
      .withColumn("csim", vec_dot(col("embedding"), col("cemb")))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"),
              vec_norm(col("embedding")).as("nrm"), col("label"))
  }

  def ivfTopK(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 3): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val assigned = assignedCells(embeddings)
    val corpus = assigned.select(col("vec_id").as("c_id"), col("embedding").as("ce"),
                                 col("nrm").as("cn"), col("cell"))
    val queries = assigned.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
              col("nrm").as("qn"), col("cell"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id").as("neighbor_id"),
              col("rank").cast("long").as("rank"), Rounding.roundN(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** The IVF cell-assignment CTE chain producing
    * `assigned(vec_id, embedding, cell, nrm)` — shared by the s03
    * oracle and the s04 centroid-update oracle. */
  private def assignedCtes: String = {
    val d = Dialect.duck
    val ids = centroidIds.mkString(", ")
    s"""cents AS (SELECT vec_id AS cent_id, embedding AS cemb
           FROM embeddings WHERE vec_id IN ($ids)),
       scoredc AS (SELECT e.vec_id, e.embedding, c.cent_id,
           ${dot(d, "e.embedding", "c.cemb")} AS csim
         FROM embeddings e CROSS JOIN cents c),
       assigned AS (SELECT vec_id, embedding, cent_id AS cell,
           ${normExpr(d, "embedding")} AS nrm
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn FROM scoredc) t
         WHERE crn = 1)"""
  }

  def ivfTopKOracle(maxQueryId: Long = 8, k: Int = 3): String = {
    val d = Dialect.duck
    s"""WITH $assignedCtes,
       scored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           ${dot(d, "q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
         FROM assigned c JOIN assigned q ON q.cell = c.cell AND q.vec_id <> c.vec_id
         WHERE q.vec_id < $maxQueryId),
       ranked AS (SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos
       FROM ranked WHERE rank <= $k ORDER BY q_id, rank"""
  }

  /** s05: multi-probe IVF — the standard recall lever: a query probes
    * its `nProbe` nearest cells instead of only the nearest one, so a
    * true neighbor sitting just across a Voronoi boundary is still
    * found. Corpus-side cost is unchanged (each vector still lives in
    * exactly one cell); the query side fans out nProbe-fold, which is
    * the knob that trades search cost for recall at constant index
    * size. Candidate pairs stay unique (a corpus vector has one cell),
    * so no dedup stage is needed before the rank.
    */
  /** The top-nProbe nearest cells per query vector — shared by the
    * s05 search and the recall sweep so probe-cell choice (csim desc,
    * cent_id tiebreak) cannot drift between search and eval. */
  private def probeCells(embeddings: DataFrame, maxQueryId: Long,
                         nProbe: Int, centIds: Seq[Long]): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val cents = embeddings.filter(col("vec_id").isin(centIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    embeddings.filter(col("vec_id") < maxQueryId)
      .crossJoin(broadcast(cents))
      .withColumn("csim", vec_dot(col("embedding"), col("cemb")))
      .withColumn("crn", row_number().over(wProbe))
      .filter(col("crn") <= nProbe)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
              vec_norm(col("embedding")).as("qn"), col("cent_id").as("cell"),
              col("label").as("qlabel"))
  }

  def ivfMultiProbe(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 3,
                    nProbe: Int = 2, centIds: Seq[Long] = centroidIds): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val corpus = assignedCells(embeddings, centIds)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"),
              col("nrm").as("cn"), col("cell"))
    val qprobe = probeCells(embeddings, maxQueryId, nProbe, centIds)
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    corpus.join(broadcast(qprobe), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id").as("neighbor_id"),
              col("rank").cast("long").as("rank"), Rounding.roundN(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** s20: all-corpus kNN JOIN — every vector's k approximate nearest
    * neighbors, i.e. the kNN GRAPH of the whole corpus (not a small
    * query set probing it, which is s03/s05). This is the bulk
    * construction step graph-based curation methods start from:
    * SemDeDup-style cluster refinement, dataset cartography,
    * kNN-graph clustering, and the base layer of graph ANN indexes
    * all consume exactly this table.
    *
    * Shape: the s05 machinery with the query side widened to the
    * corpus — every vector fans out to its `nProbe` nearest cells
    * (broadcast centroids + per-vector window, map-side) and
    * equi-joins the cell-assigned corpus on the cell id. Neither side
    * can broadcast (both are corpus-sized), so this is ONE shuffle on
    * the cell key; candidate volume is Σ_cells occupancy ×
    * probes-into-cell ≈ nProbe·N²/K, the SemDeDup bound (d17's
    * argument) — never the N² of a brute-force self-join. The
    * per-vector top-k (`row_number ≤ k`) gets WindowGroupLimit
    * map-side pruning, so the rank shuffle carries ≤ k·partitions
    * rows per vector. At 100 TB: K ~ sqrt(N) centroids
    * ([[centroidIdsFor]]) keep cell occupancy — and with it the
    * quadratic term — bounded; output is exactly N·k edges.
    * Approximation contract: a neighbor outside every probed cell is
    * invisible by design (the s05 recall trade, measured by s06).
    */
  def knnJoin(embeddings: DataFrame, k: Int = 3, nProbe: Int = 2,
              centIds: Seq[Long] = centroidIds): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val corpus = assignedCells(embeddings, centIds)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"),
              col("nrm").as("cn"), col("cell"))
    // probeCells with the query filter wide open: the whole corpus is
    // the query set. NOT broadcast (corpus-sized) — the join below is
    // the one cell-key shuffle this operator pays.
    val probes = probeCells(embeddings, Long.MaxValue, nProbe, centIds)
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    corpus.join(probes, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("c_id").as("neighbor_id"),
              col("rank").cast("long").as("rank"), Rounding.roundN(col("cos"), 4).as("cos"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** kNN edges for an ARBITRARY query frame over an arbitrary corpus —
    * [[knnJoin]] with the probe side given explicitly (the
    * [[GraphIndex.ingest]] kernel: an arrival batch's edges are its
    * top-k over the GROWN corpus, probed through the same cells). Same
    * single cell-key shuffle; the batch side fans out map-side.
    * `centsFrom` (default: the corpus) is where the centroid VECTORS
    * are looked up — [[graphHierWalk]]'s upper-level chains pass the
    * full corpus so a level subset that happens to exclude a centroid
    * id still assigns against the same cell geometry as every other
    * level (the oracle's `knnCtesP` reads cents from the full table). */
  private[graft] def knnEdgesFor(corpus: DataFrame, queryVecs: DataFrame,
                                 k: Int, nProbe: Int,
                                 centIds: Seq[Long],
                                 centsFrom: DataFrame = null): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val cents = Option(centsFrom).getOrElse(corpus)
      .filter(col("vec_id").isin(centIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
    val cells = assignedCellsWith(corpus, cents)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"),
              col("nrm").as("cn"), col("cell"))
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    val probes = queryVecs
      .crossJoin(broadcast(cents))
      .withColumn("csim", vec_dot(col("embedding"), col("cemb")))
      .withColumn("crn", row_number().over(wProbe))
      .filter(col("crn") <= nProbe)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
              vec_norm(col("embedding")).as("qn"), col("cent_id").as("cell"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    cells.join(probes, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("q_id").as("src"), col("c_id").as("dst"))
  }

  /** The s20 kNN-graph CTE chain, ending at
    * `ranked(q_id, c_id, cos, rank)` — shared by the s20 oracle and
    * the s22 centrality oracle so the graph both replay is IDENTICAL. */
  private def knnCtes(nProbe: Int): String = {
    val d = Dialect.duck
    s"""$assignedCtes,
       qprobe AS (SELECT vec_id AS q_id, embedding AS qe,
           ${normExpr(d, "embedding")} AS qn, cent_id AS cell
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn
               FROM scoredc) t
         WHERE crn <= $nProbe),
       scored AS (SELECT q.q_id, c.vec_id AS c_id,
           ${dot(d, "q.qe", "c.embedding")} / (q.qn * c.nrm) AS cos
         FROM assigned c JOIN qprobe q ON q.cell = c.cell
         WHERE q.q_id <> c.vec_id),
       ranked AS (SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         FROM scored)"""
  }

  def knnJoinOracle(k: Int = 3, nProbe: Int = 2): String =
    s"""WITH ${knnCtes(nProbe)}
       SELECT q_id AS vec_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos
       FROM ranked WHERE rank <= $k ORDER BY vec_id, rank"""

  /** s14: MMR result diversification (maximal marginal relevance,
    * Carbonell & Goldstein 1998) — re-rank each query's exact top-`kShort`
    * shortlist down to `kOut` picks that balance relevance against
    * redundancy: pick_1 = argmax rel; pick_t = argmax over remaining of
    * `lambda*rel - (1-lambda)*max_{s in picked} sim(c, s)`. The dedup
    * stage of a retrieval pipeline (RAG context assembly, eval-set
    * construction): a shortlist of near-identical passages collapses
    * to one representative plus genuinely different material.
    *
    * Scale shape: the expensive part is the SHORTLIST (any of s01-s12
    * produces it); MMR itself is bounded by the RESULT size — per
    * query, kShort candidate rows and the kShort^2 pairwise-sim
    * frame — never the corpus. The greedy selection therefore runs as
    * ONE `cogroup` on q_id (candidates with pairwise sims), the
    * O(kOut*kShort) loop in memory per group: a single shuffle and a
    * single stage however large the query set, where the unrolled
    * kOut-1 join formulation this replaced paid ~20 tiny-stage
    * launches (measured 5.5 s -> 0.x s at sf0.1; per-group state is
    * k^2 doubles — the typed-API exception a result-bounded frame
    * justifies). Determinism: rel/sim are the shared codegen'd
    * dot/norm fragments (unrounded until output); the in-group argmax
    * compares the same IEEE doubles the SQL replay compares, ties on
    * lowest id — the oracle unrolls the identical selection as
    * generated CTEs.
    */
  def mmrDiversify(embeddings: DataFrame, maxQueryId: Long = 8,
                   kShort: Int = 10, kOut: Int = 5,
                   lambda: Double = 0.7): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = embeddings.select(col("vec_id").as("c_id"), col("embedding").as("ce"))
      .withColumn("cn", vec_norm(col("ce")))
    val queries = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .withColumn("qn", vec_norm(col("qe")))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("rel").desc, col("c_id"))
    val short = corpus.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .withColumn("rel", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= kShort)
      .select(col("q_id"), col("c_id"), col("rel"), col("ce"), col("cn"))
      .localCheckpoint(eager = false)
    val a = short.select(col("q_id"), col("c_id").as("a_id"),
                         col("ce").as("ae"), col("cn").as("an"))
    val b = short.select(col("q_id"), col("c_id").as("b_id"),
                         col("ce").as("be"), col("cn").as("bn"))
    val pair = a.join(b, Seq("q_id")).filter(col("a_id") =!= col("b_id"))
      .withColumn("sim", vec_dot(col("ae"), col("be")) / (col("an") * col("bn")))
      .select(col("q_id"), col("a_id"), col("b_id"), col("sim"))
    val cands = short.select(col("q_id"), col("c_id"), col("rel"))
      .as[(Long, Long, Double)].groupByKey(_._1)
    val sims = pair.as[(Long, Long, Long, Double)].groupByKey(_._1)
    cands.cogroup(sims) { (q, cs, ps) =>
      // candidates in (rel DESC, id ASC) order — position 0 IS pick 1
      val cand = cs.map { case (_, id, rel) => (id, rel) }.toArray
        .sortBy { case (id, rel) => (-rel, id) }
      if (cand.isEmpty) Iterator.empty
      else {
        val sim = ps.map { case (_, x, y, s) => (x, y) -> s }.toMap
        val picked = scala.collection.mutable.ArrayBuffer(cand(0))
        while (picked.length < math.min(kOut, cand.length)) {
          // argmax of lambda*rel - (1-lambda)*max sim-to-picked, ties
          // on lowest id — the same comparison the SQL replay makes
          var bestId = -1L; var bestRel = 0.0
          var bestScore = Double.NegativeInfinity
          for ((id, rel) <- cand if !picked.exists(_._1 == id)) {
            var ms = Double.NegativeInfinity
            for ((pid, _) <- picked) {
              val s = sim((id, pid))
              if (s > ms) ms = s
            }
            val score = lambda * rel - (1.0 - lambda) * ms
            if (score > bestScore || (score == bestScore && id < bestId)) {
              bestId = id; bestRel = rel; bestScore = score
            }
          }
          picked += ((bestId, bestRel))
        }
        picked.iterator.zipWithIndex.map { case ((id, rel), i) =>
          (q, (i + 1).toLong, id, rel)
        }
      }
    }.toDF("q_id", "step", "neighbor_id", "rel")
      .withColumn("rel", Rounding.roundN(col("rel"), 4))
      .orderBy(col("q_id"), col("step"))
  }

  def mmrDiversifyOracle(maxQueryId: Long = 8, kShort: Int = 10,
                         kOut: Int = 5, lambda: Double = 0.7): String = {
    val d = Dialect.duck
    val base =
      s"""c AS (SELECT vec_id AS c_id, embedding AS ce,
           ${normExpr(d, "embedding")} AS cn FROM embeddings),
       q AS (SELECT vec_id AS q_id, embedding AS qe,
           ${normExpr(d, "embedding")} AS qn FROM embeddings WHERE vec_id < $maxQueryId),
       short AS (SELECT q_id, c_id, rel, ce, cn FROM (
           SELECT q_id, c_id, ${dot(d, "qe", "ce")} / (qn * cn) AS rel, ce, cn,
             row_number() OVER (PARTITION BY q_id
               ORDER BY ${dot(d, "qe", "ce")} / (qn * cn) DESC, c_id) AS rn
           FROM c JOIN q ON q_id <> c_id) t
         WHERE rn <= $kShort),
       pair AS (SELECT s1.q_id, s1.c_id AS a_id, s2.c_id AS b_id,
           ${dot(d, "s1.ce", "s2.ce")} / (s1.cn * s2.cn) AS sim
         FROM short s1 JOIN short s2
           ON s1.q_id = s2.q_id AND s1.c_id <> s2.c_id),
       sel1 AS (SELECT q_id, c_id, rel, CAST(1 AS BIGINT) AS step FROM (
           SELECT q_id, c_id, rel,
             row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, c_id) AS rn
           FROM short) t WHERE rn = 1)"""
    val steps = (2 to kOut).map { t =>
      val selUnion = (1 until t).map(i => s"SELECT q_id, c_id FROM sel$i")
        .mkString(" UNION ALL ")
      s"""picked$t AS ($selUnion),
       ms$t AS (SELECT p.q_id, p.a_id AS c_id, max(p.sim) AS msim
         FROM pair p JOIN picked$t s ON s.q_id = p.q_id AND s.c_id = p.b_id
         GROUP BY 1, 2),
       sel$t AS (SELECT q_id, c_id, rel, CAST($t AS BIGINT) AS step FROM (
           SELECT r.q_id, r.c_id, r.rel,
             row_number() OVER (PARTITION BY r.q_id
               ORDER BY $lambda * r.rel - ${1.0 - lambda} * m.msim DESC, r.c_id) AS rn
           FROM short r
           JOIN ms$t m ON m.q_id = r.q_id AND m.c_id = r.c_id
           WHERE NOT EXISTS (SELECT 1 FROM picked$t s
             WHERE s.q_id = r.q_id AND s.c_id = r.c_id)) t
         WHERE rn = 1)"""
    }
    val allSel = (1 to kOut).map(i =>
      s"SELECT q_id, c_id, rel, step FROM sel$i").mkString(" UNION ALL ")
    s"""WITH $base,
       ${steps.mkString(",\n       ")}
       SELECT q_id, step, c_id AS neighbor_id, round(rel, 4) AS rel
       FROM ($allSel) u ORDER BY q_id, step"""
  }

  /** s15: HYBRID retrieval — lexical and vector ranks fused by
    * reciprocal rank fusion (Cormack, Clarke & Buettcher 2009:
    * `Σ_arms 1/(K + rank)`), the standard composition of a RAG
    * retrieval stack (BM25-family inverted index + dense ANN, fused
    * without score calibration because RRF only consumes RANKS).
    * documents and embeddings share the id space (doc_id == vec_id),
    * so each arm ranks the same corpus by its own modality:
    *
    *  - lexical: TF-IDF-weighted term overlap between the query doc
    *    and every corpus doc — `Σ_{t shared} tf_q·tf_c·idf(t)²`, the
    *    (q·d) inner product in TF-IDF space. Built on [[TextOps
    *    .tfFrame]] (the t10 persist point): the query side's terms
    *    probe the corpus postings on the term key — the INVERTED
    *    INDEX shape, cost = queries × postings touched, never
    *    corpus × corpus. The per-pair double sum is a term-sorted
    *    fold and the ranking key is the 6-dp-ROUNDED score (the t10
    *    ln-parity discipline).
    *
    *    IMPACT PRUNING (`probeDfBudgetFrac`): each query's terms are
    *    ordered by ascending df (most selective first — impact
    *    order) and kept only while the CUMULATIVE df stays within
    *    budget·n_docs — d14's dfCap discipline upgraded to the
    *    WAND-family budgeted probe. This guards the unbounded-hot-
    *    term hazard: without it a stopword-ish query term makes the
    *    probe corpus-sized (Σ_t df(t) has no bound), the one shape
    *    that cannot ride to 100 TB. A budget (vs a plain df cap) is
    *    the right guard for ANY corpus shape: it bounds postings
    *    touched per query at budget·n_docs EXACTLY, yet always
    *    admits the query's most selective terms — on a dense-vocab
    *    corpus (this testdata: 30 of 31 terms sit in ~78% of docs) a
    *    biting df cap would zero the arm, while the budget keeps it
    *    live. The prune is part of the operator's SEMANTICS (the
    *    oracle mirrors the same cumulative window), and the pruned-
    *    vs-unpruned fused-rank delta is measured LIVE in the spec,
    *    not assumed. idf weights join the (queries × terms)-sized
    *    probe side BEFORE the postings join, so the big join carries
    *    one pass, not two.
    *  - vector: exact cosine (the s01 baseline; any ANN row — s02,
    *    s03, s05, s12 — slots in unchanged, since RRF only reads
    *    ranks).
    *
    * Fusion runs on the two arms' top-`nArm` frames — result-bounded
    * (queries × nArm rows), never corpus-bounded — full-outer-joined
    * so an item surfaced by ONE modality keeps its contribution
    * (that asymmetry is the whole point: null arm ranks in the
    * output are the evidence each arm finds what the other misses).
    * RRF doubles are sums of two exact IEEE divisions on integer
    * ranks — bit-identical cross-engine, no rounding needed before
    * the fused rank.
    */
  /** The budget-pruned TF-IDF lexical arm (see [[hybridRrf]]'s
    * Scaladoc) — shared verbatim by the exact-arm and index-backed
    * hybrid forms so arm semantics cannot drift between them. */
  private def lexicalArm(documents: DataFrame, maxQueryId: Long,
                         nArm: Int, probeDfBudgetFrac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = TextOps.tfFrame(documents)
    val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val wBudget = Window.partitionBy(col("q_id"))
      .orderBy(col("df").asc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qw = tf.filter(col("doc_id") < maxQueryId)
      .select(col("doc_id").as("q_id"), col("term"), col("tf").as("tfq"))
      .join(dfr, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("cum_df", sum(col("df")).over(wBudget))
      .filter(col("cum_df").cast("double") <=
        lit(probeDfBudgetFrac) * col("n_docs").cast("double"))
      .withColumn("idf", log(col("n_docs") / col("df")))
      .select(col("q_id"), col("term"), col("tfq"), col("idf"))
    val wLex = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(qw, Seq("term")).filter(col("doc_id") =!= col("q_id"))
      .withColumn("contrib",
        (col("tfq") * col("tf")).cast("double") * col("idf") * col("idf"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(collect_list(struct(col("term"), col("contrib"))).as("cs"))
      .withColumn("score", Rounding.roundN(
        expr("""aggregate(array_sort(cs), CAST(0 AS DOUBLE),
                 (acc, s) -> acc + s.contrib)"""), 6))
      // explicit prune: the term-contribution array must not ride the
      // rank shuffle (measured ~10% of the arm at sf0.1)
      .select(col("q_id"), col("doc_id"), col("score"))
      // long lex_rank on every lexical arm (matches LexIndex.probe)
      .withColumn("lex_rank", row_number().over(wLex).cast("long"))
      .filter(col("lex_rank") <= nArm)
      .select(col("q_id"), col("doc_id"), col("lex_rank"))
  }

  /** The exact-cosine vector arm (the s01 shape over the shared id
    * space) — factored out so the TF-IDF (s15) and BM25 (s23) hybrids
    * fuse against the IDENTICAL vector ranking. */
  private def exactVecArm(embeddings: DataFrame, maxQueryId: Long,
                          nArm: Int): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val corpus = embeddings.select(col("vec_id").as("doc_id"), col("embedding").as("ce"))
      .withColumn("cn", vec_norm(col("ce")))
    val queries = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .withColumn("qn", vec_norm(col("qe")))
    val wVec = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("doc_id"))
    corpus.join(broadcast(queries), col("q_id") =!= col("doc_id"))
      .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("vec_rank", row_number().over(wVec))
      .filter(col("vec_rank") <= nArm)
      .select(col("q_id"), col("doc_id"), col("vec_rank"))
  }

  def hybridRrf(documents: DataFrame, embeddings: DataFrame,
                maxQueryId: Long = 8, nArm: Int = 20, kOut: Int = 10,
                rrfK: Int = 60, probeDfBudgetFrac: Double = 2.0): DataFrame = {
    // lexical arm: query-term postings probe the tf persist point,
    // budget-pruned (impact order) and idf-weighted on the SMALL side
    val lex = lexicalArm(documents, maxQueryId, nArm, probeDfBudgetFrac)
    val vec = exactVecArm(embeddings, maxQueryId, nArm)
    rrfFusion(lex, vec, kOut, rrfK)
  }

  /** RRF fusion core shared by every vector-arm provider: both arms
    * are (q_id, doc_id, rank) frames bounded at queries × nArm, so
    * the full-outer join and final rank are result-bounded regardless
    * of which retrieval produced them — which is precisely why any
    * ANN row can slot in for the exact arm. */
  private def rrfFusion(lex: DataFrame, vec: DataFrame,
                        kOut: Int, rrfK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wF = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    lex.join(vec, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")), lit(0.0)))
      .withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= kOut)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("doc_id"),
              Rounding.roundN(col("rrf"), 5).as("rrf"),
              col("lex_rank").cast("long").as("lex_rank"),
              col("vec_rank").cast("long").as("vec_rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Hybrid RRF with the vector arm served by a PERSISTED
    * [[VecIndex]] — the RAG stack composed end-to-end on the index
    * (build once, probe per query batch) instead of the exact
    * O(N·Q) broadcast scan. The lexical arm, probe budget, and
    * fusion are byte-identical to [[hybridRrf]]; only the vector
    * arm's provider changes, and RRF consumes nothing but its RANKS,
    * so the fused schema and bounds are unchanged. The exact-arm
    * form stays the `queries`/oracle row (ANN recall is an operating
    * point, not an oracle); the spec measures the fused overlap
    * between the two forms live.
    *
    * At 100 TB this is the shape that actually runs: the probe opens
    * nProbe cell dirs per query (dir-pruned IO against the persisted
    * layout) while the lexical arm probes df-budgeted postings — two
    * index lookups and a result-bounded fusion, no corpus scan
    * anywhere. */
  def hybridRrfIndexed(spark: org.apache.spark.sql.SparkSession, documents: DataFrame,
                       embeddings: DataFrame, indexRoot: String,
                       maxQueryId: Long = 8, nArm: Int = 20, kOut: Int = 10,
                       rrfK: Int = 60, probeDfBudgetFrac: Double = 2.0,
                       nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id"), col("embedding"))
    // the query vector lives in the index too — probe one deeper,
    // drop self, close the rank gap
    val probed = VecIndex.probe(spark, indexRoot, queries,
        k = nArm + 1, nProbe = nProbe)
      .filter(col("neighbor_id") =!= col("q_id"))
    val wRerank = Window.partitionBy(col("q_id")).orderBy(col("rank").asc)
    val vecArm = probed
      .withColumn("vec_rank", row_number().over(wRerank))
      .filter(col("vec_rank") <= nArm)
      .select(col("q_id"), col("neighbor_id").as("doc_id"), col("vec_rank"))
    val lex = lexicalArm(documents, maxQueryId, nArm, probeDfBudgetFrac)
    rrfFusion(lex, vecArm, kOut, rrfK)
  }

  /** The s15 lexical-arm CTE chain (tokenize → tf → df → budgeted
    * probe-term selection → TF-IDF pair scores → top-nArm rank),
    * ending in `lex(q_id, doc_id, lex_rank)` — shared by the
    * exact-arm (s15) and index-backed (s18) hybrid oracles so the
    * arm's SQL replay cannot drift between them. */
  private def lexicalArmCtes(maxQueryId: Long, nArm: Int,
                             probeDfBudgetFrac: Double): String =
    s"""toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
           FROM documents),
       f AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM f GROUP BY doc_id, term),
       dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       n AS (SELECT count(*) AS n_docs FROM documents),
       qsel AS (SELECT q_id, term, tfq, df, n_docs,
           sum(df) OVER (PARTITION BY q_id ORDER BY df, term
             ROWS UNBOUNDED PRECEDING) AS cum_df
         FROM (SELECT doc_id AS q_id, term, tf AS tfq FROM tf
               WHERE doc_id < $maxQueryId) q
         JOIN dfr USING (term) CROSS JOIN n),
       qw AS (SELECT q_id, term, tfq,
           ln(n_docs / CAST(df AS DOUBLE)) AS idf
         FROM qsel
         WHERE CAST(cum_df AS DOUBLE) <= $probeDfBudgetFrac * CAST(n_docs AS DOUBLE)),
       contrib AS (SELECT q.q_id, t.doc_id, t.term,
           CAST(q.tfq * t.tf AS DOUBLE) * q.idf * q.idf AS contrib
         FROM tf t
         JOIN qw q USING (term)
         WHERE t.doc_id <> q.q_id),
       lexs AS (SELECT q_id, doc_id,
           round(list_reduce(list(contrib ORDER BY term),
             (acc, v) -> acc + v), 6) AS score
         FROM contrib GROUP BY q_id, doc_id),
       lex AS (SELECT q_id, doc_id, lex_rank FROM (
           SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
             ORDER BY score DESC, doc_id) AS lex_rank FROM lexs) t
         WHERE lex_rank <= $nArm)"""

  /** The RRF fusion + output CTE tail shared by the s15 and s18
    * oracles — consumes `lex(q_id, doc_id, lex_rank)` and
    * `vec(q_id, doc_id, vec_rank)`. */
  private def rrfFusionSql(kOut: Int, rrfK: Int): String =
    s"""fused AS (SELECT coalesce(l.q_id, v.q_id) AS q_id,
           coalesce(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank
         FROM lex l FULL JOIN vec v
           ON l.q_id = v.q_id AND l.doc_id = v.doc_id),
       rrfscored AS (SELECT q_id, doc_id, lex_rank, vec_rank,
           coalesce(CAST(1 AS DOUBLE) / ($rrfK + lex_rank), CAST(0 AS DOUBLE))
             + coalesce(CAST(1 AS DOUBLE) / ($rrfK + vec_rank), CAST(0 AS DOUBLE)) AS rrf
         FROM fused),
       rrfranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
           ORDER BY rrf DESC, doc_id) AS rank FROM rrfscored)
       SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id,
         round(rrf, 5) AS rrf, CAST(lex_rank AS BIGINT) AS lex_rank,
         CAST(vec_rank AS BIGINT) AS vec_rank
       FROM rrfranked WHERE rank <= $kOut ORDER BY q_id, rank"""

  /** The exact-cosine vector-arm CTE tail, ending in
    * `vec(q_id, doc_id, vec_rank)` — shared by the s15 and s23
    * oracles, the SQL twin of [[exactVecArm]]. */
  private def vecArmCtes(maxQueryId: Long, nArm: Int): String = {
    val d = Dialect.duck
    s"""c AS (SELECT vec_id AS doc_id, embedding AS ce,
           ${normExpr(d, "embedding")} AS cn FROM embeddings),
       q AS (SELECT vec_id AS q_id, embedding AS qe,
           ${normExpr(d, "embedding")} AS qn FROM embeddings
         WHERE vec_id < $maxQueryId),
       vec AS (SELECT q_id, doc_id, vec_rank FROM (
           SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
             ORDER BY ${dot(d, "qe", "ce")} / (qn * cn) DESC, doc_id) AS vec_rank
           FROM c JOIN q ON q_id <> doc_id) t
         WHERE vec_rank <= $nArm)"""
  }

  def hybridRrfOracle(maxQueryId: Long = 8, nArm: Int = 20, kOut: Int = 10,
                      rrfK: Int = 60, probeDfBudgetFrac: Double = 2.0): String =
    s"""WITH ${lexicalArmCtes(maxQueryId, nArm, probeDfBudgetFrac)},
       ${vecArmCtes(maxQueryId, nArm)},
       ${rrfFusionSql(kOut, rrfK)}"""

  // ---- s23: BM25 lexical arm ------------------------------------------

  /** s23: the hybrid stack with the lexical arm upgraded from raw
    * TF-IDF inner product to BM25 (Robertson & Walker 1994; the
    * Okapi/Lucene form every production lexical index actually
    * ships). Same tf/df persist points, same impact-ordered df-budget
    * probe, same RRF fusion and exact vector arm as s15 — ONLY the
    * per-(term, doc) contribution changes:
    *
    *   idf_t  = ln(1 + (N - df + 0.5)/(df + 0.5))   (Lucene: >0 always)
    *   w_t,d  = idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) · tfq
    *
    * vs TF-IDF's `tfq·tf·idf²`. The two properties that make BM25 the
    * production choice are both SATURATIONS, spec-measured live:
    * term-frequency saturation (contribution is concave in tf with
    * asymptote idf·(k1+1)·tfq — a 1000-repetition spam term cannot
    * dominate a ranking the way TF-IDF's linear tf lets it) and
    * length normalization (the b·dl/avgdl penalty stops long docs
    * winning on bulk). At 100 TB the plan prices identically to s15:
    * the postings join is the same inverted-index probe, dl is one
    * extra doc-keyed agg off the SAME tf frame (hint-free join — AQE
    * broadcasts it when it fits), avgdl one scalar. Parity
    * discipline: per-pair sum
    * is a term-sorted fold rounded to 6 dp (the t10 ln-parity rule);
    * every division is double-typed in both engines.
    */
  private[graft] def bm25Arm(documents: DataFrame, maxQueryId: Long, nArm: Int,
                             probeDfBudgetFrac: Double, k1: Double, b: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = TextOps.tfFrame(documents)
    val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    // doc length + corpus average off the SAME tf persist point
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val avg = dl.agg((sum(col("dl")).cast("double") /
      count(lit(1)).cast("double")).as("avgdl"))
    val wBudget = Window.partitionBy(col("q_id"))
      .orderBy(col("df").asc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qw = tf.filter(col("doc_id") < maxQueryId)
      .select(col("doc_id").as("q_id"), col("term"), col("tf").as("tfq"))
      .join(dfr, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("cum_df", sum(col("df")).over(wBudget))
      .filter(col("cum_df").cast("double") <=
        lit(probeDfBudgetFrac) * col("n_docs").cast("double"))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))))
      .select(col("q_id"), col("term"), col("tfq"), col("idf"))
    val wLex = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("doc_id"))
    // dl is corpus-sized (one row per doc) — hint-free, the d10 rule:
    // AQE broadcasts it from its real size exactly when it fits
    tf.join(qw, Seq("term")).filter(col("doc_id") =!= col("q_id"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(avg))
      .withColumn("contrib",
        col("idf") *
        (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))) *
        col("tfq").cast("double"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(collect_list(struct(col("term"), col("contrib"))).as("cs"))
      .withColumn("score", Rounding.roundN(
        expr("""aggregate(array_sort(cs), CAST(0 AS DOUBLE),
                 (acc, s) -> acc + s.contrib)"""), 6))
      .select(col("q_id"), col("doc_id"), col("score"))
      // long lex_rank on every lexical arm (matches LexIndex.probe)
      .withColumn("lex_rank", row_number().over(wLex).cast("long"))
      .filter(col("lex_rank") <= nArm)
      .select(col("q_id"), col("doc_id"), col("lex_rank"))
  }

  def hybridBm25(documents: DataFrame, embeddings: DataFrame,
                 maxQueryId: Long = 8, nArm: Int = 20, kOut: Int = 10,
                 rrfK: Int = 60, probeDfBudgetFrac: Double = 2.0,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val lex = bm25Arm(documents, maxQueryId, nArm, probeDfBudgetFrac, k1, b)
    val vec = exactVecArm(embeddings, maxQueryId, nArm)
    rrfFusion(lex, vec, kOut, rrfK)
  }

  /** The BM25 arm's CTE chain, ending in `lex(q_id, doc_id,
    * lex_rank)` — the SQL twin of [[bm25Arm]], sharing the tokenize/
    * tf/df/budget CTE text with [[lexicalArmCtes]]'s head. */
  private def bm25ArmCtes(maxQueryId: Long, nArm: Int,
                          probeDfBudgetFrac: Double,
                          k1: Double, b: Double): String =
    s"""toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
           FROM documents),
       f AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM f GROUP BY doc_id, term),
       dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       n AS (SELECT count(*) AS n_docs FROM documents),
       dls AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
       avgl AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS avgdl FROM dls),
       qsel AS (SELECT q_id, term, tfq, df, n_docs,
           sum(df) OVER (PARTITION BY q_id ORDER BY df, term
             ROWS UNBOUNDED PRECEDING) AS cum_df
         FROM (SELECT doc_id AS q_id, term, tf AS tfq FROM tf
               WHERE doc_id < $maxQueryId) q
         JOIN dfr USING (term) CROSS JOIN n),
       qw AS (SELECT q_id, term, tfq,
           ln(1 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                / (CAST(df AS DOUBLE) + 0.5)) AS idf
         FROM qsel
         WHERE CAST(cum_df AS DOUBLE) <= $probeDfBudgetFrac * CAST(n_docs AS DOUBLE)),
       contrib AS (SELECT q.q_id, t.doc_id, t.term,
           q.idf * (CAST(t.tf AS DOUBLE) * ${k1 + 1.0})
             / (CAST(t.tf AS DOUBLE) + $k1 *
                ((1.0 - $b) + $b * CAST(d.dl AS DOUBLE) / a.avgdl))
             * CAST(q.tfq AS DOUBLE) AS contrib
         FROM tf t
         JOIN qw q USING (term)
         JOIN dls d ON t.doc_id = d.doc_id
         CROSS JOIN avgl a
         WHERE t.doc_id <> q.q_id),
       lexs AS (SELECT q_id, doc_id,
           round(list_reduce(list(contrib ORDER BY term),
             (acc, v) -> acc + v), 6) AS score
         FROM contrib GROUP BY q_id, doc_id),
       lex AS (SELECT q_id, doc_id, lex_rank FROM (
           SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
             ORDER BY score DESC, doc_id) AS lex_rank FROM lexs) t
         WHERE lex_rank <= $nArm)"""

  def hybridBm25Oracle(maxQueryId: Long = 8, nArm: Int = 20, kOut: Int = 10,
                       rrfK: Int = 60, probeDfBudgetFrac: Double = 2.0,
                       k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH ${bm25ArmCtes(maxQueryId, nArm, probeDfBudgetFrac, k1, b)},
       ${vecArmCtes(maxQueryId, nArm)},
       ${rrfFusionSql(kOut, rrfK)}"""

  /** s18: [[hybridRrfIndexed]] with the index lifecycle managed the
    * s12 way — the IVF index is built ONCE per corpus into a temp
    * root (bounded cache keyed on the scan stamp; uncacheable frames
    * get an ephemeral index torn down after materialization) and the
    * fused retrieval probes it. This is the hybrid row a user
    * actually runs: both arms are index probes (df-budgeted postings
    * + dir-pruned cells), no corpus scan in the query path, and the
    * whole composition is DuckDB-oracle-checked
    * ([[hybridRrfIndexedOracle]] replays assignment, probing,
    * ranking and fusion relationally). */
  def hybridRrfIndexedAuto(documents: DataFrame, embeddings: DataFrame,
                           maxQueryId: Long = 8, nArm: Int = 20,
                           kOut: Int = 10, rrfK: Int = 60,
                           probeDfBudgetFrac: Double = 2.0,
                           nProbe: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    def buildTemp(): String = {
      val root = java.nio.file.Files.createTempDirectory("graft-vecidx-s18").toString
      VecIndex.build(spark, root,
        embeddings.select(col("vec_id"), col("embedding")))
      root
    }
    // cache key component -1 = "full-corpus index" (s12's keys carry
    // its batchMod, so the two families can never collide)
    val (root, ephemeral) =
      if (!Caching.bareScan(embeddings)) (buildTemp(), true)
      else {
        val stamp = Caching.stamp(embeddings)
        if (stamp.isEmpty) (buildTemp(), true)
        else (vecIndexCache.getOrElseUpdate((spark, stamp, -1))(buildTemp()), false)
      }
    val res = hybridRrfIndexed(spark, documents, embeddings, root,
      maxQueryId, nArm, kOut, rrfK, probeDfBudgetFrac, nProbe)
    if (ephemeral) {
      val out = res.localCheckpoint()
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      catch { case _: Exception => () }
      out
    } else res
  }

  /** s18 oracle: the same lexical arm + fusion as s15's, with the
    * vector arm replayed through the IVF index relationally —
    * corpus top-1 cell assignment, query top-nProbe probing, cosine
    * rank over the probed cells' members (self excluded). The
    * persisted-index path must equal this from-scratch relational
    * computation exactly (the s12 discipline applied to the fused
    * query). */
  /** The IVF-probed vector-arm CTE tail (corpus top-1 assignment,
    * query top-nProbe probing, cosine rank, self excluded), ending in
    * `vec(q_id, doc_id, vec_rank)` — shared by the s18 and s24
    * oracles so the index replay cannot drift between them. */
  private def ivfVecArmCtes(maxQueryId: Long, nArm: Int, nProbe: Int): String = {
    val d = Dialect.duck
    s"""$assignedCtes,
       qprobe AS (SELECT vec_id AS q_id, embedding AS qe,
           ${normExpr(d, "embedding")} AS qn, cent_id AS cell
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn
               FROM scoredc WHERE vec_id < $maxQueryId) t
         WHERE crn <= $nProbe),
       vscored AS (SELECT q.q_id, c.vec_id AS doc_id,
           ${dot(d, "q.qe", "c.embedding")} / (q.qn * c.nrm) AS cos
         FROM assigned c JOIN qprobe q ON q.cell = c.cell
         WHERE q.q_id <> c.vec_id),
       vec AS (SELECT q_id, doc_id, vec_rank FROM (
           SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
             ORDER BY cos DESC, doc_id) AS vec_rank FROM vscored) t
         WHERE vec_rank <= $nArm)"""
  }

  def hybridRrfIndexedOracle(maxQueryId: Long = 8, nArm: Int = 20,
                             kOut: Int = 10, rrfK: Int = 60,
                             probeDfBudgetFrac: Double = 2.0,
                             nProbe: Int = 2): String =
    s"""WITH ${lexicalArmCtes(maxQueryId, nArm, probeDfBudgetFrac)},
       ${ivfVecArmCtes(maxQueryId, nArm, nProbe)},
       ${rrfFusionSql(kOut, rrfK)}"""

  // ---- s24: fully index-backed BM25 hybrid ----------------------------

  /** s24: the hybrid stack with BOTH arms served by PERSISTED
    * indexes — [[LexIndex]] postings/stats/doclens for the BM25
    * lexical arm, [[VecIndex]] cell dirs for the vector arm — the
    * composition a production RAG deployment actually runs: two
    * dir-pruned index probes and a result-bounded fusion, the corpus
    * scanned by NEITHER arm at query time (s18 still recomputed its
    * lexical postings from the corpus; s24 retires that last scan).
    * Probe scores are bit-identical to the from-scratch s23 arm
    * (LexIndex's central contract), so the oracle is the same BM25
    * SQL with the vector arm replayed through the IVF structure —
    * the s12 discipline applied to the whole fused query. */
  def hybridBm25Indexed(spark: org.apache.spark.sql.SparkSession,
                        documents: DataFrame, embeddings: DataFrame,
                        lexRoot: String, vecRoot: String,
                        maxQueryId: Long = 8, nArm: Int = 20, kOut: Int = 10,
                        rrfK: Int = 60, probeDfBudgetFrac: Double = 2.0,
                        k1: Double = 1.2, b: Double = 0.75,
                        nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = LexIndex.probe(spark, lexRoot,
      documents.filter(col("doc_id") < maxQueryId),
      nArm, probeDfBudgetFrac, k1, b)
    val queries = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id"), col("embedding"))
    val probed = VecIndex.probe(spark, vecRoot, queries,
        k = nArm + 1, nProbe = nProbe)
      .filter(col("neighbor_id") =!= col("q_id"))
    val wRerank = Window.partitionBy(col("q_id")).orderBy(col("rank").asc)
    val vecArm = probed
      .withColumn("vec_rank", row_number().over(wRerank))
      .filter(col("vec_rank") <= nArm)
      .select(col("q_id"), col("neighbor_id").as("doc_id"), col("vec_rank"))
    rrfFusion(lex, vecArm, kOut, rrfK)
  }

  /** [[hybridBm25Indexed]] with both index lifecycles managed the s18
    * way: each index is built ONCE per corpus into a temp root
    * (bounded caches keyed on the scan stamps; uncacheable frames get
    * ephemeral indexes torn down after materialization). */
  def hybridBm25IndexedAuto(documents: DataFrame, embeddings: DataFrame,
                            maxQueryId: Long = 8, nArm: Int = 20,
                            kOut: Int = 10, rrfK: Int = 60,
                            probeDfBudgetFrac: Double = 2.0,
                            k1: Double = 1.2, b: Double = 0.75,
                            nProbe: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    def buildVec(): String = {
      val root = java.nio.file.Files.createTempDirectory("graft-vecidx-s24").toString
      VecIndex.build(spark, root,
        embeddings.select(col("vec_id"), col("embedding")))
      root
    }
    def buildLex(): String = {
      val root = java.nio.file.Files.createTempDirectory("graft-lexidx-s24").toString
      LexIndex.build(spark, root, documents)
      root
    }
    def rootFor(df: DataFrame, cache: Caching.BoundedCache[
        (org.apache.spark.sql.SparkSession, String, Int), String],
        key: Int, build: () => String): (String, Boolean) =
      if (!Caching.bareScan(df)) (build(), true)
      else {
        val stamp = Caching.stamp(df)
        if (stamp.isEmpty) (build(), true)
        else (cache.getOrElseUpdate((spark, stamp, key))(build()), false)
      }
    // vec cache key -2: "s24 full-corpus" — disjoint from s12's
    // batchMod keys and s18's -1 (same cache, never a collision)
    val (vroot, vEphemeral) = rootFor(embeddings, vecIndexCache, -2, buildVec _)
    val (lroot, lEphemeral) = rootFor(documents, lexIndexCache, 0, buildLex _)
    val res = hybridBm25Indexed(spark, documents, embeddings, lroot, vroot,
      maxQueryId, nArm, kOut, rrfK, probeDfBudgetFrac, k1, b, nProbe)
    if (vEphemeral || lEphemeral) {
      val out = res.localCheckpoint()
      for ((eph, r) <- Seq(vEphemeral -> vroot, lEphemeral -> lroot) if eph)
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
        catch { case _: Exception => () }
      out
    } else res
  }

  /** s26: phrase-constrained BM25 with the index lifecycle managed the
    * s24 way — ONE LexIndex build per corpus serves s24's fused probe
    * AND this phrase probe (same cache key: the positional payload is
    * part of every build). The query set and BM25 parameters are
    * s23/s24's, so the three rows measure one retrieval stack. */
  def phraseBm25Auto(documents: DataFrame, maxQueryId: Long = 8,
                     nArm: Int = 20, probeDfBudgetFrac: Double = 2.0,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = documents.sparkSession
    def buildLex(): String = {
      val root = java.nio.file.Files.createTempDirectory("graft-lexidx-s26").toString
      LexIndex.build(spark, root, documents)
      root
    }
    val (root, ephemeral) =
      if (!Caching.bareScan(documents)) (buildLex(), true)
      else {
        val stamp = Caching.stamp(documents)
        if (stamp.isEmpty) (buildLex(), true)
        else (lexIndexCache.getOrElseUpdate((spark, stamp, 0))(buildLex()), false)
      }
    val res = LexIndex.probePhrase(spark, root,
      documents.filter(col("doc_id") < maxQueryId),
      nArm, probeDfBudgetFrac, k1, b)
      .orderBy(col("q_id"), col("lex_rank"))
    if (ephemeral) {
      val out = res.localCheckpoint()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      out
    } else res
  }

  /** s26 oracle: s23's BM25 CTE chain, with the candidate set
    * restricted to docs containing the query's two-token prefix
    * ADJACENTLY (raw-split positions, p2 = p1 + 1) before the re-rank
    * — the positional-postings semantics replayed relationally. */
  def phraseBm25Oracle(maxQueryId: Long = 8, nArm: Int = 20,
                       probeDfBudgetFrac: Double = 2.0,
                       k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH ${bm25ArmCtes(maxQueryId, nArm, probeDfBudgetFrac, k1, b)},
       tdocs AS (SELECT doc_id, string_split(lower(text), ' ') AS tks
           FROM documents),
       praw AS (SELECT doc_id, unnest(generate_series(1, len(tks))) AS p, tks
           FROM tdocs),
       ptok AS (SELECT doc_id, tks[p] AS term, p FROM praw
           WHERE length(tks[p]) > 0),
       qph AS (SELECT doc_id AS q_id, tne[1] AS t1, tne[2] AS t2
         FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                 x -> length(x) > 0) AS tne
               FROM documents WHERE doc_id < $maxQueryId) t
         WHERE len(tne) >= 2),
       pmatch AS (SELECT DISTINCT qp.q_id, a.doc_id
         FROM qph qp
         JOIN ptok a ON a.term = qp.t1
         JOIN ptok b2 ON b2.doc_id = a.doc_id AND b2.term = qp.t2
           AND b2.p = a.p + 1
         WHERE a.doc_id <> qp.q_id)
       SELECT q_id, doc_id, CAST(lex_rank AS BIGINT) AS lex_rank
       FROM (SELECT s.q_id, s.doc_id, row_number() OVER (PARTITION BY s.q_id
               ORDER BY s.score DESC, s.doc_id) AS lex_rank
             FROM lexs s JOIN pmatch m
               ON s.q_id = m.q_id AND s.doc_id = m.doc_id) t
       WHERE lex_rank <= $nArm ORDER BY q_id, lex_rank"""

  /** st15 oracle: the streamed-ingest index must serve the SAME BM25
    * ranking as a from-scratch arm over the whole corpus — the CTE
    * text is s23's, only the projection changes (lexical ranks, no
    * fusion: the row under test is index maintenance, not retrieval
    * composition). */
  def streamLexIngestOracle(maxQueryId: Long = 8, nArm: Int = 20,
                            probeDfBudgetFrac: Double = 2.0,
                            k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH ${bm25ArmCtes(maxQueryId, nArm, probeDfBudgetFrac, k1, b)}
       SELECT q_id, doc_id, CAST(lex_rank AS BIGINT) AS lex_rank
       FROM lex ORDER BY q_id, lex_rank"""

  def hybridBm25IndexedOracle(maxQueryId: Long = 8, nArm: Int = 20,
                              kOut: Int = 10, rrfK: Int = 60,
                              probeDfBudgetFrac: Double = 2.0,
                              k1: Double = 1.2, b: Double = 0.75,
                              nProbe: Int = 2): String =
    s"""WITH ${bm25ArmCtes(maxQueryId, nArm, probeDfBudgetFrac, k1, b)},
       ${ivfVecArmCtes(maxQueryId, nArm, nProbe)},
       ${rrfFusionSql(kOut, rrfK)}"""

  /** s13: RANGE (radius) search — all corpus vectors within a cosine
    * radius of each query, probed through the same IVF cell structure
    * as s05 (the reference's similarity surface has both shapes:
    * "top-k most similar" and "everything at least this similar" — a
    * near-dup audit window, a RAG relevance cutoff). The difference
    * from s05 is the REDUCTION: a threshold filter instead of a
    * per-query rank window, so the whole search after the cell
    * equi-join is a stateless codegen'd projection+filter — no
    * per-query shuffle, no window state at any scale; result size is
    * data-dependent (the caller's radius bounds it), not k-bounded.
    * Same honest recall bound as every IVF path: only probed cells'
    * members can be returned.
    */
  def ivfRangeSearch(embeddings: DataFrame, maxQueryId: Long = 8,
                     minCos: Double = 0.2, nProbe: Int = 2,
                     centIds: Seq[Long] = centroidIds): DataFrame = {
    import graft.functions.GraftFunctions._
    val corpus = assignedCells(embeddings, centIds)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"),
              col("nrm").as("cn"), col("cell"))
    val qprobe = probeCells(embeddings, maxQueryId, nProbe, centIds)
    corpus.join(broadcast(qprobe), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .filter(col("cos") >= minCos)
      .select(col("q_id"), col("c_id").as("neighbor_id"),
              Rounding.roundN(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("neighbor_id"))
  }

  def ivfRangeSearchOracle(maxQueryId: Long = 8, minCos: Double = 0.2,
                           nProbe: Int = 2): String = {
    val d = Dialect.duck
    s"""WITH $assignedCtes,
       qprobe AS (SELECT vec_id AS q_id, embedding AS qe,
           ${normExpr(d, "embedding")} AS qn, cent_id AS cell
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn
               FROM scoredc WHERE vec_id < $maxQueryId) t
         WHERE crn <= $nProbe)
       SELECT q_id, c_id AS neighbor_id, round(cos, 4) AS cos
       FROM (SELECT q.q_id, c.vec_id AS c_id,
           ${dot(d, "q.qe", "c.embedding")} / (q.qn * c.nrm) AS cos
         FROM assigned c JOIN qprobe q ON q.cell = c.cell
         WHERE q.q_id <> c.vec_id) s
       WHERE cos >= $minCos ORDER BY q_id, neighbor_id"""
  }

  /** s16: FILTERED ANN — top-k within a metadata predicate (here:
    * same `label` as the query — within-class nearest neighbors; any
    * pushdown-able predicate slots in), probed through the s05 cell
    * structure. This is the filtered-vector-search problem every RAG
    * store has to solve, and the shape matters: the predicate is
    * applied PRE-ranking, inside the probed cells, BEFORE any
    * distance arithmetic — so the k results are the k best ELIGIBLE
    * vectors, and ineligible members don't even pay the dot product
    * (Catalyst pushes the label equi-filter below the cos
    * projection). The naive POST-filter alternative (rank top-k, then
    * filter) silently returns FEWER than k whenever the unfiltered
    * top-k contains ineligible rows — the spec measures that loss
    * live on this corpus rather than assuming it.
    *
    * Scale: identical to s05 (cell equi-join, broadcast probe set)
    * plus one codegen'd integer comparison per candidate; selective
    * predicates SHRINK the ranked set. Recall caveat is s05's: only
    * probed cells' members are reachable.
    */
  def ivfFilteredTopK(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 3,
                      nProbe: Int = 2, centIds: Seq[Long] = centroidIds): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val corpus = assignedCells(embeddings, centIds)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"),
              col("nrm").as("cn"), col("cell"), col("label").as("clabel"))
    val qprobe = probeCells(embeddings, maxQueryId, nProbe, centIds)
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    corpus.join(broadcast(qprobe), Seq("cell"))
      .filter(col("q_id") =!= col("c_id") && col("clabel") === col("qlabel"))
      .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id").as("neighbor_id"),
              col("rank").cast("long").as("rank"),
              Rounding.roundN(col("cos"), 4).as("cos"), col("clabel").as("label"))
      .orderBy(col("q_id"), col("rank"))
  }

  def ivfFilteredTopKOracle(maxQueryId: Long = 8, k: Int = 3,
                            nProbe: Int = 2): String = {
    val d = Dialect.duck
    s"""WITH $assignedCtes,
       qprobe AS (SELECT vec_id AS q_id, embedding AS qe,
           ${normExpr(d, "embedding")} AS qn, cent_id AS cell
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn
               FROM scoredc WHERE vec_id < $maxQueryId) t
         WHERE crn <= $nProbe),
       scored AS (SELECT q.q_id, c.vec_id AS c_id, cl.label,
           ${dot(d, "q.qe", "c.embedding")} / (q.qn * c.nrm) AS cos
         FROM assigned c
         JOIN qprobe q ON q.cell = c.cell
         JOIN embeddings cl ON cl.vec_id = c.vec_id
         JOIN embeddings ql ON ql.vec_id = q.q_id
         WHERE q.q_id <> c.vec_id AND cl.label = ql.label),
       ranked AS (SELECT q_id, c_id, label, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos, label
       FROM ranked WHERE rank <= $k ORDER BY q_id, rank"""
  }

  def ivfMultiProbeOracle(maxQueryId: Long = 8, k: Int = 3, nProbe: Int = 2): String = {
    val d = Dialect.duck
    s"""WITH $assignedCtes,
       qprobe AS (SELECT vec_id AS q_id, embedding AS qe,
           ${normExpr(d, "embedding")} AS qn, cent_id AS cell
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn
               FROM scoredc WHERE vec_id < $maxQueryId) t
         WHERE crn <= $nProbe),
       scored AS (SELECT q.q_id, c.vec_id AS c_id,
           ${dot(d, "q.qe", "c.embedding")} / (q.qn * c.nrm) AS cos
         FROM assigned c JOIN qprobe q ON q.cell = c.cell
         WHERE q.q_id <> c.vec_id),
       ranked AS (SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos
       FROM ranked WHERE rank <= $k ORDER BY q_id, rank"""
  }

  /** s22: CENTRALITY over the kNN graph — PageRank on the s20 edge
    * set, the canonical-representative signal graph-based curation
    * derives from the graph it just built: the most central member of
    * a near-dup/similarity neighborhood is the natural keeper (the
    * quality-aware upgrade of d16's argmax, computed from structure
    * instead of a score), and the rank tail flags isolated/orphan
    * vectors whose neighborhoods are too thin to trust.
    *
    * The whole recursion runs in EXACT BIGINT micro-units so an
    * ITERATIVE GRAPH ALGORITHM sits under the full DuckDB hash gate
    * (the q50/st13 discipline applied to graphs): total mass 10¹²,
    * per-node seed S0 = 10¹² div N, and each round is
    * pr'(v) = (15·S0) div 100 + (85·Σ_{u→v} pr(u) div odeg(u)) div 100
    * — floor divisions and integer sums only, associative and
    * order-free, so Spark's partial aggs and DuckDB's serial fold
    * land bit-identical with NO rounding surface anywhere (doubles
    * appear nowhere). Damping 0.85, `iters` fixed rounds.
    *
    * Shape: the edge list (N·k rows — the s20 output, built once and
    * localCheckpointed) is the ONLY corpus-derived frame; each round
    * is one equi-join of edges to the current pr vector (both keyed
    * src) + one dst-keyed partial→final agg — k shuffles of an N·k
    * edge list for k rounds, never a vector or document anywhere in
    * the loop. At 100 TB the edge list is the persisted asset
    * (s12's index discipline) and each round is a bounded
    * edge-partitioned pass — the standard distributed-PageRank shape.
    */
  def knnPagerank(embeddings: DataFrame, k: Int = 3, nProbe: Int = 2,
                  iters: Int = 5): DataFrame = {
    val Mass = 1000000000000L
    val rawEdges = knnJoin(embeddings, k, nProbe)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    // out-degree DENORMALIZED onto each edge before the one checkpoint:
    // the round-13 shape joined a separate outdeg frame back in every
    // iteration — one whole join per round for a value that is a pure
    // function of the (immutable) edge set
    // every checkpoint in the loop is LAZY: plans stay flat (each
    // round reads the previous round's LogicalRDD, never a growing
    // join tree) but materialization happens inside the NEXT consumer
    // instead of a dedicated job per round — the 5-round recursion +
    // rank runs as ONE job chain, not 7 sequential job launches whose
    // scheduling latency dominated the row at bench scale
    val edges = rawEdges
      .withColumn("odeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint(eager = false)
    val nodes = embeddings.select(col("vec_id"))
    val s0 = nodes.agg(count(lit(1)).as("n"))
      .select(expr(s"$Mass div n").as("s0"))
    // the per-iteration base (every node × the teleport share) is
    // iteration-invariant — materialize it once, not once per round
    val base = nodes.crossJoin(broadcast(s0))
      .select(col("vec_id"), col("s0")).localCheckpoint(eager = false)
    var pr = base.select(col("vec_id"), col("s0").as("pr"))
    for (_ <- 1 to iters) {
      val sums = edges
        .join(pr.withColumnRenamed("vec_id", "src"), Seq("src"))
        .select(col("dst"), expr("pr div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      pr = base
        .join(sums.withColumnRenamed("dst", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"),
                (expr("(15 * s0) div 100") +
                 expr("(85 * coalesce(m, cast(0 as bigint))) div 100")).as("pr"))
        .localCheckpoint(eager = false)
    }
    // global centrality rank WITHOUT a single-partition sort: the
    // pr frame is corpus-sized, so the rank rides q47's
    // range-partitioned withGlobalRank (ascending order key, hence
    // the negated pr; pr is non-negative so -pr is safe)
    Relational.withGlobalRank(
        pr.withColumn("npr", -col("pr")), "npr", "vec_id", "rank")
      .select(col("vec_id"), col("pr").as("pr_units"), col("rank"))
      .orderBy(col("rank"))
  }

  def knnPagerankOracle(k: Int = 3, nProbe: Int = 2, iters: Int = 5): String = {
    val ctes = new StringBuilder(
      s"""${knnCtes(nProbe)},
       edges AS (SELECT q_id AS src, c_id AS dst FROM ranked WHERE rank <= $k),
       deg AS (SELECT src, CAST(count(*) AS BIGINT) AS odeg FROM edges GROUP BY src),
       sc AS (SELECT CAST(1000000000000 // count(*) AS BIGINT) AS s0 FROM embeddings),
       p0 AS (SELECT e.vec_id, sc.s0 AS pr FROM embeddings e CROSS JOIN sc)""")
    for (t <- 1 to iters) {
      ctes.append(s""",
       m$t AS (SELECT e.dst AS vec_id, CAST(sum(p.pr // d.odeg) AS BIGINT) AS m
         FROM edges e JOIN deg d ON e.src = d.src
         JOIN p${t - 1} p ON p.vec_id = e.src
         GROUP BY e.dst),
       p$t AS (SELECT b.vec_id,
           ((15 * sc.s0) // 100) + ((85 * coalesce(m.m, 0)) // 100) AS pr
         FROM (SELECT vec_id FROM embeddings) b CROSS JOIN sc
         LEFT JOIN m$t m USING (vec_id))""")
    }
    s"""WITH $ctes
       SELECT vec_id, CAST(pr AS BIGINT) AS pr_units,
         CAST(row_number() OVER (ORDER BY pr DESC, vec_id) AS BIGINT) AS rank
       FROM p$iters ORDER BY rank"""
  }

  /** Squared-L2 distance via the parity-pinned dot folds:
    * |a−b|² = (a·a + b·b) − 2·a·b, with IDENTICAL parenthesization on
    * both engines so every double op replays bit-for-bit (each dot is
    * the left-to-right fold the file header documents). */
  private def l2sq(d: Dialect, a: String, b: String): String =
    s"((${dot(d, a, a)} + ${dot(d, b, b)}) - (2.0 * ${dot(d, a, b)}))"

  /** s21: k-CENTER SEEDING (farthest-first traversal, Gonzalez 1985)
    * — the deterministic center-selection step UPSTREAM of the whole
    * IVF ladder, closing the index-training story end to end: s21
    * seeds the centers, s04 Lloyd-refines them, s11 trains the PQ
    * codebooks on the residuals. Farthest-first is the classic
    * 2-approximation of the k-center objective and the standard
    * deterministic stand-in for k-means++ (whose D² SAMPLING draw
    * cannot be replayed cross-engine; the farthest-point argmax can,
    * exactly): start from the lowest-id vector, then k−1 times pick
    * the corpus point FARTHEST from its nearest chosen center
    * (max-min distance, lowest-id tie-break). The selection distance
    * at step r IS the cover radius before that center lands, so the
    * output doubles as the k-vs-radius curve an index planner reads.
    *
    * Shape: the running min-distance frame is corpus-sized and
    * localCheckpointed per round (flat plans, the t24 discipline);
    * each round is ONE map-side distance update against the 1-row
    * broadcast new center + ONE argmax aggregate — k·O(N) total work,
    * no shuffle of vectors anywhere (the argmax is a tiny all-to-one
    * agg of per-partition maxima). Distances are |a−b|² = (a·a + b·b)
    * − 2·a·b over the parity-pinned folds, so argmax comparisons and
    * `least` updates see bit-identical doubles on both engines; the
    * oracle unrolls the same recursion one CTE pair per round.
    * At 100 TB: seeding runs on a stride SAMPLE (the s11 trainer's
    * documented shape) — the loop itself is already sample-ready
    * since nothing in it depends on corpus completeness.
    */
  def kcenterSeed(embeddings: DataFrame, k: Int = 8): DataFrame = {
    import graft.functions.GraftFunctions._
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val seed = e.orderBy(col("vec_id")).limit(1).localCheckpoint()
    def d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (vec_dot(a, a) + vec_dot(b, b)) - (lit(2.0) * vec_dot(a, b))
    val picks = scala.collection.mutable.ArrayBuffer[DataFrame]()
    picks += seed.select(lit(1L).as("rank"), col("vec_id"), lit(0.0).as("radius"))
    var state = e.crossJoin(broadcast(seed.select(col("embedding").as("cemb"))))
      .select(col("vec_id"), col("embedding"),
              d2(col("embedding"), col("cemb")).as("md"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val best = state.orderBy(col("md").desc, col("vec_id")).limit(1)
        .localCheckpoint()
      picks += best.select(lit(r.toLong).as("rank"), col("vec_id"),
                           Rounding.roundN(col("md"), 4).as("radius"))
      if (r < k)
        state = state.crossJoin(broadcast(best.select(col("embedding").as("cemb"))))
          .select(col("vec_id"), col("embedding"),
                  least(col("md"), d2(col("embedding"), col("cemb"))).as("md"))
          .localCheckpoint()
    }
    picks.reduce(_.unionByName(_)).orderBy(col("rank"))
  }

  /** The farthest-first CTE chain `e, c1, d1, …, ck` (pick r lives in
    * CTE `c_r`) — shared by the s21 oracle and the s25/s27 graph-walk
    * oracles (whose entry points are these seeds). `where` restricts
    * the seeded corpus (s27 seeds on the PRE-INGEST corpus). */
  private def kcenterCtes(k: Int, where: String = ""): String = {
    val d = Dialect.duck
    val ew = if (where.isEmpty) "" else s" WHERE $where"
    val ctes = new StringBuilder(
      s"""e AS (SELECT vec_id, embedding FROM embeddings$ew),
       c1 AS (SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1),
       d1 AS (SELECT e.vec_id, e.embedding,
           """ + l2sq(d, "e.embedding", "c.embedding") + """ AS md
         FROM e CROSS JOIN c1 c)""")
    for (r <- 2 to k) {
      ctes.append(s""",
       c$r AS (SELECT vec_id, embedding, md FROM d${r - 1}
               ORDER BY md DESC, vec_id LIMIT 1)""")
      if (r < k) ctes.append(s""",
       d$r AS (SELECT t.vec_id, t.embedding,
           least(t.md, ${l2sq(d, "t.embedding", "c.embedding")}) AS md
         FROM d${r - 1} t CROSS JOIN c$r c)""")
    }
    ctes.toString
  }

  def kcenterSeedOracle(k: Int = 8): String = {
    val out = (s"SELECT CAST(1 AS BIGINT) AS rank, vec_id, 0.0 AS radius FROM c1" +:
      (2 to k).map(r =>
        s"SELECT CAST($r AS BIGINT) AS rank, vec_id, round(md, 4) AS radius FROM c$r"))
      .mkString("\n       UNION ALL ")
    s"""WITH ${kcenterCtes(k)}
       $out ORDER BY rank"""
  }

  // ---- s25: graph-ANN beam search over the kNN graph -------------------

  /** Deterministic best-first BEAM WALK — the probe primitive of
    * graph-ANN indexes (HNSW/NSG's search loop, de-randomized so the
    * walk is oracle-able as an unrolled CTE chain): seed candidates
    * are exact-scored, the top-`beam` (cos desc, lowest-id tie-break)
    * form the frontier, and each hop expands the frontier's adjacency
    * lists via `expand`, exact-scores only the NEW nodes, and re-takes
    * the global top-`beam` of everything visited. Returns the VISITED
    * frame `(q_id, c_id, cos)` — callers rank it for top-k and/or
    * count it for the cost axis (visited = exactly the vectors whose
    * full embedding was read).
    *
    * Scale shape: every frame in the loop is bounded by queries ×
    * (seeds + hops·beam·graphK) — never the corpus. This inline arm
    * broadcast-joins each hop's candidate list into one pruned pass
    * over the corpus scan; `expand` decides how adjacency is fetched
    * (an in-memory edge frame here). [[GraphIndex.probe]] walks its
    * persisted NODE RECORDS through [[beamWalkRecords]] instead — the
    * 100 TB point-lookup shape. The walk is `hops` sequential bounded
    * stages — graph ANN trades the one-shot candidate volume of cell
    * probes for a handful of tiny lookups. */
  private[graft] def beamWalk(embeddings: DataFrame, maxQueryId: Long,
                              seedIds: DataFrame,
                              expand: DataFrame => DataFrame,
                              beam: Int, hops: Int): DataFrame = {
    val entry = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"))
      .crossJoin(broadcast(seedIds.select(col("c_id"))))
      .filter(col("c_id") =!= col("q_id"))
    beamWalkFrom(embeddings, maxQueryId, entry, expand, beam, hops)
  }

  /** [[beamWalk]] with the entry CANDIDATE PAIRS `(q_id, c_id)` given
    * explicitly instead of a global seed set crossed onto every query
    * — the [[graphHierWalk]] kernel, where each level's entry is the
    * PREVIOUS level's per-query best node (HNSW's descent), so the
    * entry is per-query by construction. Semantics past the entry are
    * identical to [[beamWalk]] (same scoring, frontier, tie-breaks). */
  private[graft] def beamWalkFrom(embeddings: DataFrame, maxQueryId: Long,
                                  entry: DataFrame,
                                  expand: DataFrame => DataFrame,
                                  beam: Int, hops: Int): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    lazy val corpus = embeddings.select(col("vec_id").as("c_id"),
        col("embedding").as("ce"))
      .withColumn("cn", vec_norm(col("ce")))
    val queries = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .withColumn("qn", vec_norm(col("qe")))
      .localCheckpoint()
    def score(cands: DataFrame): DataFrame =
      corpus.join(broadcast(cands), Seq("c_id"))
        .join(broadcast(queries), Seq("q_id"))
        .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
        .select(col("q_id"), col("c_id"), col("cos"))
    val wBeam = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    var visited = score(entry.select(col("q_id"), col("c_id"))).localCheckpoint()
    // EXPANSION-TRACKED best-first (HNSW's search loop, de-randomized):
    // each hop expands the top-beam UNEXPANDED visited nodes. Without
    // the tracking, the global top-beam stabilizes after a hop or two
    // and re-expands the same nodes — the walk stalls while paying for
    // the hops (measured live: hops 3/4 added ZERO visits across the
    // whole (gk, beam, hops) grid at n=20k before this fix).
    var expanded = visited.select(col("q_id"), col("c_id")).limit(0)
      .localCheckpoint()
    (1 to hops).foreach { _ =>
      val frontier = visited
        .join(expanded, Seq("q_id", "c_id"), "left_anti") // expand ONCE
        .withColumn("rn", row_number().over(wBeam))
        .filter(col("rn") <= beam).select(col("q_id"), col("c_id"))
        .localCheckpoint()
      val fresh = expand(frontier)
        .filter(col("c_id") =!= col("q_id")).distinct()
        .join(visited.select(col("q_id"), col("c_id")),
          Seq("q_id", "c_id"), "left_anti") // score each node ONCE
      // union of checkpointed frontiers: tiny and lineage-shallow, no
      // checkpoint needed
      expanded = expanded.unionByName(frontier)
      visited = visited.unionByName(score(fresh)).localCheckpoint()
    }
    visited
  }

  /** [[beamWalk]] over persisted NODE RECORDS — DiskANN's literal
    * serving layout, where a node's vector and its adjacency list are
    * ONE record, so each pass makes ONE bounded fetch that serves BOTH
    * the exact scores and the next hop's expansion (the two-table walk
    * paid an adjacency fetch + a vector fetch per hop; this halves the
    * per-hop round-trips, which at 100 TB is the latency of a probe).
    *
    * `fetchRecs` receives the pass's distinct candidate ids `(c_id)`
    * and returns their record FRAGMENTS `(c_id, ce, nbrs)` — exactly
    * one fragment per live id carries the vector (`ce` non-null);
    * reverse-edge fragments appended by [[GraphIndex.ingest]] carry
    * `ce` null and extra neighbors. The walk merges at read: scores
    * come from the vector-bearing fragment, adjacency is the exploded
    * union of every fragment's `nbrs`. `candFilter` drops candidate
    * `(q_id, c_id)` pairs before the fetch ([[GraphIndex.probe]]'s
    * graveyard anti-join). Visit semantics, scores, and tie-breaks are
    * IDENTICAL to [[beamWalk]] by construction: the fetched adjacency
    * of a frontier node is the same edge set, and scoring is the same
    * cosine on the same vectors — [[GraftSpec]] pins the two arms
    * equal on the real corpus. */
  /** The query ids a walk serves, collected once from the checkpointed
    * query frame (bounded by the query batch — the same driver-state
    * class as the per-pass candidate-id collects). */
  private[graft] def walkQueryIds(queries: DataFrame): Seq[Long] =
    queries.select(col("q_id")).collect().map(_.getLong(0)).toSeq.sorted

  /** Seed entry pairs, driver-side: every query × every seed, minus
    * self-pairs — [[beamWalkRecords]]' entry shape. */
  private def seedEntry(qIds: Seq[Long], seedIds: Seq[Long]): Seq[(Long, Long)] =
    for (q <- qIds; c <- seedIds if c != q) yield (q, c)

  /** [[beamWalkRecords]] with the entry candidate PAIRS given
    * explicitly — [[GraphIndex.probeHier]]'s kernel (each level's
    * entry is the previous level's per-query best), mirroring
    * [[beamWalkFrom]] on the records arm. */
  /** The materialized (q_id, qe, qn) query frame a record walk scores
    * against — exposed so a caller running SEVERAL walks over the
    * same queries (probeHier's descent) pays its checkpoint ONCE. */
  private[graft] def walkQueries(embeddings: DataFrame,
                                 maxQueryId: Long): DataFrame = {
    import graft.functions.GraftFunctions._
    embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .withColumn("qn", vec_norm(col("qe")))
      .localCheckpoint()
  }

  /** The cosine record walk as DRIVER ROWS — [[recordsWalkLoopRows]]
    * with the s01 cosine scorer over `queriesPre` (the materialized
    * (q_id, qe, qn) frame from [[walkQueries]]). Scoring stays a Spark
    * job over the fetched records (the parity-pinned vec_dot/vec_norm
    * kernels — never reimplemented driver-side); only the walk's
    * BOOKKEEPING (visited/expanded/frontier/adjacency, all bounded by
    * queries × (seeds + hops·beam·graphK), the documented driver-state
    * bound) lives on the driver. */
  private[graft] def beamWalkRecordsRows(entry: Seq[(Long, Long)],
                                         fetchRecs: Seq[Long] => DataFrame,
                                         beam: Int, hops: Int,
                                         queriesPre: DataFrame,
                                         keepId: Long => Boolean = _ => true)
      : Seq[(Long, Long, Double)] = {
    import graft.functions.GraftFunctions._
    // scorer over the loop's ONE (recs ⨝ pairs) frame: the s01 cosine
    // expression, null for vector-less (reverse-edge) fragments whose
    // adjacency still rides the same row — the same vec_dot/vec_norm
    // kernels and divide order as ever, so scores stay bit-identical
    def score(joined: DataFrame): DataFrame =
      joined.join(broadcast(queriesPre), Seq("q_id"))
        .select(col("q_id"), col("c_id"),
          when(col("ce").isNotNull,
            vec_dot(col("qe"), col("ce")) /
              (col("qn") * vec_norm(col("ce")))).as("s"),
          col("nbrs"))
    recordsWalkLoopRows(queriesPre.sparkSession, entry, fetchRecs, score,
      asc = false, beam, hops, keepId)
  }

  /** Spark-parity score ordering for the driver-side frontier pick:
    * Spark's sort normalizes -0.0 to 0.0 and places NaN greatest
    * (ascending) — `Double.compare` after the -0.0 fold replicates
    * both, and the c_id tie-break resolves everything else, so the
    * driver frontier is bit-identical to the row_number window it
    * replaces (and to the DuckDB oracle's). */
  private def cmpScore(a: Double, b: Double): Int = {
    val na = if (a == 0.0) 0.0 else a
    val nb = if (b == 0.0) 0.0 else b
    java.lang.Double.compare(na, nb)
  }

  /** The shared node-record walk loop, DRIVER-STATE form: one fused
    * Spark job per pass (the round-13 loop checkpointed fresh/records/
    * visited frames separately — 4 sequential job launches per hop,
    * which WAS the probe's latency at bench scale; every one of those
    * frames is bounded by queries × (seeds + hops·beam·graphK), the
    * bound this file has always documented as legal driver state, so
    * the bookkeeping moves to the driver and each pass pays exactly
    * one job: fetch the pass's records dir-pruned, score the pass's
    * pairs through the caller's Spark-side scorer, and collect the
    * scored pairs + the records' adjacency lists together (a tagged
    * union over the same bounded fetch frame).
    *
    * `entry` is the seed candidate pairs; `fetchRecs` takes the pass's
    * distinct candidate ids and returns their record-fragment FRAME
    * (the dir-pruned scan — still distributed, never collected raw);
    * `score` takes the loop's ONE (fragments ⨝ pairs) frame and emits
    * `(q_id, c_id, s, nbrs)` with Spark expressions (float parity
    * stays in the engine) — `s` NULL on rows whose fragment carries no
    * value payload (reverse-edge fragments), whose adjacency the SAME
    * row still delivers. One broadcast join over one scan replaces
    * the earlier shape's dropDuplicates exchange + second scan +
    * union (the fragment dedup moves to the visited map, which keyed
    * (q_id, c_id) anyway — duplicate fragments carry identical
    * payloads by the txn-marker contract, exactly what dropDuplicates
    * assumed). The frontier is the top-beam UNEXPANDED visited by `s`
    * (`asc` false = similarity, true = distance; lowest-id tie-break
    * either way — [[cmpScore]] pins the double ordering to Spark's).
    * `keepId` is the graveyard filter (candidates dropped BEFORE the
    * fetch, exactly the old anti-join point). */
  private def recordsWalkLoopRows(spark: SparkSession,
                                  entry: Seq[(Long, Long)],
                                  fetchRecs: Seq[Long] => DataFrame,
                                  score: DataFrame => DataFrame,
                                  asc: Boolean,
                                  beam: Int, hops: Int,
                                  keepId: Long => Boolean)
      : Seq[(Long, Long, Double)] = {
    import spark.implicits._
    val visited = scala.collection.mutable.LinkedHashMap[(Long, Long), Double]()
    val adjSeen = scala.collection.mutable.HashMap[Long, scala.collection.mutable.TreeSet[Long]]()
    val expanded = scala.collection.mutable.HashSet[(Long, Long)]()
    // one fused job per pass: scores + adjacency collected together
    // off ONE broadcast join over the SAME bounded fetch
    def pass(pairs: Seq[(Long, Long)]): Unit = {
      val ids = pairs.map(_._2).distinct.sorted
      val recs = fetchRecs(ids) // called even when empty: the fetch
      if (ids.isEmpty) return   // closure records the pass's (zero) IO
      val pairsDf = pairs.toDF("q_id", "c_id")
      val fused = score(recs.join(broadcast(pairsDf), Seq("c_id")))
      fused.collect().foreach { r =>
        if (!r.isNullAt(2)) visited((r.getLong(0), r.getLong(1))) = r.getDouble(2)
        if (!r.isNullAt(3)) {
          val set = adjSeen.getOrElseUpdate(r.getLong(1),
            scala.collection.mutable.TreeSet.empty[Long])
          set ++= r.getSeq[Long](3)
        }
      }
    }
    pass(entry.distinct)
    (1 to hops).foreach { _ =>
      // frontier: per query, the top-beam UNEXPANDED visited (expand
      // each node once — without the tracking the walk stalls)
      val frontier = visited.toSeq
        .filterNot { case (p, _) => expanded.contains(p) }
        .groupBy(_._1._1).toSeq.flatMap { case (_, vs) =>
          vs.sortWith { (x, y) =>
            val c = cmpScore(x._2, y._2)
            val cc = if (asc) c else -c
            if (cc != 0) cc < 0 else x._1._2 < y._1._2
          }.take(beam)
        }.map(_._1)
      val fresh = frontier
        .flatMap { case (q, c) =>
          adjSeen.get(c).iterator.flatMap(_.iterator)
            .filter(_ != q).map(d => (q, d)) }
        .distinct
        .filterNot(visited.contains) // score each node ONCE
        .filter(p => keepId(p._2))   // the graveyard drop, pre-fetch
      expanded ++= frontier
      pass(fresh)
    }
    visited.toSeq.map { case ((q, c), s) => (q, c, s) }
  }

  /** Driver rows → the walk's visited FRAME `(q_id, c_id, cos)`. */
  private[graft] def walkRowsDf(spark: SparkSession,
                                rows: Seq[(Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("q_id", "c_id", "cos")
  }

  /** s25: graph-ANN top-k — the [[beamWalk]] over the s20 kNN graph,
    * entered at the s21 k-center seeds: the recall/cost operating
    * point graph indexes buy (tiny exact-scored candidate sets, a few
    * sequential hops) placed on the same frontier as the LSH/IVF/PQ
    * rows via [[recallSweep]]'s `graph[...]` row. Everything is an
    * existing kernel: the graph is [[knnJoin]]'s table, the entries
    * are [[kcenterSeed]]'s picks, the scorer is s01's cosine. */
  def graphAnnTopK(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 3,
                   beam: Int = 4, hops: Int = 3, graphK: Int = 3,
                   nProbe: Int = 2, nSeeds: Int = 8,
                   centIds: Seq[Long] = centroidIds): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = knnJoin(embeddings, graphK, nProbe, centIds)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .localCheckpoint()
    val seeds = kcenterSeed(embeddings, nSeeds)
      .select(col("vec_id").as("c_id")).localCheckpoint()
    graphWalkTopK(embeddings, maxQueryId, k, beam, hops, seeds,
      fr => fr.join(edges, fr("c_id") === edges("src"))
        .select(fr("q_id"), edges("dst").as("c_id")))
  }

  /** [[beamWalk]] + the s01-shaped top-k ranking — shared by the
    * inline arm above and [[GraphIndex.probe]]'s dir-pruned arm so the
    * two cannot rank differently. */
  private[graft] def graphWalkTopK(embeddings: DataFrame, maxQueryId: Long,
                                   k: Int, beam: Int, hops: Int,
                                   seedIds: DataFrame,
                                   expand: DataFrame => DataFrame): DataFrame =
    rankWalkTopK(
      beamWalk(embeddings, maxQueryId, seedIds, expand, beam, hops), k)

  /** The records walk + the same ranking — [[GraphIndex.probe]]'s
    * arm, guaranteed to rank identically to the inline arm (same
    * edges, same Spark-side scores, same tie-breaks). `seedIds` and
    * the graveyard predicate are driver values (both bounded — seed
    * count and tombstone set, the same state the old frame arm
    * broadcast anyway). */
  private[graft] def graphWalkRecordsTopK(embeddings: DataFrame,
                                          maxQueryId: Long, k: Int, beam: Int,
                                          hops: Int, seedIds: Seq[Long],
                                          fetchRecs: Seq[Long] => DataFrame,
                                          keepId: Long => Boolean = _ => true)
      : DataFrame =
    rankWalkTopK(graphWalkRecordsVisitedDf(embeddings, maxQueryId, beam, hops,
      seedIds, fetchRecs, keepId), k)

  /** The records walk's VISITED frame `(q_id, c_id, cos)` — the shape
    * [[graphWalkRecordsTopK]] ranks plain and the filtered arm (s28)
    * ranks under its label predicate. */
  private[graft] def graphWalkRecordsVisitedDf(
      embeddings: DataFrame, maxQueryId: Long, beam: Int, hops: Int,
      seedIds: Seq[Long], fetchRecs: Seq[Long] => DataFrame,
      keepId: Long => Boolean = _ => true): DataFrame = {
    val queries = walkQueries(embeddings, maxQueryId)
    val entry = seedEntry(walkQueryIds(queries), seedIds)
    val rows = beamWalkRecordsRows(entry, fetchRecs, beam, hops, queries, keepId)
    walkRowsDf(embeddings.sparkSession, rows)
  }

  /** s28's rank tail, shared by the inline and indexed arms so they
    * cannot rank differently: restrict the VISITED set to candidates
    * carrying the query's label (the predicate lands post-walk — the
    * filtered-DiskANN rule; ineligible nodes carried connectivity
    * during the walk) and take the k best eligible. */
  private[graft] def labelFilteredRank(embeddings: DataFrame,
                                       maxQueryId: Long, visited: DataFrame,
                                       k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = embeddings.select(col("vec_id"), col("label"))
    val ql = labels.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("label").as("qlabel"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    labels.select(col("vec_id").as("c_id"), col("label").as("clabel"))
      .join(broadcast(visited), Seq("c_id")) // bounded: queries × visited
      .join(broadcast(ql), Seq("q_id"))
      .filter(col("clabel") === col("qlabel"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"),
        Rounding.roundN(col("cos"), 4).as("cos"), col("clabel").as("label"))
      .orderBy(col("q_id"), col("rank"))
  }

  private[graft] def rankWalkTopK(visited: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    visited.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), Rounding.roundN(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** s28: FILTERED graph-ANN — top-k within a metadata predicate
    * (same `label` as the query, the s16 convention), searched
    * through the beam walk. The filtered-graph shape DIFFERS from
    * s16's cell-probe filtering, and the difference is the point:
    * ineligible nodes stay in the FRONTIER (they carry connectivity —
    * dropping them from the walk disconnects regions whose only
    * bridges fail the predicate, filtered-DiskANN's core
    * observation), while the RESULT ranks only eligible ones. So the
    * predicate lands post-walk at rank time, the walk and its visited
    * census (the cost axis) are exactly s25's, and the k results are
    * the k best eligible VISITED vectors. The spec pins the
    * connectivity property live: a query whose every nearby node is
    * ineligible still reaches its eligible twin THROUGH them. */
  def graphFilteredTopK(embeddings: DataFrame, maxQueryId: Long = 8,
                        k: Int = 3, beam: Int = 4, hops: Int = 3,
                        graphK: Int = 3, nProbe: Int = 2, nSeeds: Int = 8,
                        centIds: Seq[Long] = centroidIds): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = knnJoin(embeddings, graphK, nProbe, centIds)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .localCheckpoint()
    val seeds = kcenterSeed(embeddings, nSeeds)
      .select(col("vec_id").as("c_id")).localCheckpoint()
    val visited = beamWalk(embeddings, maxQueryId, seeds,
      fr => fr.join(edges, fr("c_id") === edges("src"))
        .select(fr("q_id"), edges("dst").as("c_id")),
      beam, hops)
    labelFilteredRank(embeddings, maxQueryId, visited, k)
  }

  /** DuckDB replay of s28: the s25 walk verbatim, label-filtered at
    * the final rank only. */
  def graphFilteredTopKOracle(maxQueryId: Long = 8, k: Int = 3,
                              beam: Int = 4, hops: Int = 3, graphK: Int = 3,
                              nProbe: Int = 2, nSeeds: Int = 8): String = {
    val seedSel = (1 to nSeeds).map(r => s"SELECT vec_id FROM c$r")
      .mkString(" UNION ALL ")
    s"""WITH ${knnCtes(nProbe)},
       ${kcenterCtes(nSeeds)},
       gedge AS (SELECT q_id AS src, c_id AS dst FROM ranked
                 WHERE rank <= $graphK),
       gseed AS ($seedSel),
       ${graphWalkSql(maxQueryId, k, beam, hops, labelFiltered = true)}"""
  }

  // ---- s30: HIERARCHICAL graph-ANN (HNSW's layered descent) ----------

  /** Deterministic layer assignment for the s30 hierarchy: a vector
    * sits on every level `l` with `h(vec_id) % 2^l == 0`, where `h`
    * is the q49 LCG hash — the geometric p=1/2 level distribution
    * HNSW samples randomly, DE-RANDOMIZED so both engines derive the
    * same layers from the ids alone (no level column is stored; the
    * level IS a function of the id). Level >= 1 holds ~half the
    * corpus, level >= 2 a quarter, exactly HNSW's expected shape.
    * `vec_id` is reduced mod P BEFORE the LCG multiply: the raw
    * product overflows BIGINT for vec_id >= ~8.36e9, where Spark
    * (non-ANSI) wraps silently but DuckDB raises out-of-range — the
    * reduction keeps the product <= (P-1)·1103515245 < 2^63 for ALL
    * long ids and leaves the hash unchanged for in-range ids (mod-P
    * congruence is preserved by reducing a factor mod P). */
  private[graft] def levelCondSql(l: Int): String =
    s"(((vec_id % 2147483647) * 1103515245 + 12345) % 2147483647) % ${1L << l} = 0"
  private def levelCond(l: Int): org.apache.spark.sql.Column =
    expr(levelCondSql(l))

  /** s30: HIERARCHICAL-entry graph walk — HNSW's actual serving shape
    * (Malkov & Yashunin 2016), where s25's weakness is fixed at the
    * ENTRY: a flat walk enters at fixed global seeds, so a query far
    * from every seed burns its whole hop budget travelling; the
    * hierarchy instead descends a pyramid of sparser kNN graphs
    * (level l = the deterministic [[levelCondSql]] subset, ~n/2^l
    * nodes) whose edges are LONG-RANGE precisely because the subsets
    * are sparse — each level's greedy walk localizes the entry for
    * the level below, and only level 0 runs the full-budget beam
    * search. Upper levels are kNN graphs over id-derived subsets
    * built by the SAME [[knnEdgesFor]] kernel (cells from the full
    * corpus's centroids, so cell geometry is level-invariant).
    *
    * Scale shape: every level's walk is bounded by queries ×
    * (2 + upperHops·upperBeam·graphK) and level 0 by queries ×
    * (1 + hops·beam·graphK) — never the corpus; upper-level graph
    * CONSTRUCTION is the same one cell-key shuffle as s20 over
    * geometrically shrinking subsets (total build cost < 2× the
    * level-0 graph). Entry: the two lowest ids on the top level (two,
    * so a query that IS one of them still has an entry). Returns the
    * union of every level's visited frame `(q_id, c_id, cos)` —
    * everything exact-scored, so upper-level visits contribute recall
    * for free; the census of this frame is the probe's cost axis. */
  private[graft] def graphHierWalk(embeddings: DataFrame, maxQueryId: Long,
                                   beam: Int, hops: Int, graphK: Int,
                                   nProbe: Int, maxLevel: Int,
                                   upperBeam: Int, upperHops: Int,
                                   centIds: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def expandWith(edges: DataFrame): DataFrame => DataFrame =
      fr => fr.join(edges, fr("c_id") === edges("src"))
        .select(fr("q_id"), edges("dst").as("c_id"))
    val qIds = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"))
    val htop = embeddings.filter(levelCond(maxLevel))
      .select(col("vec_id").as("c_id")).orderBy(col("c_id")).limit(2)
    var entry: DataFrame = qIds.crossJoin(broadcast(htop))
      .filter(col("c_id") =!= col("q_id"))
    val wBest = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    val visited = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (l <- maxLevel to 1 by -1) {
      val sub = embeddings.filter(levelCond(l))
      val edgesL = knnEdgesFor(sub, sub, graphK, nProbe, centIds,
          centsFrom = embeddings)
        .localCheckpoint()
      val vis = beamWalkFrom(embeddings, maxQueryId, entry,
        expandWith(edgesL), upperBeam, upperHops)
      visited += vis
      entry = vis.withColumn("rn", row_number().over(wBest))
        .filter(col("rn") === 1).select(col("q_id"), col("c_id"))
    }
    val edges0 = knnJoin(embeddings, graphK, nProbe, centIds)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .localCheckpoint()
    visited += beamWalkFrom(embeddings, maxQueryId, entry,
      expandWith(edges0), beam, hops)
    // cos is the same codegen'd expression on the same inputs at every
    // level, so re-visited nodes collapse under set-distinct exactly
    // like the oracle's UNION
    visited.reduce(_.unionByName(_)).distinct()
  }

  /** s30 ranked top-k — [[graphHierWalk]] + the shared s01-shaped
    * ranking, so hier and flat arms cannot rank differently. */
  def graphHierTopK(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 3,
                    beam: Int = 4, hops: Int = 3, graphK: Int = 3,
                    nProbe: Int = 2, maxLevel: Int = 2, upperBeam: Int = 1,
                    upperHops: Int = 2,
                    centIds: Seq[Long] = centroidIds): DataFrame =
    rankWalkTopK(graphHierWalk(embeddings, maxQueryId, beam, hops, graphK,
      nProbe, maxLevel, upperBeam, upperHops, centIds), k)

  /** One unrolled walk chain with a NAME PREFIX, an edge CTE, and an
    * ENTRY-PAIRS subquery — the [[graphWalkSql]] triple-per-hop shape
    * generalized so the s30 oracle can stack one chain per level
    * (consumes `gcorp`/`gq`; the entry subquery yields (q_id, c_id)). */
  private def walkChainSql(p: String, edgeCte: String, entrySql: String,
                           beam: Int, hops: Int): String = {
    val d = Dialect.duck
    val sb = new StringBuilder(
      s"""${p}v0 AS (SELECT en.q_id, en.c_id,
           ${dot(d, "q.qe", "c.ce")} / (q.qn * c.cn) AS cos
         FROM ($entrySql) en JOIN gq q ON q.q_id = en.q_id
           JOIN gcorp c ON c.c_id = en.c_id),
       ${p}e0 AS (SELECT q_id, c_id FROM ${p}v0 WHERE FALSE)""")
    for (h <- 1 to hops) {
      sb.append(s""",
       ${p}b${h - 1} AS (SELECT q_id, c_id FROM (SELECT v.q_id, v.c_id,
           row_number() OVER (PARTITION BY v.q_id
             ORDER BY v.cos DESC, v.c_id) AS rn
           FROM ${p}v${h - 1} v LEFT JOIN ${p}e${h - 1} x
             ON x.q_id = v.q_id AND x.c_id = v.c_id
           WHERE x.c_id IS NULL) t WHERE rn <= $beam),
       ${p}e$h AS (SELECT q_id, c_id FROM ${p}e${h - 1}
         UNION SELECT q_id, c_id FROM ${p}b${h - 1}),
       ${p}c$h AS (SELECT DISTINCT b.q_id, e.dst AS c_id
         FROM ${p}b${h - 1} b JOIN $edgeCte e ON e.src = b.c_id
         WHERE e.dst <> b.q_id),
       ${p}v$h AS (SELECT q_id, c_id, cos FROM ${p}v${h - 1}
         UNION
         SELECT n.q_id, n.c_id, ${dot(d, "q.qe", "c.ce")} / (q.qn * c.cn) AS cos
         FROM ${p}c$h n JOIN gq q ON q.q_id = n.q_id
           JOIN gcorp c ON c.c_id = n.c_id)""")
    }
    sb.toString
  }

  /** DuckDB replay of s30: the s25 kNN chain + one `knnCtesP` chain
    * per level (corpus restricted by [[levelCondSql]], cents from the
    * full table), then one [[walkChainSql]] per level descending —
    * each level's entry is the previous chain's per-query best — and
    * the final rank over the UNION of every level's visited. */
  def graphHierTopKOracle(maxQueryId: Long = 8, k: Int = 3, beam: Int = 4,
                          hops: Int = 3, graphK: Int = 3, nProbe: Int = 2,
                          maxLevel: Int = 2, upperBeam: Int = 1,
                          upperHops: Int = 2): String = {
    val d = Dialect.duck
    val lvlChains = (1 to maxLevel)
      .map(l => knnCtesP(s"l$l", nProbe, levelCondSql(l), ""))
      .mkString(",\n       ")
    val lvlEdges = (1 to maxLevel).map(l =>
        s"""he$l AS (SELECT q_id AS src, c_id AS dst FROM l${l}ranked
                 WHERE rank <= $graphK)""")
      .mkString(",\n       ")
    val sb = new StringBuilder(
      s"""WITH ${knnCtes(nProbe)},
       $lvlChains,
       gedge AS (SELECT q_id AS src, c_id AS dst FROM ranked
                 WHERE rank <= $graphK),
       $lvlEdges,
       htop AS (SELECT vec_id AS c_id FROM embeddings
                WHERE ${levelCondSql(maxLevel)} ORDER BY vec_id LIMIT 2),
       gcorp AS (SELECT vec_id AS c_id, embedding AS ce,
           ${normExpr(d, "embedding")} AS cn FROM embeddings),
       gq AS (SELECT vec_id AS q_id, embedding AS qe,
           ${normExpr(d, "embedding")} AS qn
         FROM embeddings WHERE vec_id < $maxQueryId),
       """)
    var entry =
      "SELECT q.q_id, t.c_id FROM gq q CROSS JOIN htop t WHERE t.c_id <> q.q_id"
    val unions = scala.collection.mutable.ArrayBuffer[String]()
    for (l <- maxLevel to 1 by -1) {
      sb.append(walkChainSql(s"w$l", s"he$l", entry, upperBeam, upperHops))
      sb.append(",\n       ")
      unions += s"SELECT q_id, c_id, cos FROM w${l}v$upperHops"
      entry = s"""SELECT q_id, c_id FROM (SELECT q_id, c_id,
             row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, c_id) AS rn FROM w${l}v$upperHops) t
           WHERE rn = 1"""
    }
    sb.append(walkChainSql("w0", "gedge", entry, beam, hops))
    unions += s"SELECT q_id, c_id, cos FROM w0v$hops"
    sb.append(s"""
       SELECT q_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos
       FROM (SELECT q_id, c_id, cos, row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, c_id) AS rank
             FROM (${unions.mkString("\n               UNION ")}) u) t
       WHERE rank <= $k ORDER BY q_id, rank""")
    sb.toString
  }

  // ---- s29: PQ-NAVIGATED graph walk (DiskANN's serving shape) --------

  /** ADC navigation score over a record's stored PQ `codes` against
    * the query's broadcast distance table — 8 list lookups per
    * (query, candidate), NO vector arithmetic in the hop (the s09
    * asymmetric-distance kernel applied as the walk's compass). */
  private def adcRecExpr = expr(
    s"aggregate(sequence(0, ${PqSubspaces - 1}), CAST(0 AS DOUBLE), " +
    s"(acc, j) -> acc + element_at(dt, j * $PqK + element_at(codes, j + 1) + 1))")

  /** The ADC record scorer for the walk loop's ONE (fragments ⨝
    * pairs) frame: codes come from the fetched fragments (the
    * vector-bearing fragment carries them — NULL `s` on code-less
    * reverse fragments, whose adjacency the same row delivers),
    * distance tables broadcast from the query side. */
  private[graft] def scoreAdcRecs(dts: DataFrame)(
      joined: DataFrame): DataFrame =
    joined.join(broadcast(dts), Seq("q_id"))
      .select(col("q_id"), col("c_id"),
        when(col("codes").isNotNull, adcRecExpr).as("s"),
        col("nbrs"))

  /** Exact-cosine re-rank of a walk's visited set — DiskANN's final
    * step: the ADC-guided walk only DECIDES what to visit; the
    * answers are ranked by one exact pass over the visited ids'
    * full vectors (`fetchVecs`: one dir-pruned point fetch in the
    * indexed arm, a broadcast-pruned corpus pass inline). */
  private[graft] def rerankExactTopK(queries: DataFrame,
                                     fetchVecs: Seq[Long] => DataFrame,
                                     visited: Seq[(Long, Long, Double)],
                                     k: Int): DataFrame = {
    import graft.functions.GraftFunctions._
    val spark = queries.sparkSession
    import spark.implicits._
    val pairsDf = visited.map(v => (v._1, v._2)).distinct.toDF("q_id", "c_id")
    val scored = fetchVecs(visited.map(_._2).distinct.sorted)
      .withColumn("cn", vec_norm(col("ce")))
      .join(broadcast(pairsDf), Seq("c_id"))
      .join(broadcast(queries), Seq("q_id"))
      .withColumn("cos", vec_dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .select(col("q_id"), col("c_id"), col("cos"))
    rankWalkTopK(scored, k)
  }

  /** s29: the PQ-navigated beam walk — DiskANN's complete serving
    * shape on the s25 graph: hops navigate by ASYMMETRIC PQ DISTANCE
    * (4-byte codes + per-query distance tables — the hop reads no
    * full vectors at all), and the final top-k is an EXACT-cosine
    * re-rank of everything visited (one bounded vector pass). The
    * operating point this buys at 100 TB: per-hop IO drops from
    * (vector + adjacency) to (codes + adjacency) — ~10× fewer bytes
    * per candidate — and full vectors are touched once, for ≤ the
    * visited set. Inline arm; [[GraphIndex.probePq]] is the persisted
    * twin serving codes+adjacency from pruned node-record columns. */
  def graphPqTopK(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 3,
                  beam: Int = 4, hops: Int = 3, graphK: Int = 3,
                  nProbe: Int = 2, nSeeds: Int = 8,
                  centIds: Seq[Long] = centroidIds): DataFrame = {
    import graft.functions.GraftFunctions._
    val adj = knnJoin(embeddings, graphK, nProbe, centIds)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_set(col("neighbor_id"))).as("nbrs"))
    val nodes = embeddings.select(col("vec_id"), col("embedding"))
      .join(adj, Seq("vec_id"), "left")
      .withColumn("nbrs", coalesce(col("nbrs"), array().cast("array<bigint>")))
      .join(pqCodes(embeddings), Seq("vec_id"), "left")
      .withColumnRenamed("vec_id", "c_id")
      .withColumnRenamed("embedding", "ce")
      .localCheckpoint()
    val seeds = kcenterSeed(embeddings, nSeeds)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    val dts = pqDistTables(embeddings, maxQueryId).localCheckpoint()
    def slice(ids: Seq[Long]): DataFrame =
      if (ids.isEmpty) nodes.limit(0)
      else nodes.filter(col("c_id").isin(ids: _*))
    graphPqWalkTopK(embeddings, maxQueryId, k, beam, hops, seeds,
      slice, dts, ids => slice(ids).select(col("c_id"), col("ce")))
  }

  /** The ADC walk + exact re-rank shared by the inline arm above and
    * [[GraphIndex.probePq]]'s dir-pruned arm — the two cannot rank
    * differently. */
  private[graft] def graphPqWalkTopK(embeddings: DataFrame, maxQueryId: Long,
                                     k: Int, beam: Int, hops: Int,
                                     seedIds: Seq[Long],
                                     fetchRecs: Seq[Long] => DataFrame,
                                     dts: DataFrame,
                                     fetchVecs: Seq[Long] => DataFrame,
                                     keepId: Long => Boolean = _ => true)
      : DataFrame = {
    val queries = walkQueries(embeddings, maxQueryId)
    val entry = seedEntry(walkQueryIds(queries), seedIds)
    val visited = recordsWalkLoopRows(embeddings.sparkSession, entry,
      fetchRecs, scoreAdcRecs(dts), asc = true, beam, hops, keepId)
    rerankExactTopK(queries, fetchVecs, visited, k)
  }

  /** DuckDB replay of s29: the s25 graph + seed chains, the s09 PQ
    * code/distance-table chains, the walk ranked by ADC ascending,
    * and the exact-cosine re-rank of the final visited set. */
  def graphPqTopKOracle(maxQueryId: Long = 8, k: Int = 3, beam: Int = 4,
                        hops: Int = 3, graphK: Int = 3, nProbe: Int = 2,
                        nSeeds: Int = 8): String = {
    val d = Dialect.duck
    val lo = PqCodebookIds.head
    val hi = PqCodebookIds.last
    val seedSel = (1 to nSeeds).map(r => s"SELECT vec_id FROM c$r")
      .mkString(" UNION ALL ")
    val adcSql = s"list_reduce(list_transform(generate_series(0, " +
      s"${PqSubspaces - 1}), j -> q.dt[j * $PqK + k.codes[j + 1] + 1]), " +
      "(a, b) -> a + b)"
    val sb = new StringBuilder(
      s"""WITH ${knnCtes(nProbe)},
       ${kcenterCtes(nSeeds)},
       gedge AS (SELECT q_id AS src, c_id AS dst FROM ranked
                 WHERE rank <= $graphK),
       gseed AS ($seedSel),
       pqcb AS (SELECT vec_id - $lo AS cidx, embedding AS cemb
         FROM embeddings WHERE vec_id BETWEEN $lo AND $hi),
       pqsub AS (SELECT s.vec_id, c.cidx, t.j,
           ${pqSubDist(d, "s.embedding", "c.cemb", "t.j")} AS sd
         FROM embeddings s CROSS JOIN pqcb c
         CROSS JOIN generate_series(0, ${PqSubspaces - 1}) t(j)),
       pqcodes AS (SELECT vec_id, list(cidx ORDER BY j) AS codes
         FROM (SELECT vec_id, j, cidx, row_number() OVER (
                 PARTITION BY vec_id, j ORDER BY sd, cidx) AS rn FROM pqsub) x
         WHERE rn = 1 GROUP BY vec_id),
       pqdt AS (SELECT vec_id AS q_id, list(sd ORDER BY j, cidx) AS dt
         FROM pqsub WHERE vec_id < $maxQueryId GROUP BY vec_id),
       gv0 AS (SELECT q.q_id, s.vec_id AS c_id, $adcSql AS adc
         FROM pqdt q CROSS JOIN gseed s JOIN pqcodes k ON k.vec_id = s.vec_id
         WHERE s.vec_id <> q.q_id),
       ge0 AS (SELECT q_id, c_id FROM gv0 WHERE FALSE)""")
    for (h <- 1 to hops) {
      sb.append(s""",
       gb${h - 1} AS (SELECT q_id, c_id FROM (SELECT v.q_id, v.c_id,
           row_number() OVER (PARTITION BY v.q_id
             ORDER BY v.adc ASC, v.c_id) AS rn
           FROM gv${h - 1} v LEFT JOIN ge${h - 1} x
             ON x.q_id = v.q_id AND x.c_id = v.c_id
           WHERE x.c_id IS NULL) t WHERE rn <= $beam),
       ge$h AS (SELECT q_id, c_id FROM ge${h - 1}
         UNION SELECT q_id, c_id FROM gb${h - 1}),
       gc$h AS (SELECT DISTINCT b.q_id, e.dst AS c_id
         FROM gb${h - 1} b JOIN gedge e ON e.src = b.c_id
         WHERE e.dst <> b.q_id),
       gv$h AS (SELECT q_id, c_id, adc FROM gv${h - 1}
         UNION
         SELECT n.q_id, n.c_id, $adcSql AS adc
         FROM gc$h n JOIN pqdt q ON q.q_id = n.q_id
           JOIN pqcodes k ON k.vec_id = n.c_id)""")
    }
    sb.append(s"""
       SELECT q_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos
       FROM (SELECT q_id, c_id, cos,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, c_id) AS rank
             FROM (SELECT v.q_id, v.c_id,
                     ${dot(d, "q.embedding", "c.embedding")} /
                     (${normExpr(d, "q.embedding")} *
                      ${normExpr(d, "c.embedding")}) AS cos
                   FROM gv$hops v JOIN embeddings q ON q.vec_id = v.q_id
                     JOIN embeddings c ON c.vec_id = v.c_id) t0) t
       WHERE rank <= $k ORDER BY q_id, rank""")
    sb.toString
  }

  /** The beam-walk CTE tail shared by the s25/s27/s28 oracles —
    * consumes `gedge(src, dst)` and `gseed(vec_id)` and emits one CTE
    * TRIPLE per hop (frontier = top-beam UNEXPANDED visited, the
    * expansion-tracking anti-join mirroring the Spark walk; expanded
    * set; candidates; then visited = UNION dedup — the cosine
    * expression is identical on both branches, so UNION's set
    * semantics are exact), then the final rank (label-filtered for
    * s28: the walk is identical, only ranking restricts to the
    * query's label). */
  private def graphWalkSql(maxQueryId: Long, k: Int, beam: Int,
                           hops: Int, labelFiltered: Boolean = false): String = {
    val d = Dialect.duck
    val sb = new StringBuilder(
      s"""gcorp AS (SELECT vec_id AS c_id, embedding AS ce,
           ${normExpr(d, "embedding")} AS cn FROM embeddings),
       gq AS (SELECT vec_id AS q_id, embedding AS qe,
           ${normExpr(d, "embedding")} AS qn
         FROM embeddings WHERE vec_id < $maxQueryId),
       gv0 AS (SELECT q.q_id, c.c_id, ${dot(d, "q.qe", "c.ce")} / (q.qn * c.cn) AS cos
         FROM gq q CROSS JOIN gseed s JOIN gcorp c ON c.c_id = s.vec_id
         WHERE s.vec_id <> q.q_id),
       ge0 AS (SELECT q_id, c_id FROM gv0 WHERE FALSE)""")
    for (h <- 1 to hops) {
      sb.append(s""",
       gb${h - 1} AS (SELECT q_id, c_id FROM (SELECT v.q_id, v.c_id,
           row_number() OVER (PARTITION BY v.q_id
             ORDER BY v.cos DESC, v.c_id) AS rn
           FROM gv${h - 1} v LEFT JOIN ge${h - 1} x
             ON x.q_id = v.q_id AND x.c_id = v.c_id
           WHERE x.c_id IS NULL) t WHERE rn <= $beam),
       ge$h AS (SELECT q_id, c_id FROM ge${h - 1}
         UNION SELECT q_id, c_id FROM gb${h - 1}),
       gc$h AS (SELECT DISTINCT b.q_id, e.dst AS c_id
         FROM gb${h - 1} b JOIN gedge e ON e.src = b.c_id
         WHERE e.dst <> b.q_id),
       gv$h AS (SELECT q_id, c_id, cos FROM gv${h - 1}
         UNION
         SELECT n.q_id, n.c_id, ${dot(d, "q.qe", "c.ce")} / (q.qn * c.cn) AS cos
         FROM gc$h n JOIN gq q ON q.q_id = n.q_id
           JOIN gcorp c ON c.c_id = n.c_id)""")
    }
    if (labelFiltered)
      sb.append(s"""
       SELECT q_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos, label
       FROM (SELECT v.q_id, v.c_id, v.cos, cl.label,
               row_number() OVER (PARTITION BY v.q_id
                 ORDER BY v.cos DESC, v.c_id) AS rank
             FROM gv$hops v
             JOIN embeddings cl ON cl.vec_id = v.c_id
             JOIN embeddings ql ON ql.vec_id = v.q_id
             WHERE cl.label = ql.label) t
       WHERE rank <= $k ORDER BY q_id, rank""")
    else
      sb.append(s"""
       SELECT q_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos
       FROM (SELECT q_id, c_id, cos, row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, c_id) AS rank FROM gv$hops) t
       WHERE rank <= $k ORDER BY q_id, rank""")
    sb.toString
  }

  /** DuckDB replay of s25: seeds chain + kNN-graph chain + the shared
    * beam-walk tail. */
  def graphAnnTopKOracle(maxQueryId: Long = 8, k: Int = 3, beam: Int = 4,
                         hops: Int = 3, graphK: Int = 3, nProbe: Int = 2,
                         nSeeds: Int = 8): String = {
    val seedSel = (1 to nSeeds).map(r => s"SELECT vec_id FROM c$r")
      .mkString(" UNION ALL ")
    s"""WITH ${knnCtes(nProbe)},
       ${kcenterCtes(nSeeds)},
       gedge AS (SELECT q_id AS src, c_id AS dst FROM ranked
                 WHERE rank <= $graphK),
       gseed AS ($seedSel),
       ${graphWalkSql(maxQueryId, k, beam, hops)}"""
  }

  /** [[knnCtes]] with a NAME PREFIX and corpus/source predicates — the
    * s27 oracle needs TWO graph chains in one query (the pre-ingest
    * build over the old corpus, the arrival batch's edges over the
    * grown corpus). Empty predicates and prefix reproduce the plain
    * chain. */
  private def knnCtesP(p: String, nProbe: Int, corpusWhere: String,
                       srcWhere: String,
                       cents: Seq[Long] = centroidIds): String = {
    val d = Dialect.duck
    val ids = cents.mkString(", ")
    val cw = if (corpusWhere.isEmpty) "" else s" WHERE $corpusWhere"
    val sw = if (srcWhere.isEmpty) "" else s" AND ($srcWhere)"
    s"""${p}cents AS (SELECT vec_id AS cent_id, embedding AS cemb
           FROM embeddings WHERE vec_id IN ($ids)),
       ${p}scoredc AS (SELECT e.vec_id, e.embedding, c.cent_id,
           ${dot(d, "e.embedding", "c.cemb")} AS csim
         FROM (SELECT * FROM embeddings$cw) e CROSS JOIN ${p}cents c),
       ${p}assigned AS (SELECT vec_id, embedding, cent_id AS cell,
           ${normExpr(d, "embedding")} AS nrm
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn FROM ${p}scoredc) t
         WHERE crn = 1),
       ${p}qprobe AS (SELECT vec_id AS q_id, embedding AS qe,
           ${normExpr(d, "embedding")} AS qn, cent_id AS cell
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn
               FROM ${p}scoredc) t
         WHERE crn <= $nProbe$sw),
       ${p}scored AS (SELECT q.q_id, c.vec_id AS c_id,
           ${dot(d, "q.qe", "c.embedding")} / (q.qn * c.nrm) AS cos
         FROM ${p}assigned c JOIN ${p}qprobe q ON q.cell = c.cell
         WHERE q.q_id <> c.vec_id),
       ${p}ranked AS (SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         FROM ${p}scored)"""
  }

  /** s27 oracle: the grown index's adjacency is the UNION of the
    * pre-ingest build (old corpus only), the batch's edges (computed
    * over the grown corpus), and the batch edges REVERSED (the
    * bidirectional insertion that makes arrivals reachable); seeds
    * stay the pre-ingest picks; then the shared beam-walk tail. */
  def graphIngestOracle(maxQueryId: Long = 8, k: Int = 3, beam: Int = 4,
                        hops: Int = 3, graphK: Int = 3, nProbe: Int = 2,
                        nSeeds: Int = 8,
                        newWhere: String = "vec_id % 9 = 0"): String = {
    val seedSel = (1 to nSeeds).map(r => s"SELECT vec_id FROM c$r")
      .mkString(" UNION ALL ")
    s"""WITH ${knnCtesP("o", nProbe, s"NOT ($newWhere)", "")},
       ${knnCtesP("n", nProbe, "", newWhere)},
       ${kcenterCtes(nSeeds, s"NOT ($newWhere)")},
       gedge AS (SELECT DISTINCT src, dst FROM (
           SELECT q_id AS src, c_id AS dst FROM oranked WHERE rank <= $graphK
           UNION ALL
           SELECT q_id, c_id FROM nranked WHERE rank <= $graphK
           UNION ALL
           SELECT c_id, q_id FROM nranked WHERE rank <= $graphK) u),
       gseed AS ($seedSel),
       ${graphWalkSql(maxQueryId, k, beam, hops)}"""
  }

  /** st16 oracle: [[graphIngestOracle]] extended to TWO commit-gated
    * arrival batches — the grown index's adjacency is the union of the
    * seed build's edges (vec_id%3==0 corpus only), batch 1's edges
    * (%3==1 arrivals against the seed∪batch-1 corpus) forward AND
    * reversed, and batch 2's edges (%3==2 arrivals against the full
    * corpus) forward AND reversed; seeds stay the seed-corpus picks;
    * then the shared beam-walk tail. Centroids are the
    * [[streamIngestCentroids]] (ids ≡ 0 mod 3 — present in every
    * grown corpus). Three prefixed kNN chains per batch boundary: the
    * literal replay of batch == commit ingest. */
  def streamGraphIngestOracle(maxQueryId: Long = 8, k: Int = 3, beam: Int = 4,
                              hops: Int = 3, graphK: Int = 3, nProbe: Int = 2,
                              nSeeds: Int = 8): String = {
    val cents = streamIngestCentroids
    val seedSel = (1 to nSeeds).map(r => s"SELECT vec_id FROM c$r")
      .mkString(" UNION ALL ")
    s"""WITH ${knnCtesP("o", nProbe, "vec_id % 3 = 0", "", cents)},
       ${knnCtesP("a", nProbe, "vec_id % 3 <> 2", "vec_id % 3 = 1", cents)},
       ${knnCtesP("b", nProbe, "", "vec_id % 3 = 2", cents)},
       ${kcenterCtes(nSeeds, "vec_id % 3 = 0")},
       gedge AS (SELECT DISTINCT src, dst FROM (
           SELECT q_id AS src, c_id AS dst FROM oranked WHERE rank <= $graphK
           UNION ALL
           SELECT q_id, c_id FROM aranked WHERE rank <= $graphK
           UNION ALL
           SELECT c_id, q_id FROM aranked WHERE rank <= $graphK
           UNION ALL
           SELECT q_id, c_id FROM branked WHERE rank <= $graphK
           UNION ALL
           SELECT c_id, q_id FROM branked WHERE rank <= $graphK) u),
       gseed AS ($seedSel),
       ${graphWalkSql(maxQueryId, k, beam, hops)}"""
  }

  /** s04: the Lloyd refinement step — recompute each IVF cell's
    * centroid as the element-wise mean of its member vectors. This is
    * how the s03 index is MAINTAINED at scale (periodic re-training on
    * the live corpus): posexplode fans each vector into (cell, dim,
    * value) rows map-side, and the mean is a plain two-phase aggregate
    * — the shuffle carries (cell, dim) partial sums (K x D rows per
    * map partition), never vectors. One such pass per Lloyd iteration,
    * embarrassingly parallel at any corpus size.
    */
  def centroidUpdate(embeddings: DataFrame): DataFrame =
    assignedCells(embeddings)
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
           Rounding.roundN(avg(col("v").cast("double")), 4).as("mean_v"))
      .orderBy(col("cell"), col("dim"))

  def centroidUpdateOracle: String =
    s"""WITH $assignedCtes,
       ex AS (SELECT cell, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
         FROM assigned CROSS JOIN generate_series(1, $Dims) t(i))
       SELECT cell, CAST(dim AS BIGINT) AS dim, count(*) AS n,
         round(avg(v), 4) AS mean_v
       FROM ex GROUP BY cell, dim ORDER BY cell, dim"""

  /** d05: embedding-cosine near-duplicate pairs, LSH-blocked. */
  def embeddingNearDup(embeddings: DataFrame, minCos: Double = 0.3,
                       numPlanes: Int = NumPlanes): DataFrame = {
    import graft.functions.GraftFunctions._
    val f = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", vec_norm(col("embedding")))
      .withColumn("bucket", plane_bucket(col("embedding"), numPlanes))
    val a = f.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
                     col("nrm").as("na"), col("bucket"))
    val b = f.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
                     col("nrm").as("nb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", vec_dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), Rounding.roundN(col("cos"), 4).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def embeddingNearDupOracle(minCos: Double = 0.3,
                             numPlanes: Int = NumPlanes): String = {
    val d = Dialect.duck
    s"""WITH f AS (SELECT vec_id, embedding, ${normExpr(d, "embedding")} AS nrm,
           ${bucketExpr(d, "embedding", numPlanes)} AS bucket FROM embeddings)
       SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(${dot(d, "a.embedding", "b.embedding")} / (a.nrm * b.nrm), 4) AS cos
       FROM f a JOIN f b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       WHERE ${dot(d, "a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $minCos
       ORDER BY id_a, id_b"""
  }

  // ---- d17: cluster-scoped semantic dedup (SemDeDup) ------------------

  /** d17: SEMANTIC dedup via k-means cells — the SemDeDup recipe
    * (Abbas et al. 2023): cluster the embedding space, compare ONLY
    * within a cluster, prune every vector that has a lower-id
    * in-cell neighbor at cos >= minCos (keep-first, the d05/d09
    * survivor rule; the keeper reported is the LOWEST such neighbor
    * so the output is a function of the data, not of join order).
    *
    * This is the third embedding-dedup blocking scheme beside d05's
    * hyperplane LSH (pair-listing) and VecIndex.ingestDedup
    * (admission control): k-means cells bound the quadratic term at
    * N*c (c = cell occupancy ~ N/K, K ~ sqrt(N) via centroidIdsFor)
    * instead of N^2 — the economics that let SemDeDup run on
    * billion-document corpora. Cell restriction is an EQUI-JOIN on
    * cell id (shuffle on cell key, never all-pairs); the spec proves
    * the recall boundary honestly: a cross-cell near-dup pair exists
    * at sf0.001 that this operator, by design, does not see.
    */
  def semDedup(embeddings: DataFrame, minCos: Double = 0.3,
               centIds: Seq[Long] = centroidIds): DataFrame = {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    val f = assignedCells(embeddings, centIds)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    val a = f.select(col("vec_id").as("keeper_id"), col("embedding").as("ea"),
                     col("nrm").as("na"), col("cell"))
    val b = f.select(col("vec_id"), col("embedding").as("eb"),
                     col("nrm").as("nb"), col("cell"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("keeper_id").asc)
    a.join(b, Seq("cell"))
      .filter(col("keeper_id") < col("vec_id"))
      .withColumn("cos", vec_dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("keeper_id"),
              Rounding.roundN(col("cos"), 4).as("cos"))
      .orderBy(col("vec_id"))
  }

  def semDedupOracle(minCos: Double = 0.3): String = {
    val d = Dialect.duck
    s"""WITH $assignedCtes,
       pairs AS (SELECT b.vec_id, b.cell, a.vec_id AS keeper_id,
           ${dot(d, "a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         FROM assigned a JOIN assigned b
           ON a.cell = b.cell AND a.vec_id < b.vec_id
         WHERE ${dot(d, "a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $minCos)
       SELECT vec_id, cell, keeper_id, round(cos, 4) AS cos
       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY keeper_id) AS rn FROM pairs) t
       WHERE rn = 1 ORDER BY vec_id"""
  }

  // ---- s06: ANN recall evaluation -------------------------------------

  /** s06: recall@k of the LSH-bucketed ANN against the exact
    * brute-force ground truth — the evaluation loop every ANN
    * deployment runs before trading recall for throughput. Ground
    * truth and approximate top-k are both per-query top-k frames
    * (tiny: queries x k rows); the left join + per-query aggregate is
    * driver-free and broadcastable. At 100 TB the ground truth comes
    * from brute-forcing a SAMPLED query set (exact search over the
    * full corpus is the one O(N*Q) stage — you bound Q, never N).
    */
  def annRecall(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 3): DataFrame = {
    val exact = bruteForceTopK(embeddings, maxQueryId, k)
      .select(col("q_id"), col("neighbor_id"))
    val approx = lshTopK(embeddings, maxQueryId, k)
      .select(col("q_id"), col("neighbor_id"), lit(1L).as("hit"))
    exact.join(broadcast(approx), Seq("q_id", "neighbor_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("k_eval"),
           sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall",
        Rounding.roundN(col("n_hits").cast("double") / col("k_eval"), 4))
      .select(col("q_id"), col("k_eval"), col("n_hits"), col("recall"))
      .orderBy(col("q_id"))
  }

  /** Sampled-query recall/efficiency SWEEP — the evaluation every ANN
    * deployment runs to pick its operating point, at a query-set size
    * that makes the numbers statistically meaningful (s06's oracle
    * binding pins 8 queries for cross-engine determinism; this
    * harness defaults to 64). One row per (method, parameter): mean
    * recall@k over the sample against brute-force ground truth, and
    * the mean FRACTION of the corpus scored per query — the
    * throughput side of the tradeoff (recall without its candidate
    * cost is not an operating point). Index sizes are the
    * data-dependent production ones (planesFor / centroidIdsFor), not
    * the oracle-pinned constants; IVF probe cells come from the same
    * [[probeCells]] the search uses, so eval cannot drift from what
    * production would run. At 100 TB this runs unchanged: ground
    * truth brute-forces a BOUNDED query sample (O(N·Q), Q bounded),
    * everything else is the index's own probe cost.
    */
  def recallSweep(embeddings: DataFrame, nQueries: Long = 64, k: Int = 10,
                  probes: Seq[Int] = Seq(1, 2, 4),
                  shortlists: Seq[Int] = Seq(10, 50, 100)): DataFrame = {
    import graft.functions.GraftFunctions._
    val n = embeddings.count()
    val planes = planesFor(n)
    val cents = centroidIdsFor(n)
    val exact = bruteForceTopK(embeddings, nQueries, k)
      .select(col("q_id"), col("neighbor_id")).localCheckpoint()

    def row(method: String, approx: DataFrame, candFrac: DataFrame,
            baseline: DataFrame = exact): DataFrame =
      baseline.join(approx.select(col("q_id"), col("neighbor_id"))
                      .withColumn("hit", lit(1L)),
                    Seq("q_id", "neighbor_id"), "left")
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1)))
               .as("recall"))
        .crossJoin(candFrac)
        .select(lit(method).as("method"),
                Rounding.roundN(col("recall"), 4).as("recall"),
                Rounding.roundN(col("cand_frac"), 4).as("cand_frac"))

    // LSH: a query scores its own hyperplane bucket (minus itself)
    val bucketed = embeddings.select(col("vec_id"),
      plane_bucket(col("embedding"), planes).as("bucket"))
    val bsizes = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("bn"))
    val lshFrac = bucketed.filter(col("vec_id") < nQueries)
      .join(bsizes, "bucket")
      .agg((avg(col("bn") - 1) / n).as("cand_frac"))
    val lshRow = row(s"lsh[planes=$planes]",
      lshTopK(embeddings, nQueries, k, planes), lshFrac)

    // multi-table OR-construction at the SAME per-table plane budget:
    // a query scores the union of its L buckets; cand_frac counts the
    // DISTINCT candidates (a vector colliding in 2 tables scores once)
    val mtBuckets = (0 until NumTables).map(t =>
      plane_bucket(col("embedding"), planes, t * planes))
    val mtBanded = embeddings.select(col("vec_id"),
      posexplode(array(mtBuckets: _*)).as(Seq("tbl", "bucket")))
    val mtFrac = mtBanded.select(col("vec_id").as("c_id"), col("tbl"),
        col("bucket"))
      .join(broadcast(mtBanded.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))),
        Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id")).distinct()
      .groupBy(col("q_id")).agg(count(lit(1)).as("cand"))
      .agg((avg(col("cand")) / n).as("cand_frac"))
    val mtRow = row(s"lsh-or[L=$NumTables,planes=$planes]",
      multiTableLshTopK(embeddings, nQueries, k, NumTables, planes), mtFrac)

    // IVF at K ~ sqrt(n): a query scores the union of its probed cells
    val csizes = assignedCells(embeddings, cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("cn"))
    val ivfRows = probes.map { p =>
      val frac = probeCells(embeddings, nQueries, p, cents)
        .join(csizes, "cell")
        .groupBy(col("q_id")).agg(sum(col("cn")).as("probed"))
        .agg((avg(col("probed")) / n).as("cand_frac"))
      row(s"ivf[K=${cents.size},probe=$p]",
        ivfMultiProbe(embeddings, nQueries, k, p, cents), frac)
    }
    // PQ: the code scan is cheap table lookups over the WHOLE corpus;
    // the cost axis is the shortlist R the exact re-rank must score
    // (cand_frac = R/n). Recall is measured against exact L2 — the
    // metric PQ codes quantize — so these rows answer "how big a
    // shortlist buys how much of the true top-k".
    val exactL2 = exactL2TopK(embeddings, nQueries, k)
      .select(col("q_id"), col("neighbor_id")).localCheckpoint()
    val pqRows = shortlists.map { r =>
      row(s"pq-l2[R=$r]", pqTopK(embeddings, nQueries, r),
          embeddings.sparkSession.range(1).select(
            (lit(math.min(r, n).toDouble) / n).as("cand_frac")),
          baseline = exactL2)
    }

    // IVF-PQ: the billion-scale composition — ADC runs only inside
    // the probed cells, so the code scan touches cand_frac of the
    // corpus (the ivf rows' cost axis) while each candidate costs 4
    // code bytes + 8 table lookups instead of a vector read. Recall
    // is the top-R(=head shortlist) vs exact L2, like the pq rows.
    // NOTE: vs flat PQ at the same R there is NO ordering invariant —
    // pruning restricts the candidate POOL (every IVF-PQ candidate
    // lies in a probed cell), but top-R within the restricted pool
    // can include exact neighbors whose global ADC rank is worse
    // than R, so pruning can RAISE recall by evicting distractors.
    // The spec pins a tolerance band, not an inequality.
    val ivfPqR = shortlists.headOption.getOrElse(50)
    val corpusCodes = pqCodes(embeddings)
      .select(col("vec_id").as("c_id"), col("codes"))
      .join(assignedCells(embeddings, cents)
              .select(col("vec_id").as("c_id"), col("cell")), "c_id")
      .localCheckpoint()
    val dts = pqDistTables(embeddings, nQueries).localCheckpoint()
    val adc = expr(s"aggregate(sequence(0, ${PqSubspaces - 1}), CAST(0 AS DOUBLE), " +
      s"(acc, j) -> acc + element_at(dt, j * $PqK + element_at(codes, j + 1) + 1))")
    val resCodes = ivfPqCodes(embeddings, cents).localCheckpoint()
    // trained codebook at the production cell count — one training run
    // + one encode pass (the cached index build) shared across the
    // probe operating points
    val (cbTr, trCodes) = trainedPqArtifacts(embeddings, cents)
    val ivfPqRows = probes.flatMap { p =>
      import org.apache.spark.sql.expressions.Window
      val qp = probeCells(embeddings, nQueries, p, cents)
        .select(col("q_id"), col("cell"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("c_id").asc)
      val approx = corpusCodes.join(broadcast(qp), "cell")
        .filter(col("q_id") =!= col("c_id"))
        .join(broadcast(dts), "q_id")
        .withColumn("adc", adc)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= ivfPqR)
        .select(col("q_id"), col("c_id").as("neighbor_id"))
      val frac = qp.join(csizes, "cell")
        .groupBy(col("q_id")).agg(sum(col("cn")).as("probed"))
        .agg((avg(col("probed")) / n).as("cand_frac")).localCheckpoint(eager = false)
      Seq(
        row(s"ivfpq[probe=$p,R=$ivfPqR]", approx, frac, baseline = exactL2),
        // the RESIDUAL variant (s10's encoding) at the same operating
        // point — same cells, same cost axis, so the recall delta is
        // exactly what the residual step buys at this code budget
        row(s"ivfpq-res[probe=$p,R=$ivfPqR]",
            ivfPqSearch(resCodes,
              ivfPqDistTables(embeddings, nQueries, p, cents), ivfPqR),
            frac, baseline = exactL2),
        // the TRAINED-codebook variant (s11): same cells, same cost
        // axis, so the delta vs ivfpq-res is exactly what two Lloyd
        // rounds on the residual distribution buy
        row(s"ivfpq-tr[probe=$p,R=$ivfPqR]",
            ivfPqSearch(trCodes,
              trainedDistTables(embeddings, nQueries, p, cents, cbTr),
              ivfPqR, acc = "BIGINT"),
            frac, baseline = exactL2))
    }
    // graph-ANN (s25): beam walk over the kNN graph at the SAME
    // production sizing; cand_frac = the exact-scored (visited)
    // fraction — the vectors whose full embedding the walk read
    def mkGraphRow(gb: Int, gh: Int, gk: Int, tag: String = ""): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val gEdges = knnJoin(embeddings, gk, 2, cents)
        .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
        .localCheckpoint()
      val gSeeds = kcenterSeed(embeddings, 8)
        .select(col("vec_id").as("c_id")).localCheckpoint()
      val gVisited = beamWalk(embeddings, nQueries, gSeeds,
        fr => fr.join(gEdges, fr("c_id") === gEdges("src"))
          .select(fr("q_id"), gEdges("dst").as("c_id")),
        gb, gh).localCheckpoint()
      val wG = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("c_id"))
      val gApprox = gVisited.withColumn("rn", row_number().over(wG))
        .filter(col("rn") <= k)
        .select(col("q_id"), col("c_id").as("neighbor_id"))
      val gFrac = gVisited.groupBy(col("q_id")).agg(count(lit(1)).as("vis"))
        .agg((avg(col("vis")) / n).as("cand_frac"))
      row(s"graph$tag[B=$gb,H=$gh,gk=$gk]", gApprox, gFrac)
    }
    // s30: the SAME level-0 budget as the graph row, entered through
    // the hierarchy instead of the k-center seeds — the recall delta
    // between these two rows is exactly what the layered descent buys
    // (localized entry), and its cost delta is the upper-level visits
    def mkHierRow(gb: Int, gh: Int, gk: Int, tag: String = ""): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val hVisited = graphHierWalk(embeddings, nQueries, gb, gh, gk,
          nProbe = 2, maxLevel = 2, upperBeam = 1, upperHops = 2, cents)
        .localCheckpoint()
      val wG = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("c_id"))
      val hApprox = hVisited.withColumn("rn", row_number().over(wG))
        .filter(col("rn") <= k)
        .select(col("q_id"), col("c_id").as("neighbor_id"))
      val hFrac = hVisited.groupBy(col("q_id")).agg(count(lit(1)).as("vis"))
        .agg((avg(col("vis")) / n).as("cand_frac"))
      row(s"hier$tag[L=2,B=$gb,H=$gh,gk=$gk]", hApprox, hFrac)
    }
    // the (gk, beam, hops) knee from tools.GraphGrid at the jittered
    // 10x corpus (PLANS round 13): gk is the recall lever (0.011 →
    // 0.033 @ ~same scored%), beam > 4 buys visits but no recall,
    // hops are cheap with the expansion-tracked walk — so the row
    // advertises gk=12, B=4, H=4 instead of the smallest passing point
    val graphRow = mkGraphRow(4, 4, 12)
    val hierRow = mkHierRow(4, 4, 12)
    // BUDGET-PARITY rows (round 14): the knee rows above exact-score a
    // smaller candidate fraction than ivf[probe=2], so the sweep's
    // frontier compared rows at DIFFERENT scored budgets. graph-b /
    // hier-b walk with the hop count raised until the walk's visit
    // budget (seeds + H·B·gk per query) reaches ivf[probe=2]'s
    // measured per-query candidate count — the like-for-like frontier
    // point that makes "does the graph family ever cross?" a measured
    // statement instead of a caveat.
    val ivf2Budget = probeCells(embeddings, nQueries, 2, cents)
      .join(csizes, "cell")
      .groupBy(col("q_id")).agg(sum(col("cn")).as("probed"))
      .agg(avg(col("probed")).as("b")).head().getDouble(0)
    val bHops = math.max(4, math.ceil((ivf2Budget - 8.0) / (4 * 12)).toInt)
    val graphBudgetRow = mkGraphRow(4, bHops, 12, tag = "-b")
    val hierBudgetRow = mkHierRow(4, bHops, 12, tag = "-b")
    // ...and the BEAM lever at the same nominal budget: a deep
    // narrow walk saturates its reachable frontier (expansion
    // overlap) long before spending the budget, so the second parity
    // row widens the beam 3× and re-derives hops — if the family
    // still does not cross, that is a statement about the graph, not
    // about one walk shape
    val bBeam = 12
    val bHops2 = math.max(2, math.ceil((ivf2Budget - 8.0) / (bBeam * 12)).toInt)
    val graphBudgetRow2 = mkGraphRow(bBeam, bHops2, 12, tag = "-b")
    val hierBudgetRow2 = mkHierRow(bBeam, bHops2, 12, tag = "-b")
    (lshRow +: mtRow +: graphRow +: hierRow +: graphBudgetRow +:
      hierBudgetRow +: graphBudgetRow2 +: hierBudgetRow2 +:
      (ivfRows ++ pqRows ++ ivfPqRows))
      .reduce(_.unionByName(_))
  }

  // ---- s07: kNN classification ----------------------------------------

  /** s07: k-nearest-neighbor majority-vote classification over the
    * embedding space — the standard "label by neighborhood" eval that
    * turns an ANN index into a classifier (and measures embedding
    * quality). The top-k frame is tiny (queries x k) so it BROADCASTS
    * into a probe of the corpus scan for neighbor labels; votes and
    * the winner-per-query window all run on queries x k rows. Swap
    * bruteForceTopK for lshTopK/ivfTopK and the classifier runs at
    * ANN cost — same downstream plan.
    */
  def knnClassify(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topk = bruteForceTopK(embeddings, maxQueryId, k)
      .select(col("q_id"), col("neighbor_id"))
    val votes = embeddings.select(col("vec_id"), col("label"))
      .join(broadcast(topk), col("vec_id") === col("neighbor_id"))
      .groupBy(col("q_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("label").asc)
    val truth = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("t_id"), col("label").as("true_label"))
    votes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(truth), col("q_id") === col("t_id"))
      .select(col("q_id"), col("true_label"),
              col("label").as("predicted_label"), col("votes"))
      .orderBy(col("q_id"))
  }

  def knnClassifyOracle(maxQueryId: Long = 8, k: Int = 5): String =
    s"""WITH v AS (SELECT t.q_id, e.label, count(*) AS votes
           FROM (${bruteForceTopKOracle(maxQueryId, k)}) t
           JOIN embeddings e ON t.neighbor_id = e.vec_id
           GROUP BY t.q_id, e.label),
       r AS (SELECT q_id, label, votes, row_number() OVER (PARTITION BY q_id
           ORDER BY votes DESC, label ASC) AS rn FROM v)
       SELECT r.q_id, q.label AS true_label, r.label AS predicted_label,
         CAST(votes AS BIGINT) AS votes
       FROM r JOIN embeddings q ON r.q_id = q.vec_id
       WHERE rn = 1 ORDER BY r.q_id"""

  def annRecallOracle(maxQueryId: Long = 8, k: Int = 3): String =
    s"""SELECT e.q_id, count(*) AS k_eval,
         CAST(sum(CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hits,
         round(CAST(sum(CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
               / count(*), 4) AS recall
       FROM (${bruteForceTopKOracle(maxQueryId, k)}) e
       LEFT JOIN (${lshTopKOracle(maxQueryId, k)}) a
         ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id
       GROUP BY e.q_id ORDER BY e.q_id"""

  // ---- s08: int8 scalar-quantization recall ---------------------------

  /** Top-k under quantized cosine — the [[bruteForceTopK]] shape
    * scored on per-vector symmetric integer codes (see [[codesExpr]]).
    * Cosine is scale-invariant, so scoring the INTEGER code vectors
    * directly equals scoring the dequantized floats — no dequant pass
    * exists anywhere. */
  private def quantizedTopK(embeddings: DataFrame, maxQueryId: Long, k: Int,
                            levels: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Dialect.spark
    val corpus = embeddings
      .select(col("vec_id").as("c_id"),
              expr(codesExpr(d, "embedding", levels)).as("ce"))
      .withColumn("cn", expr(normExpr(d, "ce")))
    val queries = corpus.filter(col("c_id") < maxQueryId)
      .select(col("c_id").as("q_id"), col("ce").as("qe"), col("cn").as("qn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_q").desc, col("c_id"))
    corpus.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .withColumn("cos_q", expr(dot(d, "qe", "ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id").as("neighbor_id"))
  }

  /** s08: what does scalar quantization COST in recall? At 100 TB the
    * embedding store is the bandwidth bill — int8 codes cut every
    * scan, shuffle and broadcast of vectors 4×, int4 8× — and this
    * eval is the evidence for where on the compression/recall
    * frontier the corpus can afford to sit: per query, recall@k of
    * int8-quantized and int4-quantized cosine top-k against the
    * exact-cosine top-k (same queries×k join-and-count frame as
    * [[annRecall]]). The quantizer is floor-based so the integer
    * codes are bit-reproducible cross-engine (no round-half boundary
    * — see [[codesExpr]]), which is what lets a DuckDB oracle replay
    * both index builds exactly.
    */
  def quantizedRecall(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 5): DataFrame = {
    val exact = bruteForceTopK(embeddings, maxQueryId, k)
      .select(col("q_id"), col("neighbor_id"))
    val int8 = quantizedTopK(embeddings, maxQueryId, k, levels = 127)
      .withColumn("hit8", lit(1L))
    val int4 = quantizedTopK(embeddings, maxQueryId, k, levels = 7)
      .withColumn("hit4", lit(1L))
    exact.join(broadcast(int8), Seq("q_id", "neighbor_id"), "left")
      .join(broadcast(int4), Seq("q_id", "neighbor_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("k_eval"),
           sum(coalesce(col("hit8"), lit(0L))).as("hits_int8"),
           sum(coalesce(col("hit4"), lit(0L))).as("hits_int4"))
      .withColumn("recall_int8",
        Rounding.roundN(col("hits_int8").cast("double") / col("k_eval"), 4))
      .withColumn("recall_int4",
        Rounding.roundN(col("hits_int4").cast("double") / col("k_eval"), 4))
      .select(col("q_id"), col("k_eval"), col("hits_int8"), col("recall_int8"),
              col("hits_int4"), col("recall_int4"))
      .orderBy(col("q_id"))
  }

  def quantizedRecallOracle(maxQueryId: Long = 8, k: Int = 5): String = {
    val d = Dialect.duck
    def approx(levels: Int): String =
      s"""WITH codes AS (SELECT vec_id, ${codesExpr(d, "embedding", levels)} AS code
             FROM embeddings),
         c AS (SELECT vec_id AS c_id, code AS ce, ${normExpr(d, "code")} AS cn
               FROM codes),
         q AS (SELECT vec_id AS q_id, code AS qe, ${normExpr(d, "code")} AS qn
               FROM codes WHERE vec_id < $maxQueryId),
         scored AS (SELECT q_id, c_id, ${dot(d, "qe", "ce")} / (qn * cn) AS cos_q
           FROM c JOIN q ON q_id <> c_id),
         ranked AS (SELECT q_id, c_id,
             row_number() OVER (PARTITION BY q_id ORDER BY cos_q DESC, c_id) AS rank
           FROM scored)
         SELECT q_id, c_id AS neighbor_id FROM ranked WHERE rank <= $k"""
    s"""SELECT e.q_id, count(*) AS k_eval,
         CAST(sum(CASE WHEN a8.neighbor_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits_int8,
         round(CAST(sum(CASE WHEN a8.neighbor_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
               / count(*), 4) AS recall_int8,
         CAST(sum(CASE WHEN a4.neighbor_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits_int4,
         round(CAST(sum(CASE WHEN a4.neighbor_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
               / count(*), 4) AS recall_int4
       FROM (${bruteForceTopKOracle(maxQueryId, k)}) e
       LEFT JOIN (${approx(127)}) a8
         ON e.q_id = a8.q_id AND e.neighbor_id = a8.neighbor_id
       LEFT JOIN (${approx(7)}) a4
         ON e.q_id = a4.q_id AND e.neighbor_id = a4.neighbor_id
       GROUP BY e.q_id ORDER BY e.q_id"""
  }

  // ---- s09: product-quantization (PQ) recall --------------------------

  /** PQ geometry: 8 subspaces x 8 dims, 16 codebook entries per
    * subspace — a 64-float vector (256 B) becomes 8 four-bit codes
    * (4 B): 64x smaller than float32 and 16x smaller than s08's int4
    * codes, the step that makes billion-vector ANN fit in memory
    * (IVF-PQ). Codebook entries are CONTIGUOUS corpus vector ids,
    * static so the oracle SQL stays corpus-independent (the
    * centroidIds/NumPlanes convention; production training is a
    * per-subspace k-means — s04's Lloyd machinery — same plan shape).
    */
  val PqSubspaces = 8
  val PqSubDim: Int = Dims / PqSubspaces
  val PqCodebookIds: Seq[Long] = 200L until 216L
  private val PqK = PqCodebookIds.size

  /** Subspace-j L2^2 between `e` and `c` — identical left-to-right
    * fold on both engines; squared via self-multiplication (round-trip
    * safe, no pow()). `j` may be a column reference. */
  private def pqSubDist(d: Dialect, e: String, c: String, j: String): String = {
    val diff = s"(CAST(${d.elem(e, "i")} AS DOUBLE) - CAST(${d.elem(c, "i")} AS DOUBLE))"
    d.sumDouble(d.transform(
      d.range(s"$j * $PqSubDim + 1", s"$j * $PqSubDim + $PqSubDim"),
      s"i -> $diff * $diff"))
  }

  private def l2Expr(d: Dialect, a: String, b: String): String = {
    val diff = s"(CAST(${d.elem(a, "i")} AS DOUBLE) - CAST(${d.elem(b, "i")} AS DOUBLE))"
    d.sumDouble(d.transform(d.range("1", Dims.toString), s"i -> $diff * $diff"))
  }

  private def pqCodebook(embeddings: DataFrame): DataFrame =
    embeddings.filter(col("vec_id").isin(PqCodebookIds: _*))
      .select((col("vec_id") - lit(PqCodebookIds.head)).cast("int").as("cidx"),
              col("embedding").as("cemb"))

  /** The (vector, codebook entry, subspace, subdistance) fan-out both
    * the encoder and the query distance tables read — `side`'s rows
    * against the 16-row broadcast codebook (always extracted from the
    * FULL corpus) x 8 subspaces. */
  private def pqSubDists(all: DataFrame, side: DataFrame): DataFrame =
    side.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(pqCodebook(all)))
      .select(col("vec_id"), col("cidx"),
              explode(expr(s"sequence(0, ${PqSubspaces - 1})")).as("j"),
              col("embedding"), col("cemb"))
      .withColumn("sd", expr(pqSubDist(Dialect.spark, "embedding", "cemb", "j")))

  /** Per-vector PQ codes: argmin codebook entry per subspace
    * (tie-break lowest entry), assembled in subspace order. The index
    * BUILD: one map-side pass against the broadcast codebook; after
    * it the scan side never touches vectors again. */
  private def pqCodes(embeddings: DataFrame): DataFrame =
    pqCodesAgainst(embeddings, embeddings)

  /** [[pqCodes]] with the codebook source given explicitly — the
    * [[GraphIndex]] encode kernel: arrivals/corpora are coded against
    * the 16 codebook vectors extracted from `codebookSrc` (the stored
    * index's own records, so stored and fresh codes agree). */
  private[graft] def pqCodesAgainst(codebookSrc: DataFrame,
                                    side: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("sd").asc, col("cidx").asc)
    pqSubDists(codebookSrc, side)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(struct(j, cidx))), s -> s.cidx)")
        .as("codes"))
  }

  /** Public alias for the encoder ([[GraphIndex.build]] stores codes
    * inside node records). */
  private[graft] def pqCodesFor(embeddings: DataFrame): DataFrame =
    pqCodes(embeddings)

  /** Per-query ADC distance tables: dt[j*K + c] = subdist(query, entry
    * c, subspace j) — 128 doubles per query, the only thing the scan
    * needs from the query side. */
  private def pqDistTables(embeddings: DataFrame, maxQueryId: Long): DataFrame =
    pqDistTablesAgainst(embeddings,
      embeddings.filter(col("vec_id") < maxQueryId))

  /** [[pqDistTables]] with the codebook source given explicitly
    * (the [[GraphIndex.probePq]] query-side kernel). */
  private[graft] def pqDistTablesAgainst(codebookSrc: DataFrame,
                                         queries: DataFrame): DataFrame =
    pqSubDists(codebookSrc, queries)
      .groupBy(col("vec_id").as("q_id"))
      .agg(expr("transform(array_sort(collect_list(struct(j, cidx, sd))), s -> s.sd)")
        .as("dt"))

  /** Asymmetric-distance top-k: the corpus streams 4-BYTE code rows,
    * queries broadcast their distance tables, and the approximate L2^2
    * is 8 table lookups per (query, vector) — no vector arithmetic in
    * the scan at all. This is the PQ bandwidth win made visible in
    * the plan: the scan side's projection is (vec_id, codes). */
  private[graft] def pqTopK(embeddings: DataFrame, maxQueryId: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val adc = expr(s"aggregate(sequence(0, ${PqSubspaces - 1}), CAST(0 AS DOUBLE), " +
      s"(acc, j) -> acc + element_at(dt, j * $PqK + element_at(codes, j + 1) + 1))")
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("c_id").asc)
    pqCodes(embeddings).select(col("vec_id").as("c_id"), col("codes"))
      .join(broadcast(pqDistTables(embeddings, maxQueryId)), col("q_id") =!= col("c_id"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id").as("neighbor_id"))
  }

  /** Exact L2^2 top-k — the ground truth PQ approximates (PQ codes
    * quantize Euclidean cells, so the honest baseline is L2, not the
    * cosine of s01). */
  private[graft] def exactL2TopK(embeddings: DataFrame, maxQueryId: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = embeddings.select(col("vec_id").as("c_id"), col("embedding").as("ce"))
    val queries = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("dist").asc, col("c_id").asc)
    corpus.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .withColumn("dist", expr(l2Expr(Dialect.spark, "qe", "ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id").as("neighbor_id"))
  }

  /** s09: SHORTLIST recall of PQ asymmetric-distance search — the
    * fraction of each query's exact-L2 top-k found in PQ's top-R
    * (R = 10k) shortlist. This is how PQ is actually deployed: the
    * 4-byte codes produce a cheap candidate shortlist and an exact
    * re-rank (on R vectors, not N) finishes the query — so shortlist
    * membership, not top-k agreement, is the operative contract
    * (recall@k-in-top-R, the standard IVF-PQ operating point). s08's
    * scalar codes are the 4x/8x compression rungs; PQ is the 64x rung
    * billion-scale indexes use. Same queries x k eval frame as
    * s06/s08.
    */
  def pqRecall(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 5,
               shortlist: Int = 50): DataFrame = {
    val exact = exactL2TopK(embeddings, maxQueryId, k)
    val pq = pqTopK(embeddings, maxQueryId, shortlist).withColumn("hit", lit(1L))
    exact.join(broadcast(pq), Seq("q_id", "neighbor_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("k_eval"),
           sum(coalesce(col("hit"), lit(0L))).as("hits_short"))
      .withColumn("recall_short",
        Rounding.roundN(col("hits_short").cast("double") / col("k_eval"), 4))
      .select(col("q_id"), col("k_eval"), col("hits_short"), col("recall_short"))
      .orderBy(col("q_id"))
  }

  // ---- s10: IVF-PQ with per-cell residual codes -----------------------

  /** Element-wise difference as a double list — the residual
    * arithmetic, identical element order on both engines. */
  private def residualExpr(d: Dialect, a: String, b: String): String =
    if (d eq Dialect.spark)
      s"zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
    else
      d.transform(d.range("1", Dims.toString),
        s"i -> CAST(${d.elem(a, "i")} AS DOUBLE) - CAST(${d.elem(b, "i")} AS DOUBLE)")

  /** Corpus/query residuals: each vector minus ITS cell's centroid
    * (assignment from [[assignedCells]], so search and eval share the
    * same Voronoi partition). */
  private def residuals(embeddings: DataFrame,
                        centIds: Seq[Long] = centroidIds): DataFrame = {
    val cents = embeddings.filter(col("vec_id").isin(centIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
    assignedCells(embeddings, centIds)
      .join(broadcast(cents), col("cell") === col("cent_id"))
      .select(col("vec_id"), col("cell"),
              expr(residualExpr(Dialect.spark, "embedding", "cemb")).as("res"))
  }

  /** TRUE IVF-PQ codes (Jégou et al. 2011, the billion-scale
    * composition): every corpus vector is PQ-coded as its RESIDUAL
    * from its IVF cell centroid. Residuals concentrate around the
    * origin regardless of which cell a vector lives in, so one
    * codebook quantizes every cell's local geometry — that is why
    * IVF-PQ beats flat-PQ-plus-cells at the same code budget, and why
    * the residual step exists at all. Codebook = the residuals of the
    * pinned [[PqCodebookIds]] vectors (16 rows, broadcast; the
    * corpus-independent-SQL convention — production trains per-
    * subspace k-means on sampled residuals, same plan shape). One
    * map-side pass: the scan side afterwards streams
    * (cell, 4-byte codes) and never touches vectors again. */
  private def ivfPqCodes(embeddings: DataFrame,
                         centIds: Seq[Long] = centroidIds): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val res = residuals(embeddings, centIds).localCheckpoint(eager = false)
    val cbr = res.filter(col("vec_id").isin(PqCodebookIds: _*))
      .select((col("vec_id") - lit(PqCodebookIds.head)).cast("int").as("cidx"),
              col("res").as("cres"))
    val w = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("sd").asc, col("cidx").asc)
    res.crossJoin(broadcast(cbr))
      .select(col("vec_id"), col("cell"), col("cidx"),
              explode(expr(s"sequence(0, ${PqSubspaces - 1})")).as("j"),
              col("res"), col("cres"))
      .withColumn("sd", expr(pqSubDist(Dialect.spark, "res", "cres", "j")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("vec_id"), col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(j, cidx))), s -> s.cidx)")
        .as("codes"))
  }

  /** Per-(query, probed cell) ADC distance tables: the query's
    * residual AGAINST THAT CELL vs the residual codebook — nProbe x
    * 128 doubles per query, the whole query-side payload. */
  private def ivfPqDistTables(embeddings: DataFrame, maxQueryId: Long,
                              nProbe: Int,
                              centIds: Seq[Long] = centroidIds): DataFrame = {
    val centsE = embeddings.filter(col("vec_id").isin(centIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
    val cbr = residuals(embeddings, centIds)
      .filter(col("vec_id").isin(PqCodebookIds: _*))
      .select((col("vec_id") - lit(PqCodebookIds.head)).cast("int").as("cidx"),
              col("res").as("cres"))
    probeCells(embeddings, maxQueryId, nProbe, centIds)
      .join(broadcast(centsE), col("cell") === col("cent_id"))
      .select(col("q_id"), col("cell"),
              expr(residualExpr(Dialect.spark, "qe", "cemb")).as("qr"))
      .crossJoin(broadcast(cbr))
      .select(col("q_id"), col("cell"), col("cidx"),
              explode(expr(s"sequence(0, ${PqSubspaces - 1})")).as("j"),
              col("qr"), col("cres"))
      .withColumn("sd", expr(pqSubDist(Dialect.spark, "qr", "cres", "j")))
      .groupBy(col("q_id"), col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(j, cidx, sd))), s -> s.sd)")
        .as("dt"))
  }

  /** IVF-PQ shortlist per query: code rows join the probed cells (the
    * equi-join IS the cell pruning), ADC = 8 table lookups against
    * the (query, cell) table, rank <= R. */
  /** The ADC scan given prebuilt code rows and (query, cell) tables —
    * split out so the recall sweep can amortize ONE code build across
    * its probe operating points. */
  private def ivfPqSearch(codes: DataFrame, dts: DataFrame, r: Int,
                          acc: String = "DOUBLE"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val adc = expr(s"aggregate(sequence(0, ${PqSubspaces - 1}), CAST(0 AS $acc), " +
      s"(acc, j) -> acc + element_at(dt, j * $PqK + element_at(codes, j + 1) + 1))")
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("c_id").asc)
    codes.select(col("vec_id").as("c_id"), col("cell"), col("codes"))
      .join(broadcast(dts), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= r)
      .select(col("q_id"), col("c_id").as("neighbor_id"))
  }

  private def ivfPqTopK(embeddings: DataFrame, maxQueryId: Long, r: Int,
                        nProbe: Int,
                        centIds: Seq[Long] = centroidIds): DataFrame =
    ivfPqSearch(ivfPqCodes(embeddings, centIds),
                ivfPqDistTables(embeddings, maxQueryId, nProbe, centIds), r)

  /** s10: TRUE IVF-PQ (per-cell residual codes) shortlist recall —
    * the s09 contract (exact-L2 top-k membership in the ADC top-R,
    * because production IVF-PQ feeds an exact re-rank) over the
    * s03/s05 cell structure: candidates are only the probed cells'
    * members, each scored by 8 table lookups on its 4-byte residual
    * code. The operating point every billion-vector index runs:
    * cells bound the scan, residual codes bound the bytes per
    * candidate, R bounds the re-rank. Full DuckDB replay of
    * assignment, residuals, codes, per-cell tables and ranking.
    */
  def ivfPqRecall(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 5,
                  shortlist: Int = 50, nProbe: Int = 2): DataFrame = {
    val exact = exactL2TopK(embeddings, maxQueryId, k)
    val appx = ivfPqTopK(embeddings, maxQueryId, shortlist, nProbe)
      .withColumn("hit", lit(1L))
    exact.join(broadcast(appx), Seq("q_id", "neighbor_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("k_eval"),
           sum(coalesce(col("hit"), lit(0L))).as("hits_short"))
      .withColumn("recall_short",
        Rounding.roundN(col("hits_short").cast("double") / col("k_eval"), 4))
      .select(col("q_id"), col("k_eval"), col("hits_short"), col("recall_short"))
      .orderBy(col("q_id"))
  }

  def ivfPqRecallOracle(maxQueryId: Long = 8, k: Int = 5,
                        shortlist: Int = 50, nProbe: Int = 2): String = {
    val d = Dialect.duck
    val lo = PqCodebookIds.head
    val hi = PqCodebookIds.last
    s"""WITH $assignedCtes,
       resid AS (SELECT a.vec_id, a.cell,
           ${residualExpr(d, "a.embedding", "c.cemb")} AS res
         FROM assigned a JOIN cents c ON a.cell = c.cent_id),
       cbr AS (SELECT vec_id - $lo AS cidx, res AS cres
         FROM resid WHERE vec_id BETWEEN $lo AND $hi),
       rsub AS (SELECT r.vec_id, r.cell, b.cidx, t.j,
           ${pqSubDist(d, "r.res", "b.cres", "t.j")} AS sd
         FROM resid r CROSS JOIN cbr b
         CROSS JOIN generate_series(0, ${PqSubspaces - 1}) t(j)),
       codes AS (SELECT vec_id, cell, list(cidx ORDER BY j) AS codes
         FROM (SELECT vec_id, cell, j, cidx, row_number() OVER (
                 PARTITION BY vec_id, j ORDER BY sd, cidx) AS rn FROM rsub) x
         WHERE rn = 1 GROUP BY vec_id, cell),
       qprobe AS (SELECT vec_id AS q_id, cent_id AS cell, embedding AS qe
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn
               FROM scoredc WHERE vec_id < $maxQueryId) t
         WHERE crn <= $nProbe),
       qres AS (SELECT q.q_id, q.cell,
           ${residualExpr(d, "q.qe", "c.cemb")} AS qr
         FROM qprobe q JOIN cents c ON q.cell = c.cent_id),
       qsub AS (SELECT q.q_id, q.cell, b.cidx, t.j,
           ${pqSubDist(d, "q.qr", "b.cres", "t.j")} AS sd
         FROM qres q CROSS JOIN cbr b
         CROSS JOIN generate_series(0, ${PqSubspaces - 1}) t(j)),
       dt AS (SELECT q_id, cell, list(sd ORDER BY j, cidx) AS dt
         FROM qsub GROUP BY q_id, cell),
       scored AS (SELECT d.q_id, c.vec_id AS c_id,
           list_reduce(list_transform(generate_series(0, ${PqSubspaces - 1}),
             j -> dt[j * $PqK + codes[j + 1] + 1]), (a, b) -> a + b) AS adc
         FROM codes c JOIN dt d ON c.cell = d.cell WHERE d.q_id <> c.vec_id),
       appx AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS rank
           FROM scored) r WHERE rank <= $shortlist),
       exact AS (SELECT q_id, c_id AS neighbor_id FROM (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY ${l2Expr(d, "q.embedding", "c.embedding")}, c.vec_id) AS rank
           FROM embeddings c JOIN embeddings q
             ON q.vec_id < $maxQueryId AND q.vec_id <> c.vec_id) t
         WHERE rank <= $k)
       SELECT e.q_id, count(*) AS k_eval,
         CAST(sum(CASE WHEN p.c_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits_short,
         round(CAST(sum(CASE WHEN p.c_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
               / count(*), 4) AS recall_short
       FROM exact e LEFT JOIN appx p
         ON e.q_id = p.q_id AND e.neighbor_id = p.c_id
       GROUP BY e.q_id ORDER BY e.q_id"""
  }

  def pqRecallOracle(maxQueryId: Long = 8, k: Int = 5,
                     shortlist: Int = 50): String = {
    val d = Dialect.duck
    val lo = PqCodebookIds.head
    val hi = PqCodebookIds.last
    s"""WITH cb AS (SELECT vec_id - $lo AS cidx, embedding AS cemb
           FROM embeddings WHERE vec_id BETWEEN $lo AND $hi),
       sub AS (SELECT e.vec_id, c.cidx, t.j,
           ${pqSubDist(d, "e.embedding", "c.cemb", "t.j")} AS sd
         FROM embeddings e CROSS JOIN cb c
         CROSS JOIN generate_series(0, ${PqSubspaces - 1}) t(j)),
       codes AS (SELECT vec_id, list(cidx ORDER BY j) AS codes
         FROM (SELECT vec_id, j, cidx, row_number() OVER (
                 PARTITION BY vec_id, j ORDER BY sd, cidx) AS rn FROM sub) x
         WHERE rn = 1 GROUP BY vec_id),
       dt AS (SELECT vec_id AS q_id, list(sd ORDER BY j, cidx) AS dt
         FROM sub WHERE vec_id < $maxQueryId GROUP BY vec_id),
       scored AS (SELECT q.q_id, c.vec_id AS c_id,
           list_reduce(list_transform(generate_series(0, ${PqSubspaces - 1}),
             j -> dt[j * $PqK + codes[j + 1] + 1]), (a, b) -> a + b) AS adc
         FROM codes c CROSS JOIN dt q WHERE q.q_id <> c.vec_id),
       pq AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS rank
           FROM scored) r WHERE rank <= $shortlist),
       exact AS (SELECT q_id, c_id AS neighbor_id FROM (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY ${l2Expr(d, "q.embedding", "c.embedding")}, c.vec_id) AS rank
           FROM embeddings c JOIN embeddings q
             ON q.vec_id < $maxQueryId AND q.vec_id <> c.vec_id) t
         WHERE rank <= $k)
       SELECT e.q_id, count(*) AS k_eval,
         CAST(sum(CASE WHEN p.c_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits_short,
         round(CAST(sum(CASE WHEN p.c_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
               / count(*), 4) AS recall_short
       FROM exact e LEFT JOIN pq p
         ON e.q_id = p.q_id AND e.neighbor_id = p.c_id
       GROUP BY e.q_id ORDER BY e.q_id"""
  }

  // ---- s11: TRAINED per-subspace PQ codebooks (integer Lloyd) ---------

  /** Lloyd rounds for codebook training. Two rounds move the seed
    * entries most of the way to the local optimum (k-means converges
    * geometrically; production IVF-PQ trainers run 10-25 rounds on a
    * sampled slice — the plan shape per round is identical, this is
    * the unrolled-and-replayable count). */
  val PqTrainIters = 2

  /** Training-sample stride: the Lloyd loop reads vec_id % mod == 0
    * residuals only. Training cost is O(sample * K * iters) however
    * big the corpus gets — the encode pass (every vector, one
    * assignment) is the only full-corpus stage, exactly how a
    * billion-vector index trains (FAISS trains on 10^5-10^6 sampled
    * vectors, encodes 10^9). */
  val PqTrainSampleMod = 4L

  /** 2^20: multiplying a double by a power of two is EXACT (exponent
    * shift, no mantissa rounding), so floor(x * 2^20) is the same
    * BIGINT on every engine — the property the whole trained pipeline
    * leans on. From here every distance, sum and floor-mean is integer
    * arithmetic: associative, order-free, bit-identical under Spark's
    * nondeterministic partial-agg order AND DuckDB's serial order.
    * (Contrast the double-valued s09/s10 path, which needs fold-order
    * discipline; training's groupBy means would break it.) */
  private val PqIntScale = "1048576.0"

  /** res (double list) -> integer-grid residual (BIGINT list). */
  private def intResExpr(d: Dialect, res: String): String =
    d.transform(res, s"x -> CAST(floor(x * $PqIntScale) AS BIGINT)")

  /** Integer subspace-j L2^2 between full-vector slice ri[j*8+1..j*8+8]
    * and an 8-entry codebook slice cvec — pure BIGINT. `j` may be a
    * column reference. */
  private def pqSubDistInt(d: Dialect, ri: String, cvec: String, j: String): String = {
    val diff = s"(${d.elem(ri, s"$j * $PqSubDim + i")} - ${d.elem(cvec, "i")})"
    d.sumLong(d.transform(d.range("1", PqSubDim.toString), s"i -> $diff * $diff"))
  }

  /** Integer-grid corpus residuals (vec_id, cell, ri). */
  private def intResiduals(embeddings: DataFrame,
                           centIds: Seq[Long] = centroidIds): DataFrame =
    residuals(embeddings, centIds)
      .select(col("vec_id"), col("cell"),
              expr(intResExpr(Dialect.spark, "res")).as("ri"))

  /** One Lloyd ASSIGNMENT: each input vector's subspace-j slice to its
    * nearest codebook entry (tie: lowest cidx). cb is (j, cidx, cvec)
    * — K*subspaces = 128 rows, broadcast; the fan-out is the same
    * 128x the untrained encoder already pays. */
  private def pqTrainAssign(ri: DataFrame, cb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("sd").asc, col("cidx").asc)
    ri.crossJoin(broadcast(cb))
      .withColumn("sd", expr(pqSubDistInt(Dialect.spark, "ri", "cvec", "j")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("j"), col("cidx"), col("ri"))
  }

  /** One Lloyd UPDATE: entry (j, cidx) moves to the floor-mean of its
    * members' subspace slices; empty entries keep their previous
    * center (the standard empty-cluster rule, via left join +
    * coalesce). floor(sum/count) is exact cross-engine: the integer
    * sum is < 2^53 so the double division is correctly rounded, and
    * the quotient is never within 2^-31 of a wrong integer boundary.
    * The shuffle carries (j, cidx, i) partial sums — 1024 cells of
    * BIGINT — never vectors: s04's Lloyd-step shape. */
  private def pqTrainUpdate(assigned: DataFrame, cbPrev: DataFrame): DataFrame = {
    val means = assigned
      .select(col("j"), col("cidx"),
              explode(expr(s"sequence(1, $PqSubDim)")).as("i"), col("ri"))
      .withColumn("v", expr(s"element_at(ri, j * $PqSubDim + i)"))
      .groupBy(col("j"), col("cidx"), col("i"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
      .withColumn("m", expr("CAST(floor(CAST(s AS DOUBLE) / cnt) AS BIGINT)"))
      .groupBy(col("j"), col("cidx"))
      .agg(expr("transform(array_sort(collect_list(struct(i, m))), t -> t.m)")
        .as("mvec"))
    cbPrev.join(means, Seq("j", "cidx"), "left")
      .select(col("j"), col("cidx"),
              coalesce(col("mvec"), col("cvec")).as("cvec"))
  }

  /** Trained codebook from an integer-residual frame: seed with the
    * pinned [[PqCodebookIds]] residual slices (what s10 uses as-is),
    * then [[PqTrainIters]] Lloyd rounds over the stride sample. */
  private def trainedCodebookFrom(ir: DataFrame): DataFrame = {
    val sample = ir.filter(col("vec_id") % PqTrainSampleMod === 0)
    val cb0 = ir.filter(col("vec_id").isin(PqCodebookIds: _*))
      .select((col("vec_id") - lit(PqCodebookIds.head)).cast("int").as("cidx"),
              col("ri"))
      .select(col("cidx"),
              explode(expr(s"sequence(0, ${PqSubspaces - 1})")).as("j"), col("ri"))
      .withColumn("cvec", expr(
        s"transform(sequence(1, $PqSubDim), i -> element_at(ri, j * $PqSubDim + i))"))
      .select(col("j"), col("cidx"), col("cvec"))
    (1 to PqTrainIters).foldLeft(cb0) { (cb, _) =>
      pqTrainUpdate(pqTrainAssign(sample, cb), cb)
    }
  }

  /** Build counter for the spec that pins amortization: N queries
    * against one corpus must train/encode once, not N times. */
  @volatile var trainedPqBuilds: Long = 0L

  private val trainedPqCache = new Caching.BoundedCache[
    (org.apache.spark.sql.SparkSession, String, Seq[Long]),
    (DataFrame, DataFrame)](8)

  /** The s11 INDEX BUILD — (trained codebook, corpus code rows) — as a
    * persist point: training + the O(corpus) encode pass run once per
    * (corpus stamp, cell config) and every consumer (s11 query, sweep
    * operating points, repeat bench passes) probes the checkpointed
    * result. This is the honest production boundary: an IVF-PQ index
    * is trained/encoded once and serves queries for days; per-query
    * cost is the dts + ADC scan only. Derived/unstable frames build
    * fresh (same policy as the dedup pipeline cache). */
  private def trainedPqArtifacts(embeddings: DataFrame,
                                 centIds: Seq[Long]): (DataFrame, DataFrame) = {
    def build(): (DataFrame, DataFrame) = {
      trainedPqBuilds += 1
      val ir = intResiduals(embeddings, centIds).localCheckpoint()
      val cb = trainedCodebookFrom(ir).localCheckpoint()
      val codes = pqTrainAssign(ir, cb)
        .groupBy(col("vec_id"), col("cell"))
        .agg(expr("transform(array_sort(collect_list(struct(j, cidx))), s -> s.cidx)")
          .as("codes"))
        .localCheckpoint()
      (cb, codes)
    }
    val stamp = Caching.stamp(embeddings)
    if (stamp.isEmpty || !Caching.bareScan(embeddings)) build()
    else trainedPqCache.getOrElseUpdate(
      (embeddings.sparkSession, stamp, centIds))(build())
  }

  /** Query-side ADC tables against a TRAINED codebook: the query's
    * integer residual per probed cell vs all 128 entries — BIGINT
    * distances, so the later ADC sum is order-free. */
  private def trainedDistTables(embeddings: DataFrame, maxQueryId: Long,
                                nProbe: Int, centIds: Seq[Long],
                                cb: DataFrame): DataFrame = {
    val centsE = embeddings.filter(col("vec_id").isin(centIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
    probeCells(embeddings, maxQueryId, nProbe, centIds)
      .join(broadcast(centsE), col("cell") === col("cent_id"))
      .select(col("q_id"), col("cell"),
              expr(residualExpr(Dialect.spark, "qe", "cemb")).as("qres"))
      .withColumn("qi", expr(intResExpr(Dialect.spark, "qres")))
      .crossJoin(broadcast(cb))
      .withColumn("sd", expr(pqSubDistInt(Dialect.spark, "qi", "cvec", "j")))
      .groupBy(col("q_id"), col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(j, cidx, sd))), s -> s.sd)")
        .as("dt"))
  }

  /** s11: IVF-PQ recall with a TRAINED residual codebook — the
    * production path the s10 scaladoc names. Round-5 measurement
    * (RecallHarness) showed residual codes under the UNTRAINED stride
    * codebook score below raw-position codes: a codebook sampled from
    * vectors matches vector positions, not residuals. Training moves
    * the entries onto the residual distribution — per-subspace
    * k-means, the missing half of Jegou et al.'s recipe. Everything
    * after the 2^20 snap is integer arithmetic, so the DuckDB oracle
    * replays training, encoding and ADC bit-for-bit (no fold-order
    * caveats). Same recall contract and output shape as s09/s10.
    */
  def ivfPqTrainedRecall(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 5,
                         shortlist: Int = 50, nProbe: Int = 2): DataFrame = {
    val (cb, codes) = trainedPqArtifacts(embeddings, centroidIds)
    val dts = trainedDistTables(embeddings, maxQueryId, nProbe, centroidIds, cb)
    val appx = ivfPqSearch(codes, dts, shortlist, acc = "BIGINT")
      .withColumn("hit", lit(1L))
    exactL2TopK(embeddings, maxQueryId, k)
      .join(broadcast(appx), Seq("q_id", "neighbor_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("k_eval"),
           sum(coalesce(col("hit"), lit(0L))).as("hits_short"))
      .withColumn("recall_short",
        Rounding.roundN(col("hits_short").cast("double") / col("k_eval"), 4))
      .select(col("q_id"), col("k_eval"), col("hits_short"), col("recall_short"))
      .orderBy(col("q_id"))
  }

  /** The two oracle-side Lloyd CTE bodies, parameterized by source and
    * codebook names so the unrolled rounds cannot drift from each
    * other or from the Spark loop. */
  private def trainAssignCte(src: String, cb: String): String = {
    val d = Dialect.duck
    s"""SELECT vec_id, cell, j, cidx, ri FROM (
          SELECT s.vec_id, s.cell, c.j, c.cidx, s.ri,
                 row_number() OVER (PARTITION BY s.vec_id, c.j
                   ORDER BY ${pqSubDistInt(d, "s.ri", "c.cvec", "c.j")}, c.cidx) AS rn
          FROM $src s CROSS JOIN $cb c) x WHERE rn = 1"""
  }

  private def trainUpdateCte(assigned: String, cbPrev: String): String =
    s"""SELECT c.j, c.cidx, COALESCE(u.mvec, c.cvec) AS cvec
        FROM $cbPrev c LEFT JOIN (
          SELECT j, cidx, list(m ORDER BY i) AS mvec FROM (
            SELECT a.j, a.cidx, t.i,
                   CAST(floor(CAST(sum(a.ri[a.j * $PqSubDim + t.i]) AS DOUBLE)
                        / count(*)) AS BIGINT) AS m
            FROM $assigned a CROSS JOIN generate_series(1, $PqSubDim) t(i)
            GROUP BY a.j, a.cidx, t.i) g GROUP BY j, cidx) u
        ON c.j = u.j AND c.cidx = u.cidx"""

  def ivfPqTrainedRecallOracle(maxQueryId: Long = 8, k: Int = 5,
                               shortlist: Int = 50, nProbe: Int = 2): String = {
    val d = Dialect.duck
    val lo = PqCodebookIds.head
    val hi = PqCodebookIds.last
    val rounds = (1 to PqTrainIters).map { t =>
      s"""a$t AS (${trainAssignCte("samp", s"cb${t - 1}")}),
       cb$t AS (${trainUpdateCte(s"a$t", s"cb${t - 1}")})"""
    }.mkString(",\n       ")
    s"""WITH $assignedCtes,
       resid AS (SELECT a.vec_id, a.cell,
           ${residualExpr(d, "a.embedding", "c.cemb")} AS res
         FROM assigned a JOIN cents c ON a.cell = c.cent_id),
       iri AS (SELECT vec_id, cell, ${intResExpr(d, "res")} AS ri FROM resid),
       samp AS (SELECT * FROM iri WHERE vec_id % $PqTrainSampleMod = 0),
       cb0 AS (SELECT t.j, CAST(vec_id - $lo AS INTEGER) AS cidx,
           list_transform(generate_series(1, $PqSubDim),
             i -> ri[t.j * $PqSubDim + i]) AS cvec
         FROM iri CROSS JOIN generate_series(0, ${PqSubspaces - 1}) t(j)
         WHERE vec_id BETWEEN $lo AND $hi),
       $rounds,
       codes AS (SELECT vec_id, cell, list(cidx ORDER BY j) AS codes
         FROM (${trainAssignCte("iri", s"cb$PqTrainIters")}) fa
         GROUP BY vec_id, cell),
       qprobe AS (SELECT vec_id AS q_id, cent_id AS cell, embedding AS qe
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn
               FROM scoredc WHERE vec_id < $maxQueryId) t
         WHERE crn <= $nProbe),
       qiri AS (SELECT q.q_id, q.cell, ${intResExpr(d, "qr")} AS qi
         FROM (SELECT q.q_id, q.cell,
                 ${residualExpr(d, "q.qe", "c.cemb")} AS qr
               FROM qprobe q JOIN cents c ON q.cell = c.cent_id) q),
       qsub AS (SELECT q.q_id, q.cell, c.cidx, c.j,
           ${pqSubDistInt(d, "q.qi", "c.cvec", "c.j")} AS sd
         FROM qiri q CROSS JOIN cb$PqTrainIters c),
       dt AS (SELECT q_id, cell, list(sd ORDER BY j, cidx) AS dt
         FROM qsub GROUP BY q_id, cell),
       scored AS (SELECT d.q_id, c.vec_id AS c_id,
           list_reduce(list_transform(generate_series(0, ${PqSubspaces - 1}),
             j -> dt[j * $PqK + codes[j + 1] + 1]), (a, b) -> a + b) AS adc
         FROM codes c JOIN dt d ON c.cell = d.cell WHERE d.q_id <> c.vec_id),
       appx AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS rank
           FROM scored) r WHERE rank <= $shortlist),
       exact AS (SELECT q_id, c_id AS neighbor_id FROM (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY ${l2Expr(d, "q.embedding", "c.embedding")}, c.vec_id) AS rank
           FROM embeddings c JOIN embeddings q
             ON q.vec_id < $maxQueryId AND q.vec_id <> c.vec_id) t
         WHERE rank <= $k)
       SELECT e.q_id, count(*) AS k_eval,
         CAST(sum(CASE WHEN p.c_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits_short,
         round(CAST(sum(CASE WHEN p.c_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
               / count(*), 4) AS recall_short
       FROM exact e LEFT JOIN appx p
         ON e.q_id = p.q_id AND e.neighbor_id = p.c_id
       GROUP BY e.q_id ORDER BY e.q_id"""
  }

  // ---- s12: incremental ANN over the persisted IVF index --------------

  /** s12's per-corpus index roots (see [[VecIndex.indexBuilds]] for
    * the build counter). Eviction DELETES the temp index dirs — the
    * d12 indexCache contract: on-disk tables, not GC-tracked blocks. */
  private val vecIndexCache =
    new Caching.BoundedCache[(org.apache.spark.sql.SparkSession, String, Int), String](4,
      onEvict = root =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        catch { case _: Exception => () })

  /** s24's per-corpus LEXICAL index roots — same eviction contract. */
  private val lexIndexCache =
    new Caching.BoundedCache[(org.apache.spark.sql.SparkSession, String, Int), String](4,
      onEvict = root =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
        catch { case _: Exception => () })

  /** s12: INCREMENTAL ANN — a new batch of vectors searched against
    * the corpus's PERSISTED IVF index ([[VecIndex]]): centroids and
    * cell-partitioned inverted lists live as
    * [[graft.sources.VersionedTable]]s, built ONCE per corpus and
    * probed per batch — no corpus re-assignment, and the probe's IO is
    * dir-pruned to the probed cells (the inverted lists ARE partition
    * dirs). The d12/d15 ingest shape for embeddings: at 100 TB the
    * index is the long-lived asset, batches probe it and
    * [[VecIndex.ingest]] appends them O(batch) so successive batches
    * see each other (spec-pinned; the demo closes the loop).
    *
    * Batch split vec_id % 19 == 0 keeps the oracle-pinned centroid
    * ids (100..107) on the corpus side. Results match s05's multiprobe
    * semantics with queries restricted to the batch and candidates to
    * the corpus — the oracle replays assignment, probing and ranking
    * relationally.
    */
  def annIncremental(embeddings: DataFrame, k: Int = 3, nProbe: Int = 2,
                     batchMod: Int = 19): DataFrame = {
    val spark = embeddings.sparkSession
    val isBatch = col("vec_id") % batchMod === 0
    val batch = embeddings.filter(isBatch).select(col("vec_id"), col("embedding"))
    val corpus = embeddings.filter(!isBatch).select(col("vec_id"), col("embedding"))
    def buildTemp(): String = {
      val root = java.nio.file.Files.createTempDirectory("graft-vecidx").toString
      VecIndex.build(spark, root, corpus)
      root
    }
    val (root, ephemeral) =
      if (!Caching.bareScan(embeddings)) (buildTemp(), true)
      else {
        val stamp = Caching.stamp(embeddings)
        if (stamp.isEmpty) (buildTemp(), true)
        else (vecIndexCache.getOrElseUpdate((spark, stamp, batchMod))(buildTemp()), false)
      }
    val res = VecIndex.probe(spark, root, batch, k, nProbe)
      .orderBy(col("q_id"), col("rank"))
    if (ephemeral) {
      val out = res.localCheckpoint()
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      catch { case _: Exception => () }
      out
    } else res
  }

  /** Oracle: corpus assignment (top-1), query probing (top-nProbe) and
    * cosine ranking replayed relationally over the same batch split —
    * the persisted-index path must equal the from-scratch relational
    * computation exactly. */
  /** st12's pinned operating point: centroid ids that live INSIDE the
    * stream's seed slice (vec_id % 3 == 0 — every id divisible by 3),
    * and an admission threshold sitting inside this corpus's
    * cross-slice cosine distribution so both the reject and admit
    * arms are live (the d05/d17 corpus-tuned-threshold convention;
    * max cross-slice cosine here is ~0.48-0.53, there are no 0.99
    * near-identical twins). */
  val streamIngestCentroids: Seq[Long] =
    Seq(99L, 102L, 105L, 108L, 111L, 114L, 117L, 120L)
  val StreamIngestMaxCos = 0.42

  /** The DuckDB replay of st12's streaming ANN-ingest drain (Spark
    * side: StreamOps.streamAnnIngestDrain): seed = vec_id%3==0 built
    * into a VecIndex raw; arrival batch 0 = %3==1, batch 1 = %3==2;
    * an arrival is ADMITTED iff no member of the index AT ITS BATCH
    * START (seed, then seed ∪ batch-0 admissions) inside its nProbe
    * probed cells reaches `maxCos` (4-dp-rounded, the ingestDedup
    * gate). Assignment/probing/cosine arithmetic is the s12-proven
    * relational replay; admissions are sequential NOT-IN steps. */
  def streamAnnIngestOracle(maxCos: Double = StreamIngestMaxCos,
                            nProbe: Int = 2): String = {
    val d = Dialect.duck
    val ids = streamIngestCentroids.mkString(", ")
    def assign1(src: String, out: String): String =
      s"""${out}s AS (SELECT e.vec_id, e.embedding, c.cent_id,
           ${dot(d, "e.embedding", "c.cemb")} AS csim
         FROM $src e CROSS JOIN cents c),
       $out AS (SELECT vec_id, embedding, ${normExpr(d, "embedding")} AS nrm,
           cent_id AS cell
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn FROM ${out}s) t
         WHERE crn = 1)"""
    def probeN(src: String, out: String): String =
      s"""${out}s AS (SELECT e.vec_id, e.embedding, c.cent_id,
           ${dot(d, "e.embedding", "c.cemb")} AS csim
         FROM $src e CROSS JOIN cents c),
       $out AS (SELECT vec_id, embedding AS qe, ${normExpr(d, "embedding")} AS qn,
           cent_id AS cell
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn FROM ${out}s) t
         WHERE crn <= $nProbe)"""
    def hitExpr(probe: String, idx: String): String =
      s"""SELECT DISTINCT p.vec_id FROM $probe p JOIN $idx a ON a.cell = p.cell
         WHERE round(${dot(d, "p.qe", "a.embedding")} / (p.qn * a.nrm), 4) >= $maxCos"""
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cemb
           FROM embeddings WHERE vec_id IN ($ids)),
       seed AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0),
       b1 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 1),
       b2 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 2),
       ${assign1("seed", "sassign")},
       ${probeN("b1", "p1")},
       hit1 AS (${hitExpr("p1", "sassign")}),
       adm1 AS (SELECT vec_id, embedding FROM b1
         WHERE vec_id NOT IN (SELECT vec_id FROM hit1)),
       ${assign1("adm1", "a1assign")},
       idx2 AS (SELECT * FROM sassign UNION ALL SELECT * FROM a1assign),
       ${probeN("b2", "p2")},
       hit2 AS (${hitExpr("p2", "idx2")}),
       adm2 AS (SELECT vec_id FROM b2
         WHERE vec_id NOT IN (SELECT vec_id FROM hit2)),
       landed AS (SELECT CAST(0 AS BIGINT) AS arrival_batch, vec_id FROM adm1
                  UNION ALL
                  SELECT CAST(1 AS BIGINT), vec_id FROM adm2)
       SELECT arrival_batch, e.label, CAST(count(*) AS BIGINT) AS n_vecs
       FROM landed l JOIN embeddings e USING (vec_id)
       GROUP BY 1, 2 ORDER BY arrival_batch, label"""
  }

  def annIncrementalOracle(k: Int = 3, nProbe: Int = 2,
                           batchMod: Int = 19): String = {
    val d = Dialect.duck
    val ids = centroidIds.mkString(", ")
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cemb
           FROM embeddings WHERE vec_id IN ($ids)),
       corp AS (SELECT vec_id, embedding FROM embeddings
         WHERE vec_id % $batchMod <> 0),
       q AS (SELECT vec_id, embedding FROM embeddings
         WHERE vec_id % $batchMod = 0),
       cscored AS (SELECT e.vec_id, e.embedding, c.cent_id,
           ${dot(d, "e.embedding", "c.cemb")} AS csim
         FROM corp e CROSS JOIN cents c),
       cassign AS (SELECT vec_id, embedding, cent_id AS cell,
           ${normExpr(d, "embedding")} AS nrm
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn FROM cscored) t
         WHERE crn = 1),
       qscored AS (SELECT e.vec_id, e.embedding, c.cent_id,
           ${dot(d, "e.embedding", "c.cemb")} AS csim
         FROM q e CROSS JOIN cents c),
       qprobe AS (SELECT vec_id, embedding, cent_id AS cell,
           ${normExpr(d, "embedding")} AS nrm
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cent_id) AS crn FROM qscored) t
         WHERE crn <= $nProbe),
       scored AS (SELECT p.vec_id AS q_id, a.vec_id AS c_id,
           ${dot(d, "p.embedding", "a.embedding")} / (p.nrm * a.nrm) AS cos
         FROM cassign a JOIN qprobe p USING (cell)),
       ranked AS (SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, c_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         round(cos, 4) AS cos
       FROM ranked WHERE rank <= $k ORDER BY q_id, rank"""
  }

  // ---- s17: two-stage retrieval — PQ shortlist + exact re-rank --------

  /** s17: the COMPLETE two-stage query s09's contract describes but
    * stops short of: PQ ADC produces a top-R shortlist from 4-byte
    * codes, then the R candidate VECTORS are fetched and re-ranked by
    * exact L2 — the answer a production PQ index actually returns
    * (FAISS's refine step; Jegou et al. 2011 §V). Reference analogue:
    * the reference serves ranked results, not candidate pools
    * (services/workers/tasks/queue_for_delta.py's ordered reads).
    *
    * Scale shape: stage 1 streams code rows (4 B/vector) against
    * broadcast distance tables; the shortlist is RESULT-BOUNDED
    * (queries x R) and re-joins the corpus ONCE on vec_id to fetch
    * candidate vectors — at 100 TB that join broadcasts the shortlist
    * id set onto the vector scan (AQE picks it from the real size; no
    * hint, the q40/d10 rule), so exact distance arithmetic runs on
    * queries x R rows, never N. The final window is per-query over
    * <= R rows. Exact re-rank of a fixed candidate set is the optimal
    * ordering of that set, so recall@k >= the ADC ordering's recall@k
    * at the same R — pinned as a set-theoretic invariant in GraftSpec
    * (NOT a data-dependent tolerance), with liveness (re-rank visibly
    * corrects ADC's order at sf0.001) asserted alongside.
    */
  def pqRerank(embeddings: DataFrame, maxQueryId: Long = 8, k: Int = 5,
               shortlist: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = pqTopK(embeddings, maxQueryId, shortlist)
    val vecs = embeddings.select(col("vec_id"), col("embedding").as("ce"))
    val queries = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("dist").asc, col("neighbor_id").asc)
    cand.join(vecs, cand("neighbor_id") === vecs("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .withColumn("dist", expr(l2Expr(Dialect.spark, "qe", "ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
              col("neighbor_id"), Rounding.roundN(col("dist"), 4).as("l2"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Oracle: the s09 code/table/shortlist replay plus the re-rank CTE
    * — exact L2 over the shortlist, rank <= k. */
  def pqRerankOracle(maxQueryId: Long = 8, k: Int = 5,
                     shortlist: Int = 50): String = {
    val d = Dialect.duck
    val lo = PqCodebookIds.head
    val hi = PqCodebookIds.last
    s"""WITH cb AS (SELECT vec_id - $lo AS cidx, embedding AS cemb
           FROM embeddings WHERE vec_id BETWEEN $lo AND $hi),
       sub AS (SELECT e.vec_id, c.cidx, t.j,
           ${pqSubDist(d, "e.embedding", "c.cemb", "t.j")} AS sd
         FROM embeddings e CROSS JOIN cb c
         CROSS JOIN generate_series(0, ${PqSubspaces - 1}) t(j)),
       codes AS (SELECT vec_id, list(cidx ORDER BY j) AS codes
         FROM (SELECT vec_id, j, cidx, row_number() OVER (
                 PARTITION BY vec_id, j ORDER BY sd, cidx) AS rn FROM sub) x
         WHERE rn = 1 GROUP BY vec_id),
       dt AS (SELECT vec_id AS q_id, list(sd ORDER BY j, cidx) AS dt
         FROM sub WHERE vec_id < $maxQueryId GROUP BY vec_id),
       scored AS (SELECT q.q_id, c.vec_id AS c_id,
           list_reduce(list_transform(generate_series(0, ${PqSubspaces - 1}),
             j -> dt[j * $PqK + codes[j + 1] + 1]), (a, b) -> a + b) AS adc
         FROM codes c CROSS JOIN dt q WHERE q.q_id <> c.vec_id),
       short AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS rank
           FROM scored) r WHERE rank <= $shortlist),
       rr AS (SELECT s.q_id, s.c_id,
           ${l2Expr(d, "q.embedding", "c.embedding")} AS dist
         FROM short s
         JOIN embeddings c ON s.c_id = c.vec_id
         JOIN embeddings q ON s.q_id = q.vec_id)
       SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id AS neighbor_id,
         round(dist, 4) AS l2
       FROM (SELECT q_id, c_id, dist, row_number() OVER (
               PARTITION BY q_id ORDER BY dist, c_id) AS rank FROM rr) t
       WHERE rank <= $k ORDER BY q_id, rank"""
  }
}
