package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline surface:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Every metric is pure integer/deterministic-double arithmetic so the
  * DuckDB oracle can reproduce values bit-for-bit. The shingle hash is
  * an explicit 31-base polynomial mod 2^31-1 over codepoints — NOT an
  * engine-native hash — precisely so both engines agree. Oracle SQL is
  * generated next to each operator from the same fragments, so the two
  * sides cannot drift.
  *
  * Scale note: all of these are single-pass narrow projections
  * (no shuffle at all until the final orderBy, which exists only for
  * oracle determinism); at 100 TB they run map-side at scan speed.
  * The transform(sequence(...)) shingle loop is codegen'd by Catalyst.
  */
object TextOps {
  val P = 2147483647L // 2^31 - 1
  private val pow31 = Array(923521L, 29791L, 961L, 31L, 1L) // 31^4..31^0

  /** Engine-neutral k=5 char-shingle polynomial hash at position i. */
  def shingleHashFragment(txt: String): String = {
    val terms = (0 until 5).map { k =>
      val idx = if (k == 0) "i" else s"i+$k"
      s"CAST(ascii(substring($txt, $idx, 1)) AS BIGINT) * ${pow31(k)}"
    }
    s"(${terms.mkString(" + ")}) % $P"
  }

  /** Distinct shingle-hash set of a text column (engine-dialected). */
  def shinglesSpark(txt: String): String =
    s"array_distinct(transform(sequence(1, greatest(length($txt)-4, 1)), i -> ${shingleHashFragment(txt)}))"
  def shinglesDuck(txt: String): String =
    s"list_distinct(list_transform(generate_series(1, greatest(length($txt)-4, 1)), i -> ${shingleHashFragment(txt)}))"

  // ---- language ID (t01) ----------------------------------------------

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "de", "los", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une"))

  private def hitFragment(words: Seq[String], filterFn: String, splitFn: String): String = {
    val cond = words.map(w => s"t = '$w'").mkString(" OR ")
    s"$filterFn($splitFn(lower(text), ' '), t -> $cond)"
  }
  private def hitsSpark(lang: String) = s"size(${hitFragment(stopwords(lang), "filter", "split")})"
  private def hitsDuck(lang: String)  = s"len(${hitFragment(stopwords(lang), "list_filter", "string_split")})"

  val cjkPattern = "[\\x{4e00}-\\x{9fff}]"
  private val predictedFragment =
    """CASE WHEN zh_chars > 0 THEN 'zh'
       WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
       WHEN de_hits >= es_hits AND de_hits >= fr_hits AND de_hits > 0 THEN 'de'
       WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
       WHEN fr_hits > 0 THEN 'fr'
       ELSE 'und' END"""

  /** n-gram/stopword-heuristic language ID: per-language stopword hit
    * counts + CJK codepoint presence, deterministic argmax. */
  def langId(documents: DataFrame): DataFrame =
    documents
      .withColumn("en_hits", expr(hitsSpark("en")).cast("long"))
      .withColumn("de_hits", expr(hitsSpark("de")).cast("long"))
      .withColumn("es_hits", expr(hitsSpark("es")).cast("long"))
      .withColumn("fr_hits", expr(hitsSpark("fr")).cast("long"))
      .withColumn("zh_chars", size(regexp_extract_all(col("text"), lit(cjkPattern), lit(0))).cast("long"))
      .withColumn("predicted", expr(predictedFragment))
      .select("doc_id", "lang", "en_hits", "de_hits", "es_hits", "fr_hits", "zh_chars", "predicted")
      .orderBy("doc_id")

  val langIdOracle: String =
    s"""WITH h AS (SELECT doc_id, lang,
       CAST(${hitsDuck("en")} AS BIGINT) AS en_hits,
       CAST(${hitsDuck("de")} AS BIGINT) AS de_hits,
       CAST(${hitsDuck("es")} AS BIGINT) AS es_hits,
       CAST(${hitsDuck("fr")} AS BIGINT) AS fr_hits,
       CAST(len(regexp_extract_all(text, '$cjkPattern')) AS BIGINT) AS zh_chars
       FROM documents)
       SELECT doc_id, lang, en_hits, de_hits, es_hits, fr_hits, zh_chars,
       $predictedFragment AS predicted
       FROM h ORDER BY doc_id"""

  // ---- quality scoring (t02) ------------------------------------------

  /** Quality metrics: stopword ratio, punctuation ratio, length signal,
    * composite score. Mirrors the heuristic doc-quality filters used in
    * LLM corpus pipelines; all-double arithmetic rounded at 4dp. */
  def qualityScore(documents: DataFrame): DataFrame =
    documents
      // empty text would divide by n_chars=0: Spark doubles give
      // NaN/Inf, DuckDB gives NULL — drop such rows identically
      .filter(col("n_chars") > 0)
      .withColumn("n_tokens", expr("size(split(lower(text), ' '))").cast("long"))
      .withColumn("stop_hits", expr(hitsSpark("en")).cast("long"))
      .withColumn("n_punct", size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0))).cast("long"))
      .withColumn("stop_ratio", Rounding.roundN(col("stop_hits").cast("double") / col("n_tokens"), 4))
      .withColumn("punct_ratio", Rounding.roundN(col("n_punct").cast("double") / col("n_chars"), 4))
      .withColumn("len_signal", Rounding.roundN(least(col("n_tokens").cast("double") / 100.0, lit(1.0)), 4))
      .withColumn("quality", Rounding.roundN(
        col("stop_hits").cast("double") / col("n_tokens") * 0.5 +
        (lit(1.0) - col("n_punct").cast("double") / col("n_chars")) * 0.3 +
        least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.2, 4))
      .select("doc_id", "n_tokens", "stop_hits", "n_punct", "stop_ratio",
              "punct_ratio", "len_signal", "quality")
      .orderBy("doc_id")

  val qualityOracle: String =
    s"""WITH m AS (SELECT doc_id, n_chars,
       CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
       CAST(${hitsDuck("en")} AS BIGINT) AS stop_hits,
       CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct
       FROM documents WHERE n_chars > 0)
       SELECT doc_id, n_tokens, stop_hits, n_punct,
       round(CAST(stop_hits AS DOUBLE) / n_tokens, 4) AS stop_ratio,
       round(CAST(n_punct AS DOUBLE) / n_chars, 4) AS punct_ratio,
       round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 4) AS len_signal,
       round(CAST(stop_hits AS DOUBLE) / n_tokens * 0.5
           + (1.0 - CAST(n_punct AS DOUBLE) / n_chars) * 0.3
           + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.2, 4) AS quality
       FROM m ORDER BY doc_id"""

  // ---- token counting (t03) -------------------------------------------

  /** Whitespace + BPE-ish regex token counts (word-ish runs, digit
    * runs, single punctuation marks — the pre-tokenization split most
    * BPE vocabularies use). */
  def tokenCount(documents: DataFrame): DataFrame =
    documents
      .withColumn("ws_tokens", expr("size(split(trim(text), '\\\\s+'))").cast("long"))
      .withColumn("bpe_tokens",
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
      .withColumn("n_chars_m", length(col("text")).cast("long"))
      .select("doc_id", "n_chars_m", "ws_tokens", "bpe_tokens")
      .orderBy("doc_id")

  val tokenCountOracle: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
       FROM documents ORDER BY doc_id"""

  // ---- t30: sliding token-window chunking -----------------------------

  /** t30: OVERLAPPING token-window chunking — the long-document
    * splitting step between cleaning and packing: pretraining slices
    * documents longer than the context into stride-overlapped windows
    * (the overlap preserves cross-boundary context the hard cut of
    * t08's greedy packer would sever), and RAG corpora chunk documents
    * the same way before embedding. Windows are t03's whitespace
    * tokens; chunk i starts at `i*stride`, the LAST window is clamped
    * to `n-window` so it is always full-width (every token is covered,
    * no degenerate tail), and a document at or under `window` tokens
    * is exactly one (short) chunk. Sentence-boundary snapping is a
    * tokenizer-side refinement, deliberately out of scope here — the
    * window math is tokenizer-agnostic.
    *
    * Scale shape: one narrow projection per document (split + explode
    * of the per-doc start list — starts are O(n/stride) longs, the
    * token array never leaves its row, nothing shuffles but the
    * result sort); the amplification factor is exactly
    * window/stride ≈ 1.33 at the defaults, carried as data so the
    * packer downstream can budget for it. At 100 TB this is the same
    * embarrassingly-parallel map as t01-t04. */
  def chunkWindows(documents: DataFrame, window: Int = 32,
                   stride: Int = 24): DataFrame = {
    require(stride >= 1 && stride <= window,
      s"stride $stride must be in [1, window=$window]")
    documents
      .withColumn("toks", expr("split(trim(text), '\\\\s+')"))
      .withColumn("n", size(col("toks")).cast("long"))
      // starts = {k*stride : k*stride < n-window} ++ {n-window}, or
      // {0} for short docs — pure integer math, engine-identical
      .withColumn("starts", when(col("n") <= window, array(lit(0L)))
        .otherwise(expr(
          s"concat(transform(sequence(0L, (n - ${window + 1}L) div $stride), " +
          s"k -> k * ${stride}L), array(n - ${window}L))")))
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(col("starts")).as(Seq("chunk_id", "start_tok")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("start_tok"),
        least(lit(window.toLong), col("n") - col("start_tok")).as("n_tok"),
        array_join(slice(col("toks"), col("start_tok") + 1, lit(window)), " ")
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** DuckDB twin of [[chunkWindows]]: the identical start set derived
    * as a FILTER over token subscripts (st is a chunk start iff it is
    * a stride multiple short of the clamp, or the clamp itself) — the
    * per-row `sequence` spelled relationally. */
  def chunkWindowsOracle(window: Int = 32, stride: Int = 24): String =
    s"""WITH t AS (SELECT doc_id,
           regexp_split_to_array(trim(text), '\\s+') AS toks,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n
         FROM documents),
       ix AS (SELECT doc_id, toks, n, g.i - 1 AS st
         FROM t, LATERAL (SELECT generate_subscripts(toks, 1) AS i) g),
       cs AS (SELECT doc_id, toks, n, st,
           row_number() OVER (PARTITION BY doc_id ORDER BY st) - 1 AS chunk_id
         FROM ix WHERE (n <= $window AND st = 0)
            OR (n > $window AND ((st < n - $window AND st % $stride = 0)
                                 OR st = n - $window)))
       SELECT doc_id, chunk_id, st AS start_tok,
         least($window, n - st) AS n_tok,
         array_to_string(toks[CAST(st + 1 AS BIGINT):CAST(st + $window AS BIGINT)], ' ')
           AS chunk_text
       FROM cs ORDER BY doc_id, chunk_id"""

  // ---- corpus distribution stats (t05) --------------------------------

  /** Per-language corpus statistics with exact interpolated
    * percentiles (Spark `percentile` == DuckDB `quantile_cont`, both
    * linear interpolation over the sorted values — exact, unlike the
    * sketch-based approx_percentile which could never oracle-match).
    * Exact percentile requires a sort per group; at 100 TB switch to
    * approx_percentile and drop the oracle to a tolerance check.
    */
  def corpusStats(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("total_chars"),
           Rounding.roundN(expr("percentile(n_chars, 0.5)"), 4).as("median_chars"),
           Rounding.roundN(expr("percentile(n_chars, 0.9)"), 4).as("p90_chars"),
           min(col("n_chars")).as("min_chars"),
           max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))

  val corpusStatsOracle: String =
    """SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(quantile_cont(n_chars, 0.5), 4) AS median_chars,
       round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
       FROM documents GROUP BY lang ORDER BY lang"""

  /** t15: SKETCH percentiles — the 100 TB form of t05 the t05 scaladoc
    * promises: `approx_percentile` keeps a fixed-size quantile summary
    * per group (mergeable, rank error <= 1/accuracy) instead of
    * sorting every group's values, so the exchange carries
    * KB-per-group sketches where t05 shuffles and sorts the raw
    * column. Exact values ride along for self-evidencing accuracy
    * (the q35 pattern — sketch outputs differ by engine, so there is
    * no DuckDB oracle BY CONSTRUCTION; the spec bounds the rank error
    * instead, and the exact columns make every run's error visible).
    */
  def approxPercentiles(documents: DataFrame, accuracy: Int = 1000): DataFrame =
    documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           expr("percentile(n_chars, 0.5)").as("exact_median"),
           expr("percentile(n_chars, 0.9)").as("exact_p90"),
           expr(s"approx_percentile(n_chars, array(0.5D, 0.9D), $accuracy)").as("ap"))
      .select(col("lang"), col("n_docs"),
        Rounding.roundN(col("exact_median"), 4).as("exact_median"),
        Rounding.roundN(col("exact_p90"), 4).as("exact_p90"),
        element_at(col("ap"), 1).cast("long").as("approx_median"),
        element_at(col("ap"), 2).cast("long").as("approx_p90"))
      .orderBy(col("lang"))

  // ---- fingerprinting (t04) -------------------------------------------

  /** Rolling-hash document fingerprint: min-sampled 5-gram polynomial
    * hash (the MinHash-1 fingerprint) + full polynomial checksum. */
  def fingerprint(documents: DataFrame): DataFrame =
    documents
      .withColumn("shingles", graft.functions.GraftFunctions.shingle_set(col("text")))
      .withColumn("n_shingles", size(col("shingles")).cast("long"))
      .withColumn("fp_min", expr("array_min(shingles)").cast("long"))
      .withColumn("fp_poly", expr(s"aggregate(shingles, CAST(0 AS BIGINT), (acc, x) -> acc + x) % $P").cast("long"))
      .select("doc_id", "n_shingles", "fp_min", "fp_poly")
      .orderBy("doc_id")

  val fingerprintOracle: String =
    s"""WITH s AS (SELECT doc_id, ${shinglesDuck("text")} AS shingles FROM documents)
       SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles,
       CAST(list_min(shingles) AS BIGINT) AS fp_min,
       CAST(CAST(list_sum(shingles) AS BIGINT) % $P AS BIGINT) AS fp_poly
       FROM s ORDER BY doc_id"""

  // ---- per-language heavy hitters (t06) -------------------------------

  /** t06: top-k terms per language — the vocabulary/heavy-hitter scan
    * every corpus build runs. Classic two-phase shape: explode tokens
    * map-side, partial-count before the shuffle (the exchange carries
    * (lang, term) partial counts, not tokens), then a rank-limited
    * window (Spark's WindowGroupLimit keeps only k rows per partition
    * map-side). Tie-break on the term itself so both engines pick the
    * same winners at equal counts.
    */
  def termTopK(documents: DataFrame, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("term").asc)
    documents
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank").cast("long").as("rank"), col("term"), col("n"))
      .orderBy(col("lang"), col("rank"))
  }

  def termTopKOracle(k: Int = 5): String =
    s"""WITH toks AS (SELECT lang, unnest(string_split(lower(text), ' ')) AS term
           FROM documents),
       c AS (SELECT lang, term, count(*) AS n FROM toks
           WHERE length(term) > 0 GROUP BY lang, term),
       r AS (SELECT lang, term, n, row_number() OVER (PARTITION BY lang
           ORDER BY n DESC, term ASC) AS rank FROM c)
       SELECT lang, CAST(rank AS BIGINT) AS rank, term, n
       FROM r WHERE rank <= $k ORDER BY lang, rank"""

  // ---- TF-IDF top terms (t10) ----------------------------------------

  /** How many times the tf frame was actually BUILT (not served from
    * cache) — spec-pinned evidence that t10's consumers share one
    * corpus-token pass per corpus (see PlanShapeSpec). */
  @volatile var tfBuilds: Long = 0L

  private val tfCache =
    new Caching.BoundedCache[(org.apache.spark.sql.SparkSession, String), DataFrame](8)

  /** Drop every cached tf frame (checkpoint blocks reclaimed by the
    * ContextCleaner once unreferenced) — the explicit flush hook,
    * mirroring [[Dedup.invalidatePipelines]]. */
  def invalidateTfFrames(): Unit = tfCache.clear()

  /** The corpus term-frequency persist point: (doc_id, term, tf),
    * computed ONCE per corpus and localCheckpointed — the natural
    * materialization boundary of a text pipeline (all corpus-token
    * work happens below it; everything downstream reads vocab-bounded
    * rows). t10's tf/df/join branches are all views over this frame,
    * so the explode+count pass runs once instead of once per branch —
    * the same storage-boundary treatment [[Dedup.pipeline]] gives LSH
    * candidates. Cache policy is identical: bare-scan frames only,
    * keyed by (session, file stamp), LRU-bounded.
    */
  def tfFrame(documents: DataFrame): DataFrame = {
    def build = {
      tfBuilds += 1
      documents
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
    }
    if (!Caching.bareScan(documents)) return build // no stats for uncacheable frames
    val stamp = Caching.stamp(documents)
    if (stamp.isEmpty) build
    else tfCache.getOrElseUpdate((documents.sparkSession, stamp))(build)
  }

  /** t10: top-k TF-IDF terms per document — the classic keyword
    * extractor. tf comes from the materialized [[tfFrame]]; df derives
    * FROM tf (tf is unique per (doc, term), so a plain count ==
    * countDistinct(doc_id) over raw tokens) and N is one broadcast
    * row — so the corpus-token pass runs ONCE and both the df branch
    * and the scoring join read checkpointed vocab-bounded rows. The
    * ranking key is the ROUNDED score (then the term): both engines
    * compute ln with ulp-level agreement and 6-dp rounding absorbs
    * it, so the rank — and the hash — are stable cross-engine
    * (verified at all three SFs).
    */
  def tfidfTopK(documents: DataFrame, k: Int = 3): DataFrame = {
    val tf = tfFrame(documents)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term").asc)
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        Rounding.roundN(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
              col("term"), col("tf"), col("df"), col("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  def tfidfTopKOracle(k: Int = 3): String =
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
           FROM documents),
       f AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM f GROUP BY doc_id, term),
       df AS (SELECT term, count(DISTINCT doc_id) AS df FROM f GROUP BY term),
       n AS (SELECT count(*) AS n_docs FROM documents),
       scored AS (SELECT doc_id, term, tf, df,
           round(tf * ln(n_docs / CAST(df AS DOUBLE)), 6) AS tfidf
         FROM tf JOIN df USING (term) CROSS JOIN n),
       ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
           ORDER BY tfidf DESC, term ASC) AS rank FROM scored)
       SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, tfidf
       FROM ranked WHERE rank <= $k ORDER BY doc_id, rank"""

  // ---- deterministic train/val/test split (t07) -----------------------

  /** t07: deterministic hash split — assign every document to
    * train/val/test by an affine hash of its id, 80/10/10. The split
    * is a pure stateless projection: no shuffle, no sampling state,
    * reproducible across runs/engines/cluster sizes, and any subset of
    * the corpus lands in the same split it would in the full corpus —
    * the property that makes incremental corpus builds possible.
    * (Spark's `randomSplit` has none of these properties.)
    */
  def splitSample(documents: DataFrame): DataFrame = {
    val bucket = (col("doc_id") * lit(1103515245L) + lit(12345L)) % P % 1000
    documents
      .withColumn("split",
        when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("total_chars"),
           Rounding.roundN(avg(col("n_chars")), 4).as("avg_chars"))
      .orderBy(col("split"))
  }

  val splitSampleOracle: String =
    s"""WITH b AS (SELECT n_chars,
         (doc_id * 1103515245 + 12345) % $P % 1000 AS bucket FROM documents)
       SELECT CASE WHEN bucket < 800 THEN 'train'
                   WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
         count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars
       FROM b GROUP BY 1 ORDER BY split"""

  /** t21: EXACT-k stratified sample — exactly `k` documents per
    * stratum (language), chosen by ranking each stratum on the t07
    * affine hash (a reproducible pseudo-random permutation of doc
    * ids) with doc_id as the total tie-break. The balanced-eval-set
    * constructor: per-language dev sets, debugging samples, human-
    * review batches — where `sampleBy`'s Bernoulli draw gives only
    * EXPECTED counts (and different rows per run/partitioning), this
    * gives exact counts, deterministic across runs, engines, cluster
    * layouts, and corpus growth order.
    *
    * Scale shape: one shuffle on the stratum key; the rank-limit
    * filter gets Spark's WindowGroupLimit pushdown (map-side top-k
    * per stratum BEFORE the exchange — the t06 discipline), so the
    * shuffle carries ≤ k·partitions rows per stratum, not the corpus.
    */
  def stratifiedSample(documents: DataFrame, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    documents
      .withColumn("h", (col("doc_id") * lit(1103515245L) + lit(12345L)) % P)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank").cast("long").as("rank"),
              col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rank"))
  }

  def stratifiedSampleOracle(k: Int = 20): String =
    s"""WITH h AS (SELECT lang, doc_id, n_chars,
         (doc_id * 1103515245 + 12345) % $P AS h FROM documents),
       r AS (SELECT lang, doc_id, n_chars,
           row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
         FROM h)
       SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, n_chars
       FROM r WHERE rank <= $k ORDER BY lang, rank"""

  // ---- sequence packing (t08) ----------------------------------------

  /** t08: contiguous sequence packing — group documents into training
    * batches of ~`budget` tokens each (per language, in doc_id order):
    * batch_id = floor(prefix_token_sum / budget). Pure window
    * arithmetic: one shuffle on lang, then a sorted linear pass — the
    * scalable form of "pack the corpus into fixed-token batches"
    * (greedy bin-packing is sequential; prefix-sum packing is the
    * order-preserving parallel equivalent).
    */
  def sequencePack(documents: DataFrame, budget: Long = 512): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    documents
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("prefix", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("batch_id", floor(col("prefix") / budget))
      .groupBy(col("lang"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("batch_tokens"))
      .orderBy(col("lang"), col("batch_id"))
  }

  def sequencePackOracle(budget: Long = 512): String =
    s"""WITH t AS (SELECT lang, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
       p AS (SELECT lang, n_tokens,
         coalesce(CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS prefix
         FROM t)
       SELECT lang, CAST(floor(prefix / $budget) AS BIGINT) AS batch_id,
         count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS batch_tokens
       FROM p GROUP BY lang, batch_id ORDER BY lang, batch_id"""

  // ---- quality filter with per-reason accounting (t09) ----------------

  /** t09: the corpus admission filter — every document gets a keep /
    * drop verdict with the FIRST failing reason, and the output is the
    * per-(lang, reason) census. First-reason semantics (a CASE chain,
    * not independent flags) match how production filters report drops;
    * the census is what you watch to catch a filter eating a language.
    * Single projection + tiny agg: no shuffle before the partial agg.
    */
  def qualityFilter(documents: DataFrame): DataFrame = {
    val nTokens = size(split(col("text"), " ")).cast("long")
    documents
      .withColumn("reason",
        when(col("n_chars") < 100, "too_short")
        .when(col("n_chars") > 500, "too_long")
        .when(nTokens < 15, "too_few_tokens")
        .otherwise("keep"))
      .groupBy(col("lang"), col("reason"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("reason"))
  }

  val qualityFilterOracle: String =
    """SELECT lang,
       CASE WHEN n_chars < 100 THEN 'too_short'
            WHEN n_chars > 500 THEN 'too_long'
            WHEN len(string_split(text, ' ')) < 15 THEN 'too_few_tokens'
            ELSE 'keep' END AS reason,
       count(*) AS n
       FROM documents GROUP BY 1, 2 ORDER BY lang, reason"""

  // ---- repetition signals (t11) ---------------------------------------

  /** t11: within-document repetition signals — the Gopher-style
    * quality family (duplicate-token fraction, most-frequent-token
    * share, duplicate-bigram fraction) that catches boilerplate and
    * degenerate generations. Everything is a single narrow projection
    * over per-row arrays (no explode, no shuffle): per-doc cost is
    * bounded by document length, so at 100 TB this runs map-side at
    * scan speed exactly like t02. The token histogram is computed
    * in-row via transform-over-distinct rather than an
    * explode+groupBy, trading O(distinct x tokens) in-row work for
    * zero exchange — the right trade while docs are bounded-length.
    */
  def repetitionScore(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", expr("size(array_distinct(toks))").cast("long"))
      .withColumn("top_count",
        expr("array_max(transform(array_distinct(toks), x -> size(filter(toks, y -> y = x))))")
          .cast("long"))
      .withColumn("bigs",
        when(col("n_tokens") >= 2,
          expr("transform(sequence(1, size(toks)-1), i -> concat(element_at(toks, i), '_', element_at(toks, i+1)))"))
        .otherwise(expr("CAST(array() AS array<string>)")))
      .withColumn("n_bigrams", size(col("bigs")).cast("long"))
      .withColumn("n_dist_bigrams", expr("size(array_distinct(bigs))").cast("long"))
      .withColumn("dup_token_frac",
        Rounding.roundN(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 4))
      .withColumn("top_token_frac",
        Rounding.roundN(col("top_count").cast("double") / col("n_tokens"), 4))
      .withColumn("dup_bigram_frac",
        when(col("n_bigrams") > 0,
          Rounding.roundN(lit(1.0) - col("n_dist_bigrams").cast("double") / col("n_bigrams"), 4))
        .otherwise(lit(0.0)))
      .select("doc_id", "n_tokens", "n_distinct", "top_count",
              "dup_token_frac", "top_token_frac", "dup_bigram_frac")
      .orderBy("doc_id")

  /** Oracle: same numbers via unnest+groupBy (the relational spelling
    * of the same histogram — results, not implementation, must match). */
  val repetitionScoreOracle: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
       c AS (SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY 1, 2),
       u AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(n) AS BIGINT) AS top_count
             FROM c GROUP BY doc_id),
       l AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       bg AS (SELECT doc_id,
               CASE WHEN len(tk) >= 2
                 THEN list_transform(generate_series(1, len(tk) - 1),
                        i -> tk[i] || '_' || tk[i + 1])
                 ELSE CAST([] AS VARCHAR[]) END AS bigs
             FROM l),
       b AS (SELECT doc_id, CAST(len(bigs) AS BIGINT) AS n_bigrams,
               CAST(len(list_distinct(bigs)) AS BIGINT) AS n_dist_bigrams
             FROM bg)
       SELECT u.doc_id, n_tokens, n_distinct, top_count,
         round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 4) AS dup_token_frac,
         round(CAST(top_count AS DOUBLE) / n_tokens, 4) AS top_token_frac,
         CASE WHEN n_bigrams > 0
           THEN round(1.0 - CAST(n_dist_bigrams AS DOUBLE) / n_bigrams, 4)
           ELSE 0.0 END AS dup_bigram_frac
       FROM u JOIN b ON u.doc_id = b.doc_id ORDER BY u.doc_id"""

  // ---- PII scrubbing (t12) --------------------------------------------

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  val phonePattern = "555-[0-9]{4}"
  val numPattern = "[0-9]+"

  /** t12: PII scrubbing — regex-mask emails, phone numbers, and
    * residual digit runs, with per-category redaction counts. The
    * input is a contact string synthesized from the customer dim
    * (name + derived email + derived phone + account integer), so
    * every mask fires deterministically and the oracle replays the
    * identical patterns (RE2/Java-regex common subset: plain character
    * classes and bounded repeats only — no \\d, \\b, or backrefs).
    * Masking order is a chain (email, then phone, then bare numbers)
    * so counts are unambiguous; the whole thing is one narrow
    * projection, codegen'd, no shuffle — at 100 TB it runs at scan
    * speed like every other per-row text op.
    */
  def piiScrub(customer: DataFrame): DataFrame =
    customer
      .withColumn("contact", concat(
        col("c_name"), lit(" <user"), col("c_custkey").cast("string"),
        lit("@example.com> phone 555-"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
        lit(" acct "), floor(col("c_acctbal")).cast("long").cast("string")))
      .withColumn("n_emails",
        size(regexp_extract_all(col("contact"), lit(emailPattern), lit(0))).cast("long"))
      .withColumn("s1", regexp_replace(col("contact"), emailPattern, "[EMAIL]"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("s1"), lit(phonePattern), lit(0))).cast("long"))
      .withColumn("s2", regexp_replace(col("s1"), phonePattern, "[PHONE]"))
      .withColumn("n_nums",
        size(regexp_extract_all(col("s2"), lit(numPattern), lit(0))).cast("long"))
      .withColumn("scrubbed", regexp_replace(col("s2"), numPattern, "[NUM]"))
      .select("c_custkey", "scrubbed", "n_emails", "n_phones", "n_nums")
      .orderBy("c_custkey")

  val piiScrubOracle: String =
    s"""WITH c0 AS (SELECT c_custkey,
           c_name || ' <user' || CAST(c_custkey AS VARCHAR)
             || '@example.com> phone 555-'
             || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             || ' acct ' || CAST(CAST(floor(c_acctbal) AS BIGINT) AS VARCHAR)
             AS contact
         FROM customer),
       c1 AS (SELECT c_custkey,
           CAST(len(regexp_extract_all(contact, '$emailPattern')) AS BIGINT) AS n_emails,
           regexp_replace(contact, '$emailPattern', '[EMAIL]', 'g') AS s1
         FROM c0),
       c2 AS (SELECT c_custkey, n_emails,
           CAST(len(regexp_extract_all(s1, '$phonePattern')) AS BIGINT) AS n_phones,
           regexp_replace(s1, '$phonePattern', '[PHONE]', 'g') AS s2
         FROM c1)
       SELECT c_custkey,
         regexp_replace(s2, '$numPattern', '[NUM]', 'g') AS scrubbed,
         n_emails, n_phones,
         CAST(len(regexp_extract_all(s2, '$numPattern')) AS BIGINT) AS n_nums
       FROM c2 ORDER BY c_custkey"""

  // ---- token-distribution entropy (t13) -------------------------------

  /** t13: Shannon entropy of each document's token distribution plus
    * the evenness (entropy / ln(distinct)) — the information-density
    * quality signal that separates natural text from keyword stuffing
    * and degenerate repetition. Computed IN-ROW (no shuffle): the
    * token histogram is folded over the SORTED distinct-token list, so
    * both engines sum the identical terms in the identical order and
    * the doubles agree to the rounding precision. Scan-speed at
    * 100 TB like t02/t11.
    */
  def tokenEntropy(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", expr("size(array_distinct(toks))").cast("long"))
      .withColumn("entropy", Rounding.roundN(
        expr("""-aggregate(
                  transform(array_sort(array_distinct(toks)),
                    x -> (CAST(size(filter(toks, y -> y = x)) AS DOUBLE) / size(toks))
                         * ln(CAST(size(filter(toks, y -> y = x)) AS DOUBLE) / size(toks))),
                  CAST(0 AS DOUBLE), (acc, v) -> acc + v)"""), 4))
      .withColumn("evenness",
        when(col("n_distinct") > 1,
          Rounding.roundN(col("entropy") / log(col("n_distinct").cast("double")), 4))
        .otherwise(lit(0.0)))
      .select("doc_id", "n_tokens", "n_distinct", "entropy", "evenness")
      .orderBy("doc_id")

  /** Oracle: histogram relationally (unnest + group), counts collected
    * in tok-sorted order so the fold matches Spark's sorted-distinct
    * fold term-for-term; evenness divides the ROUNDED entropy exactly
    * like the Spark column does. */
  val tokenEntropyOracle: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
       c AS (SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY 1, 2),
       h AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               list(CAST(n AS DOUBLE) ORDER BY tok) AS cnts
             FROM c GROUP BY doc_id),
       e AS (SELECT doc_id, n_tokens, n_distinct,
               round(-list_reduce(list_transform(cnts,
                   c -> (c / n_tokens) * ln(c / n_tokens)),
                 (acc, v) -> acc + v), 4) AS entropy
             FROM h)
       SELECT doc_id, n_tokens, n_distinct, entropy,
         CASE WHEN n_distinct > 1
           THEN round(entropy / ln(CAST(n_distinct AS DOUBLE)), 4)
           ELSE 0.0 END AS evenness
       FROM e ORDER BY doc_id"""

  // ---- corpus-LM surprisal (t14) --------------------------------------

  /** t14: per-document average surprisal under the corpus's own
    * unigram language model — the cheap end of perplexity filtering
    * (docs whose tokens are uniformly corpus-frequent score low;
    * gibberish and off-distribution text score high). avg_nll =
    * (1/N) Σ_tokens -ln p(tok), p from corpus term frequencies; ppl
    * = exp(avg_nll) is the natural-log perplexity, derived from the
    * ROUNDED avg so both engines exponentiate the identical double.
    *
    * Scale shape: ONE scan of the corpus. The term-frequency table
    * re-aggregates the (doc, tok) count frame, so both branches hang
    * off an IDENTICAL pruned exchange — (doc_id, tok, count) — and
    * AQE's ReuseExchange collapses them at runtime (this is why tf
    * derives from docTok rather than from the raw token stream,
    * where pruning would diverge the branches — the t10 lesson,
    * inverted). The corpus TOTAL is a 1-row aggregate over the same
    * docTok frame, broadcast back via crossJoin — the t10/t18/t26
    * shape — so NO single-partition exchange exists anywhere in the
    * plan: even a vocab-bounded frame (~10⁸ rows at 100 TB by t28's
    * own Heaps measurement) must never funnel through one task just
    * to compute a scalar. PlanShapeSpec pins the one-scan +
    * ReusedExchange shape AND the absence of SinglePartition
    * exchanges on the post-execution adaptive plan. The vocab-bounded frequency table
    * joins back by broadcast at any corpus scale — no hint needed,
    * AQE sees the agg output size. The per-doc fold runs over the
    * tok-SORTED term list (collect_list + array_sort) so the double
    * summation order is pinned cross-engine exactly like t13's
    * entropy fold.
    */
  def surprisal(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val docTok = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val tf = docTok.groupBy(col("tok")).agg(sum(col("c")).as("n_corpus"))
    val nTotal = docTok.agg(sum(col("c")).as("n_total"))
    docTok.join(tf, "tok")
      .crossJoin(broadcast(nTotal))
      .withColumn("term",
        col("c") * -log(col("n_corpus").cast("double") / col("n_total")))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
           collect_list(struct(col("tok"), col("term"))).as("ts"))
      .withColumn("avg_nll", Rounding.roundN(
        expr("""aggregate(array_sort(ts), CAST(0 AS DOUBLE),
                 (acc, s) -> acc + s.term)""") / col("n_tokens"), 4))
      .select(col("doc_id"), col("n_tokens"), col("avg_nll"),
              Rounding.roundN(exp(col("avg_nll")), 2).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the same two aggs relationally; the per-doc term list is
    * collected in tok order so list_reduce folds the identical
    * doubles in the identical order. */
  val surprisalOracle: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
       dt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
       tf AS (SELECT tok, count(*) AS n_corpus FROM toks GROUP BY 1),
       tot AS (SELECT count(*) AS n_total FROM toks),
       terms AS (SELECT doc_id, tok, c,
           c * -ln(CAST(n_corpus AS DOUBLE) / n_total) AS term
         FROM dt JOIN tf USING (tok) CROSS JOIN tot),
       agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                 list(term ORDER BY tok) AS ts
               FROM terms GROUP BY doc_id),
       e AS (SELECT doc_id, n_tokens,
               round(list_reduce(ts, (acc, v) -> acc + v) / n_tokens, 4) AS avg_nll
             FROM agg)
       SELECT doc_id, n_tokens, avg_nll, round(exp(avg_nll), 2) AS ppl
       FROM e ORDER BY doc_id"""

  // ---- t16: temperature-weighted domain mixture -----------------------

  /** t16: temperature-weighted domain mixture — the sampling-weight
    * computation every multi-source training pipeline runs before
    * packing (the mC4/XLM-R alpha-sampling recipe): per-source token
    * mass t_d, alpha-damped share w_d = t_d^a / sum(t^a), and the
    * expected epochs each source is read at a one-corpus-pass token
    * budget (epochs_d = w_d * T / t_d; > 1 means the tail domain is
    * upsampled — the whole point of the damping). alpha is pinned at
    * 0.5 so damping is sqrt (bit-identical across libms, unlike
    * pow(x, 0.5) which may route through exp/ln).
    *
    * Scale shape: ONE corpus scan, one shuffle on source (partial
    * map-side counts), and everything after runs on the domain-bounded
    * frame (sources are dozens, not billions). Integer token sums are
    * exact and order-free; the single order-sensitive DOUBLE reduction
    * — the damped denominator — is a sorted left fold over the
    * source-bounded list (the t14 trick), so both engines add the same
    * doubles in the same order.
    */
  def domainMixture(documents: DataFrame): DataFrame = {
    val per = documents
      .withColumn("ws_tokens", expr("size(split(trim(text), '\\\\s+'))").cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("tokens"))
    val tot = per.agg(
      sum(col("tokens")).as("total_tokens"),
      expr("""aggregate(array_sort(collect_list(sqrt(CAST(tokens AS DOUBLE)))),
               CAST(0 AS DOUBLE), (a, v) -> a + v)""").as("denom"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("tokens"),
        Rounding.roundN(
          col("tokens").cast("double") / col("total_tokens").cast("double"), 6)
          .as("raw_share"),
        Rounding.roundN(expr("sqrt(CAST(tokens AS DOUBLE)) / denom"), 6)
          .as("weight"),
        Rounding.roundN(expr(
          """(sqrt(CAST(tokens AS DOUBLE)) / denom)
             * CAST(total_tokens AS DOUBLE) / CAST(tokens AS DOUBLE)"""), 6)
          .as("epochs"))
      .orderBy(col("source"))
  }

  val domainMixtureOracle: String =
    """WITH per AS (SELECT source, count(*) AS n_docs,
           CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens
         FROM documents GROUP BY source),
       tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
           list_reduce(list_sort(list(sqrt(CAST(tokens AS DOUBLE)))),
             (a, v) -> a + v) AS denom
         FROM per)
       SELECT source, n_docs, tokens,
         round(CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6) AS raw_share,
         round(sqrt(CAST(tokens AS DOUBLE)) / denom, 6) AS weight,
         round((sqrt(CAST(tokens AS DOUBLE)) / denom)
               * CAST(total_tokens AS DOUBLE) / CAST(tokens AS DOUBLE), 6) AS epochs
       FROM per CROSS JOIN tot ORDER BY source"""

  // ---- t17: mixture materialization (epoch-expansion sampling) --------

  /** t17: MATERIALIZE the t16 mixture — turn each source's expected
    * epochs into per-document repeat counts, deterministically: a doc
    * in a source with epochs e is emitted floor(e) times plus one more
    * iff its affine hash (the t07 split hash, uniform in [0,1)) falls
    * below frac(e). This is the stage between weight computation and
    * packing in every alpha-sampled training pipeline (mC4/XLM-R):
    * t05 stats -> t16 weights -> t17 materialized repeats -> t07/t08.
    * The Bernoulli step makes the REALIZED token share an unbiased,
    * reproducible estimate of the target weight per source — the
    * census emitted here is exactly the drift check (target vs
    * realized epochs) a production run monitors.
    *
    * Scale shape: the per-source epoch frame is source-bounded (dozens
    * of rows) and broadcasts back onto the doc scan — repeats are a
    * narrow map-side projection, no doc ever shuffles; the census is
    * one partial agg on source. Cross-engine parity: epochs stays
    * UNROUNDED through floor/frac (both engines compute the identical
    * IEEE double from integer token sums, a sorted-fold denominator
    * and exact sqrt/mul/div, so the floor boundary cannot straddle);
    * the hash-vs-frac comparison compares two bit-identical doubles.
    */
  def mixtureMaterialize(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withTok = documents.select(col("doc_id"), col("source"),
      expr("size(split(trim(text), '\\\\s+'))").cast("long").as("ws_tokens"))
    val per = withTok.groupBy(col("source"))
      .agg(sum(col("ws_tokens")).as("tokens_in"))
    val tot = per.agg(
      sum(col("tokens_in")).as("total_tokens"),
      expr("""aggregate(array_sort(collect_list(sqrt(CAST(tokens_in AS DOUBLE)))),
               CAST(0 AS DOUBLE), (a, v) -> a + v)""").as("denom"))
    val withEpochs = per.crossJoin(broadcast(tot))
      .withColumn("epochs", expr(
        """(sqrt(CAST(tokens_in AS DOUBLE)) / denom)
           * CAST(total_tokens AS DOUBLE) / CAST(tokens_in AS DOUBLE)"""))
      .select(col("source"), col("epochs"))
    val u = ((col("doc_id") * lit(1103515245L) + lit(12345L)) % P)
      .cast("double") / lit(P.toDouble)
    val perDoc = withTok
      .join(broadcast(withEpochs), Seq("source"))
      .withColumn("repeats", floor(col("epochs")) +
        when(u < (col("epochs") - floor(col("epochs"))), lit(1L)).otherwise(lit(0L)))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("repeats")).as("n_out"),
           sum(col("ws_tokens")).as("tokens_in"),
           sum(col("repeats") * col("ws_tokens")).as("tokens_out"),
           max(col("epochs")).as("te"))
      .withColumn("total_out", sum(col("tokens_out")).over(Window.partitionBy()))
      .select(col("source"), col("n_docs"), col("n_out"), col("tokens_in"),
        col("tokens_out"),
        Rounding.roundN(col("te"), 6).as("target_epochs"),
        Rounding.roundN(
          col("tokens_out").cast("double") / col("tokens_in").cast("double"), 6)
          .as("realized_epochs"),
        Rounding.roundN(
          col("tokens_out").cast("double") / col("total_out").cast("double"), 6)
          .as("realized_share"))
      .orderBy(col("source"))
  }

  val mixtureMaterializeOracle: String =
    s"""WITH d AS (SELECT doc_id, source,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens
         FROM documents),
       per AS (SELECT source, CAST(sum(ws_tokens) AS BIGINT) AS tokens_in
         FROM d GROUP BY source),
       tot AS (SELECT CAST(sum(tokens_in) AS BIGINT) AS total_tokens,
           list_reduce(list_sort(list(sqrt(CAST(tokens_in AS DOUBLE)))),
             (a, v) -> a + v) AS denom
         FROM per),
       we AS (SELECT source,
           (sqrt(CAST(tokens_in AS DOUBLE)) / denom)
             * CAST(total_tokens AS DOUBLE) / CAST(tokens_in AS DOUBLE) AS epochs
         FROM per CROSS JOIN tot),
       pd AS (SELECT d.doc_id, d.source, d.ws_tokens, we.epochs,
           CAST(floor(epochs) AS BIGINT)
             + CASE WHEN CAST((doc_id * 1103515245 + 12345) % $P AS DOUBLE) / $P.0
                         < epochs - floor(epochs)
                    THEN 1 ELSE 0 END AS repeats
         FROM d JOIN we USING (source)),
       agg AS (SELECT source, count(*) AS n_docs,
           CAST(sum(repeats) AS BIGINT) AS n_out,
           CAST(sum(ws_tokens) AS BIGINT) AS tokens_in,
           CAST(sum(repeats * ws_tokens) AS BIGINT) AS tokens_out,
           max(epochs) AS te
         FROM pd GROUP BY source),
       t2 AS (SELECT CAST(sum(tokens_out) AS BIGINT) AS total_out FROM agg)
       SELECT source, n_docs, n_out, tokens_in, tokens_out,
         round(te, 6) AS target_epochs,
         round(CAST(tokens_out AS DOUBLE) / CAST(tokens_in AS DOUBLE), 6)
           AS realized_epochs,
         round(CAST(tokens_out AS DOUBLE) / CAST(total_out AS DOUBLE), 6)
           AS realized_share
       FROM agg CROSS JOIN t2 ORDER BY source"""

  // ---- t18: bigram-LM surprisal with stupid backoff -------------------

  /** t18: held-out perplexity under a count-based BIGRAM LM with
    * stupid backoff — the context-conditional upgrade of t14's unigram
    * surprisal, and the standard shape of an LM-based quality filter
    * (CCNet/KenLM style: train a count model on a reference slice,
    * score candidate docs; high perplexity = off-distribution text).
    * Train slice = doc_id % trainMod == 0; every other doc is scored.
    * Per held-out bigram (w1, w2):
    * p = c2(w1,w2)/c1(w1) if the bigram was seen in training, else
    * 0.4 * c1(w2)/N (unigram backoff), else 0.4/N (OOV floor) — the
    * Brants et al. "stupid backoff" recipe, deterministic on counts
    * (no tuned discounts), hence fully replayable in the oracle.
    *
    * Scale shape: bigram extraction is IN-ROW (zip_with over the
    * token array against its own tail) — tokens NEVER shuffle; the
    * positional lead-window alternative would shuffle every token on
    * doc_id before emitting the same pairs. The count tables shuffle
    * on bigram/unigram keys exactly once (map-side partials); scoring
    * is equi-joins against count tables that are vocab-bounded
    * (Heaps' law), which AQE broadcasts when they fit. Double
    * summation is a sorted fold over each doc's (w1, w2)-keyed term
    * list (the t14 trick) so both engines add identical doubles in
    * identical order.
    */
  def bigramSurprisal(documents: DataFrame, trainMod: Int = 7): DataFrame = {
    // adjacent-pair extraction without a window: ws zipped with its
    // own tail (slice length 0 on a 1-token doc => no bigrams)
    val big = documents
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
             (a, b) -> struct(a AS w1, b AS w2))""")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .localCheckpoint(eager = false)
    val isTrain = col("doc_id") % trainMod === 0
    val trainBig = big.filter(isTrain)
    val c2 = trainBig.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = trainBig.groupBy(col("w1").as("w")).agg(count(lit(1)).as("c1"))
    val n = trainBig.agg(count(lit(1)).as("n"))
    val held = big.filter(!isTrain)
      .groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val scored = held
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1.select(col("w").as("w1"), col("c1").as("c1w1")), Seq("w1"), "left")
      .join(c1.select(col("w").as("w2"), col("c1").as("c1w2")), Seq("w2"), "left")
      .crossJoin(broadcast(n))
      .withColumn("p",
        when(col("c2").isNotNull, col("c2").cast("double") / col("c1w1"))
          .when(col("c1w2").isNotNull,
            lit(0.4) * col("c1w2").cast("double") / col("n"))
          .otherwise(lit(0.4) / col("n")))
      .withColumn("term", col("c") * -log(col("p")))
      .withColumn("oov", when(col("c2").isNull, col("c")).otherwise(lit(0L)))
    scored.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
           sum(col("oov")).as("oov_bigrams"),
           collect_list(struct(col("w1"), col("w2"), col("term"))).as("ts"))
      .withColumn("avg_nll", Rounding.roundN(
        expr("""aggregate(array_sort(ts), CAST(0 AS DOUBLE),
                 (acc, s) -> acc + s.term)""") / col("n_bigrams"), 4))
      .select(col("doc_id"), col("n_bigrams"), col("oov_bigrams"), col("avg_nll"),
              Rounding.roundN(exp(col("avg_nll")), 2).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: identical counts/backoff relationally; each doc's term
    * list collected in (w1, w2) order so list_reduce folds the same
    * doubles in the same order as array_sort's struct ordering
    * ((w1, w2) is unique per doc after the group-by). */
  def bigramSurprisalOracle(trainMod: Int = 7): String =
    s"""WITH toks AS (
         SELECT doc_id, g.i AS pos, g.tok
         FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
              LATERAL (SELECT unnest(ts) AS tok, generate_subscripts(ts, 1) AS i) g),
       big AS (SELECT doc_id, tok AS w1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
         FROM toks),
       b2 AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
       tr AS (SELECT w1, w2, count(*) AS c2 FROM b2
         WHERE doc_id % $trainMod = 0 GROUP BY 1, 2),
       un AS (SELECT w1 AS w, count(*) AS c1 FROM b2
         WHERE doc_id % $trainMod = 0 GROUP BY 1),
       nn AS (SELECT count(*) AS n FROM b2 WHERE doc_id % $trainMod = 0),
       hd AS (SELECT doc_id, w1, w2, count(*) AS c FROM b2
         WHERE doc_id % $trainMod <> 0 GROUP BY 1, 2, 3),
       sc AS (SELECT h.doc_id, h.w1, h.w2, h.c,
           CASE WHEN t.c2 IS NOT NULL THEN CAST(t.c2 AS DOUBLE) / u1.c1
                WHEN u2.c1 IS NOT NULL THEN CAST(0.4 AS DOUBLE) * CAST(u2.c1 AS DOUBLE) / n
                ELSE CAST(0.4 AS DOUBLE) / n END AS p,
           CASE WHEN t.c2 IS NULL THEN h.c ELSE 0 END AS oov
         FROM hd h LEFT JOIN tr t USING (w1, w2)
           LEFT JOIN un u1 ON h.w1 = u1.w
           LEFT JOIN un u2 ON h.w2 = u2.w
           CROSS JOIN nn),
       ag AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(sum(oov) AS BIGINT) AS oov_bigrams,
           list(c * -ln(p) ORDER BY w1, w2) AS ts
         FROM sc GROUP BY doc_id),
       e AS (SELECT doc_id, n_bigrams, oov_bigrams,
           round(list_reduce(ts, (acc, v) -> acc + v) / n_bigrams, 4) AS avg_nll
         FROM ag)
       SELECT doc_id, n_bigrams, oov_bigrams, avg_nll,
         round(exp(avg_nll), 2) AS ppl
       FROM e ORDER BY doc_id"""

  // ---- t22: CCNet perplexity buckets ----------------------------------

  /** t22: head/middle/tail perplexity partition PER SOURCE — the
    * CCNet curation step (Wenzek et al. 2020 §4.3): score every
    * held-out document under the t18 bigram LM, then split each
    * domain into perplexity terciles; "head" (lowest perplexity,
    * most in-distribution) is what CCNet keeps for pretraining and
    * "tail" is what it drops or down-weights.
    *
    * Parity design: bucket boundaries are RANK-based (ntile over the
    * already-rounded avg_nll with doc_id tie-break — a deterministic
    * permutation both engines order identically), NOT value-based
    * percentile thresholds, whose interpolation arithmetic differs
    * between engines and could straddle a boundary.
    *
    * Scale shape: the LM scoring is t18 (tokens never shuffle; count
    * tables vocab-bounded); the tercile window partitions by SOURCE —
    * the per-language sharding CCNet itself uses — so no global sort:
    * the shuffle key is the domain, the same key the mixture stages
    * (t16/t17) already partition on. At 100 TB the scored frame is
    * one row per doc; ntile within a domain is the standard
    * window-on-key shape (q04's plan).
    */
  def perplexityBuckets(documents: DataFrame, trainMod: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bigramSurprisal(documents, trainMod)
    val src = documents.select(col("doc_id"), col("source"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("avg_nll").asc, col("doc_id").asc)
    scored.join(src, Seq("doc_id"))
      .withColumn("nt", ntile(3).over(w))
      .select(col("doc_id"), col("source"), col("ppl"),
        when(col("nt") === 1, lit("head"))
          .when(col("nt") === 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy(col("doc_id"))
  }

  def perplexityBucketsOracle(trainMod: Int = 7): String =
    s"""WITH base AS (${bigramSurprisalOracle(trainMod)}),
       b AS (SELECT base.doc_id, d.source, base.ppl, base.avg_nll,
           ntile(3) OVER (PARTITION BY d.source
             ORDER BY base.avg_nll, base.doc_id) AS nt
         FROM base JOIN documents d ON base.doc_id = d.doc_id)
       SELECT doc_id, source, ppl,
         CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
       FROM b ORDER BY doc_id"""

  // ---- t20: quality-rule filter battery -------------------------------

  /** Rule thresholds: the Gopher-style rule FAMILY (word-count bounds,
    * mean-word-length bounds, repetition guard, stopword presence —
    * Rae et al. 2021 §A.1.1), with bounds tuned to the synthetic
    * corpus so EVERY rule has live pass and fail populations at
    * sf0.001 (a rule no document can fail is untested code, the same
    * honesty rule as t18's backoff arms). Production thresholds are a
    * config choice; the operator shape is what scales. */
  val RuleMinWords = 20L
  val RuleMaxWords = 80L
  val RuleMinMwl = 4.3
  val RuleMaxMwl = 4.8
  val RuleMinDistinct = 0.32
  val RuleMinStops = 2L

  /** The shared rule projection behind t20 and t23: every input column
    * plus the rule metrics/booleans and the composite `keep`. One
    * definition so the filter row and the curation pipeline can never
    * disagree about what "keep" means. Narrow, zero-shuffle. */
  private[operators] def batteryMetrics(documents: DataFrame): DataFrame =
    documents
      .filter(col("n_chars") > 0)
      .withColumn("n_words", expr("size(split(trim(text), ' '))").cast("long"))
      .withColumn("mwl",
        length(regexp_replace(trim(col("text")), " ", "")).cast("double") / col("n_words"))
      .withColumn("dr",
        expr("size(array_distinct(split(trim(text), ' ')))").cast("double") / col("n_words"))
      .withColumn("stop_hits", expr(hitsSpark("en")).cast("long"))
      .withColumn("r_len",
        col("n_words") >= RuleMinWords && col("n_words") <= RuleMaxWords)
      .withColumn("r_wordlen", col("mwl") >= RuleMinMwl && col("mwl") <= RuleMaxMwl)
      .withColumn("r_repeat", col("dr") >= RuleMinDistinct)
      .withColumn("r_stop", col("stop_hits") >= RuleMinStops)
      .withColumn("keep",
        col("r_len") && col("r_wordlen") && col("r_repeat") && col("r_stop"))

  /** The battery's admission set alone — (doc_id) of every keeper,
    * WITHOUT t20's oracle-determinism orderBy (a global sort has no
    * place inside an ingest loop). Same rules via [[batteryMetrics]];
    * used by the streaming curation paths. */
  def batteryKeep(documents: DataFrame): DataFrame =
    batteryMetrics(documents).filter(col("keep")).select(col("doc_id"))

  /** t20: per-document quality-rule battery — each heuristic filter as
    * an explicit boolean column plus the composite `keep` (the
    * CCNet/Gopher filter stage as data, not a silent WHERE: a corpus
    * pipeline audits per-rule rejection rates before committing to a
    * filter, so the rules must be inspectable output). All metrics are
    * exact integer ratios (len/count divisions are bit-identical IEEE
    * in both engines), so the rule booleans cannot straddle engines.
    *
    * Scale shape: single-pass narrow projection, no shuffle until the
    * oracle-determinism orderBy — map-side at scan speed at 100 TB;
    * the downstream materialization is `filter(keep)` (or a
    * per-rule census, which aggregates these booleans). */
  def filterBattery(documents: DataFrame): DataFrame =
    batteryMetrics(documents)
      .select(col("doc_id"), col("n_words"),
        Rounding.roundN(col("mwl"), 4).as("mean_word_len"),
        Rounding.roundN(col("dr"), 4).as("distinct_ratio"),
        col("stop_hits"), col("r_len"), col("r_wordlen"), col("r_repeat"),
        col("r_stop"), col("keep"))
      .orderBy(col("doc_id"))

  /** The DuckDB side of [[batteryMetrics]]: CTE fragment `m` with the
    * rule metrics over every non-empty doc (extra doc columns carried
    * for downstream composition), plus the keep predicate as a WHERE
    * fragment — shared by the t20 and t23 oracles. */
  private[graft] val batteryMetricsCte: String =
    s"""m AS (SELECT doc_id, lang, text, n_chars,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words,
         CAST(len(replace(trim(text), ' ', '')) AS DOUBLE)
           / len(string_split(trim(text), ' ')) AS mwl,
         CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
           / len(string_split(trim(text), ' ')) AS dr,
         CAST(${hitsDuck("en")} AS BIGINT) AS stop_hits
       FROM documents WHERE n_chars > 0)"""
  private[graft] val batteryKeepWhere: String =
    s"""n_words >= $RuleMinWords AND n_words <= $RuleMaxWords
      AND mwl >= $RuleMinMwl AND mwl <= $RuleMaxMwl
      AND dr >= $RuleMinDistinct AND stop_hits >= $RuleMinStops"""

  val filterBatteryOracle: String =
    s"""WITH $batteryMetricsCte,
       r AS (SELECT doc_id, n_words, mwl, dr, stop_hits,
         (n_words >= $RuleMinWords AND n_words <= $RuleMaxWords) AS r_len,
         (mwl >= $RuleMinMwl AND mwl <= $RuleMaxMwl) AS r_wordlen,
         (dr >= $RuleMinDistinct) AS r_repeat,
         (stop_hits >= $RuleMinStops) AS r_stop
       FROM m)
       SELECT doc_id, n_words, round(mwl, 4) AS mean_word_len,
         round(dr, 4) AS distinct_ratio, stop_hits,
         r_len, r_wordlen, r_repeat, r_stop,
         (r_len AND r_wordlen AND r_repeat AND r_stop) AS keep
       FROM r ORDER BY doc_id"""

  // ---- t24: BPE merge induction ---------------------------------------

  /** t24: the first `iters` BPE merge selections (Sennrich et al.
    * 2016 — the tokenizer-training loop itself, the step upstream of
    * every token count in this engine): start from words as character
    * sequences weighted by corpus frequency, and per iteration (1)
    * count adjacent symbol pairs, (2) select the most frequent pair
    * (count desc, then lexicographic — fully deterministic), (3)
    * merge its occurrences greedily left-to-right within every word.
    * Output: one row per learned merge with its selection-time count
    * — the tokenizer artifact a BPE vocab ships as.
    *
    * The greedy non-overlap rule ("aaa" under merge a+a yields
    * [aa, a], never [a, aa] or [aa, aa]) is the part string replace
    * cannot express relationally (a replaced pair's trailing
    * delimiter overlaps the next match), so it is computed as
    * gaps-and-islands over match POSITIONS (q42's trick): consecutive
    * match runs form islands, and within an island every other match
    * starting from its head applies. Both engines run that same
    * relational construction — no fold, no UDF.
    *
    * Scale shape: the ONLY corpus-scale work is the initial token
    * shuffle into word counts (one partial->final agg). Every
    * iteration after that operates on the DISTINCT-WORD table —
    * vocab-bounded (positions ~ vocab × word length), with the 1-row
    * best-pair frame broadcast into the merge application. At 100 TB
    * the vocab is millions of rows while the corpus is trillions of
    * tokens: the loop costs iters × O(vocab), not iters × O(corpus).
    * localCheckpoint pins each iteration's vocab so plans stay flat.
    */
  def bpeMerges(documents: DataFrame, iters: Int = 4): DataFrame =
    bpeTrain(documents, iters)._2.reduce(_.unionByName(_)).orderBy(col("iter"))

  /** t25: the corpus token distribution under the learned merges —
    * the APPLY step (what d10 is to d02): every word's final symbol
    * sequence after [[bpeMerges]]' `iters` merges, exploded and
    * frequency-weighted into the top token counts a tokenizer
    * training run reports. Same cost shape as training: one corpus
    * token shuffle (shared word counts), then vocab-bounded work —
    * the per-word tokenization is computed ONCE per distinct word,
    * never per corpus occurrence. */
  def bpeEncode(documents: DataFrame, iters: Int = 4, k: Int = 30): DataFrame = {
    val vocab = bpeTrain(documents, iters)._1
    vocab.select(col("wc"), explode(col("syms")).as("token"))
      .groupBy(col("token")).agg(sum(col("wc")).as("n"))
      .orderBy(col("n").desc, col("token")).limit(k)
  }

  /** t27: TOKENIZER FERTILITY per language — tokens-per-word (and its
    * inverse view, characters-per-token) under [[bpeMerges]]' learned
    * merges, the standard tokenizer-evaluation metric: a vocab
    * trained on a language mixture systematically over-segments the
    * minority languages (fertility up, compression down), which is
    * exactly what this row measures per `lang`. Shares [[bpeTrain]]
    * with t24/t25 (one trainer, three views); the only additions are
    * a per-(lang, word) count — the same single token shuffle keyed
    * one column wider — and a vocab-bounded join of the final symbol
    * sequences back onto it. The ratio columns divide two exact
    * BIGINTs, so there is no fold-order hazard at all.
    */
  def bpeFertility(documents: DataFrame, iters: Int = 4): DataFrame = {
    val vocab = bpeTrain(documents, iters)._1
    val wl = documents
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    wl.join(vocab.select(col("w"), size(col("syms")).as("ntok")), "w")
      .groupBy(col("lang"))
      .agg(sum(col("c")).as("n_words"),
           sum(col("c") * col("ntok")).as("n_tokens"),
           sum(col("c") * length(col("w"))).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_tokens"),
        Rounding.roundN(col("n_tokens").cast("double")
          / col("n_words").cast("double"), 4).as("fertility"),
        Rounding.roundN(col("n_chars").cast("double")
          / col("n_tokens").cast("double"), 4).as("chars_per_token"))
      .orderBy(col("lang"))
  }

  /** DuckDB twin of [[bpeFertility]]: the same CTE chain, final vocab
    * joined back onto per-(lang, word) counts. */
  def bpeFertilityOracle(iters: Int = 4): String =
    s"""WITH ${bpeCtes(iters)},
       wl AS (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
              FROM documents),
       wlf AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM wl
               WHERE length(w) > 0 GROUP BY 1, 2),
       j AS (SELECT lang, c, len(syms) AS ntok, length(w) AS nch
             FROM wlf JOIN v$iters USING (w)),
       agg AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_words,
                 CAST(sum(c * ntok) AS BIGINT) AS n_tokens,
                 CAST(sum(c * nch) AS BIGINT) AS n_chars
               FROM j GROUP BY lang)
       SELECT lang, n_words, n_tokens,
         round(CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE), 4)
           AS fertility,
         round(CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
           AS chars_per_token
       FROM agg ORDER BY lang"""

  // The trainer is the t24/t25/t27 persist point (the Dedup.pipeline
  // discipline): one corpus's merges are learned ONCE per (session,
  // file stamp, iters) and the three views share the checkpointed
  // vocab — cache only bare table scans (a filtered/synthetic frame
  // has no stable identity and gets a fresh trainer).
  private val bpeCache = new Caching.BoundedCache[
    (org.apache.spark.sql.SparkSession, String, Int),
    (DataFrame, Seq[DataFrame])](4)
  private[graft] var bpeTrainerRuns = 0L

  /** Shared BPE trainer: returns (final vocab after `iters` merges,
    * one 1-row merge frame per iteration). */
  private def bpeTrain(documents: DataFrame, iters: Int)
      : (DataFrame, Seq[DataFrame]) = {
    if (!Caching.bareScan(documents))
      return bpeTrainUncached(documents, iters)
    val stamp = Caching.stamp(documents)
    if (stamp.isEmpty) bpeTrainUncached(documents, iters)
    else bpeCache.getOrElseUpdate((documents.sparkSession, stamp, iters))(
      bpeTrainUncached(documents, iters))
  }

  private def bpeTrainUncached(documents: DataFrame, iters: Int)
      : (DataFrame, Seq[DataFrame]) = {
    bpeTrainerRuns += 1
    import org.apache.spark.sql.expressions.Window
    val words = documents
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wc"))
    var vocab = words.withColumn("syms",
      expr("transform(sequence(1, length(w)), j -> substring(w, j, 1))"))
      .select(col("w"), col("wc"), col("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (it <- 1 to iters) {
      val pairs = vocab.filter(size(col("syms")) >= 2)
        .select(col("wc"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .select(lit(it.toLong).as("iter"), col("a"), col("b"),
                concat(col("a"), col("b")).as("merged"), col("cnt"))
        .localCheckpoint()
      merges += best
      val withBest = vocab.crossJoin(broadcast(
        best.select(col("a").as("ma"), col("b").as("mb"))))
      val pos = withBest
        .select(col("w"), col("wc"), col("ma"), col("mb"), col("syms"),
                posexplode(col("syms")).as(Seq("i0", "s")))
        .withColumn("i", col("i0") + 1)
        // ANSI-safe lookahead: element_at only when i+1 is in bounds
        .withColumn("is_match", coalesce(
          col("s") === col("ma") &&
            when(col("i") < size(col("syms")),
                 element_at(col("syms"), col("i") + 1)) === col("mb"),
          lit(false)))
      val app = pos.filter(col("is_match"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("w")).orderBy(col("i"))))
        .withColumn("grp", col("i") - col("rn"))
        .withColumn("island_start", min(col("i")).over(
          Window.partitionBy(col("w"), col("grp"))))
        .filter((col("i") - col("island_start")) % 2 === 0)
        .select(col("w"), col("i"))
      vocab = pos
        .join(app.withColumn("app_here", lit(true)), Seq("w", "i"), "left")
        .join(app.select(col("w"), (col("i") + 1).as("i"),
                         lit(true).as("dropped")), Seq("w", "i"), "left")
        .filter(col("dropped").isNull)
        .withColumn("osym", when(col("app_here"),
          concat(col("ma"), col("mb"))).otherwise(col("s")))
        .groupBy(col("w"), col("wc"))
        .agg(expr("transform(array_sort(collect_list(struct(i, osym))), x -> x.osym)")
               .as("syms"))
        .localCheckpoint()
    }
    (vocab, merges.toSeq)
  }

  /** DuckDB twin of [[bpeMerges]]: the same relational construction
    * unrolled — one CTE chain per iteration (pair counts → best →
    * positions → match islands → rebuilt vocab). */
  def bpeMergesOracle(iters: Int = 4): String = {
    val out = (1 to iters).map { t =>
      s"SELECT CAST($t AS BIGINT) AS iter, a, b, a || b AS merged, cnt FROM best$t"
    }.mkString("\n       UNION ALL ")
    s"""WITH ${bpeCtes(iters)}
       $out ORDER BY iter"""
  }

  /** DuckDB twin of [[bpeEncode]]: the same CTE chain, final vocab
    * exploded into frequency-weighted token counts. */
  def bpeEncodeOracle(iters: Int = 4, k: Int = 30): String =
    s"""WITH ${bpeCtes(iters)}
       SELECT token, CAST(sum(wc) AS BIGINT) AS n
       FROM (SELECT wc, unnest(syms) AS token FROM v$iters) z
       GROUP BY token ORDER BY n DESC, token LIMIT $k"""

  private def bpeCtes(iters: Int): String = {
    val v0 =
      """v0 AS (SELECT w, CAST(count(*) AS BIGINT) AS wc,
           list_transform(generate_series(1, length(w)), j -> substring(w, j, 1)) AS syms
         FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
         WHERE length(w) > 0 GROUP BY w)"""
    val steps = (1 to iters).map { t =>
      val p = t - 1
      s"""px$t AS (SELECT wc, syms,
           unnest(generate_series(1, len(syms) - 1)) AS i FROM v$p),
       pc$t AS (SELECT syms[i] AS a, syms[i + 1] AS b,
           CAST(sum(wc) AS BIGINT) AS cnt FROM px$t GROUP BY 1, 2),
       best$t AS (SELECT a, b, cnt FROM pc$t ORDER BY cnt DESC, a, b LIMIT 1),
       pos$t AS (SELECT w, wc, syms, unnest(generate_series(1, len(syms))) AS i
         FROM v$p),
       posb$t AS (SELECT p.w, p.wc, p.i, p.syms[p.i] AS s, q.a AS ma, q.b AS mb,
           coalesce(p.syms[p.i] = q.a AND p.syms[p.i + 1] = q.b, FALSE) AS is_match
         FROM pos$t p CROSS JOIN best$t q),
       app$t AS (SELECT w, i FROM (
           SELECT w, i, (i - min(i) OVER (PARTITION BY w, i - rn)) % 2 = 0 AS applied
           FROM (SELECT w, i, row_number() OVER (PARTITION BY w ORDER BY i) AS rn
                 FROM posb$t WHERE is_match) x) y
         WHERE applied),
       v$t AS (SELECT w, wc, list(osym ORDER BY i) AS syms FROM (
           SELECT p.w, p.wc, p.i,
             CASE WHEN a2.i IS NOT NULL THEN p.ma || p.mb ELSE p.s END AS osym
           FROM posb$t p
           LEFT JOIN app$t a2 ON p.w = a2.w AND p.i = a2.i
           LEFT JOIN app$t d ON p.w = d.w AND p.i = d.i + 1
           WHERE d.i IS NULL) z
         GROUP BY w, wc)"""
    }.mkString(",\n       ")
    s"""$v0,
       $steps"""
  }

  // ---- t28: Heaps-law vocabulary growth (corpus planning) -------------

  /** t28: per-source HEAPS-LAW vocabulary growth — V(N) ≈ K·N^β
    * fitted per source over ten cumulative decile checkpoints of the
    * corpus in doc_id order: the corpus-PLANNING measurement (what
    * will the vocab be at 100 TB? how fast is this crawl still
    * finding new words?) and the sizing input behind every
    * vocab-bounded cost claim in this engine. β near 1 means the
    * source is still novel text; β collapsing toward 0 means it has
    * gone repetitive.
    *
    * Everything before the fit is EXACT integer relational algebra:
    * a token's first-appearance rank is the rank of its min doc_id
    * (doc rank is monotone in doc_id), per-rank new-vocab counts and
    * token counts cumulate in one doc-bounded window, and the ten
    * checkpoint ranks are ceil(D·c/10) = (D·c+9) div 10 — identical
    * integer arithmetic in both engines. The OLS log-log fit then
    * touches only ≤ 10 (ln N, ln V) points per source, folded in
    * checkpoint order (the t14 discipline at trivial size).
    *
    * Scale shape: one token shuffle into (source, tok, first rank) —
    * vocab-bounded after; the cumulative window is one row per DOC,
    * not per token; checkpoints are 10 rows per source. */
  def heapsGrowth(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents
      .select(col("source"), col("doc_id"),
        explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val wDoc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val docs = toks.groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("ntok"))
      .withColumn("r", row_number().over(wDoc))
    val firsts = toks.groupBy(col("source"), col("tok"))
      .agg(min(col("doc_id")).as("fd"))
      .groupBy(col("source"), col("fd")).agg(count(lit(1)).as("newv"))
    val wRun = Window.partitionBy(col("source")).orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = docs
      .join(firsts.withColumnRenamed("fd", "doc_id"),
        Seq("source", "doc_id"), "left")
      .withColumn("cum_toks", sum(col("ntok")).over(wRun))
      .withColumn("cum_vocab", sum(coalesce(col("newv"), lit(0L))).over(wRun))
      .withColumn("d_docs",
        count(lit(1)).over(Window.partitionBy(col("source"))))
    val ck = cum
      .crossJoin(broadcast(
        documents.sparkSession.range(1, 11).select(col("id").as("c"))))
      .filter(expr("r = (d_docs * c + 9) div 10"))
      .select(col("source"), col("r"), col("d_docs"),
        col("cum_toks"), col("cum_vocab")).distinct()
    ck.groupBy(col("source"))
      .agg(max(col("d_docs")).as("n_docs"),
           max(col("cum_toks")).as("n_tokens"),
           max(col("cum_vocab")).as("vocab"),
           count(lit(1)).as("cpoints"),
           collect_list(struct(col("r"),
             log(col("cum_toks").cast("double")).as("x"),
             log(col("cum_vocab").cast("double")).as("y"))).as("pts"))
      .filter(col("cpoints") >= 2)
      .select(col("source"), col("n_docs"), col("n_tokens"), col("vocab"),
        col("cpoints"),
        expr("""aggregate(array_sort(pts), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.x)""").as("sx"),
        expr("""aggregate(array_sort(pts), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.y)""").as("sy"),
        expr("""aggregate(array_sort(pts), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.x * s.y)""").as("sxy"),
        expr("""aggregate(array_sort(pts), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.x * s.x)""").as("sxx"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("vocab"),
        (Rounding.roundN(
          (col("cpoints") * col("sxy") - col("sx") * col("sy"))
            / (col("cpoints") * col("sxx") - col("sx") * col("sx")), 4)
          + lit(0.0)).as("beta"),
        Rounding.roundN(exp(
          (col("sy") - ((col("cpoints") * col("sxy") - col("sx") * col("sy"))
            / (col("cpoints") * col("sxx") - col("sx") * col("sx")))
            * col("sx")) / col("cpoints")), 4).as("k"))
      .orderBy(col("source"))
  }

  /** DuckDB twin of [[heapsGrowth]]: identical integer checkpoint
    * construction and the identical fold/fit arithmetic. */
  val heapsGrowthOracle: String =
    """WITH toks AS (SELECT source, doc_id,
           unnest(string_split(lower(text), ' ')) AS tok FROM documents),
       tf AS (SELECT source, doc_id, tok FROM toks WHERE length(tok) > 0),
       docs AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS ntok,
           CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                AS BIGINT) AS r
         FROM tf GROUP BY 1, 2),
       firsts AS (SELECT source, fd AS doc_id,
           CAST(count(*) AS BIGINT) AS newv
         FROM (SELECT source, tok, min(doc_id) AS fd FROM tf GROUP BY 1, 2) z
         GROUP BY 1, 2),
       cum AS (SELECT d.source, d.r,
           CAST(sum(d.ntok) OVER w AS BIGINT) AS cum_toks,
           CAST(sum(COALESCE(f.newv, 0)) OVER w AS BIGINT) AS cum_vocab,
           CAST(count(*) OVER (PARTITION BY d.source) AS BIGINT) AS d_docs
         FROM docs d LEFT JOIN firsts f
           ON f.source = d.source AND f.doc_id = d.doc_id
         WINDOW w AS (PARTITION BY d.source ORDER BY d.r
                      ROWS UNBOUNDED PRECEDING)),
       ck AS (SELECT DISTINCT source, r, d_docs, cum_toks, cum_vocab
         FROM cum JOIN (SELECT unnest(generate_series(1, 10)) AS c) cs ON TRUE
         WHERE r = (d_docs * c + 9) // 10),
       s AS (SELECT source,
           CAST(max(d_docs) AS BIGINT) AS n_docs,
           CAST(max(cum_toks) AS BIGINT) AS n_tokens,
           CAST(max(cum_vocab) AS BIGINT) AS vocab,
           CAST(count(*) AS BIGINT) AS cpoints,
           list(ln(CAST(cum_toks AS DOUBLE)) ORDER BY r) AS xs,
           list(ln(CAST(cum_vocab AS DOUBLE)) ORDER BY r) AS ys,
           list(ln(CAST(cum_toks AS DOUBLE)) * ln(CAST(cum_vocab AS DOUBLE))
                ORDER BY r) AS xys,
           list(ln(CAST(cum_toks AS DOUBLE)) * ln(CAST(cum_toks AS DOUBLE))
                ORDER BY r) AS xxs
         FROM ck GROUP BY source HAVING count(*) >= 2),
       f AS (SELECT source, n_docs, n_tokens, vocab, cpoints,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), xs), (a, v) -> a + v) AS sx,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), ys), (a, v) -> a + v) AS sy,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), xys), (a, v) -> a + v) AS sxy,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), xxs), (a, v) -> a + v) AS sxx
         FROM s)
       SELECT source, n_docs, n_tokens, vocab,
         round((cpoints * sxy - sx * sy) / (cpoints * sxx - sx * sx), 4)
           + 0.0 AS beta,
         round(exp((sy - ((cpoints * sxy - sx * sy)
             / (cpoints * sxx - sx * sx)) * sx) / cpoints), 4) AS k
       FROM f ORDER BY source"""

  // ---- t29: Zipf rank-frequency slope (corpus planning, with t28) -----

  /** t29: per-source ZIPF-LAW fit — f(r) ≈ C·r^s over the top-`topR`
    * term ranks: the STATIC companion to t28's Heaps growth (the two
    * laws are duals — β ≈ −1/s for large corpora) and the other half
    * of the corpus-planning pair: the slope says how head-heavy a
    * source's term distribution is (s near −1 = natural text; s
    * flattening toward 0 = templated/boilerplate where the head
    * carries no skew; s steepening = a few tokens dominating, the
    * repetition signal t11 sees per doc measured corpus-wide).
    *
    * Determinism: ranks are a row_number permutation over
    * (count desc, token asc) — exact integers; the OLS log-log fit
    * touches only ≤ topR (ln r, ln f) points per source, folded in
    * rank order (the t28 discipline). Scale shape: ONE corpus token
    * shuffle into (source, tok) counts (map-side partials), the
    * rank window gets WindowGroupLimit map-side top-R, and the fit
    * frame is topR rows per source — everything after the count agg
    * is vocab-bounded, the fit grid-bounded.
    */
  def zipfSlope(documents: DataFrame, topR: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = documents
      .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("tok"))
    val ranked = tf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topR)
    val totals = tf.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), sum(col("cnt")).as("n_tokens"))
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_ranks"),
           collect_list(struct(col("rank"),
             log(col("rank").cast("double")).as("x"),
             log(col("cnt").cast("double")).as("y"))).as("pts"))
      .join(totals, Seq("source"))
      .select(col("source"), col("vocab"), col("n_tokens"), col("n_ranks"),
        expr("""aggregate(array_sort(pts), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.x)""").as("sx"),
        expr("""aggregate(array_sort(pts), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.y)""").as("sy"),
        expr("""aggregate(array_sort(pts), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.x * s.y)""").as("sxy"),
        expr("""aggregate(array_sort(pts), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.x * s.x)""").as("sxx"))
      .select(col("source"), col("vocab"), col("n_tokens"), col("n_ranks"),
        (Rounding.roundN(
          (col("n_ranks") * col("sxy") - col("sx") * col("sy"))
            / (col("n_ranks") * col("sxx") - col("sx") * col("sx")), 4)
          + lit(0.0)).as("slope"),
        Rounding.roundN(exp(
          (col("sy") - ((col("n_ranks") * col("sxy") - col("sx") * col("sy"))
            / (col("n_ranks") * col("sxx") - col("sx") * col("sx")))
            * col("sx")) / col("n_ranks")), 4).as("c"))
      .orderBy(col("source"))
  }

  /** DuckDB twin of [[zipfSlope]]: identical rank permutation and the
    * identical rank-ordered fold/fit arithmetic. */
  def zipfSlopeOracle(topR: Int = 32): String =
    s"""WITH tf AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
         FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
               FROM documents) z
         WHERE length(tok) > 0 GROUP BY source, tok),
       ranked AS (SELECT source, cnt,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY cnt DESC, tok) AS BIGINT) AS rank
         FROM tf QUALIFY rank <= $topR),
       totals AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(cnt) AS BIGINT) AS n_tokens FROM tf GROUP BY source),
       s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
           list(ln(CAST(rank AS DOUBLE)) ORDER BY rank) AS xs,
           list(ln(CAST(cnt AS DOUBLE)) ORDER BY rank) AS ys,
           list(ln(CAST(rank AS DOUBLE)) * ln(CAST(cnt AS DOUBLE))
                ORDER BY rank) AS xys,
           list(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))
                ORDER BY rank) AS xxs
         FROM ranked GROUP BY source),
       f AS (SELECT source, n_ranks,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), xs), (a, v) -> a + v) AS sx,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), ys), (a, v) -> a + v) AS sy,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), xys), (a, v) -> a + v) AS sxy,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), xxs), (a, v) -> a + v) AS sxx
         FROM s)
       SELECT f.source, t.vocab, t.n_tokens, f.n_ranks,
         round((n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx), 4)
           + 0.0 AS slope,
         round(exp((sy - ((n_ranks * sxy - sx * sy)
             / (n_ranks * sxx - sx * sx)) * sx) / n_ranks), 4) AS c
       FROM f JOIN totals t ON f.source = t.source ORDER BY f.source"""

  // ---- t26: pairwise domain divergence (distribution shift) ----------

  /** t26: Jensen-Shannon divergence between every pair of sources'
    * unigram term distributions — the distribution-shift measurement
    * behind mixture rebalancing, drift monitoring, and "is this crawl
    * snapshot like the last one": JSD(P,Q) ∈ [0,1] bits, 0 = identical
    * distributions, 1 = disjoint support. Computed via the entropy
    * decomposition JSD = H(M) − (H(P)+H(Q))/2 with M = (P+Q)/2, where
    * H(M) needs only per-source sums plus a SHARED-token correction:
    * H(M) = G_a + G_b + Σ_shared [f(m) − f(p_a/2) − f(p_b/2)],
    * G_s = Σ_t f(p_s/2), f(x) = −x·ln x — so one-sided tokens never
    * pair up and the only join is a bounded equi-join on the token.
    *
    * Scale shape: ONE corpus token shuffle into (source, token)
    * counts; everything after is vocab-bounded. The pair join is an
    * equi-join on token (fan-out ≤ sources² per token, never a
    * cartesian). Double determinism uses a TWO-LEVEL sorted fold (the
    * t14 trick, sharded): tokens fold within their 2-char-prefix
    * bucket in token order, bucket sums fold in prefix order — no
    * vocab-sized collect_list in any task (a 10⁸-term vocab folds in
    * ~1k-token buckets), and both engines add the same doubles in the
    * same order at every level. `vocab_*` columns are exact BIGINTs;
    * jsd rounds at 4 dp (+0.0 normalizes a −0.0 residual on
    * identical-distribution pairs).
    */
  def domainDivergence(documents: DataFrame): DataFrame = {
    val tc = documents
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val dist = tc
      .join(tc.groupBy(col("source")).agg(sum(col("c")).as("n")), "source")
      .select(col("source"), col("tok"),
        (col("c").cast("double") / col("n").cast("double")).as("p"),
        substring(col("tok"), 1, 2).as("pfx"))
      .localCheckpoint() // shared by the per-source and pair arms
    // per-source H(P) and G = Σ f(p/2): prefix-bucket folds, then a
    // bucket-level fold — deterministic and bounded at both levels
    val l1 = dist.groupBy(col("source"), col("pfx"))
      .agg(count(lit(1)).as("v"),
           collect_list(struct(col("tok"), col("p"))).as("ps"))
      .select(col("source"), col("pfx"), col("v"),
        expr("""aggregate(array_sort(ps), CAST(0 AS DOUBLE),
                 (a, s) -> a - s.p * ln(s.p))""").as("e"),
        expr("""aggregate(array_sort(ps), CAST(0 AS DOUBLE),
                 (a, s) -> a - s.p / 2 * ln(s.p / 2))""").as("h"))
    val per = l1.groupBy(col("source"))
      .agg(sum(col("v")).as("vocab"),
           collect_list(struct(col("pfx"), col("e"), col("h"))).as("shards"))
      .select(col("source"), col("vocab"),
        expr("""aggregate(array_sort(shards), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.e)""").as("ent"),
        expr("""aggregate(array_sort(shards), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.h)""").as("half"))
    // shared-token correction per pair: the same two-level fold keyed
    // (src_a, src_b, pfx) then (src_a, src_b)
    val corr = dist.select(col("source").as("src_a"), col("tok"),
        col("pfx"), col("p").as("pa"))
      .join(dist.select(col("source").as("src_b"), col("tok"),
        col("p").as("pb")), Seq("tok"))
      .filter(col("src_a") < col("src_b"))
      .withColumn("corr", expr(
        """-((pa + pb) / 2 * ln((pa + pb) / 2))
           + pa / 2 * ln(pa / 2) + pb / 2 * ln(pb / 2)"""))
    val c1 = corr.groupBy(col("src_a"), col("src_b"), col("pfx"))
      .agg(count(lit(1)).as("v"),
           collect_list(struct(col("tok"), col("corr"))).as("cs"))
      .select(col("src_a"), col("src_b"), col("pfx"), col("v"),
        expr("""aggregate(array_sort(cs), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.corr)""").as("cc"))
    val pairs = c1.groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("v")).as("vocab_shared"),
           collect_list(struct(col("pfx"), col("cc"))).as("shards"))
      .select(col("src_a"), col("src_b"), col("vocab_shared"),
        expr("""aggregate(array_sort(shards), CAST(0 AS DOUBLE),
                 (a, s) -> a + s.cc)""").as("corr"))
    pairs
      .join(per.select(col("source").as("src_a"), col("vocab").as("vocab_a"),
        col("ent").as("ent_a"), col("half").as("half_a")), "src_a")
      .join(per.select(col("source").as("src_b"), col("vocab").as("vocab_b"),
        col("ent").as("ent_b"), col("half").as("half_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("vocab_a"), col("vocab_b"),
        col("vocab_shared"),
        (Rounding.roundN(
          (col("half_a") + col("half_b") + col("corr")
            - (col("ent_a") + col("ent_b")) / 2) / lit(math.log(2.0)), 4)
          + lit(0.0)).as("jsd"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** DuckDB twin of [[domainDivergence]]: the identical entropy
    * decomposition and the identical two-level fold (list(... ORDER BY
    * tok) within prefix buckets, then ORDER BY pfx across buckets) so
    * every double is added in the same order as the Spark plan. */
  val domainDivergenceOracle: String =
    """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
       tc AS (SELECT source, tok, count(*) AS c FROM toks
              WHERE length(tok) > 0 GROUP BY 1, 2),
       n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY 1),
       dist AS (SELECT source, tok, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                  substring(tok, 1, 2) AS pfx
                FROM tc JOIN n USING (source)),
       l1 AS (SELECT source, pfx, count(*) AS v,
                list(-p * ln(p) ORDER BY tok) AS es,
                list(-(p / 2) * ln(p / 2) ORDER BY tok) AS hs
              FROM dist GROUP BY 1, 2),
       l1r AS (SELECT source, pfx, v,
                list_reduce(es, (a, x) -> a + x) AS e,
                list_reduce(hs, (a, x) -> a + x) AS h FROM l1),
       per AS (SELECT source, CAST(sum(v) AS BIGINT) AS vocab,
                list(e ORDER BY pfx) AS el, list(h ORDER BY pfx) AS hl
              FROM l1r GROUP BY 1),
       perr AS (SELECT source, vocab,
                list_reduce(el, (a, x) -> a + x) AS ent,
                list_reduce(hl, (a, x) -> a + x) AS half FROM per),
       sh AS (SELECT l.source AS src_a, r.source AS src_b, l.tok, l.pfx,
                -((l.p + r.p) / 2 * ln((l.p + r.p) / 2))
                  + l.p / 2 * ln(l.p / 2) + r.p / 2 * ln(r.p / 2) AS corr
              FROM dist l JOIN dist r
                ON l.tok = r.tok AND l.source < r.source),
       c1 AS (SELECT src_a, src_b, pfx, count(*) AS v,
                list(corr ORDER BY tok) AS cs
              FROM sh GROUP BY 1, 2, 3),
       c1r AS (SELECT src_a, src_b, pfx, v,
                list_reduce(cs, (a, x) -> a + x) AS cc FROM c1),
       pairs AS (SELECT src_a, src_b, CAST(sum(v) AS BIGINT) AS vocab_shared,
                  list(cc ORDER BY pfx) AS cl
                FROM c1r GROUP BY 1, 2),
       pairr AS (SELECT src_a, src_b, vocab_shared,
                  list_reduce(cl, (a, x) -> a + x) AS corr FROM pairs)
       SELECT src_a, src_b, a.vocab AS vocab_a, b.vocab AS vocab_b,
         vocab_shared,
         round((a.half + b.half + corr - (a.ent + b.ent) / 2) / ln(2), 4)
           + 0.0 AS jsd
       FROM pairr
       JOIN perr a ON a.source = src_a
       JOIN perr b ON b.source = src_b
       ORDER BY src_a, src_b"""
}
