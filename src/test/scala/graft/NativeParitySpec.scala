package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions._
import graft.operators.{Dedup, Dialect, TextOps}

/** The native kernels must be bit-identical to the SQL-composed
  * (higher-order-function) fragments they replaced — that equivalence
  * is what lets the DuckDB oracle stay unchanged. These specs pit the
  * two implementations against each other inside Spark on real data,
  * including the multilingual documents (CJK codepoints).
  */
class NativeParitySpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local("graft-parity-test", cores = 4)

  private def docs = Tables.documents(spark, sf)
  private def emb = Tables.embeddings(spark, sf)
  private val d = Dialect.spark
  private def shinglesSql: String = {
    val hash = TextOps.shingleHashFragment("text")
    d.distinct(d.transform(d.range("1", "length(text)-4"), s"i -> $hash"))
  }

  test("ShingleSet == SQL-composed shingle fragment (as sorted sets)") {
    val n = docs
      .withColumn("a", sort_array(shingle_set(col("text"))))
      .withColumn("b", sort_array(expr(shinglesSql)))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("MinHashSig == per-permutation array_min fragments") {
    val checks = (0 until Dedup.NumPerms).map { j =>
      val sql = d.amin(d.transform("hs",
        s"h -> (${Dedup.minhashA(j)} * h + ${Dedup.minhashB(j)}) % ${Dedup.P}"))
      (element_at(col("sig"), j + 1) === expr(sql))
    }.reduce(_ && _)
    val n = docs
      .withColumn("hs", shingle_set(col("text")))
      .withColumn("sig", minhash_sig(col("text"), Dedup.minhashA, Dedup.minhashB))
      .filter(!checks).count()
    assert(n == 0)
  }

  test("WordBigrams == split/element_at/concat fragment (as sorted sets)") {
    val toks = s"split(lower(text), ' ')"
    val sql = d.distinct(d.transform(
      d.range("1", s"size($toks) - 1"),
      s"i -> concat(element_at($toks, i), '_', element_at($toks, i+1))"))
    val n = docs
      .withColumn("a", sort_array(word_bigrams(col("text"))))
      .withColumn("b", sort_array(expr(sql)))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("VecDot == zip_with/aggregate double fold, bit-for-bit") {
    val sql = "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val n = emb
      .withColumn("a", vec_dot(col("embedding"), col("embedding")))
      .withColumn("b", expr(sql))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("ArrJaccard == array_intersect/array_union on distinct arrays") {
    val pairs = docs.limit(40).select(col("doc_id").as("ida"), shingle_set(col("text")).as("sa"))
      .crossJoin(docs.limit(40).select(col("doc_id").as("idb"), shingle_set(col("text")).as("sb")))
      .filter(col("ida") < col("idb"))
    val n = pairs
      .withColumn("a", arr_jaccard(col("sa"), col("sb")))
      .withColumn("b", expr("CAST(size(array_intersect(sa, sb)) AS DOUBLE) / size(array_union(sa, sb))"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("SimHash64 == Dialect-composed mix + 62-bit vote fragment") {
    val n = docs
      .withColumn("hs", shingle_set(col("text")))
      .withColumn("m", expr(Dedup.simhashMixExpr(d)))
      .withColumn("a", simhash64(col("text")))
      .withColumn("b", expr(Dedup.simhashVoteExpr(d)))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("ArrJaccard on unsorted / duplicate-bearing input falls back to true set-Jaccard") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("sa", ArrayType(LongType, false)),
      StructField("sb", ArrayType(LongType, false))))
    val rows = java.util.Arrays.asList(
      Row(Seq(3L, 1L, 2L), Seq(2L, 3L, 4L)),             // unsorted left
      Row(Seq(1L, 1L, 2L, 3L), Seq(3L, 4L, 4L)),         // dups both sides
      Row(Seq(5L, 5L, 5L), Seq(5L)),                     // dup-only overlap
      Row(Seq.empty[Long], Seq(9L, 9L)))                 // empty vs dup
    val got = spark.createDataFrame(rows, schema)
      .select(arr_jaccard(col("sa"), col("sb")).as("j")).collect().map(_.getDouble(0))
    // set-Jaccard ground truth: {1,2,3}v{2,3,4}=2/4, {1,2,3}v{3,4}=1/4,
    // {5}v{5}=1, {}v{9}=0
    assert(got.toSeq == Seq(0.5, 0.25, 1.0, 0.0))
  }

  test("rewriteOracle skips string literals and rejects non-integer scales") {
    import graft.operators.Rounding.rewriteOracle
    // 'round(' inside a literal is untouched; the real call is rewritten
    val in = "SELECT 'use round(x, 2) here' AS note, round(v, 2) AS r FROM t"
    val out = rewriteOracle(in)
    assert(out == "SELECT 'use round(x, 2) here' AS note, (round((v) * 1e2) / 1e2) AS r FROM t")
    // no-op inputs come back byte-identical
    assert(rewriteOracle("SELECT a, b FROM t ORDER BY 1, 2") == "SELECT a, b FROM t ORDER BY 1, 2")
    // unparseable scale fails fast instead of silently mangling
    intercept[IllegalArgumentException] { rewriteOracle("SELECT round(x, 1+1) FROM t") }
  }

  test("WordBigramHashes == nested-lambda SQL fold (as sorted sets)") {
    val toks = "split(lower(text), ' ')"
    val raw = s"transform(sequence(1, greatest(size($toks) - 1, 1)), i -> concat(element_at($toks, i), '_', element_at($toks, i+1)))"
    val hash = s"aggregate(transform(sequence(2, length(s)), k -> CAST(ascii(substring(s, k, 1)) AS BIGINT)), CAST(ascii(substring(s, 1, 1)) AS BIGINT), (acc, c) -> (acc * 31 + c) % ${Dedup.P})"
    val sql = s"array_sort(array_distinct(transform($raw, s -> $hash)))"
    val n = docs
      .withColumn("a", sort_array(word_bigram_hashes(col("text"))))
      .withColumn("b", expr(sql))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("WordGramHashes == token-hash Rabin-Karp SQL fold (as sorted sets)") {
    val n = 10
    val toks = "split(lower(text), ' ')"
    // per-token char hash; single-char guard (sequence(2,1) would DESCEND)
    val charHash = "(CASE WHEN length(s) < 2 THEN CAST(ascii(s) AS BIGINT) " +
      s"ELSE aggregate(transform(sequence(2, length(s)), k -> CAST(ascii(substring(s, k, 1)) AS BIGINT)), " +
      s"CAST(ascii(substring(s, 1, 1)) AS BIGINT), (acc, c) -> (acc * 31 + c) % ${Dedup.P}) END)"
    val th = s"transform($toks, s -> $charHash)"
    val grams = s"CASE WHEN size($toks) < $n THEN CAST(array() AS ARRAY<BIGINT>) " +
      s"ELSE array_sort(array_distinct(transform(sequence(1, size($toks) - ${n - 1}), " +
      s"i -> aggregate(slice($th, i + 1, ${n - 1}), element_at($th, i), " +
      s"(a, b) -> (a * 131 + b) % ${Dedup.P})))) END"
    val cnt = docs
      .withColumn("a", sort_array(word_gram_hashes(col("text"), n)))
      .withColumn("b", expr(grams))
      .filter(col("a") =!= col("b")).count()
    assert(cnt == 0)
  }

  test("PlaneBucket == arithmetic hyperplane-sign SQL fragment") {
    val planes = graft.operators.Similarity.NumPlanes
    val dims = graft.operators.Similarity.Dims
    val bucketSql = (0 until planes).map { j =>
      val dot = s"aggregate(transform(sequence(1, $dims), i -> CAST(element_at(embedding, i) AS DOUBLE) * (2 * (shiftright((CAST(1103515245 AS BIGINT) * ($j * $dims + i) + 12345), 16) & 1) - 1)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
      s"(CASE WHEN $dot > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    val n = emb
      .withColumn("a", plane_bucket(col("embedding"), planes))
      .withColumn("b", expr(s"CAST($bucketSql AS BIGINT)"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("PlaneBucket offset slices the shared plane stream (table t == global planes [t*p, t*p+p))") {
    val p = graft.operators.Similarity.PlanesPerTable
    val dims = graft.operators.Similarity.Dims
    // table t's bucket recomputed from GLOBAL plane indices via the
    // SQL fragment, bit positions local to the table — the contract
    // the s19 oracle SQL is built on
    for (t <- 0 until graft.operators.Similarity.NumTables) {
      val bucketSql = (0 until p).map { j =>
        val g = t * p + j
        val dot = s"aggregate(transform(sequence(1, $dims), i -> CAST(element_at(embedding, i) AS DOUBLE) * (2 * (shiftright((CAST(1103515245 AS BIGINT) * ($g * $dims + i) + 12345), 16) & 1) - 1)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        s"(CASE WHEN $dot > 0 THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
      val n = emb
        .withColumn("a", plane_bucket(col("embedding"), p, t * p))
        .withColumn("b", expr(s"CAST($bucketSql AS BIGINT)"))
        .filter(col("a") =!= col("b")).count()
      assert(n == 0, s"table $t bucket mismatch")
    }
    // offset 0 is bit-identical to the un-offset kernel (s02 unchanged)
    val z = emb
      .withColumn("a", plane_bucket(col("embedding"), p, 0))
      .withColumn("b", plane_bucket(col("embedding"), p))
      .filter(col("a") =!= col("b")).count()
    assert(z == 0)
  }

  test("ShingleSet tiny-string edge matches the guarded SQL window (ascii('')=0)") {
    import org.apache.spark.sql.Row
    // 'ab' -> one guarded window: (97*31^4 + 98*31^3) % p — DuckDB's
    // ascii('') is 0 for the out-of-range positions, as is the kernel's
    val expected = (97L * 923521L + 98L * 29791L) % 2147483647L
    val got = spark.range(1).selectExpr("'ab' AS text")
      .select(shingle_set(org.apache.spark.sql.functions.col("text")))
      .head.getSeq[Long](0)
    assert(got == Seq(expected))
  }

  test("native functions register for SQL use (registerAll + extensions)") {
    // runtime registration on the live session
    graft.functions.GraftFunctions.registerAll(spark, Dedup.minhashA, Dedup.minhashB)
    val r = spark.sql("SELECT graft_simhash32('hello world graft') AS h").head.getLong(0)
    val r2 = spark.sql("SELECT graft_arr_jaccard(array(1L,2L,3L), array(2L,3L,4L)) AS j").head.getDouble(0)
    assert(r != 0L)
    assert(math.abs(r2 - 0.5) < 1e-12)
    // config-based path: the extensions object must inject without error
    // (a fresh session with withExtensions can't be built here because
    // the suite session is already running in this JVM)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
