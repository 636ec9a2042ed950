package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** The PERSISTED positional-gram posting index — d14's substring-span
  * detection in the incremental-ingest shape d12/BandIndex give
  * document-level dedup: the corpus's (gram, doc, pos) postings live
  * as a [[VersionedTable]], a new batch's postings probe them with NO
  * corpus re-tokenization or re-hashing, and admitted docs' postings
  * APPEND as O(batch) add-file commits so the next batch sees them.
  *
  * The hot-gram cap (grams in more than `dfCap` corpus docs are
  * dropped at BUILD time) is the same skew guard as d14's gate — the
  * standard inverted-index discipline: boilerplate grams explode the
  * probe join quadratically and carry no dedup signal. Appends do not
  * re-apply the cap (an appended doc could push a gram past it);
  * periodic [[build]] from the full corpus re-levels it — stated
  * honestly, the same compaction-refresh contract as the band index.
  *
  * At 100 TB the posting table gets bucketed by gram (the BandIndex
  * buildBucketed treatment) so probes never shuffle the index side;
  * the VersionedTable layout here keeps time travel + atomic appends.
  */
object GramIndex {

  /** Times a posting index was BUILT (not probed) — the d12-style
    * evidence that repeated incremental runs are probe-only. */
  @volatile var indexBuilds: Long = 0L

  private def postings(docs: DataFrame, n: Int): DataFrame = {
    import graft.functions.GraftFunctions._
    docs.select(col("doc_id"),
        posexplode(word_gram_pos_hashes(col("text"), n)).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("gram"))
  }

  /** Build (or rebuild) the index: one tokenize+hash pass over the
    * corpus, hot grams dropped, committed as the table's next
    * version. */
  def build(spark: SparkSession, root: String, corpus: DataFrame,
            n: Int = 8, dfCap: Int = 64): Unit = {
    indexBuilds += 1
    // one tokenize+hash pass: the hot-gram aggregate AND the anti-join
    // side both read this frame (without the checkpoint the subtree
    // executes twice per build)
    val g = postings(corpus, n).localCheckpoint(eager = false)
    val hot = g.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > dfCap).select(col("gram"))
    val idx = g.join(hot, Seq("gram"), "left_anti")
    val v = VersionedTable.currentVersion(spark, root).getOrElse(-1L)
    VersionedTable.commit(spark, root, idx, v)
  }

  /** Append a batch's postings (no cap re-check — see class doc):
    * O(batch) add-file commit. */
  def append(spark: SparkSession, root: String, docs: DataFrame, n: Int = 8): Unit = {
    val v = VersionedTable.currentVersion(spark, root).getOrElse(-1L)
    VersionedTable.append(spark, root, postings(docs, n), v)
  }

  /** Duplicated spans of `batch` against the PERSISTED index: batch
    * postings (tokenized fresh — the only text work) equi-join the
    * stored postings on gram, matched coordinates merge into maximal
    * spans by gaps-and-islands per (pair, diagonal) — d14's kernel
    * with the corpus side read, never recomputed. Output:
    * (batch_doc, corpus_doc, b_start, c_start, span_toks).
    */
  def probe(spark: SparkSession, root: String, batch: DataFrame,
            n: Int = 8, minTokens: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bg = postings(batch, n)
      .select(col("doc_id").as("batch_doc"), col("pos").as("pos_b"), col("gram"))
    val idx = VersionedTable.read(spark, root)
      .select(col("doc_id").as("corpus_doc"), col("pos").as("pos_c"), col("gram"))
    val w = Window.partitionBy(col("batch_doc"), col("corpus_doc"), col("diag"))
      .orderBy(col("pos_b"))
    bg.join(idx, Seq("gram"))
      .select(col("batch_doc"), col("corpus_doc"), col("pos_b"), col("pos_c"))
      .withColumn("diag", col("pos_b") - col("pos_c"))
      .withColumn("isl", col("pos_b") - row_number().over(w))
      .groupBy(col("batch_doc"), col("corpus_doc"), col("diag"), col("isl"))
      .agg(min(col("pos_b")).as("b_start"), min(col("pos_c")).as("c_start"),
           (max(col("pos_b")) - min(col("pos_b")) + lit(n.toLong)).as("span_toks"))
      .filter(col("span_toks") >= minTokens)
      .select(col("batch_doc"), col("corpus_doc"), col("b_start"),
              col("c_start"), col("span_toks"))
  }
}
