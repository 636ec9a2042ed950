package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._
import graft.operators.Dedup

/** Config-based registration of the native graft functions:
  * `spark.sql.extensions=graft.GraftExtensions` exposes them to pure
  * SQL sessions (spark-sql, Thrift server, notebooks) without any
  * code dependency. Programmatic sessions can equivalently call
  * GraftFunctions.registerAll.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_shingle_set"),
      info("graft_shingle_set", "distinct 5-gram polynomial shingle hashes of a string"),
      (es: Seq[Expression]) => ShingleSet(es.head)))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "16-permutation MinHash signature"),
      (es: Seq[Expression]) => MinHashSig(es.head, Dedup.minhashA, Dedup.minhashB)))
    e.injectFunction((FunctionIdentifier("graft_simhash32"),
      info("graft_simhash32", "32-bit SimHash of a string"),
      (es: Seq[Expression]) => SimHash32(es.head)))
    e.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "64-bit (62 used) SimHash of a string"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("graft_word_bigrams"),
      info("graft_word_bigrams", "distinct word bigrams of lower(text)"),
      (es: Seq[Expression]) => WordBigrams(es.head)))
    e.injectFunction((FunctionIdentifier("graft_vec_dot"),
      info("graft_vec_dot", "double dot product of two float vectors"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("graft_arr_jaccard"),
      info("graft_arr_jaccard",
        "set-Jaccard of two arrays; sorted distinct inputs take a merge fast path, any other input is deduped via a set"),
      (es: Seq[Expression]) => ArrJaccard(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("graft_plane_bucket"),
      info("graft_plane_bucket", "random-hyperplane LSH sign bucket of a float vector"),
      (es: Seq[Expression]) => PlaneBucket(es.head, graft.operators.Similarity.NumPlanes)))
    // SQL time travel over VersionedTable (VERSION AS OF / TIMESTAMP
    // AS OF as TVFs) — the lake's uniform SQL front door
    e.injectTableFunction((FunctionIdentifier("graft_table"),
      info("graft_table", "latest snapshot of a graft VersionedTable at the given path"),
      (es: Seq[Expression]) => graft.sources.VersionedTable.tableFn(es)))
    e.injectTableFunction((FunctionIdentifier("graft_table_at_version"),
      info("graft_table_at_version", "snapshot of a graft VersionedTable at a version (VERSION AS OF)"),
      (es: Seq[Expression]) => graft.sources.VersionedTable.tableAtVersionFn(es)))
    e.injectTableFunction((FunctionIdentifier("graft_table_at_timestamp"),
      info("graft_table_at_timestamp", "snapshot of a graft VersionedTable at a wall-clock time (TIMESTAMP AS OF)"),
      (es: Seq[Expression]) => graft.sources.VersionedTable.tableAtTimestampFn(es)))
    e.injectTableFunction((FunctionIdentifier("graft_table_changes"),
      info("graft_table_changes", "change feed of a graft VersionedTable between two versions (keys = comma-separated merge-key list)"),
      (es: Seq[Expression]) => graft.sources.VersionedTable.tableChangesFn(es)))
  }
}
