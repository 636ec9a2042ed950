package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Ad-hoc stage profiler for the dedup hotspots. */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile", 32)
    import graft.functions.GraftFunctions._
    val docs = Tables.documents(spark, sf)
    spark.range(100000).selectExpr("sum(id)").collect() // warmup

    val bg = docs.select(col("doc_id"), col("lang"), col("source"),
      word_bigrams(col("text")).as("bg"))
    time("d04 bigrams only")(bg.select(sum(size(col("bg")))).collect())
    val pairs = bg.as("x").join(bg.as("y"),
      col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
      col("x.doc_id") < col("y.doc_id"))
    time("d04 join count")(println("pairs=" + pairs.count()))
    time("d04 join+jaccard")(pairs
      .select(arr_jaccard(col("x.bg"), col("y.bg")).as("jac"))
      .filter(col("jac") >= 0.05).count())
    time("d04 full op")(graft.operators.Dedup.ngramJaccard(docs).count())

    val sh = docs.select(col("doc_id"), shingle_set(col("text")).as("hs"))
    time("d02 shingles only")(sh.select(sum(size(col("hs")))).collect())
    time("d02 full op")(graft.operators.Dedup.minhashLsh(docs).count())
    time("d03 full op")(graft.operators.Dedup.simhash(docs).count())
    spark.stop()
  }
}
