package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Finer-grained stage profiler for the round-2 hotspots
  * (d01/d02/d03/q08/q20): isolates scan cost, kernel cost, candidate
  * join cost, and verification cost so optimization lands where the
  * time actually goes.
  */
object Profile2 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile2", 32)
    import graft.functions.GraftFunctions._
    val docs = Tables.documents(spark, sf)
    spark.range(100000).selectExpr("sum(id)").collect() // JIT warmup

    time("docs text scan (cold)")(docs.select(sum(length(col("text")))).collect())
    time("docs text scan (warm)")(docs.select(sum(length(col("text")))).collect())
    time("d01 sha2 groupBy")(graft.operators.Dedup.exact(docs).count())
    time("d01 again")(graft.operators.Dedup.exact(docs).count())

    val sh = docs.select(col("doc_id"), shingle_set(col("text")).as("hs"))
    time("d02 shingle kernel")(sh.select(sum(size(col("hs")))).collect())
    val sig = docs.select(col("doc_id"),
      minhash_sig(col("text"), graft.operators.Dedup.minhashA,
        graft.operators.Dedup.minhashB).as("sig"))
    time("d02 minhash kernel")(sig.select(sum(size(col("sig")))).collect())
    time("d02 full op")(graft.operators.Dedup.minhashLsh(docs).count())

    val sim = docs.select(col("doc_id"), simhash32(col("text")).as("sim32"))
    time("d03 simhash kernel")(sim.select(sum(col("sim32"))).collect())
    time("d03 full op")(graft.operators.Dedup.simhash(docs).count())

    val li = Tables.lineitem(spark, sf)
    time("q08 full op")(graft.SparkEntry.queries("q08_merge_upsert")(spark, sf).count())
    time("q20 full op")(graft.SparkEntry.queries("q20_unified_records")(spark, sf).count())
    li.count()
    spark.stop()
  }
}
