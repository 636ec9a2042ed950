package graft.tools

import graft.{GraftSession, Tables}

/** Ad-hoc timing for the d14 duplicated-span operator. */
object ProfileSpans {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile-spans", 32)
    val docs = Tables.documents(spark, sf)
    spark.range(100000).selectExpr("sum(id)").collect() // warmup
    for (i <- 1 to 3)
      Profile.time(s"d14 pass $i")(
        println("rows=" + graft.operators.Dedup.dupSpans(docs).count()))
    spark.stop()
  }
}
