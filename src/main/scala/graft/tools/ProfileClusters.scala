package graft.tools

import graft.{GraftSession, Tables}

/** Ad-hoc profiler for the d07/d10 connected-components path:
  * wall time + convergence round count at a given SF. */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile", 32)
    val docs = Tables.documents(spark, sf)
    spark.range(100000).selectExpr("sum(id)").collect() // warmup
    (1 to 2).foreach { i =>
      Profile.time(s"d07 run$i")(graft.operators.Dedup.dedupClusters(docs).count())
      println("[profile] iters=" + graft.operators.Dedup.lastIters)
    }
    (1 to 2).foreach { i =>
      Profile.time(s"d10 run$i")(graft.operators.Dedup.dedupApply(docs).count())
    }
    spark.stop()
  }
}
