package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc steady-state timing for individual query keys.
  * Usage: runMain graft.tools.ProfileSpans [sfDir] [key ...]
  * (defaults to the d14 span operator). */
object ProfileSpans {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = if (args.length > 1) args.drop(1).toSeq else Seq("d14_dup_spans")
    val spark = GraftSession.local("graft-profile-keys", 32)
    spark.range(100000).selectExpr("sum(id)").collect() // warmup
    keys.foreach { k =>
      for (i <- 1 to 3)
        Profile.time(s"$k pass $i")(
          println("rows=" + SparkEntry.queries(k)(spark, sf).count()))
    }
    spark.stop()
  }
}
