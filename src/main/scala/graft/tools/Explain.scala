package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-review tool: prints the formatted physical plan for selected
  * queries so pushdown/broadcast/partial-agg can be audited.
  * Usage: runMain graft.tools.Explain [sfDir] [queryKey ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local("graft-explain", 8)
    keys.foreach { k =>
      println(s"\n========== $k ==========")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
