package graft.tools

import graft.{GraftSession, SparkEntry}

/** Prints the POST-execution adaptive plan for a query so runtime-only
  * features (ReusedExchange, AQE coalescing) are visible — the static
  * explain shows the pre-adaptive plan and misses them. */
object CheckReuse {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val key = if (args.length > 1) args(1) else "t10_tfidf_topk"
    val spark = GraftSession.local("graft-reuse", 8)
    val df = SparkEntry.queries(key)(spark, sfDir)
    // execute THIS Dataset's own plan (df.count() would build a separate
    // QueryExecution and leave df's AdaptiveSparkPlan un-finalized)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    println(s"[reuse] $key ReusedExchange=" + "ReusedExchange".r.findAllIn(p).size +
      " Generate=" + "Generate".r.findAllIn(p).size)
    spark.stop()
  }
}
