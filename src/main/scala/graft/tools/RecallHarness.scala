package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity

/** ANN operating-point report: sampled-query recall@k vs candidate
  * cost for the production-sized LSH and IVF indexes (see
  * [[Similarity.recallSweep]]).
  *
  * Usage: runMain graft.tools.RecallHarness [sfDir] [nQueries] [k]
  */
object RecallHarness {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nq = if (args.length > 1) args(1).toLong else 64L
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("graft-recall", 8)
    val emb = Tables.embeddings(spark, sf)
    println(s"== ANN recall sweep: $sf (n=${emb.count()}), $nq queries, k=$k")
    Similarity.recallSweep(emb, nq, k).collect().foreach { r =>
      println(f"${r.getString(0)}%-22s recall@$k=${r.getDouble(1)}%.4f  " +
        f"corpus scored/query=${r.getDouble(2) * 100}%.2f%%")
    }
    spark.stop()
  }
}
