package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.Similarity

/** Graph-ANN operating-point grid: recall@k vs exact-scored fraction
  * for the beam walk across (graphK, beam, hops) — the knob study
  * behind the `graph[...]` row in [[Similarity.recallSweep]], so the
  * advertised default is the KNEE of the curve, not the smallest
  * point that passes. One kNN graph per graphK (the expensive build)
  * is reused across every (beam, hops) cell; ground truth
  * brute-forces the bounded query sample once.
  *
  * Usage: runMain graft.tools.GraphGrid [sfDir] [nQueries] [k]
  */
object GraphGrid {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.expressions.Window
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nq = if (args.length > 1) args(1).toLong else 64L
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("graft-graphgrid", 8)
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val cents = Similarity.centroidIdsFor(n)
    println(s"== graph-ANN grid: $sf (n=$n), $nq queries, k=$k")
    val exact = Similarity.bruteForceTopK(emb, nq, k)
      .select(col("q_id"), col("neighbor_id")).localCheckpoint()
    val seeds = Similarity.kcenterSeed(emb, 8)
      .select(col("vec_id").as("c_id")).localCheckpoint()
    for (gk <- Seq(3, 6, 12)) {
      val edges = Similarity.knnJoin(emb, gk, 2, cents)
        .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
        .localCheckpoint()
      for (beam <- Seq(4, 8, 16); hops <- Seq(2, 3, 4)) {
        val visited = Similarity.beamWalk(emb, nq, seeds,
          fr => fr.join(edges, fr("c_id") === edges("src"))
            .select(fr("q_id"), edges("dst").as("c_id")),
          beam, hops).localCheckpoint()
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("c_id"))
        val approx = visited.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .select(col("q_id"), col("c_id").as("neighbor_id"))
        val recall = exact.join(approx.withColumn("hit", lit(1L)),
            Seq("q_id", "neighbor_id"), "left")
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") /
            count(lit(1))).as("r")).head.getDouble(0)
        val frac = visited.groupBy(col("q_id")).agg(count(lit(1)).as("vis"))
          .agg((avg(col("vis")) / n).as("f")).head.getDouble(0)
        println(f"graph[gk=$gk%2d,B=$beam%2d,H=$hops] recall@$k=$recall%.4f  scored/query=${frac * 100}%.2f%%")
      }
    }
    spark.stop()
  }
}
