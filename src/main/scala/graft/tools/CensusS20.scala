package graft.tools

import graft.operators.Similarity

/** s20 evidence harness: cell occupancy + kNN-join candidate-volume
  * census for a given corpus dir, at the production centroid sizing
  * ([[Similarity.centroidIdsFor]]). Prints one line per census plus
  * the per-doc candidate rate — the number PLANS.md tracks across
  * 1×/10×/30× to show the nProbe·N²/K term stays bounded by K ~
  * sqrt(N) resizing (flat-ish per-doc candidates as the corpus
  * grows).
  *
  * Usage: runMain graft.tools.CensusS20 [sfDir] [nProbe]
  */
object CensusS20 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nProbe = if (args.length > 1) args(1).toInt else 2
    val spark = graft.GraftSession.local("census-s20", cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    val embs = graft.Tables.embeddings(spark, dir)
    val n = embs.count()
    // both selectors, side by side: the affine id formula (assumes a
    // dense id domain) vs the rank-based pick (holds on sparse ones)
    for ((label, cents) <- Seq(
           "affine" -> Similarity.centroidIdsFor(n),
           "ranked" -> Similarity.centroidIdsRanked(embs))) {
      println(s"[census] dir=$dir n_vectors=$n sel=$label " +
        s"k_slots=${cents.size} nProbe=$nProbe")
      Similarity.cellCensus(embs, cents).collect()
        .foreach(r => println(s"[census] $label cells $r"))
      Similarity.knnJoinCensus(embs, nProbe, cents).collect().foreach { r =>
        val total = r.getAs[Long]("total_cand")
        println(s"[census] $label s20 $r per_doc_cand=" +
          f"${total.toDouble / n}%.1f")
      }
    }
    spark.stop()
  }
}
