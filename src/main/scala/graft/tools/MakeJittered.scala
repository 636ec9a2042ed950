package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Build a MEASUREMENT-ONLY embeddings corpus from a key-shifted
  * replicated one (scripts/make_sf10.py): the replicas are
  * byte-identical clones — perfect for dedup stress and oracle
  * parity, degenerate for ANN recall (every method's recall plateaus
  * at (copies-1)/k clone recovery, and a kNN graph with graphK <
  * copies collapses into disjoint clone cliques no walk can leave —
  * the production reason you dedup BEFORE indexing). This tool adds
  * small DETERMINISTIC per-id jitter so the scaled corpus has n
  * distinct vectors with the original's geometry, making recall
  * sweeps at 10x/30x measure index quality instead of clone count.
  * Never an oracle input — recall harnesses only.
  *
  * Usage: runMain graft.tools.MakeJittered [srcDir] [dstDir] [scale]
  */
object MakeJittered {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/sf10")
    val dst = if (args.length > 1) args(1) else "/tmp/sf10j"
    val scale = if (args.length > 2) args(2).toDouble else 0.05
    val spark = GraftSession.local("graft-jitter", 8)
    val emb = Tables.embeddings(spark, src)
    // deterministic pseudo-noise per (vec_id, dim): hash -> [-.5, .5),
    // scaled; floats stay floats so VecDot's analysis gate holds
    val jittered = emb.withColumn("embedding",
      expr(s"""transform(embedding, (x, i) ->
        CAST(x + $scale * (pmod(hash(vec_id, i), 1000) / 1000.0 - 0.5)
          AS FLOAT))"""))
    jittered.coalesce(4).write.mode("overwrite")
      .parquet(s"$dst/embeddings.parquet")
    println(s"wrote ${spark.read.parquet(s"$dst/embeddings.parquet").count()} " +
      s"jittered vectors to $dst")
    spark.stop()
  }
}
