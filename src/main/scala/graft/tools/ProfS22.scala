package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
object ProfS22 {
  def t[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[s22prof] $l%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-prof-s22", 32)
    import graft.operators.Similarity
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val emb = Tables.embeddings(spark, sf)
    t("warm knnPagerank full")(Similarity.knnPagerank(emb).count())
    t("knnJoin (edges proxy)")(Similarity.knnJoin(emb).count())
    t("knnJoin again")(Similarity.knnJoin(emb).count())
    val edges = t("edges ckpt")(Similarity.knnJoin(emb)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .withColumn("odeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint())
    t("knnPagerank full")(Similarity.knnPagerank(emb).count())
    t("knnPagerank full again")(Similarity.knnPagerank(emb).count())
    spark.stop()
  }
}
