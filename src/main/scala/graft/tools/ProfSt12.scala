package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
object ProfSt12 {
  def t[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[st12prof] $l%-30s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-prof-st12", 32)
    import graft.operators.{Similarity, VecIndex}
    import graft.sources.VersionedTable
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
    val fix = java.nio.file.Files.createTempDirectory("prof-st12").toString
    t("vec build 1/3")(VecIndex.build(spark, s"$fix/ix",
      emb.filter(pmod(col("vec_id"), lit(3)) === 0).select("vec_id", "embedding"),
      centIds = Similarity.streamIngestCentroids))
    val b1 = emb.filter(pmod(col("vec_id"), lit(3)) === 1)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val (a1, _) = t("ingestDedup b1")(VecIndex.ingestDedup(spark, s"$fix/ix", b1,
      maxCos = Similarity.StreamIngestMaxCos, nProbe = 2))
    val b2 = emb.filter(pmod(col("vec_id"), lit(3)) === 2)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val (a2, _) = t("ingestDedup b2")(VecIndex.ingestDedup(spark, s"$fix/ix", b2,
      maxCos = Similarity.StreamIngestMaxCos, nProbe = 2))
    t("probe only")(VecIndex.probe(spark, s"$fix/ix", b1, k = 1, nProbe = 2).count())
    t("st12 full drain")(graft.streaming.StreamOps.streamAnnIngestDrain(
      Tables.embeddings(spark, sf)).count())
    t("st12 full drain again")(graft.streaming.StreamOps.streamAnnIngestDrain(
      Tables.embeddings(spark, sf)).count())
    spark.stop()
  }
}
