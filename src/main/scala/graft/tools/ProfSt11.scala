package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
object ProfSt11 {
  def t[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[st11prof] $l%-30s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-prof-st11", 32)
    import graft.operators.{BandIndex, TextOps, VecIndex, Similarity, GraphIndex}
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"),
      col("lang"), col("source"), col("n_chars"))
    val fix = java.nio.file.Files.createTempDirectory("prof-st11").toString
    t("band build 1/3")(BandIndex.build(spark, s"$fix/bi",
      docs.filter(pmod(col("doc_id"), lit(3)) === 0).select("doc_id", "text")))
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 1).localCheckpoint()
    val kept1 = t("batteryKeep b1 ckpt")(
      b1.join(TextOps.batteryKeep(b1), "doc_id").localCheckpoint())
    val (adm, _) = t("band ingest b1 (probe+append)")(
      BandIndex.ingest(spark, s"$fix/bi", kept1.select("doc_id", "text")))
    t("probe only b1 again")(
      BandIndex.probe(spark, s"$fix/bi", kept1.select("doc_id", "text")).count())
    t("landed join + count")(
      kept1.join(adm.select("doc_id"), "doc_id").count())
    t("st11 full drain")(graft.streaming.StreamOps.streamCurationDrain(
      Tables.documents(spark, sf)).count())
    t("st11 full drain again")(graft.streaming.StreamOps.streamCurationDrain(
      Tables.documents(spark, sf)).count())
    // st16 ingest phase split
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
    val gfix = java.nio.file.Files.createTempDirectory("prof-st16b").toString
    GraphIndex.build(spark, s"$gfix/ix",
      emb.filter(pmod(col("vec_id"), lit(3)) === 0),
      centIds = Similarity.streamIngestCentroids)
    val gb1 = emb.filter(pmod(col("vec_id"), lit(3)) === 1)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val corpus1 = emb.filter(pmod(col("vec_id"), lit(3)) =!= 2)
    val fwd = t("st16 knnEdgesFor ckpt")(
      Similarity.knnEdgesFor(corpus1, gb1, 3, 2,
        Similarity.streamIngestCentroids).localCheckpoint())
    t("fwd count")(fwd.count())
    t("st16 ingest b1 (full)")(GraphIndex.ingest(spark, s"$gfix/ix", corpus1, gb1,
      centIds = Similarity.streamIngestCentroids, txn = Some(("prof", 0L))))
    spark.stop()
  }
}
