package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Phase profiler for the streaming-ingest rows (st15/st16): isolates
  * fixture build, index copy, per-batch ingest, stream machinery, and
  * probe so optimization lands where the time actually goes. */
object ProfileStreams {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile-streams", 32)
    import graft.operators.{GraphIndex, LexIndex, Similarity}
    import graft.sources.VersionedTable
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // ---- st15 phases ----------------------------------------------------
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val fix = java.nio.file.Files.createTempDirectory("prof-st15").toString
    time("st15 fixture: lex build 1/3")(
      LexIndex.build(spark, s"$fix/lexindex",
        docs.filter(pmod(col("doc_id"), lit(3)) === 0)))
    val v0 = time("st15 fixture: commit b1")(
      VersionedTable.commit(spark, s"$fix/arrivals",
        docs.filter(pmod(col("doc_id"), lit(3)) === 1), -1L))
    time("st15 fixture: append b2")(
      VersionedTable.append(spark, s"$fix/arrivals",
        docs.filter(pmod(col("doc_id"), lit(3)) === 2), v0))
    val idx = s"$fix/lex2"
    time("st15 copyDirectory")(
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(s"$fix/lexindex"), new java.io.File(idx)))
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 1).localCheckpoint()
    val b2 = docs.filter(pmod(col("doc_id"), lit(3)) === 2).localCheckpoint()
    time("st15 ingest batch1")(
      LexIndex.ingest(spark, idx, b1, txn = Some(("prof", 0L))))
    time("st15 ingest batch2")(
      LexIndex.ingest(spark, idx, b2, txn = Some(("prof", 1L))))
    time("st15 probe")(
      LexIndex.probe(spark, idx, docs.filter(col("doc_id") < 8)).count())
    time("st15 full drain (fixture cached)")(
      graft.streaming.StreamOps.streamLexIngestDrain(
        Tables.documents(spark, sf)).count())
    time("st15 full drain again")(
      graft.streaming.StreamOps.streamLexIngestDrain(
        Tables.documents(spark, sf)).count())

    // ---- st16 phases ----------------------------------------------------
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
    val gfix = java.nio.file.Files.createTempDirectory("prof-st16").toString
    time("st16 fixture: graph build 1/3")(
      GraphIndex.build(spark, s"$gfix/ix",
        emb.filter(pmod(col("vec_id"), lit(3)) === 0),
        centIds = Similarity.streamIngestCentroids))
    val gb1 = emb.filter(pmod(col("vec_id"), lit(3)) === 1)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val gb2 = emb.filter(pmod(col("vec_id"), lit(3)) === 2)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val corpus1 = emb.filter(pmod(col("vec_id"), lit(3)) =!= 2)
    time("st16 ingest batch1")(
      GraphIndex.ingest(spark, s"$gfix/ix", corpus1, gb1,
        centIds = Similarity.streamIngestCentroids, txn = Some(("prof", 0L))))
    time("st16 ingest batch2")(
      GraphIndex.ingest(spark, s"$gfix/ix", emb, gb2,
        centIds = Similarity.streamIngestCentroids, txn = Some(("prof", 1L))))
    time("st16 probe")(
      GraphIndex.probe(spark, s"$gfix/ix", Tables.embeddings(spark, sf)).count())
    time("st16 full drain (fixture cached)")(
      graft.streaming.StreamOps.streamGraphIngestDrain(
        Tables.embeddings(spark, sf)).count())
    time("st16 full drain again")(
      graft.streaming.StreamOps.streamGraphIngestDrain(
        Tables.embeddings(spark, sf)).count())
    spark.stop()
  }
}
