package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
object ProfLex {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-prof-lex", 32)
    import graft.operators.LexIndex
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val fix = java.nio.file.Files.createTempDirectory("prof-lex").toString
    LexIndex.build(spark, s"$fix/ix", docs.filter(pmod(col("doc_id"), lit(3)) === 0))
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 1).localCheckpoint()
    val b2 = docs.filter(pmod(col("doc_id"), lit(3)) === 2).localCheckpoint()
    val t0 = System.nanoTime()
    LexIndex.ingest(spark, s"$fix/ix", b1, txn = Some(("prof", 0L)))
    System.err.println(f"[lexprof] TOTAL b1: ${(System.nanoTime()-t0)/1e9}%.2fs")
    val t1 = System.nanoTime()
    LexIndex.ingest(spark, s"$fix/ix", b2, txn = Some(("prof", 1L)))
    System.err.println(f"[lexprof] TOTAL b2: ${(System.nanoTime()-t1)/1e9}%.2fs")
    spark.stop()
  }
}
