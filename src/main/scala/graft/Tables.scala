package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the test corpus (TPC-H-ish star schema + events stream
  * table + LLM-pipeline documents/embeddings). One parquet per table
  * under the scale-factor directory.
  *
  * All loads are plain `spark.read.parquet` so Catalyst sees the scan
  * and can push filters / prune columns into it — never pre-collect or
  * cache here.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw long ns and convert with integer
    * division (floor) to micros — the same truncation DuckDB applies,
    * so oracle timestamps agree. Division must be integral (`div`):
    * a double roundtrip would lose precision at 1.7e18 ns.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the
    * session — GraftSession/Bench/Verify all set it at construction
    * (deliberately NOT mutated here: a table loader silently flipping
    * session config would change unrelated parquet reads).
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
