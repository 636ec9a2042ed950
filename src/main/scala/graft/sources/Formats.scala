package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format adapters — the reference lands raw JSON blobs in
  * object storage and serves processed columnar data
  * (services/workers/tasks/queue_for_delta.py:200-230); this is the
  * Spark-native equivalent surface: schema-on-read JSON/CSV for
  * landing zones, parquet/ORC for the serving layer.
  *
  * Always pass an explicit schema on read at scale — schema inference
  * is a full extra pass over the data and can silently widen types
  * between batches.
  */
object Formats {

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
