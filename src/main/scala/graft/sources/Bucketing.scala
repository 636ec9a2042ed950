package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** BUCKETED tables — the co-located-join layout for keys that are
  * joined or aggregated REPEATEDLY (reference: every pipeline stage
  * joins statements/metadata back to the stock dimension on the same
  * key — the task modules under services/workers/tasks): write both
  * sides hash-bucketed
  * by the join key into the same bucket count, and every subsequent
  * equi-join or aggregation on that key runs WITHOUT a shuffle — the
  * scan itself reports hash partitioning, so EnsureRequirements
  * inserts no Exchange (spec-pinned on the plan).
  *
  * This is the third co-location tier alongside what the engine
  * already has, each matched to a lifetime:
  *  - broadcast (AQE, per-query): small side, decided at runtime;
  *  - [[VersionedTable]] partition dirs (per-table, coarse values):
  *    dir-pruned reads, partition-scoped rewrites;
  *  - buckets (per-table, hash of a HIGH-CARDINALITY key): the only
  *    one that co-locates a many-to-many join of two big fact tables.
  *  At 100 TB the shuffle of a fact-fact join is the single biggest
  *  network cost in the pipeline; paying it ONCE at write time and
  *  never again is the entire point (Hive/Spark bucketing, Iceberg
  *  bucket transforms — same trade).
  *
  * Honest constraints: both sides must agree on bucket count and key
  * (Spark does not co-locate mismatched bucket counts — it shuffles
  * the smaller-bucketed side); bucketed tables live in the session
  * catalog (saveAsTable — the path option keeps the DATA external and
  * durable, but the bucket METADATA is catalog state, exactly like
  * production Hive-metastore deployments); bucket pruning applies to
  * equality predicates on the bucket key. Sorted buckets additionally
  * serve merge joins without a per-query sort when each bucket is one
  * file (SortMergeJoin's sort node survives with multi-file buckets —
  * stated because the spec pins only the Exchange count).
  */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) catalog table whose
    * data lives at `path`. Overwrites any previous table of the same
    * name. One shuffle now, none on any later key-join. */
  def writeBucketed(spark: SparkSession, name: String, path: String,
                    df: DataFrame, key: String, nBuckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(nBuckets, key).sortBy(key).saveAsTable(name)
  }

  /** The bucketed table, with its bucket metadata attached (a plain
    * spark.read.parquet of the same path would NOT know the layout —
    * bucket info travels through the catalog, not the files). */
  def read(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Equi-join two same-key, same-bucket-count tables — by
    * construction shuffle-free (the spec asserts zero Exchange in the
    * executed plan). */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    read(spark, left).join(read(spark, right), Seq(key))
}
