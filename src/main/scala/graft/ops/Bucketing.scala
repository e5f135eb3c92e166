package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-partition a table by its join/agg key at
  * WRITE time so every later equi-join or aggregation on that key skips
  * the exchange entirely — both sides scan co-located buckets and join
  * map-side. At 100 TB this converts the dominant per-query shuffle of a
  * fact table into a one-time layout cost amortized over every query
  * that touches the key (the classic warehouse trick Spark's
  * `bucketBy` + `spark.sql.sources.bucketing.enabled` implements).
  *
  * Bucket count guidance: target bucket files of 100-500 MB after
  * compression; too few buckets caps join parallelism, too many makes
  * small files. Both join sides must share the bucket count (or be
  * integer multiples with `bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Writes `df` as a managed bucketed table (overwriting), bucketed and
    * sorted by `keys` into `buckets` buckets. Sorting within buckets
    * additionally removes the sort from later sort-merge joins. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Reads a bucketed table back (bucket metadata comes from the
    * catalog, which is why plain `spark.read.parquet` on the files would
    * NOT get the exchange-free plan). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
