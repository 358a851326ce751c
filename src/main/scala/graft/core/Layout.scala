package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical data layout for scale (the brief's "repartition/bucketing for
  * co-located joins" and partition pruning):
  *
  *  - BUCKETING pre-shuffles a fact table by its join key at write time;
  *    two tables bucketed the same way join with NO exchange at read time
  *    — the shuffle is paid once per dataset lifetime instead of per
  *    query. The win at 100 TB: repeated orderkey joins become
  *    scan+sort-merge with zero network.
  *  - PARTITIONED layout turns selective filters on the partition column
  *    into directory pruning — the scan never opens non-matching files.
  */
object Layout {

  /** Write `df` as a bucketed, sorted managed table (parquet, native
    * catalog). `buckets` should match downstream parallelism, and both
    * sides of a co-located join must use the same key and bucket count. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, overwrite: Boolean = true): Unit = {
    val w = df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    (if (overwrite) w.mode("overwrite") else w).saveAsTable(table)
  }

  /** Bucket-aware read: just the catalog table (bucket metadata rides
    * along and the planner drops the exchanges when keys line up). */
  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write `df` hive-partitioned by `partitionCol` for directory pruning. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
