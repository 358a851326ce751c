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

  /** Write `df` RANGE-SORTED on `sortCol`: `repartitionByRange` gives
    * each output file a disjoint key range, and the within-partition sort
    * makes every parquet row group's min/max stats tight. A selective
    * range predicate then touches one file's worth of row groups and the
    * parquet reader (predicate pushdown) skips the rest — the
    * sort-based complement of [[writePartitioned]]'s directory pruning,
    * and the right layout for time-range scans where hive-partitioning
    * by a high-cardinality timestamp would explode the directory count.
    *
    * At 100 TB this is the difference between "a 10-minute window scans
    * ~1/Nth of the corpus" and "every query scans everything": unsorted
    * parquet has every file's min/max spanning the full key range, so
    * stats prune nothing. Cost: one range shuffle (with a sampling pass
    * to pick balanced bounds) paid once at write time. LayoutSpec proves
    * the per-file ranges are disjoint. */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String,
                       numFiles: Int): Unit =
    df.repartitionByRange(numFiles, df.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet directory's small files to ~`targetFileBytes`
    * each, returning (filesBefore, filesAfter, bytes). The small-files
    * problem is the classic 100 TB operational hazard: a pipeline that
    * writes one file per task per micro-batch ends up with millions of
    * KB-sized files whose open/footer overhead dominates every later
    * scan (and whose listing alone stalls planning).
    *
    * `shuffle=false` (default) compacts with `coalesce` — no shuffle,
    * the common case where the data is small relative to the cluster and
    * the read parallelism collapse is irrelevant. `shuffle=true` uses
    * `repartition` — pays a full shuffle of every byte but keeps the
    * rewrite parallel, the right mode when compacting terabytes. Output
    * file count = ceil(inputBytes / targetFileBytes), computed from the
    * actual listing, never a guess. */
  def compactFiles(spark: SparkSession, inPath: String, outPath: String,
                   targetFileBytes: Long, shuffle: Boolean = false): (Int, Int, Long) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    val bytes = dataFiles.map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val sized = if (shuffle) df.repartition(n) else df.coalesce(n)
    sized.write.mode("overwrite").parquet(outPath)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    (dataFiles.length, after, bytes)
  }
}
