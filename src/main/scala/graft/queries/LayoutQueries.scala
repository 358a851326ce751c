package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Layout, Tables}

/** Physical-layout queries: each gate reads data back through a layout
  * transformation ([[Layout]]) and pins the CONTENT against the original
  * parquet truth via the DuckDB oracle — proving the layout machinery
  * (range shuffle, sort, compaction rewrite) moves bytes without
  * changing them. The layout-shape claims themselves (disjoint per-file
  * ranges, file counts, zero-Exchange bucket joins) are LayoutSpec's
  * job — they are filesystem facts DuckDB cannot oracle.
  */
object LayoutQueries {

  /** Fixture-keyed tmp path (same contract as the format-roundtrip
    * dumps: (mtime, length) key, `_SUCCESS` completion gate). */
  private def layoutPath(dir: String, table: String, kind: String): String = {
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp").stripSuffix("/")
    val src = new java.io.File(s"$dir/$table.parquet")
    s"$tmp/graft_layout_$kind/${dir.replaceAll("[^A-Za-z0-9.]+", "_")}" +
      s"_${src.lastModified}_${src.length}"
  }

  /** Range-sorted events layout, built once per fixture: 8 files, each
    * owning a disjoint `ts` range with tight row-group stats. */
  private def rangeSortedEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = layoutPath(dir, "events", "range")
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      Layout.writeRangeSorted(Tables.events(spark, dir), path, "ts", numFiles = 8)
    spark.read.parquet(path)
  }

  /** Time-range probe over the range-sorted layout: the first 10 minutes
    * of the stream, aggregated per type. On this layout the predicate
    * prunes to the first file's leading row groups (stats-tight after
    * the sort); on unsorted parquet the same predicate scans every row
    * group of every file. The window bound is derived from the data
    * (min ts) so the query is deterministic across fixtures; the single
    * `head` is a bounded one-row driver read, same class as the serve
    * endpoints. Content is hash-pinned against the ORIGINAL events
    * table — the layout must not change a single aggregate. */
  def rangeScan(spark: SparkSession, dir: String): DataFrame = {
    val ev = rangeSortedEvents(spark, dir)
    val minTs = ev.agg(min(col("ts"))).head.getTimestamp(0)
    val bound = new java.sql.Timestamp(minTs.getTime + 10 * 60 * 1000L)
    ev.filter(col("ts") < lit(bound))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** Z-ordered lineitem layout, built once per fixture: 8 files, each
    * owning a bounded RECTANGLE in (l_orderkey, l_partkey) space via the
    * Morton curve — the layout for workloads that filter on either or
    * both keys, where a single-column range sort leaves the second
    * column unprunable. */
  private def zorderedLineitem(spark: SparkSession, dir: String): DataFrame = {
    val path = layoutPath(dir, "lineitem", "zorder")
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      Layout.writeZOrdered(Tables.lineitem(spark, dir), path,
        "l_orderkey", "l_partkey", numFiles = 8)
    spark.read.parquet(path)
  }

  /** Two-dimensional box probe over the Z-ordered layout: the lowest
    * eighth of the orderkey range × lowest quarter of the partkey range,
    * aggregated per returnflag. On this layout both predicates prune —
    * per-file stats are tight rectangles, so the box touches ~a couple of
    * files' row groups; on a single-column sort the partkey bound prunes
    * nothing. Bounds are derived from the data (one 4-cell aggregate —
    * bounded driver read, same class as [[rangeScan]]'s min-ts probe) so
    * the query is deterministic across fixtures, and the content is
    * hash-pinned against the ORIGINAL lineitem table — the curve must
    * not change a single aggregate. */
  def zorderScan(spark: SparkSession, dir: String): DataFrame = {
    val li = zorderedLineitem(spark, dir)
    val r = li.agg(
      min(col("l_orderkey")), max(col("l_orderkey")),
      min(col("l_partkey")), max(col("l_partkey"))).head
    val boundA = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 8
    val boundB = r.getLong(2) + (r.getLong(3) - r.getLong(2)) / 4
    li.filter(col("l_orderkey") <= boundA && col("l_partkey") <= boundB)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Over-sharded documents dump (64 shards of a table that needs ~1):
    * the small-files input [[Layout.compactFiles]] exists to fix. */
  private def shardedDocs(spark: SparkSession, dir: String): String = {
    val path = layoutPath(dir, "documents", "sharded")
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      Tables.documents(spark, dir).repartition(64)
        .write.mode("overwrite").parquet(path)
    path
  }

  /** Compaction gate: 64 shards → ~8 MB target files, then every value
    * is pinned against the original table (per-source counts, exact
    * char/id sums, and an order-independent text fingerprint — the
    * BIT_XOR of a 60-bit slice of each row's md5, the same md5→conv
    * idiom as the portable dedup twins but folded with xor, which is
    * commutative AND overflow-free where a sum of 2^60-scale values is
    * not; a single mangled byte in any document still flips it). */
  def compactRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val in = shardedDocs(spark, dir)
    val out = layoutPath(dir, "documents", "compacted")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      Layout.compactFiles(spark, in, out, targetFileBytes = 8L * 1024 * 1024)
      ()
    }
    spark.read.parquet(out)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("doc_id")).as("sum_ids"),
        bit_xor(conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long"))
          .as("text_fp"))
      .orderBy("source")
  }

  val queries: Seq[GQuery] = Seq(
    GQuery("layout_range_scan", rangeScan, Some("""
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events
      WHERE ts < (SELECT min(ts) + INTERVAL 10 MINUTE FROM events)
      GROUP BY event_type ORDER BY event_type""")),
    GQuery("layout_zorder_scan", zorderScan, Some("""
      WITH b AS (SELECT min(l_orderkey) + (max(l_orderkey) - min(l_orderkey)) // 8 AS ba,
                        min(l_partkey) + (max(l_partkey) - min(l_partkey)) // 4 AS bb
                 FROM lineitem)
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem, b
      WHERE l_orderkey <= b.ba AND l_partkey <= b.bb
      GROUP BY l_returnflag ORDER BY l_returnflag""")),
    GQuery("corpus_compact_files", compactRoundtrip, Some("""
      SELECT source,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(sum(doc_id) AS BIGINT) AS sum_ids,
             CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT) AS text_fp
      FROM documents GROUP BY source ORDER BY source"""))
  )
}
