package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-level proof of the physical-layout claims: bucketed joins shuffle
  * nothing, partitioned reads prune directories. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def executedString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize the AQE plan through this handle
    df.queryExecution.executedPlan.toString
  }

  test("co-located bucketed join runs with zero Exchange") {
    val facts = (1L to 500L).map(i => (i % 50, s"f$i")).toDF("k", "payload")
    val other = (1L to 200L).map(i => (i % 50, i * 2)).toDF("k", "w")
    Layout.writeBucketed(facts, "b_facts", "k", buckets = 4)
    Layout.writeBucketed(other, "b_other", "k", buckets = 4)
    try {
      val joined = Layout.readTable(spark, "b_facts")
        .hint("merge") // forbid broadcast so the shuffle question is real
        .join(Layout.readTable(spark, "b_other"), "k")
      val plan = executedString(joined)
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"
      joined.count() shouldBe 500L * 4 // each k has 10 fact × 4 other rows
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_other")
    }
  }

  test("partitioned layout prunes non-matching directories at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = (1 to 300).map(i => (i.toLong, Seq("click", "view", "error")(i % 3)))
      .toDF("id", "event_type")
    Layout.writePartitioned(df, dir, "event_type")
    val read = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = executedString(read)
    plan should include("PartitionFilters: [isnotnull(event_type")
    read.count() shouldBe 100L
  }

  test("range-sorted layout gives every file a disjoint key range") {
    val dir = java.nio.file.Files.createTempDirectory("graft-range").toString
    // write shuffled so disjointness can only come from the range shuffle
    val df = scala.util.Random.shuffle((1 to 10000).toList)
      .map(i => (i.toLong, s"v$i")).toDF("k", "payload")
    Layout.writeRangeSorted(df, dir, "k", numFiles = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    files.length shouldBe 4
    // per-FILE min/max: this is exactly the stats a reader prunes on
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("k")), max(col("k"))).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.map(r => r._2 - r._1 + 1).sum shouldBe 10000L // covers all, no overlap
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      hi should be < lo // strictly disjoint, in key order
    }
  }

  test("compactFiles collapses a small-files directory without changing content") {
    val in = java.nio.file.Files.createTempDirectory("graft-compact-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    val df = (1 to 5000).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
    df.repartition(32).write.mode("overwrite").parquet(in)
    val (before, after, bytes) =
      Layout.compactFiles(spark, in, out, targetFileBytes = 64L * 1024 * 1024)
    before shouldBe 32
    after shouldBe 1 // 32 tiny files fit one 64 MB target
    bytes should be > 0L
    val back = spark.read.parquet(out)
    back.count() shouldBe 5000L
    back.agg(sum(col("id"))).head.getLong(0) shouldBe 5000L * 5001 / 2
  }
}
