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
}
