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

  test("mortonKey is a bijection on the full 2-D grid") {
    // 2^6 × 2^6 grid → 4096 DISTINCT interleaved keys covering exactly
    // [0, 4096): a dropped or misplaced bit would collide somewhere
    val df = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
      .select(Layout.mortonKey(col("a"), col("b"), bits = 6).as("z"))
    val r = df.agg(
      countDistinct(col("z")), min(col("z")), max(col("z"))).head
    r.getLong(0) shouldBe 4096L
    r.getLong(1) shouldBe 0L
    r.getLong(2) shouldBe 4095L
  }

  test("z-ordered layout keeps per-file stats tight on BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // full 64×64 grid, written shuffled (seeded — the range partitioner
    // samples its split points, so a deterministic input keeps the file
    // boxes reproducible): any per-file locality can only come from the
    // Morton curve, not input order
    val df = new scala.util.Random(42).shuffle(
        (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong)).toList)
      .toDF("a", "b")
    Layout.writeZOrdered(df, dir, "a", "b", numFiles = 4, bits = 6)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    files.length shouldBe 4
    // per-file (min,max) box on both dims — exactly the footer stats a
    // reader prunes on. A file whose Morton interval straddles a
    // quadrant boundary can cover up to two quadrants' bounding box, so
    // the per-file bound is 3/4 of the domain, not one quadrant — still
    // far from the full-span second dimension a single-column sort gives
    val boxes = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("a")), max(col("a")), min(col("b")), max(col("b"))).head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    boxes.foreach { case (loA, hiA, loB, hiB) =>
      (hiA - loA + 1) * (hiB - loB + 1) should be <= 3L * 64 * 64 / 4
    }
    // the discriminating claims: EACH dimension alone prunes at least
    // one file on stats (a range sort on `a` leaves every file spanning
    // the full b range — its b-probe prunes nothing), and a two-sided
    // corner probe prunes at least half the files
    boxes.count { case (loA, _, _, _) => loA < 16 } should be <= 3
    boxes.count { case (_, _, loB, _) => loB < 16 } should be <= 3
    boxes.count { case (loA, _, loB, _) => loA < 16 && loB < 16 } should be <= 2
  }

  test("z-order rank scaling survives epoch-micros-wide key ranges (no i64 overflow)") {
    // round-9 advice: the old integer form (col - lo) * 65535 overflowed
    // for ranges wider than Long.MaxValue/65535 (~1.4e14), silently
    // garbling the Morton clustering. Keys here span ~4.6e18 — any
    // integer scaling would wrap; the double path must keep ranks
    // monotone so the curve (and its pruning) survives.
    val dir = java.nio.file.Files.createTempDirectory("graft-zwide").toString
    val step = Long.MaxValue / 1000 * 500 / 16 // ~2.9e17 per cell, range ~4.6e18
    val df = new scala.util.Random(7).shuffle(
        (for (a <- 0 until 16; b <- 0 until 16)
          yield (a.toLong * step, b.toLong * step)).toList)
      .toDF("a", "b")
    Layout.writeZOrdered(df, dir, "a", "b", numFiles = 4, bits = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    val boxes = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("a")), max(col("a")), min(col("b")), max(col("b"))).head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // same clustering contract as the narrow-range test, scaled: each
    // file's box covers at most 3/4 of the 16×16 cell grid (an
    // overflow-garbled curve degenerates to near-random file boxes that
    // each span the whole domain)
    val cell = step
    boxes.foreach { case (loA, hiA, loB, hiB) =>
      ((hiA - loA) / cell + 1) * ((hiB - loB) / cell + 1) should be <= 3L * 16 * 16 / 4
    }
  }
}
