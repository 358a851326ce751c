package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The fused cosine expression must be BIT-EQUAL to the dot/norm/CASE
  * composition it replaced (every similarity hash in the registry
  * rides on this), across element types, codegen and interpreted
  * paths, and every edge case the composition's NULL/zero semantics
  * define. */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  private def bitsEqual(a: java.lang.Double, b: java.lang.Double): Boolean =
    (a == null && b == null) ||
      (a != null && b != null &&
        java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b))

  test("fused == composed, bit-for-bit, on a randomized float grid (both eval paths)") {
    val rnd = new scala.util.Random(0xC05153)
    val rows = (0 until 2000).map { i =>
      val d = 1 + rnd.nextInt(96)
      (i.toLong,
        Array.fill(d)(rnd.nextFloat() * 2f - 1f),
        Array.fill(d)(rnd.nextFloat() * 2f - 1f))
    }
    val df = rows.toDF("id", "a", "b")
    val key = "spark.sql.codegen.factoryMode"
    val saved = spark.conf.getOption(key)
    try {
      for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
        spark.conf.set(key, codegen)
        val got = df.select(col("id"),
            graft.ext.Similarity.cosine(col("a"), col("b")).as("f"),
            graft.ext.Similarity.cosineComposed(col("a"), col("b")).as("c"))
          .collect()
        got.foreach { r =>
          val f = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
          val c = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
          withClue(s"id=${r.getLong(0)} codegen=$codegen fused=$f composed=$c: ") {
            bitsEqual(f, c) shouldBe true
          }
        }
      }
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("edge cases mirror the composition: zero vectors, mismatch, null element, NaN, double arrays") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", ArrayType(DoubleType, containsNull = true), nullable = true),
      StructField("b", ArrayType(DoubleType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(0L, Seq(0.0, 0.0), Seq(1.0, 2.0)),                 // zero norm -> 0.0
      Row(1L, Seq(0.0, 0.0), Seq(0.0, 0.0)),                 // both zero -> 0.0
      Row(2L, Seq(1.0, 2.0), Seq(1.0)),                      // mismatch -> null
      Row(3L, Seq(1.0, null), Seq(1.0, 2.0)),                // null elem -> null
      Row(4L, Seq(Double.NaN, 1.0), Seq(1.0, 1.0)),          // NaN propagates
      Row(5L, null, Seq(1.0, 2.0)),                          // null array -> null
      Row(6L, Seq(3.0, -4.0), Seq(-3.0, 4.0)),               // antiparallel -> -1
      Row(7L, Seq(1e200, 1e200), Seq(1e200, 1e200)),         // inf norms, same both forms
      // mismatch + zero-norm side: the composition's WHEN tests the
      // product of SELF-dots first (they never see the other array), so
      // 0.0 wins over the mismatch — the review-found divergence window
      Row(8L, Seq(0.0, 0.0), Seq(1.0)),                      // -> 0.0, not null
      Row(9L, Seq(1.0), Seq(0.0, 0.0)),                      // -> 0.0, not null
      Row(10L, Seq(0.0, null), Seq(1.0)))                    // mismatch + null elem -> null
      .map(r => Row(r.get(0),
        Option(r.get(1)).map(_.asInstanceOf[Seq[Any]]).orNull,
        Option(r.get(2)).map(_.asInstanceOf[Seq[Any]]).orNull))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = df.select(col("id"),
        graft.ext.Similarity.cosine(col("a"), col("b")).as("f"),
        graft.ext.Similarity.cosineComposed(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    got.foreach { r =>
      val f = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      val c = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
      withClue(s"id=${r.getLong(0)} fused=$f composed=$c: ") {
        // NaN: both must be NaN (raw-bit compare would demand one NaN
        // payload; the contract is value-level here)
        if (c != null && c.isNaN) (f != null && f.isNaN) shouldBe true
        else bitsEqual(f, c) shouldBe true
      }
    }
    // pin the contract values, not just agreement
    got(0).getDouble(1) shouldBe 0.0
    got(2).isNullAt(1) shouldBe true
    got(3).isNullAt(1) shouldBe true
    got(6).getDouble(1) shouldBe -1.0 +- 1e-15
    got(8).getDouble(1) shouldBe 0.0
    got(9).getDouble(1) shouldBe 0.0
    got(10).isNullAt(1) shouldBe true
  }

  test("whole-stage codegen: the fused expression runs inside one codegen region") {
    // spark.range is a codegen'd source that cannot constant-fold to a
    // LocalTableScan (a local Seq does, and then no codegen region
    // exists to assert on); arrays built with array(), NOT transform()
    // — a HOF lambda is itself non-codegen and would eject the whole
    // Project from the region regardless of the cosine expression
    def arr(base: org.apache.spark.sql.Column) =
      array((0 to 15).map(i => (base + lit(i)).cast("double")): _*)
    val df = spark.range(100).select(col("id"),
      arr(col("id")).as("a"), arr(col("id") * 2).as("b"))
    val scored = df.select(
      graft.ext.Similarity.cosine(col("a"), col("b")).as("cs"))
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    // executedPlan renders codegen spans as "*(n) " node prefixes: the
    // projection evaluating graft_cosine must carry one
    val cosLine = plan.linesIterator.find(_.contains("graft_cosine"))
    cosLine should not be None
    withClue(s"plan:\n$plan\n") {
      cosLine.get.trim should startWith("*(")
    }
  }
}
