package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The native integer dot must be BIT-EQUAL to the HOF composition it
  * replaced (both int8 coarse scorers' hashes ride on it), across eval
  * paths and the composition's NULL/mismatch/empty semantics. */
class DotProductIntSpec extends SparkSpec {
  import spark.implicits._

  test("fused == composed on a randomized int8 grid (both eval paths)") {
    val rnd = new scala.util.Random(0xD07)
    val rows = (0 until 2000).map { i =>
      val d = 1 + rnd.nextInt(96)
      (i.toLong,
        Array.fill(d)(rnd.nextInt(255) - 127),
        Array.fill(d)(rnd.nextInt(255) - 127))
    }
    val df = rows.toDF("id", "a", "b")
    val key = "spark.sql.codegen.factoryMode"
    val saved = spark.conf.getOption(key)
    try {
      for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
        spark.conf.set(key, codegen)
        val got = df.select(col("id"),
            graft.ext.Similarity.dotInt8(col("a"), col("b")).as("f"),
            graft.ext.Similarity.dotInt8Composed(col("a"), col("b")).as("c"))
          .collect()
        got.foreach { r =>
          withClue(s"id=${r.getLong(0)} codegen=$codegen: ") {
            r.isNullAt(1) shouldBe r.isNullAt(2)
            if (!r.isNullAt(1)) r.getLong(1) shouldBe r.getLong(2)
          }
        }
      }
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("edge cases mirror the composition: mismatch, null element, null array, empty, int wrap") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", ArrayType(IntegerType, containsNull = true), nullable = true),
      StructField("b", ArrayType(IntegerType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(0L, Seq(1, 2), Seq(3)),                      // mismatch -> null
      Row(1L, Seq(1, null), Seq(3, 4)),                // null elem -> null
      Row(2L, null, Seq(1, 2)),                        // null array -> null
      Row(3L, Seq.empty[Any], Seq.empty[Any]),         // empty -> 0
      Row(4L, Seq(127, -127), Seq(127, 127)))          // int8 extremes
      .map(r => Row(r.get(0),
        Option(r.get(1)).map(_.asInstanceOf[Seq[Any]]).orNull,
        Option(r.get(2)).map(_.asInstanceOf[Seq[Any]]).orNull))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val got = df.select(col("id"),
        graft.ext.Similarity.dotInt8(col("a"), col("b")).as("f"),
        graft.ext.Similarity.dotInt8Composed(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    got.foreach { r =>
      withClue(s"id=${r.getLong(0)}: ") {
        r.isNullAt(1) shouldBe r.isNullAt(2)
        if (!r.isNullAt(1)) r.getLong(1) shouldBe r.getLong(2)
      }
    }
    got(0).isNullAt(1) shouldBe true
    got(1).isNullAt(1) shouldBe true
    got(2).isNullAt(1) shouldBe true
    got(3).getLong(1) shouldBe 0L
    got(4).getLong(1) shouldBe (127L * 127 + (-127L) * 127)
    // domain note, pinned: inputs are int8-bounded BY CONSTRUCTION
    // (int8Quantize clamps to ±127, |product| ≤ 16129 — no int overflow
    // is reachable). Outside that domain the two forms diverge by
    // design: under ANSI mode the HOF's int multiply THROWS on
    // overflow while the native loop wraps — asserted here so the
    // boundary is a recorded fact, not a surprise
    val wide = Seq((0L, Seq(Int.MaxValue), Seq(2))).toDF("id", "a", "b")
    val thrown = intercept[Exception] {
      wide.select(graft.ext.Similarity.dotInt8Composed(col("a"), col("b"))).collect()
    }
    thrown.getClass.getSimpleName shouldBe "SparkArithmeticException"
    wide.select(graft.ext.Similarity.dotInt8(col("a"), col("b")).as("f"))
      .collect()(0).getLong(0) shouldBe (Int.MaxValue * 2).toLong
  }

  test("whole-stage codegen: the fused expression runs inside one codegen region") {
    def arr(base: org.apache.spark.sql.Column) =
      array((0 to 15).map(i => (base + lit(i)).cast("int")): _*)
    val df = spark.range(100).select(col("id"),
      arr(col("id")).as("a"), arr(col("id") * 2).as("b"))
    val scored = df.select(
      graft.ext.Similarity.dotInt8(col("a"), col("b")).as("d"))
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_dot_int"))
    line should not be None
    withClue(s"plan:\n$plan\n") {
      line.get.trim should startWith("*(")
    }
  }
}
