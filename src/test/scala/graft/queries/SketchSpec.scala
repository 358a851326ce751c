package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The frequent-items sketch behind `approx_top_types`, in both regimes:
  * exact (capacity > distinct items ⇒ counts are guaranteed error-free —
  * what lets the query share the exact top-k oracle) and approximate
  * (capacity < distinct ⇒ the guarantee degrades to error-bounded, and a
  * true heavy hitter must still surface). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_top_k exact regime: counts equal the exact group-by") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")).toDF("v")
    val got = df.agg(expr("approx_top_k(v, 2, 100)").as("tk"))
      .select(explode(col("tk")).as("t"))
      .select(col("t.item"), col("t.count"))
      .as[(String, Long)].collect().toSeq
    got shouldBe Seq(("a", 50L), ("b", 30L))
  }

  test("approx_top_k approximate regime: a planted heavy hitter survives capacity pressure") {
    // 500 singleton keys + one key with 200 occurrences, sketch capacity 64:
    // the sketch cannot track all items, but the frequent-items guarantee
    // (estimate >= true - error) must keep the heavy hitter on top
    val rows = (0 until 500).map(i => s"rare_$i") ++ Seq.fill(200)("hot")
    val got = rows.toDF("v")
      .agg(expr("approx_top_k(v, 1, 64)").as("tk"))
      .select(explode(col("tk")).as("t"))
      .select(col("t.item"), col("t.count"))
      .as[(String, Long)].collect()
    got.head._1 shouldBe "hot"
    got.head._2 should be >= 200L // frequent-items over-estimates, never under
  }
}
