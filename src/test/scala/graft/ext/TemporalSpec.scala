package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Temporal joins: the as-of window form and the bucketed range join are
  * checked against hand-computed expectations and against the naive
  * (quadratic) formulations they replace at scale. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asofJoin: latest at-or-before match per key, inclusive at equal ts") {
    val left = Seq((1L, ts(10), 100L), (1L, ts(20), 101L), (2L, ts(5), 102L))
      .toDF("k", "t", "l_id")
    val right = Seq((1L, ts(10), 900L), (1L, ts(15), 901L), (2L, ts(9), 902L))
      .toDF("k", "t", "r_id")
    val got = Temporal.asofJoin(left, right, Seq("k"), "t")
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    // l_id 100 at t=10 matches r_id 900 at t=10 (inclusive);
    // l_id 101 at t=20 matches r_id 901 at t=15; l_id 102 at t=5 has no
    // right row at-or-before it and is dropped (inner)
    got shouldBe Set((100L, 900L), (101L, 901L))
  }

  test("asofJoin: outer keeps unmatched left rows with null payload") {
    val left = Seq((1L, ts(1), 100L)).toDF("k", "t", "l_id")
    val right = Seq((1L, ts(5), 900L)).toDF("k", "t", "r_id")
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", inner = false)
      .select(col("l_id"), col("r_id").isNull).as[(Long, Boolean)].collect()
    got shouldBe Array((100L, true))
  }

  test("asofJoin tolerance: stale matches are nulled out, then dropped when inner") {
    val left = Seq((1L, ts(100), 100L), (1L, ts(200), 101L)).toDF("k", "t", "l_id")
    val right = Seq((1L, ts(95), 900L)).toDF("k", "t", "r_id")
    // 10s tolerance: l at t=100 matches (5s stale); l at t=200 does not (105s)
    val tol = Some(10000000L)
    Temporal.asofJoin(left, right, Seq("k"), "t", toleranceUs = tol)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq shouldBe Seq((100L, 900L))
    Temporal.asofJoin(left, right, Seq("k"), "t", inner = false, toleranceUs = tol)
      .select(col("l_id"), col("r_id").isNull).as[(Long, Boolean)].collect().toSet shouldBe
      Set((100L, false), (101L, true))
  }

  test("asofJoin equals the naive per-row max-subquery on random data") {
    val rng = new scala.util.Random(31)
    val left = (0 until 300).map(i => (rng.nextInt(5).toLong, ts(rng.nextInt(1000).toLong), i.toLong))
    val rightRaw = (0 until 300).map(i => (rng.nextInt(5).toLong, ts(rng.nextInt(1000).toLong), 1000L + i))
    // unique per (k, t): keep max id, as the contract requires
    val right = rightRaw.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val naive = left.flatMap { case (k, t, lid) =>
      val cands = right.filter(r => r._1 == k && !r._2.after(t))
      if (cands.isEmpty) None
      else {
        val best = cands.maxBy(r => (r._2.getTime, r._3))
        Some((lid, best._3))
      }
    }.toSet
    val got = Temporal.asofJoin(
        left.toDF("k", "t", "l_id"), right.toDF("k", "t", "r_id"), Seq("k"), "t")
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    got shouldBe naive
  }

  test("both joins refuse colliding non-key column names instead of corrupting") {
    val a = Seq((1L, ts(1), 1L)).toDF("k", "t", "payload")
    val b = Seq((1L, ts(1), 2L)).toDF("k", "t", "payload")
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(a, b, Seq("k"), "t")
    }.getMessage should include("payload")
    val c = Seq((1L, ts(1), 1L)).toDF("k", "a_ts", "x")
    val d = Seq((1L, ts(1), 2L)).toDF("k", "b_ts", "x")
    intercept[IllegalArgumentException] {
      Temporal.rangeJoinBuckets(c, d, Seq("k"), "a_ts", "b_ts", 1000L)
    }.getMessage should include("x")
  }

  test("rangeJoinBuckets equals the naive inequality join, pairs emitted once") {
    val rng = new scala.util.Random(37)
    val width = 10000000L // 10 s in micros
    val a = (0 until 200).map(i => (rng.nextInt(4).toLong, ts(rng.nextInt(100).toLong), i.toLong))
    val b = (0 until 200).map(i => (rng.nextInt(4).toLong, ts(rng.nextInt(100).toLong), 1000L + i))
    val naive = (for {
      (ka, ta, ia) <- a
      (kb, tb, ib) <- b
      if ka == kb && math.abs(ta.getTime - tb.getTime) * 1000L <= width
    } yield (ia, ib)).toSet
    val got = Temporal.rangeJoinBuckets(
        a.toDF("k", "a_ts", "a_id"), b.toDF("k", "b_ts", "b_id"),
        Seq("k"), "a_ts", "b_ts", width)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    got.length shouldBe got.toSet.size // no duplicate pair from the bucket explode
    got.toSet shouldBe naive
  }

  test("scd2History: consecutive duplicates collapse, intervals chain exclusively, re-appearing value is a new version") {
    // key 1: A@10, A@20 (collapsed), B@30, A@40 — three versions; key 2:
    // a single row stays open; equal-ts updates keep tieCol order
    val df = Seq(
      (1L, "A", ts(10), 100L), (1L, "A", ts(20), 101L),
      (1L, "B", ts(30), 102L), (1L, "A", ts(40), 103L),
      (2L, "X", ts(5), 104L)
    ).toDF("k", "attr", "ts", "id")
    val got = Temporal.scd2History(df, Seq("k"), "ts", "attr", "id")
      .select("k", "version", "attr", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, Long, String, Long, Long, Int)].collect().sortBy(r => (r._1, r._2))
    got shouldBe Array(
      (1L, 1L, "A", 10000000L, 30000000L, 0),
      (1L, 2L, "B", 30000000L, 40000000L, 0),
      (1L, 3L, "A", 40000000L, Temporal.OpenIntervalUs, 1),
      (2L, 1L, "X", 5000000L, Temporal.OpenIntervalUs, 1))
    // interval chain property: version n's end = version n+1's start
    got.groupBy(_._1).values.foreach { vs =>
      vs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => a._5 shouldBe b._4
        case _ =>
      }
    }
  }
}
