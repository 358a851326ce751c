package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A1-A7 + P5-P6 + §2.6 (SURVEY.md): the windowed-aggregation core on
  * hand-built fixtures. Minute math uses epoch seconds (minute M starts at
  * 60*M). */
class WindowAggSpec extends SparkSpec {
  import spark.implicits._

  private def m(minute: Long, sec: Long = 0): Long = minute * 60 + sec

  test("P5: withMinute truncates to the minute bucket") {
    val df = WindowAgg.withMinute(eventsDf(Seq((m(10, 59), "a"))))
    df.select(unix_micros(col("minute"))).collect()(0).getLong(0) shouldBe
      m(10) * 1000000L
  }

  test("A1/A2: minuteTypeCounts counts per (minute, type)") {
    val df = eventsDf(Seq(
      (m(1, 1), "a"), (m(1, 2), "a"), (m(1, 3), "b"),
      (m(2, 1), "a")))
    val got = WindowAgg.minuteTypeCounts(df, "event_type")
      .select(unix_micros(col("minute")).as("us"), col("event_type"), col("cnt"))
      .as[(Long, String, Long)].collect().toSet
    got shouldBe Set(
      (m(1) * 1000000L, "a", 2L),
      (m(1) * 1000000L, "b", 1L),
      (m(2) * 1000000L, "a", 1L))
  }

  test("A3: minuteTotals counts all types per minute") {
    val df = eventsDf(Seq((m(1, 1), "a"), (m(1, 2), "b"), (m(2, 1), "a")))
    val got = WindowAgg.minuteTotals(df)
      .select(unix_micros(col("minute")).as("us"), col("total_count"))
      .as[(Long, Long)].collect().toSet
    got shouldBe Set((m(1) * 1000000L, 2L), (m(2) * 1000000L, 1L))
  }

  test("P6: scaledCount piecewise boundary at 999/1000/1001") {
    val got = Seq(999L, 1000L, 1001L).toDF("cnt")
      .select(col("cnt"), WindowAgg.scaledCount(col("cnt")).as("s"))
      .as[(Long, Double)].collect().toMap
    got(999L) shouldBe 1.0
    got(1000L) shouldBe 1.0
    got(1001L) shouldBe 1.001
  }

  test("A4: retained keeps only minutes within the 3-minute horizon of the max") {
    // minutes 0..10; max minute = 10; horizon keeps minute >= 7.
    val df = eventsDf((0L to 10L).map(i => (m(i), "a")))
    val kept = WindowAgg.retained(df)
      .select(unix_micros(col("minute"))).as[Long].collect().toSet
    kept shouldBe Set(7L, 8L, 9L, 10L).map(_ * 60000000L)
  }

  test("A4: retention boundary minute (max - 3) is inclusive") {
    val df = eventsDf(Seq((m(0), "a"), (m(3), "a")))
    WindowAgg.retained(df).count() shouldBe 2L
  }

  test("A5+A7: windowStats totals and distinct types") {
    val df = eventsDf(Seq((m(1), "a"), (m(1), "a"), (m(1), "b")))
    val row = WindowAgg.windowStats(df, "event_type").collect()(0)
    row.getAs[Long]("total_events") shouldBe 3L
    row.getAs[Long]("distinct_types") shouldBe 2L
  }

  test("§2.6: pivotMinuteByType zero-fills vocabulary gaps") {
    val df = eventsDf(Seq((m(1), "a"), (m(1), "a"), (m(2), "b")))
    val got = WindowAgg.pivotMinuteByType(df, "event_type", Seq("a", "b", "c"))
      .select(unix_micros(col("minute")).as("us"), col("a"), col("b"), col("c"))
      .as[(Long, Long, Long, Long)].collect().toSet
    got shouldBe Set(
      (m(1) * 1000000L, 2L, 0L, 0L),
      (m(2) * 1000000L, 0L, 1L, 0L))
  }
}
