package graft.serve

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec
import graft.core.WindowAgg

/** Payload-shape parity with the reference's three JSON endpoints
  * (`analytical_server.py:67-109`), asserted on parsed JSON. */
class TimeSeriesSpec extends SparkSpec {

  // minute 100: a×2, b×1; minute 101: a×1  (epoch-seconds fixture)
  private def counts = {
    val df = eventsDf(Seq(
      (6000L, "a"), (6010L, "a"), (6020L, "b"),
      (6060L, "a")))
    WindowAgg.minuteTypeCounts(df, "event_type")
      .withColumnRenamed("event_type", "emoji_type")
  }

  private def totals = {
    val df = eventsDf(Seq((6000L, "a"), (6010L, "a"), (6020L, "b"), (6060L, "a")))
    WindowAgg.minuteTotals(df)
  }

  private val m100 = "1970-01-01T01:40:00"
  private val m101 = "1970-01-01T01:41:00"

  test("emoji-data: {emoji: [{timestamp, count}…]} with series in time order") {
    val json = JsonMethods.parse(TimeSeries.emojiDataJson(counts))
    val JObject(fields) = json
    fields.map(_._1).toSet shouldBe Set("a", "b")
    val JArray(aSeries) = json \ "a"
    aSeries.map(p => ((p \ "timestamp").values, (p \ "count").values)) shouldBe
      List((m100, 2L), (m101, 1L))
    val JArray(bSeries) = json \ "b"
    bSeries.map(p => ((p \ "timestamp").values, (p \ "count").values)) shouldBe
      List((m100, 1L))
  }

  test("total-data: [{timestamp, count}…] in time order") {
    val json = JsonMethods.parse(TimeSeries.totalDataJson(totals))
    val JArray(series) = json
    series.map(p => ((p \ "timestamp").values, (p \ "count").values)) shouldBe
      List((m100, 3L), (m101, 1L))
  }

  test("stats: {total_emojis, emoji_breakdown, window_minutes}") {
    val json = JsonMethods.parse(TimeSeries.statsJson(counts))
    (json \ "total_emojis").values shouldBe 4L
    (json \ "window_minutes").values shouldBe 3L
    (json \ "emoji_breakdown" \ "a").values shouldBe 3L
    (json \ "emoji_breakdown" \ "b").values shouldBe 1L
  }

  test("windowedToMinute adapts a streaming window-struct aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val w = eventsDf(Seq((6000L, "a"), (6020L, "a")))
      .withColumnRenamed("event_type", "emoji_type")
      .groupBy(window(col("ts"), "1 minute"), col("emoji_type"))
      .agg(count(lit(1)).as("count"))
    val json = JsonMethods.parse(TimeSeries.emojiDataJson(TimeSeries.windowedToMinute(w)))
    val JArray(s) = json \ "a"
    s.map(p => (p \ "count").values) shouldBe List(2L)
  }
}
