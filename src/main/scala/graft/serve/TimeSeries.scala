package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Schemas

/** The reference's three JSON query surfaces
  * (`analytical_server.py:67-109`), produced from any minute-grain count
  * frame — batch (`WindowAgg.minuteTypeCounts`) or a streaming memory-sink
  * table via [[windowedToMinute]]. In update/complete mode the sink
  * already contains the open minute's partial counts, which is exactly the
  * reference's W7 "flush current minute before answering" behavior.
  *
  * Scale note: the JSON document is assembled by Catalyst expressions
  * (`collect_list` → `map_from_entries` → `to_json`) over the RETAINED
  * aggregate — a few minutes × vocabulary rows, constant-size regardless
  * of input volume. Only the final one-row JSON string reaches the driver;
  * the raw stream is never collected.
  */
object TimeSeries {

  private val isoMinute = "yyyy-MM-dd'T'HH:mm:ss"

  /** Adapter: streaming `window(...)` aggregate → minute-grain frame. */
  def windowedToMinute(df: DataFrame, countCol: String = "count"): DataFrame =
    df.select(
      col("window.start").as("minute"),
      col("emoji_type"),
      col(countCol).as("cnt"))

  /** `/api/emoji-data` (`analytical_server.py:67-81`):
    * `{emoji: [{timestamp, count}…]…}`, series in time order. */
  def emojiDataJson(minuteCounts: DataFrame, typeCol: String = "emoji_type"): String = {
    val series = minuteCounts
      .groupBy(col(typeCol))
      .agg(sort_array(collect_list(struct(
        date_format(col("minute"), isoMinute).as("timestamp"),
        col("cnt").as("count")))).as("series"))
    val doc = series
      .agg(collect_list(struct(col(typeCol), col("series"))).as("entries"))
      .select(to_json(map_from_entries(sort_array(col("entries")))).as("j"))
    doc.collect()(0).getString(0)
  }

  /** `/api/total-data` (`analytical_server.py:83-94`):
    * `[{timestamp, count}…]` in time order. */
  def totalDataJson(minuteTotals: DataFrame, countCol: String = "total_count"): String =
    minuteTotals
      .agg(sort_array(collect_list(struct(
        date_format(col("minute"), isoMinute).as("timestamp"),
        col(countCol).as("count")))).as("series"))
      .select(to_json(col("series")).as("j"))
      .collect()(0).getString(0)

  /** `/api/stats` (`analytical_server.py:96-109`):
    * `{total_emojis, emoji_breakdown: {emoji: n}, window_minutes}`. */
  def statsJson(minuteCounts: DataFrame, typeCol: String = "emoji_type",
                windowMinutes: Int = Schemas.retentionMinutes): String =
    minuteCounts
      .groupBy(col(typeCol)).agg(sum(col("cnt")).as("n"))
      .agg(
        sum(col("n")).as("total_emojis"),
        map_from_entries(sort_array(collect_list(struct(col(typeCol), col("n")))))
          .as("emoji_breakdown"))
      .select(to_json(struct(
        col("total_emojis"),
        col("emoji_breakdown"),
        lit(windowMinutes).as("window_minutes"))).as("j"))
      .collect()(0).getString(0)
}
