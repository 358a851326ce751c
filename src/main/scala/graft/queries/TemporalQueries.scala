package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Temporal

/** As-of and range joins over `events` — temporal operators the
  * reference lacks entirely (SURVEY.md §2.6), oracled against DuckDB's
  * native `ASOF JOIN` and a naive inequality join respectively. Both
  * Spark plans use the scale shapes from [[Temporal]]; the oracle
  * proves they compute exactly the textbook semantics. */
object TemporalQueries {

  /** Each purchase joined to the user's most recent click at-or-before
    * it (inclusive). Right side pre-deduped per (user, ts) with
    * max(event_id) so "most recent" is unambiguous; lag in exact integer
    * microseconds. */
  def asofQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts")
      .agg(max(col("event_id")).as("r_event_id"))
    Temporal.asofJoin(purchases, clicks, Seq("user_id"), "ts")
      .select(
        col("event_id"), col("user_id"), col("r_event_id"),
        (unix_micros(col("ts")) - unix_micros(col("__asof_ts"))).as("lag_us"))
      .orderBy("event_id")
  }

  private val RangeDeltaUs = 86400000000L // 1 day

  /** Per-user count + exact lag sum of (click, view) pairs within ±1 day
    * of each other — the bucketed equi-join answering what a naive
    * inequality join would (and what the oracle runs). */
  def rangeQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("a_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("b_ts"))
    Temporal.rangeJoinBuckets(clicks, views, Seq("user_id"), "a_ts", "b_ts", RangeDeltaUs)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(abs(unix_micros(col("a_ts")) - unix_micros(col("b_ts")))).as("sum_abs_lag_us"))
      .orderBy("user_id")
  }

  /** SCD type-2 dimension history over the event stream
    * ([[Temporal.scd2History]]): each user's event_type treated as a
    * tracked attribute — every change becomes a version row with an
    * exclusive validity interval, consecutive duplicates collapsed,
    * current row flagged. The warehouse companion of `dedup_latest`
    * (which keeps only the newest value). All-integer output
    * (epoch micros + the open-interval sentinel), so the hash gate is
    * exact. */
  def scd2Q(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    Temporal.scd2History(ev, Seq("user_id"), "ts", "event_type", "event_id")
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"), col("is_current"))
      .orderBy("user_id", "version")
  }

  val queries: Seq[GQuery] = Seq(
    GQuery("scd2_history", scd2Q, Some(s"""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS us, event_id
                 FROM events),
      c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
            FROM e),
      f AS (SELECT user_id, event_type, us, event_id FROM c
            WHERE prev IS NULL OR prev <> event_type),
      v AS (SELECT user_id, event_type,
                   CAST(row_number() OVER w AS BIGINT) AS version,
                   us AS valid_from_us,
                   coalesce(lead(us) OVER w, ${Temporal.OpenIntervalUs}) AS valid_to_us
            FROM f WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
      SELECT user_id, version, event_type,
             CAST(valid_from_us AS BIGINT) AS valid_from_us,
             CAST(valid_to_us AS BIGINT) AS valid_to_us,
             CAST(CASE WHEN valid_to_us = ${Temporal.OpenIntervalUs} THEN 1 ELSE 0 END AS INT) AS is_current
      FROM v ORDER BY user_id, version""")),
    GQuery("asof_join", asofQ, Some("""
      WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts
                 FROM events WHERE event_type = 'purchase'),
      r AS (SELECT user_id, ts::TIMESTAMP AS ts, CAST(max(event_id) AS BIGINT) AS r_event_id
            FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT l.event_id, l.user_id, r.r_event_id,
             epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
      FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id""")),
    GQuery("range_join_buckets", rangeQ, Some("""
      WITH a AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS us
                 FROM events WHERE event_type = 'click'),
      b AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS us
            FROM events WHERE event_type = 'view')
      SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(abs(a.us - b.us)) AS BIGINT) AS sum_abs_lag_us
      FROM a JOIN b ON a.user_id = b.user_id AND abs(a.us - b.us) <= 86400000000
      GROUP BY 1 ORDER BY 1"""))
  )
}
