package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Ingest, Schemas, Tables, WindowAgg}

/** Reference-parity queries (SURVEY.md §2.1-§2.4) expressed as batch
  * queries over the driver's `events` table (`event_type` plays the role
  * of `emoji_type`, `ts` is the pre-parsed event time — TESTDATA/FIXTURES
  * §2). The streaming twins of the shared `Ingest`/`WindowAgg` transforms
  * are wired in `graft.stream.Pipeline`.
  */
object Parity {

  private def minuteStr(c: String) =
    date_format(col(c), "yyyy-MM-dd HH:mm:ss").as("window_start")

  /** DuckDB-side minute-to-string, kept in lockstep with [[minuteStr]]. */
  private val duckMinute =
    "strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S')"

  /** Flagship (spark_consumer.py:19-53): per-(minute, type) counts with the
    * piecewise scaled_count (P5+A1+P6+P7). */
  def flagship(spark: SparkSession, dir: String): DataFrame =
    WindowAgg.minuteTypeCounts(Tables.events(spark, dir), "event_type")
      .select(
        minuteStr("minute"),
        col("event_type"),
        WindowAgg.scaledCount(col("cnt")).as("scaled_count"))
      .orderBy("window_start", "event_type")

  /** P1-P4 roundtrip: serialize events to the reference's JSON wire
    * envelope, re-parse with `from_json` + lenient timestamp + presence
    * validation, aggregate. Oracle sees only the (identity) end state. */
  def parseEnvelope(spark: SparkSession, dir: String): DataFrame = {
    val parsed = Ingest.parseEnvelope(wireEnvelope(spark, dir))
    val (valid, _) = Ingest.validate(parsed)
    valid.filter(col("event_time").isNotNull)
      .groupBy(col("emoji_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("emoji_type")
  }

  /** A3: per-minute totals. */
  def minuteTotals(spark: SparkSession, dir: String): DataFrame =
    WindowAgg.minuteTotals(Tables.events(spark, dir))
      .select(minuteStr("minute"), col("total_count"))
      .orderBy("window_start")

  /** A4+A6: per-type totals over the rolling 3-minute retention window. */
  def retention3m(spark: SparkSession, dir: String): DataFrame =
    WindowAgg.retained(Tables.events(spark, dir))
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** A5+A7: the /api/stats scalar row over the retention window. */
  def statsWindow(spark: SparkSession, dir: String): DataFrame =
    WindowAgg.windowStats(WindowAgg.retained(Tables.events(spark, dir)), "event_type")

  /** §2.6 dashboard align+pivot: minute × type matrix. */
  def pivotMinute(spark: SparkSession, dir: String): DataFrame =
    WindowAgg.pivotMinuteByType(
        Tables.events(spark, dir), "event_type", Schemas.eventTypeVocab)
      .select(minuteStr("minute") +: Schemas.eventTypeVocab.map(col): _*)
      .orderBy("window_start")

  /** §2.6 top-k (`slice(-10)` table): top-10 (minute,type) cells by count. */
  def topMinutes(spark: SparkSession, dir: String): DataFrame =
    WindowAgg.minuteTypeCounts(Tables.events(spark, dir), "event_type")
      .select(minuteStr("minute"), col("event_type"), col("cnt"))
      .orderBy(col("cnt").desc, col("window_start"), col("event_type"))
      .limit(10)

  /** Measure aggregation over the extra `value` column (exact decimal
    * arithmetic → bit-stable doubles, see QueryDef.decimalNote). */
  def valueStats(spark: SparkSession, dir: String): DataFrame = {
    val dec = col("value").cast(DecimalType(18, 4))
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(dec).cast("double").as("sum_value"),
        (sum(dec).cast("double") / count(lit(1))).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** P2 on real JSON: extract `props.k`, aggregate per type. */
  def propsExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), Schemas.propsSchema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
      .orderBy("event_type")

  /** A7 at user grain: exact distinct users per type. Standard two-phase
    * expand-shuffle plan; correct, but the heaviest shuffle in this set at
    * scale — [[approxDistinctEstimate]] is the 100 TB variant. */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  /** A7 skew variant: the SAME exact answer as [[distinctUsers]] through
    * [[graft.core.Skew.saltedDistinctCount]]'s two-phase salted plan —
    * phase 1 counts distincts per (type, salt-of-user), phase 2 sums the
    * ≤ saltFactor partials, so one hot event_type spreads over
    * saltFactor reducers instead of a single straggler. Sharing the
    * plain oracle puts the salting identity under the driver hash gate. */
  def distinctUsersSalted(spark: SparkSession, dir: String): DataFrame =
    graft.core.Skew.saltedDistinctCount(
        Tables.events(spark, dir).select(col("event_type"), col("user_id")),
        "event_type", "user_id")
      .select(col("event_type"), col("n_distinct_user_id").cast("long").as("n_users"))
      .orderBy("event_type")

  /** ADVISOR-DRIVEN AUTO-SALTING (round-13 verdict #6 — the advisor and
    * the salted twin existed; this closes the loop end-to-end): measure
    * the grouping key's skew with [[graft.core.Skew.adviseSaltFactor]],
    * then SWITCH PLANS on the verdict — the two-phase salted
    * aggregation at the advised factor when any key exceeds its fair
    * 1/32 share, the plain expand-shuffle distinct otherwise. On the
    * fixture, event_type has ~5 values over the whole table, every one
    * far past its fair share, so the advisor flags (factor ≈ 32/5) and
    * the salted plan runs — PlanSpec pins the switch (salt hash in the
    * aggregate keys) AND the negative branch (an unskewed key advises 1
    * and keeps the plain plan). Either branch computes the identical
    * answer, so the query shares `distinct_users`' oracle verbatim:
    * the driver hash gate proves the advisor can never change RESULTS,
    * only the shuffle's shape. */
  def distinctUsersAutosalt(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("user_id"))
    val factor = graft.core.Skew.adviseSaltFactor(ev, "event_type")
    val counted =
      if (factor > 1)
        graft.core.Skew.saltedDistinctCount(ev, "event_type", "user_id",
            saltFactor = factor)
          .select(col("event_type"),
            col("n_distinct_user_id").cast("long").as("n_users"))
      else
        ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"))
    counted.orderBy("event_type")
  }

  /** SKEW ADVISOR — the measurement half of the salting story
    * ([[graft.core.Skew]] is the mitigation half): per-key frequency
    * histogram over the grouping key, reporting the top heavy hitters,
    * each key's share of the table, and the salt factor that would level
    * it (`salt_parts` = partitions needed so the key's rows fit one
    * partition's fair 1/32 share — ceil via integer arithmetic, no fp).
    * At 100 TB you run THIS first, then configure
    * `saltedDistinctCount`/AQE skew thresholds from its output instead
    * of guessing. One partial-aggregated count shuffle (keys, not rows,
    * cross the wire) + a TakeOrdered top-10 — nothing collects. */
  def skewAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val total = ev.count() // parquet-metadata count, one cheap job
    ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("cnt"),
        (col("cnt").cast("double") / lit(total.toDouble)).as("share"),
        expr(s"CAST((cnt * 32 + $total - 1) DIV $total AS BIGINT)").as("salt_parts"))
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(10)
  }

  /** A7 scale variant: HyperLogLog++ distinct users per type. One regular
    * hash-agg shuffle of fixed-size sketches instead of [[distinctUsers]]'s
    * (type, user_id) expand-shuffle — the plan that survives 100 TB. This
    * is the PRODUCTION operator (estimate only); the registry entry is
    * [[approxDistinctUsersChecked]], which verifies the estimate against
    * the exact count so the driver's DuckDB gate goes fully hash-green. */
  def approxDistinctEstimate(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))
      .orderBy("event_type")

  /** The driver-checkable harness around [[approxDistinctEstimate]]
    * (round-9 verdict #1: no more `no_oracle` rows). Different HLL
    * implementations disagree on raw estimates, so the estimate itself can
    * never hash-match DuckDB — instead the query computes BOTH the HLL
    * estimate and the exact distinct count in one aggregate and emits the
    * exact count plus `approx_ok` = |estimate − exact| ≤ 3·rsd·exact. The
    * oracle recomputes the exact count independently and asserts TRUE, so
    * a hash match proves (a) the exact count against DuckDB and (b) the
    * sketch's error bound against that independently-verified truth —
    * strictly stronger than the old rows-only check. The estimate is
    * deterministic for fixed data, so the 3σ bound (observed relative
    * error on the fixture: ≤0.4%) is stable run to run. */
  def approxDistinctUsersChecked(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id"), 0.02).as("__approx"))
      .select(col("event_type"), col("n_users"),
        (abs(col("__approx") - col("n_users")) <=
          col("n_users").cast("double") * lit(0.06)).as("approx_ok"))
      .orderBy("event_type")

  /** P2 as a DYNAMIC schema: props parsed to `map<string,string>`
    * (SURVEY §1.3's mapping for schema-on-read payloads whose keys are
    * not known at compile time), exploded to (key, value) pairs and
    * aggregated per key. The struct-schema twin is [[propsExtract]];
    * this one survives producers adding fields without a redeploy. */
  def propsMapAgg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    Tables.events(spark, dir)
      .select(explode(from_json(col("props"), MapType(StringType, StringType)))
        .as(Seq("key", "val")))
      .groupBy("key")
      .agg(
        count(lit(1)).as("n"),
        sum(col("val").cast("long")).as("sum_v"))
      .orderBy("key")
  }

  /** Heavy-hitters sketch (DataSketches frequent-items via
    * `approx_top_k`): the third exact/approx twin next to HLL distinct
    * counts and the quantile sketch — but this one is fully HASH-CHECKED
    * against the exact top-k oracle, because with `maxItemsTracked`
    * above the distinct-item count the sketch is in its exact regime and
    * its counts are guaranteed error-free. At 100 TB the plan is one
    * shuffle of fixed-size sketch buffers regardless of key cardinality
    * — the same reason the HLL twin exists. The approximate regime
    * (capacity < distinct items) is gated in SketchSpec on planted skew. */
  def approxTopTypes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(expr("approx_top_k(event_type, 3, 1000)").as("tk"))
      .select(explode(col("tk")).as("t"))
      .select(col("t.item").as("event_type"), col("t.count").as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"))

  /** A8: the ingest success/total counters (`api_server.py:16-17,35-36`,
    * `client.py:64`) as a query over the envelope roundtrip: total
    * attempts, accepted (all three fields present ⇒ the 200 path),
    * rejected (the 400 side output). The reject path is exercised with
    * planted bad envelopes in IngestSpec; on the well-formed events table
    * it is structurally zero. */
  def ingestCounters(spark: SparkSession, dir: String): DataFrame = {
    val parsed = Ingest.parseEnvelope(wireEnvelope(spark, dir))
    // one pass: conditional aggregate instead of two scans + crossJoin
    val ok = col("user_id").isNotNull && col("emoji_type").isNotNull &&
      col("timestamp").isNotNull
    parsed.agg(
        count(lit(1)).as("n_total"),
        count(when(ok, lit(1))).as("n_accepted"))
      .withColumn("n_rejected", col("n_total") - col("n_accepted"))
  }

  /** Events re-serialized to the reference's JSON wire envelope (shared by
    * the P1-P4 roundtrip queries). */
  private def wireEnvelope(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      to_json(struct(
        col("user_id").cast("string").as("user_id"),
        col("event_type").as("emoji_type"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("timestamp")
      )).as("value"))

  /** A2+A3 in one pass via ROLLUP (SURVEY §2.3 A3's grouping-sets
    * alternative): per-(minute, type) counts plus per-minute subtotals
    * plus the grand total, one shuffle. */
  def rollupMinuteType(spark: SparkSession, dir: String): DataFrame =
    WindowAgg.withMinute(Tables.events(spark, dir))
      .rollup(col("minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("minute"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"))
      .orderBy(col("window_start").asc_nulls_first, col("event_type").asc_nulls_first)

  /** [[rollupMinuteType]]'s CUBE sibling: all four grouping sets of
    * (minute, type) in one pass — the remaining OLAP grouping shape. The
    * plan is a single Expand + hash aggregate, so at scale it costs one
    * extra pass over the (tiny) aggregate, not extra scans. */
  def cubeMinuteType(spark: SparkSession, dir: String): DataFrame =
    WindowAgg.withMinute(Tables.events(spark, dir))
      .cube(col("minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("minute"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"))
      .orderBy(col("window_start").asc_nulls_first, col("event_type").asc_nulls_first)

  /** Distribution window functions over the minute series: per-type
    * quartile bucket (`ntile`) and `percent_rank` of each minute by its
    * count — the remaining rank-family shapes (`row_number`/`rank` ride
    * in `top_types_per_minute`, `lag` in the deltas pair). The inner
    * ORDER BY is total (cnt, then minute), so both engines assign
    * identical ranks; percent_rank is an exact small-integer ratio, so
    * the double compares clean. */
  def minuteNtile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("cnt"), col("window_start"))
    WindowAgg.minuteTypeCounts(Tables.events(spark, dir), "event_type")
      .select(minuteStr("minute"), col("event_type"), col("cnt"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .orderBy("event_type", "window_start")
  }

  /** §2.6 ranking window function: top-3 types per minute by count (the
    * dashboard's per-minute leaderboard shape). */
  def topTypesPerMinute(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    WindowAgg.minuteTypeCounts(Tables.events(spark, dir), "event_type")
      .withColumn("rk", row_number().over(
        Window.partitionBy("minute").orderBy(col("cnt").desc, col("event_type"))))
      .filter(col("rk") <= 3)
      .select(minuteStr("minute"), col("event_type"), col("cnt"), col("rk"))
      .orderBy("window_start", "rk")
  }

  /** Exact interpolated quantiles of `value` per type (Spark `percentile`
    * = DuckDB `quantile_cont`; rounded to 6 dp so the two engines'
    * interpolation association can't flip the hash). */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 6).as("p25"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"))
      .orderBy("event_type")

  /** [[valueQuantiles]]'s 100 TB variant: `approx_percentile` carries a
    * fixed-size sketch per group through the shuffle instead of buffering
    * each group's full value multiset (the exact interpolated percentile
    * cannot avoid that). This is the PRODUCTION operator (estimates
    * only); the registry entry is [[approxValueQuantilesChecked]]. */
  def approxQuantileEstimate(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(value, 0.25, 1000)").as("p25_approx"),
        expr("approx_percentile(value, 0.5, 1000)").as("p50_approx"),
        expr("approx_percentile(value, 0.9, 1000)").as("p90_approx"))
      .orderBy("event_type")

  /** Driver-checkable harness around [[approxQuantileEstimate]] (round-9
    * verdict #1): sketch-based quantile implementations legitimately
    * differ across engines, so instead of emitting raw estimates the
    * query checks each estimate against the exact quantiles at q ± 0.005
    * — five times the sketch's guaranteed rank error (accuracy 1000 ⇒
    * rank error ≤ 0.001) — and emits per-quantile booleans plus the group
    * count. The oracle recomputes the count and asserts TRUE, so a hash
    * match proves every sketch estimate sits inside an exact-rank window
    * that DuckDB's own `count(*)` row pins to the same group population.
    * Both `approx_percentile` and `percentile` aggregate in one pass, so
    * the benched plan still carries the sketch through the shuffle
    * alongside the exact buffer the twin [[valueQuantiles]] already pays. */
  def approxValueQuantilesChecked(spark: SparkSession, dir: String): DataFrame = {
    def within(ap: Column, lo: Column, hi: Column): Column = ap >= lo && ap <= hi
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(value, array(0.25, 0.5, 0.9), 1000)").as("__ap"),
        expr("percentile(value, array(0.245, 0.255, 0.495, 0.505, 0.895, 0.905))")
          .as("__ex"))
      .select(col("event_type"), col("n"),
        within(element_at(col("__ap"), 1),
          element_at(col("__ex"), 1), element_at(col("__ex"), 2)).as("p25_ok"),
        within(element_at(col("__ap"), 2),
          element_at(col("__ex"), 3), element_at(col("__ex"), 4)).as("p50_ok"),
        within(element_at(col("__ap"), 3),
          element_at(col("__ex"), 5), element_at(col("__ex"), 6)).as("p90_ok"))
      .orderBy("event_type")
  }

  /** W2 extension: sliding 5-minute window with 1-minute slide — each
    * event lands in 5 overlapping windows. (The reference uses only
    * tumbling windows; SURVEY §2.4 W2 lists sliding as the optional
    * extension.) */
  def sliding5m(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "5 minutes", "1 minute"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("cnt"))
      .orderBy("window_start")

  /** W2 extension: session windows — per-user sessions closed by a 30 s
    * inactivity gap; sessions counted per event type of the session's
    * first event... kept simpler: session count and mean length per user
    * bucket (user_id % 10) so output stays small and deterministic. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(pmod(col("user_id"), lit(10)).as("user_bucket"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
      .orderBy("user_bucket")

  /** Analytic lag: minute-over-minute traffic delta (the dashboard's
    * trend arrow). The lag window runs over the already-aggregated minute
    * series — a few thousand rows at any input scale, so the
    * single-partition window is fine by construction. */
  def minuteDeltas(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    WindowAgg.minuteTotals(Tables.events(spark, dir))
      .select(minuteStr("minute"), col("total_count"))
      .withColumn("delta",
        col("total_count") -
          lag("total_count", 1).over(Window.orderBy("window_start")))
      .orderBy("window_start")
  }

  /** [[minuteDeltas]] at type grain: the lag window is PARTITIONED by
    * event_type, so it distributes across executors (the global variant's
    * single-partition window is bounded only because its input is the
    * pre-aggregated minute series). */
  def minuteDeltasByType(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    WindowAgg.minuteTypeCounts(Tables.events(spark, dir), "event_type")
      .select(minuteStr("minute"), col("event_type"), col("cnt"))
      .withColumn("delta",
        col("cnt") - lag("cnt", 1).over(
          Window.partitionBy("event_type").orderBy("window_start")))
      .orderBy("window_start", "event_type")
  }

  /** The flagship authored in pure SQL over registered temp views — the
    * `spark.sql(...)` face of the same engine (identical plan after
    * analysis; identical oracle as `flagship`). */
  def sqlFlagship(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      SELECT date_format(date_trunc('minute', ts), 'yyyy-MM-dd HH:mm:ss') AS window_start,
             event_type,
             CAST(CASE WHEN count(*) <= 1000 THEN 1.0
                       ELSE count(*) / 1000.0 END AS DOUBLE) AS scaled_count
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")
  }

  val queries: Seq[GQuery] = Seq(
    GQuery("flagship", flagship, Some(s"""
      SELECT $duckMinute AS window_start, event_type,
             CAST(CASE WHEN count(*) <= 1000 THEN 1.0
                       ELSE count(*) / 1000.0 END AS DOUBLE) AS scaled_count
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),
    GQuery("parse_envelope", parseEnvelope, Some("""
      SELECT event_type AS emoji_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1 ORDER BY 1""")),
    GQuery("minute_totals", minuteTotals, Some(s"""
      SELECT $duckMinute AS window_start, CAST(count(*) AS BIGINT) AS total_count
      FROM events GROUP BY 1 ORDER BY 1""")),
    GQuery("retention_3m", retention3m, Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events
      WHERE date_trunc('minute', ts) >=
            (SELECT date_trunc('minute', max(ts)) - INTERVAL 3 MINUTE FROM events)
      GROUP BY 1 ORDER BY 1""")),
    GQuery("stats_window", statsWindow, Some("""
      SELECT CAST(count(*) AS BIGINT) AS total_events,
             CAST(count(DISTINCT event_type) AS BIGINT) AS distinct_types
      FROM events
      WHERE date_trunc('minute', ts) >=
            (SELECT date_trunc('minute', max(ts)) - INTERVAL 3 MINUTE FROM events)""")),
    GQuery("pivot_minute", pivotMinute, Some(s"""
      SELECT $duckMinute AS window_start,
             CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
             CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
             CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
             CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view
      FROM events GROUP BY 1 ORDER BY 1""")),
    GQuery("top_minutes", topMinutes, Some(s"""
      SELECT $duckMinute AS window_start, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
      ORDER BY cnt DESC, window_start, event_type LIMIT 10""")),
    GQuery("value_stats", valueStats, Some("""
      SELECT event_type,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_value,
             min(value) AS min_value,
             max(value) AS max_value,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1 ORDER BY 1""")),
    GQuery("props_extract", propsExtract, Some("""
      SELECT event_type,
             CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(count(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS n_k
      FROM events GROUP BY 1 ORDER BY 1""")),
    GQuery("props_map_agg", propsMapAgg, Some("""
      SELECT k AS key, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(json_extract_string(props, '$.' || k)::BIGINT) AS BIGINT) AS sum_v
      FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
      GROUP BY 1 ORDER BY 1""")),
    GQuery("distinct_users", distinctUsers, Some("""
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1 ORDER BY 1""")),
    // same oracle on purpose: the two-phase salted plan must count
    // exactly what the plain expand-shuffle distinct counts
    GQuery("distinct_users_salted", distinctUsersSalted, Some("""
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1 ORDER BY 1""")),
    // advisor-driven plan switch, same oracle as distinct_users on
    // purpose: the advisor may only change the shuffle shape, never the
    // answer — the hash gate enforces exactly that
    GQuery("distinct_users_autosalt", distinctUsersAutosalt, Some("""
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1 ORDER BY 1""")),
    GQuery("skew_advisor", skewAdvisor, Some("""
      WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
                 FROM events GROUP BY user_id),
           t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events)
      SELECT user_id, cnt,
             CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share,
             CAST((cnt * 32 + total - 1) // total AS BIGINT) AS salt_parts
      FROM c, t ORDER BY cnt DESC, user_id LIMIT 10""")),
    // exact count verified by DuckDB + in-engine 3σ bound on the HLL
    // estimate against that count — see approxDistinctUsersChecked
    GQuery("approx_distinct_users", approxDistinctUsersChecked, Some("""
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             TRUE AS approx_ok
      FROM events GROUP BY 1 ORDER BY 1""")),
    // exact top-k oracle on purpose: the sketch runs in its exact regime
    // (capacity 1000 >> 5 distinct types), so estimate = truth, hashable
    GQuery("approx_top_types", approxTopTypes, Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1 ORDER BY cnt DESC, event_type LIMIT 3""")),
    GQuery("ingest_counters", ingestCounters, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST(count(*) FILTER (WHERE user_id IS NOT NULL
                                     AND event_type IS NOT NULL
                                     AND ts IS NOT NULL) AS BIGINT) AS n_accepted,
             CAST(count(*) AS BIGINT)
               - CAST(count(*) FILTER (WHERE user_id IS NOT NULL
                                         AND event_type IS NOT NULL
                                         AND ts IS NOT NULL) AS BIGINT) AS n_rejected
      FROM events""")),
    GQuery("rollup_minute_type", rollupMinuteType, Some(s"""
      SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT $duckMinute AS window_start, event_type FROM events)
      GROUP BY ROLLUP (window_start, event_type)
      ORDER BY window_start ASC NULLS FIRST, event_type ASC NULLS FIRST""")),
    GQuery("cube_minute_type", cubeMinuteType, Some(s"""
      SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT $duckMinute AS window_start, event_type FROM events)
      GROUP BY CUBE (window_start, event_type)
      ORDER BY window_start ASC NULLS FIRST, event_type ASC NULLS FIRST""")),
    GQuery("minute_ntile", minuteNtile, Some(s"""
      SELECT window_start, event_type, cnt,
             CAST(ntile(4) OVER w AS INT) AS quartile,
             percent_rank() OVER w AS pct_rank
      FROM (SELECT $duckMinute AS window_start, event_type,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2)
      WINDOW w AS (PARTITION BY event_type ORDER BY cnt, window_start)
      ORDER BY event_type, window_start""")),
    GQuery("top_types_per_minute", topTypesPerMinute, Some(s"""
      SELECT window_start, event_type, cnt, rk FROM (
        SELECT $duckMinute AS window_start, event_type,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(row_number() OVER (
                 PARTITION BY date_trunc('minute', ts)
                 ORDER BY count(*) DESC, event_type) AS INT) AS rk
        FROM events GROUP BY date_trunc('minute', ts), event_type)
      WHERE rk <= 3 ORDER BY window_start, rk""")),
    GQuery("value_quantiles", valueQuantiles, Some("""
      SELECT event_type,
             ROUND(quantile_cont(value, 0.25), 6) AS p25,
             ROUND(quantile_cont(value, 0.5), 6) AS p50,
             ROUND(quantile_cont(value, 0.9), 6) AS p90
      FROM events GROUP BY 1 ORDER BY 1""")),
    GQuery("sliding_5m", sliding5m, Some("""
      SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
             CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT date_trunc('minute', ts) - i * INTERVAL 1 MINUTE AS ws
            FROM events, (SELECT unnest([0, 1, 2, 3, 4]) AS i) offsets)
      GROUP BY 1 ORDER BY 1""")),
    GQuery("session_windows", sessionWindows, Some("""
      WITH ev AS (
        -- ts::TIMESTAMP truncates TIMESTAMP_NS to micros, matching the
        -- engine's microsecond timestamps: a gap straddling exactly 30 s
        -- at nanosecond precision must split sessions identically
        SELECT user_id, ts::TIMESTAMP AS ts FROM events),
      marks AS (
        SELECT user_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            >= INTERVAL 30 SECOND
                    THEN 1 ELSE 0 END AS new_s
        FROM ev)
      SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
             CAST(sum(new_s) AS BIGINT) AS n_sessions,
             CAST(count(*) AS BIGINT) AS n_events
      FROM marks GROUP BY 1 ORDER BY 1""")),
    GQuery("sql_flagship", sqlFlagship, Some(s"""
      SELECT $duckMinute AS window_start, event_type,
             CAST(CASE WHEN count(*) <= 1000 THEN 1.0
                       ELSE count(*) / 1000.0 END AS DOUBLE) AS scaled_count
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),
    GQuery("minute_deltas", minuteDeltas, Some(s"""
      SELECT window_start, total_count,
             total_count - lag(total_count, 1) OVER (ORDER BY window_start) AS delta
      FROM (SELECT $duckMinute AS window_start,
                   CAST(count(*) AS BIGINT) AS total_count
            FROM events GROUP BY 1)
      ORDER BY window_start""")),
    GQuery("minute_deltas_by_type", minuteDeltasByType, Some(s"""
      SELECT window_start, event_type, cnt,
             cnt - lag(cnt, 1) OVER (PARTITION BY event_type
                                     ORDER BY window_start) AS delta
      FROM (SELECT $duckMinute AS window_start, event_type,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2)
      ORDER BY window_start, event_type""")),
    // group population verified by DuckDB + in-engine exact-rank-window
    // bound on each sketch estimate — see approxValueQuantilesChecked
    GQuery("approx_value_quantiles", approxValueQuantilesChecked, Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p90_ok
      FROM events GROUP BY 1 ORDER BY 1"""))
  )
}
