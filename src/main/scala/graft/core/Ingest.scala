package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest / envelope operators — SURVEY.md §2.1-§2.2 (S1, P1-P4).
  *
  * The reference ingests a JSON envelope `{user_id, emoji_type, timestamp}`
  * over Kafka and parses it in three places with slightly different
  * leniency (`api_server.py:52-66`, `spark_consumer.py:27-35`,
  * `analytical_server.py:22-27`). We centralize that as pure
  * `DataFrame => DataFrame` transforms so the same code path serves batch
  * (parquet) and streaming (Kafka `value` bytes).
  *
  * All expressions here are built-in Catalyst functions — codegen'd, no
  * UDFs — so whole-stage codegen spans the parse (SURVEY.md §2.7).
  */
object Ingest {

  /** Timestamp formats the producers actually emit (FIXTURES.md §1):
    *  - python `datetime.now().isoformat()` → `2024-11-19T12:34:56.789123`
    *  - JS `new Date().toISOString()`       → `2024-11-19T12:34:56.789Z`
    */
  private val isoMicros = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
  private val isoMillisZ = "yyyy-MM-dd'T'HH:mm:ss.SSSX"

  /** P3+P4: lenient multi-format ISO-8601 parse (`spark_consumer.py:32-35`,
    * `analytical_server.py:23-27`) via a `try_to_timestamp` coalesce chain.
    *
    * The `fallback` is what an unparsable string becomes. Batch queries use
    * the default `null` so results stay deterministic (the GQuery contract);
    * the streaming pipeline passes [[processingTimeFallback]] to reproduce
    * the reference's W8 wall-clock behavior (`analytical_server.py:26-27`).
    */
  def lenientTimestamp(
      ts: Column,
      fallback: Column = lit(null).cast("timestamp")): Column =
    coalesce(
      try_to_timestamp(ts, lit(isoMicros)),
      try_to_timestamp(ts, lit(isoMillisZ)),
      try_to_timestamp(ts), // default ISO parser, covers second granularity
      fallback)

  /** W8: unparsable event time → wall clock (`analytical_server.py:26-27`).
    * Nondeterministic by design — streaming path only, never in a batch
    * oracle query. */
  def processingTimeFallback: Column = current_timestamp()

  /** P1+P2: Kafka `value: binary` → envelope columns, via `json_tuple`.
    *
    * `json_tuple` (a Generate) rather than `from_json` (a scalar
    * expression), deliberately: every envelope field is a string
    * ([[Schemas.emojiEventSchema]]) so the untyped extraction is loss-free,
    * and a Generate is a hard materialization point — downstream
    * validation predicates stay on its output attributes. With the
    * `from_json` form, predicate pushdown substituted the parse into every
    * filter conjunct and coalesce branch (where conditional evaluation
    * also defeats codegen subexpression elimination): the measured plan
    * parsed each row's JSON ~7× and ran 3× slower at sf0.1.
    */
  def parseEnvelope(
      raw: DataFrame,
      valueCol: String = "value",
      tsFallback: Column = lit(null).cast("timestamp")): DataFrame =
    raw
      .select(json_tuple(col(valueCol).cast("string"),
        "user_id", "emoji_type", "timestamp").as(Seq("user_id", "emoji_type", "timestamp")))
      .withColumn("event_time", lenientTimestamp(col("timestamp"), tsFallback))

  /** S1 validation: presence of all three fields (`api_server.py:55-56`).
    * Returns (valid, rejected) — the reject path is the 400 side output.
    */
  def validate(parsed: DataFrame): (DataFrame, DataFrame) = {
    val ok = col("user_id").isNotNull && col("emoji_type").isNotNull &&
      col("timestamp").isNotNull
    (parsed.filter(ok), parsed.filter(!ok))
  }

  /** Serialize back to the wire envelope (Kafka sink K2 / SSE relay
    * shape). Accepts either the raw wire schema (string `timestamp`) or
    * the parsed pipeline output (`event_time` only) — the parsed form is
    * re-serialized to the producers' ISO-micros format. */
  def toEnvelope(df: DataFrame): DataFrame = {
    val ts =
      if (df.columns.contains("timestamp")) col("timestamp")
      else date_format(col("event_time"), isoMicros).as("timestamp")
    df.select(to_json(struct(col("user_id"), col("emoji_type"), ts.as("timestamp"))).as("value"))
  }
}
