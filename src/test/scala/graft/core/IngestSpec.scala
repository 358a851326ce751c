package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** P1-P4 + S1 (SURVEY.md §2.1-§2.2): envelope parse, lenient timestamp
  * formats actually emitted by the reference's producers (`client.py:50,111`,
  * `templates/index.html:203`, `emojitest.py:16`), validation split. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def micros(ts: String): Option[Long] =
    Seq(ts).toDF("t")
      .select(unix_micros(Ingest.lenientTimestamp(col("t"))).as("us"))
      .collect()(0) match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getLong(0))
      }

  test("P3: parses python isoformat with microseconds") {
    micros("2024-11-19T12:34:56.789123") shouldBe Some(1732019696789123L)
  }

  test("P3: parses JS toISOString with millis + Z") {
    micros("2024-11-19T12:34:56.789Z") shouldBe Some(1732019696789000L)
  }

  test("P3: parses second-granularity ISO") {
    micros("2024-11-19T12:34:56") shouldBe Some(1732019696000000L)
  }

  test("P4: unparsable timestamp -> null under the deterministic batch default") {
    micros("not-a-timestamp") shouldBe None
    micros("") shouldBe None
  }

  test("W8: unparsable timestamp -> wall clock when processingTimeFallback is passed") {
    val r = Seq("garbage").toDF("t")
      .select(Ingest.lenientTimestamp(col("t"), Ingest.processingTimeFallback).as("p"))
      .collect()(0)
    r.isNullAt(0) shouldBe false
  }

  test("P1+P2: parseEnvelope extracts the three wire fields and event_time") {
    val wire = Seq("""{"user_id":"u1","emoji_type":"👍","timestamp":"2024-11-19T12:34:56.789123"}""")
      .toDF("value")
    val out = Ingest.parseEnvelope(wire).collect()(0)
    out.getAs[String]("user_id") shouldBe "u1"
    out.getAs[String]("emoji_type") shouldBe "👍"
    out.getAs[java.sql.Timestamp]("event_time") should not be null
  }

  test("S1: validate splits rows missing any of the three fields to the reject side") {
    val wire = Seq(
      """{"user_id":"u1","emoji_type":"👍","timestamp":"2024-11-19T12:34:56.789123"}""",
      """{"user_id":"u2","timestamp":"2024-11-19T12:34:56.789123"}""",
      """{"emoji_type":"❤️","timestamp":"2024-11-19T12:34:56.789123"}""",
      "this is not json at all"
    ).toDF("value")
    val (valid, rejected) = Ingest.validate(Ingest.parseEnvelope(wire))
    valid.count() shouldBe 1L
    rejected.count() shouldBe 3L
    valid.collect()(0).getAs[String]("user_id") shouldBe "u1"
  }

  test("K2: toEnvelope serializes the parsed pipeline shape (event_time, no timestamp)") {
    val parsed = Seq(("u1", "👍", java.sql.Timestamp.from(
      java.time.Instant.parse("2024-11-19T12:34:56.789123Z"))))
      .toDF("user_id", "emoji_type", "event_time")
    val round = Ingest.parseEnvelope(Ingest.toEnvelope(parsed)).collect()(0)
    round.getAs[String]("user_id") shouldBe "u1"
    round.getAs[String]("timestamp") shouldBe "2024-11-19T12:34:56.789123"
  }

  test("K2: toEnvelope/parseEnvelope roundtrip preserves the wire fields") {
    val src = Seq(("u9", "🔥", "2024-11-19T12:34:56.789123"))
      .toDF("user_id", "emoji_type", "timestamp")
    val round = Ingest.parseEnvelope(Ingest.toEnvelope(src)).collect()(0)
    round.getAs[String]("user_id") shouldBe "u9"
    round.getAs[String]("emoji_type") shouldBe "🔥"
    round.getAs[String]("timestamp") shouldBe "2024-11-19T12:34:56.789123"
  }
}
