package graft.core

import org.apache.spark.sql.types._

/** Canonical schemas for the engine.
  *
  * The reference's single base record is the emoji event — three nullable
  * string fields declared at `spark_consumer.py:13-17` and presence-validated
  * at `api_server.py:55-56`. We keep that exact wire schema and add the
  * parsed `event_time` downstream (SURVEY.md §1.1/§1.3).
  */
object Schemas {

  /** The reference wire record (`spark_consumer.py:13-17`). */
  final case class EmojiEvent(user_id: String, emoji_type: String, timestamp: String)

  /** Parsed form: `event_time` added by Ingest.parse (P3/P4). */
  final case class ParsedEvent(
      user_id: String,
      emoji_type: String,
      timestamp: String,
      event_time: java.sql.Timestamp)

  /** Wire schema as a StructType — the `from_json` target (P2). */
  val emojiEventSchema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = true),
    StructField("emoji_type", StringType, nullable = true),
    StructField("timestamp", StringType, nullable = true)))

  /** 10-emoji vocabulary (`client.py:29`, `locustfile.py:10`). */
  val emojiVocab: Seq[String] =
    Seq("👍", "❤️", "😂", "🎉", "😢",
        "🔥", "👏", "🏆", "😮", "💔")

  /** Event-type vocabulary of the driver's batch `events` table (TESTDATA). */
  val eventTypeVocab: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** `events.props` JSON payload schema (FIXTURES.md §2). */
  val propsSchema: StructType = StructType(Seq(StructField("k", LongType, nullable = true)))

  /** Retention horizon of the hand-rolled analytics engine
    * (`analytical_server.py:13`): 3 minutes. */
  val retentionMinutes: Int = 3

  /** Count-scaling threshold (`spark_consumer.py:43-46`). */
  val scalingThreshold: Long = 1000L
}
