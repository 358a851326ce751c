package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.core.Ingest

/** Streaming sinks — SURVEY.md §2.5 (K1-K3) + W3/W4/W9.
  *
  * The reference runs its flagship to a console sink in complete mode on a
  * 2 s processing-time trigger (`spark_consumer.py:49-53`); `pubsub.py`
  * replicates every record to all WebSocket clusters. These builders are
  * the Spark-native twins; everything returns a writer (or started query)
  * so callers own lifecycle and trigger choice.
  */
object Sinks {

  /** W4: the reference's 2 s micro-batch trigger (`spark_consumer.py:52`).
    * This is also the engine-side S3 twin — micro-batching is the
    * trigger's job, not a hand-rolled drain loop (`api_server.py:19-50`). */
  val referenceTrigger: Trigger = Trigger.ProcessingTime("2 seconds")

  /** K1: console sink, reference defaults (`spark_consumer.py:49-53`). */
  def console(
      df: DataFrame,
      mode: OutputMode = OutputMode.Complete(),
      trigger: Trigger = referenceTrigger): DataStreamWriter[Row] =
    df.writeStream.format("console").outputMode(mode).trigger(trigger)

  /** Memory sink (started): the test/serve surface — W7's read-your-ingest
    * behavior (`analytical_server.py:69-71`) falls out of querying this
    * table in update/complete mode, where the open window's partial counts
    * are already visible. */
  def memory(
      df: DataFrame,
      name: String,
      mode: OutputMode = OutputMode.Update()): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()

  /** K2: Kafka sink twin of the producer at `api_server.py:11-14,32-37` —
    * rows re-serialized to the JSON wire envelope. `.start()` needs the
    * kafka connector (not in this sandbox); the envelope serialization is
    * what unit tests exercise. */
  def kafkaWriter(
      df: DataFrame,
      bootstrapServers: String,
      topic: String = "emoji_topic"): DataStreamWriter[Row] =
    Ingest.toEnvelope(df).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)

  /** K3: broadcast fan-out — every micro-batch replicated to ALL
    * subscribers, no routing/filtering/keying, exactly the
    * replicate-to-all-clusters dataflow of `pubsub.py:15-29,98-103`. The
    * reference dispatches per message through one event loop; batch
    * granularity removes that ceiling for free (SURVEY.md §3.4). */
  def broadcast(
      df: DataFrame,
      subscribers: Seq[(Long, DataFrame) => Unit]): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      // persist once so N subscribers don't recompute the batch N times
      batch.persist()
      try subscribers.foreach(s => s(id, batch))
      finally { batch.unpersist(); () }
    }

  /** File sink: append-mode parquet with a mandatory checkpoint — the
    * durable variant of K1/K2 (with a watermark upstream, append emits
    * each window exactly once, so the files are the closed-window log). */
  def files(
      df: DataFrame,
      path: String,
      checkpointDir: String,
      format: String = "parquet"): DataStreamWriter[Row] =
    df.writeStream
      .format(format)
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())

  /** W9: graceful shutdown (`spark_consumer.py:8` + query stop). */
  def stopGracefully(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
  }
}
