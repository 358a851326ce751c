package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.stream.{Pipeline, Sources}

/** Streaming throughput bench: rate source → full flagship pipeline
  * (JSON envelope encode → parse → watermark → 1-min window agg →
  * scaled_count) → noop streaming sink. Prints one JSON line with the
  * steady-state processed-rows/sec, comparable to the reference's design
  * target of ~100k emojis/s aggregate ingest (BASELINE.md;
  * `README.md:152-159`).
  *
  * Offered rate is set far above the target (default 2M rows/s) so the
  * measurement is pipeline-bound, not source-bound; the first batches are
  * excluded as warm-up.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rps = sys.env.getOrElse("SPARK_STREAM_RPS", "2000000").toLong
    // 45 s default: the first non-empty batch drains the rate source's
    // startup backlog (~4-12M rows at the default offered rate) and is
    // excluded as warm-up, so the window must fit it PLUS ≥2 steady
    // batches — a 20 s window reported 0 completed batches on slow starts
    val seconds = sys.env.getOrElse("SPARK_STREAM_SECONDS", "45").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val agg = Pipeline.flagshipFromWire(Sources.rateEnvelopes(spark, rps))
    val q = agg.writeStream
      .format("noop")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime("2 seconds")) // W4 parity trigger
      .start()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress.toSeq

    // exclude empty startup batches; if several real batches completed,
    // also drop the first (codegen warm-up) — with an unbounded rate
    // source, batches are large and few, so don't over-trim
    val nonEmpty = progress.filter(_.numInputRows > 0)
    val steady = if (nonEmpty.size >= 2) nonEmpty.tail else nonEmpty
    val rows = steady.map(_.numInputRows).sum
    val secs = steady.map(p => p.durationMs.get("triggerExecution").toDouble / 1000.0).sum
    val eps = if (secs > 0) rows / secs else 0.0
    // metric printed BEFORE stop: stopping mid-batch can surface an
    // InterruptedException from the state-store commit, which must not
    // eat the measurement
    println(
      s"""{"metric":"stream_events_per_sec","value":$eps,"unit":"events/sec","batches":${steady.size},"offered_rps":$rps}""")
    try q.stop() catch { case _: Exception => () }
    spark.stop()
  }
}
