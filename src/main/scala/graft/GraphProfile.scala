package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Similarity

/** Graph-lifecycle measurement harness (round 17 — r16 verdict #2;
  * extended round 18 — r17 verdict #2): phase-level wall times for
  * build-base / upsert walk / compact rebuild / serve walk, plus the
  * SCHEDULING-FLOOR decomposition the bar adjudication needs:
  *
  *  - a SparkListener logs every job of one full compact lifecycle
  *    (build → upsert → compact, the exact `ann_graph_compact` shape) —
  *    job count, per-job wall, Σ job wall vs end-to-end wall (the gap
  *    is driver planning/analysis time);
  *  - a floor probe times a MINIMAL graph-stage-shaped pipeline (one
  *    2k-row exchange + aggregation + eager localCheckpoint, the unit
  *    every NN-Descent stage and walk stage reduces to) — its median
  *    is the per-job scheduling floor on this box at local[32];
  *  - the closing line prices floor × job-count against the measured
  *    lifecycle, which is the honest test of "is the residual
  *    scheduling, not data" (r17 verdict: either cut exchanges or
  *    prove the floor and re-set the bar).
  *
  * The round-17 walk prototype variants (walkLite/walkEntryOnly/
  * walkCkpt) were DELETED this round (r17 ADVICE #5): their A/B
  * verdicts are recorded in PERF_NOTES §2 and keeping uncalled
  * near-copies of the production walk in src/main invited drift.
  * Not part of the registry. */
object GraphProfile {

  /** Job-level wall clock from the scheduler's own events — start/end
    * per job id; stages/tasks totals ride along for the density note. */
  private final class JobLog extends org.apache.spark.scheduler.SparkListener {
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val walls = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      starts.put(e.jobId, e.time)
    override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val s = starts.get(e.jobId)
      if (s > 0) walls.add((e.time - s) / 1e3)
    }
    override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(e.stageInfo.numTasks.toLong)
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf._1, Tables.nanosAsLongConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the registry lifecycle's exact geometry (SimilarityQueries)
    val GraphK = 14; val GraphRounds = 2; val GraphBeam = 20; val GraphHops = 2
    val UpsertSplit = 400L
    val path = "/tmp/graft-profile/graph"
    def wipe(): Unit = {
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
      ()
    }
    def t(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $label%-28s $s%7.2f s"); s
    }
    val e = Tables.embeddings(spark, dir)
    for (i <- 1 to iters) {
      wipe()
      println(s"=== iter $i ===")
      t("build-base") {
        Similarity.buildGraphIndex(e.filter(col("vec_id") < UpsertSplit), path,
          graphK = GraphK, graphRounds = GraphRounds)
      }
      t("upsert-walk") {
        Similarity.upsertGraphIndex(spark, path,
          e.filter(col("vec_id") >= UpsertSplit),
          k = GraphK, beam = GraphBeam, hops = GraphHops)
      }
      t("compact-rebuild") {
        Similarity.compactGraphIndex(spark, path,
          graphK = GraphK, graphRounds = GraphRounds)
          .write.format("noop").mode("overwrite").save()
      }
      // the walk alone: the whole serve against the compacted tier
      val g = spark.read.parquet(s"$path/graph_edges")
      val v = spark.read.parquet(s"$path/vectors")
      val probes = e.filter(col("vec_id") >= UpsertSplit)
      t("walk-only (1600 probes)") {
        Similarity.graphSearchOn(g, v, probes, k = GraphK,
          beam = GraphBeam, hops = GraphHops)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ---- SCHEDULING-FLOOR DECOMPOSITION (round 18) ----
    // 1. per-job floor: the minimal graph-stage shape — one 2k-row
    //    exchange + aggregation + eager localCheckpoint. 20 warm reps,
    //    median. Everything an NN-Descent round or walk stage does
    //    reduces to 1-3 of these units; their data volume at fixture
    //    scale is trivial, so the unit's cost IS scheduling (DAG
    //    submit + AQE replan + 32-slot task round + checkpoint job).
    val floorReps = 20
    val floorTimes = (1 to floorReps).map { r =>
      val t0 = System.nanoTime()
      val df = spark.range(2000)
        .select((col("id") % 97).as("k"), col("id").as("v"))
        .groupBy("k").agg(sum("v").as("s"))
        .localCheckpoint(true)
      df.write.format("noop").mode("overwrite").save()
      org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(df)
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val floor = floorTimes(floorReps / 2)
    println(f"[profile] stage-floor (exchange+agg+ckpt, 2k rows) median " +
      f"$floor%.3f s over $floorReps reps (min ${floorTimes.head}%.3f, " +
      f"max ${floorTimes.last}%.3f)")

    // 2. job log of ONE warm full lifecycle (the ann_graph_compact
    //    shape): job count × per-job walls vs end-to-end wall, with a
    //    per-phase job-count split so the floor table names where the
    //    jobs live.
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    wipe()
    def jobsNow(): Int = { Thread.sleep(300); log.walls.size }
    val t0 = System.nanoTime()
    Similarity.buildGraphIndex(e.filter(col("vec_id") < UpsertSplit), path,
      graphK = GraphK, graphRounds = GraphRounds)
    val jBuild = jobsNow()
    Similarity.upsertGraphIndex(spark, path,
      e.filter(col("vec_id") >= UpsertSplit),
      k = GraphK, beam = GraphBeam, hops = GraphHops)
    val jUpsert = jobsNow() - jBuild
    Similarity.compactGraphIndex(spark, path,
      graphK = GraphK, graphRounds = GraphRounds)
      .select(col("vec_id"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
      // the registry query's dumpSorted shape: one-partition sort,
      // single execution (orderBy's range sampling re-runs the child)
      .repartition(1)
      .sortWithinPartitions(col("vec_id"), col("cos_sim").desc,
        col("neighbor_id"))
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    val jCompact = jobsNow() - jBuild - jUpsert
    println(s"[profile] phase job counts: build $jBuild, upsert $jUpsert, " +
      s"compact+serve $jCompact")
    // listener events are posted async (listenerBus is spark-private) —
    // a short sleep drains the tail of the queue before reading
    Thread.sleep(1000)
    spark.sparkContext.removeSparkListener(log)
    import scala.jdk.CollectionConverters._
    val jw = log.walls.asScala.toSeq.sorted
    val jobSum = jw.sum
    println(f"[profile] lifecycle decomposition: wall $wall%.2f s, " +
      f"jobs ${jw.length}, stages ${log.stages.get}, tasks ${log.tasks.get}")
    println(f"[profile] sum(job wall) $jobSum%.2f s " +
      f"(driver gap ${wall - jobSum}%.2f s = planning/analysis); " +
      f"job wall p50 ${jw(jw.length / 2)}%.3f s, " +
      f"p90 ${jw((jw.length * 9) / 10)}%.3f s, max ${jw.last}%.3f s")
    println(f"[profile] floor x jobs = ${floor * jw.length}%.2f s vs " +
      f"measured wall $wall%.2f s (ratio ${wall / (floor * jw.length)}%.2f)")
    spark.stop()
  }
}
