package graft

import org.apache.spark.sql.SparkSession

import graft.core.Tables
import graft.ext.Dedup

/** Isolated connected-components A/B harness (round-5 verdict #1).
  *
  * The shipping bench times `dedup_groups` (star) and
  * `dedup_groups_minlabel` INSIDE a 78-query run, where run order decides
  * who pays the LSH pipeline's codegen warm-up — which is how round 4
  * recorded "star ~3× faster" and round 5's driver bench recorded the
  * exact opposite. This harness removes both confounds:
  *
  *  - ONE algorithm per JVM (`GRAFT_CC_ALGO=star|minlabel|hybrid`) — run
  *    it once per algorithm, fresh `sbt runMain` each;
  *  - the pair list is pre-materialized (eager localCheckpoint + count)
  *    BEFORE any timing, so reps measure the CC algorithm alone:
  *    orient/checkpoint, propagation rounds, label extraction, noop write;
  *  - rep 1 is reported but the summary median is over reps 2..n (rep 1
  *    carries the algorithm's own codegen warm-up — reported so the
  *    cold-start cost stays visible).
  *
  * `GRAFT_CC_PAIRS=portable|near|family:<k>` picks the `dedup_groups`
  * sample pairs (default), the full-corpus verified near-dup pairs, or a
  * self-generated k×-scaled dup-family CLIQUE edge set (ids replicated k
  * times off sf docs, every copy paired with every family member —
  * C(k,2)·families edges, the verified-pair topology at k-fold
  * duplication; family:30 ≈ 2.2M edges at sf0.1, well above the
  * driver-finish bound, so star and min-label get a distributed-regime
  * A/B too). Results (median + all reps + pair/label counts) print as
  * one JSON line; PERF_NOTES.md records the A/B table.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_CC_REPS", "5").toInt
    val algoName = sys.env.getOrElse("GRAFT_CC_ALGO", "star")
    val pairsName = sys.env.getOrElse("GRAFT_CC_PAIRS", "portable")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf._1, Tables.nanosAsLongConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rawPairs = pairsName match {
      case "near" => Dedup.nearDupPairs(Tables.documents(spark, sfDir), 0.7)
        .select("a_id", "b_id")
      case f if f.startsWith("family:") =>
        import org.apache.spark.sql.functions._
        val k = f.stripPrefix("family:").toInt
        val base = Tables.documents(spark, sfDir).select("doc_id")
        val n = base.count()
        val fams = base
          .withColumn("__i", explode(sequence(lit(0), lit(k - 1))))
          .select((col("doc_id") + col("__i") * lit(n)).as("doc_id"),
            col("doc_id").as("__f"))
        fams.as("x").join(fams.as("y"),
            col("x.__f") === col("y.__f") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      case _ => queries.DedupQueries.portablePairsFor(spark, sfDir)
    }
    val pairs = rawPairs.localCheckpoint() // eager: LSH runs here, untimed
    val nPairs = pairs.count()

    // star/minlabel force the DISTRIBUTED paths (driver-finish off) —
    // that's the A/B the default choice rests on; "hybrid" measures the
    // shipped defaults (driver union-find below the edge bound)
    val checkEvery = sys.env.getOrElse("GRAFT_CC_CHECKEVERY", "3").toInt
    // GRAFT_CC_BOUND (hybrid only): override DriverFinishEdges — raise it
    // above the edge count to force the driver union-find on edge sets
    // beyond the shipping bound, the knob behind the crossing-point A/B
    // that justifies where the bound sits (round-6 verdict #9)
    val bound = sys.env.get("GRAFT_CC_BOUND").map(_.toLong)
      .getOrElse(Dedup.DriverFinishEdges)
    val run: () => Unit = algoName match {
      case "minlabel" => () =>
        exec(Dedup.connectedComponents(pairs, algo = Dedup.CcAlgo.MinLabel,
          checkEvery = checkEvery, driverFinishEdges = 0L))
      case "hybrid" => () =>
        exec(Dedup.connectedComponents(pairs, driverFinishEdges = bound))
      case _ => () =>
        exec(Dedup.connectedComponents(pairs, algo = Dedup.CcAlgo.StarContraction,
          checkEvery = checkEvery, driverFinishEdges = 0L))
    }
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }
    val warm = times.drop(1).sorted
    val median = if (warm.nonEmpty) warm(warm.size / 2) else times.head
    val ts = times.map(t => f"$t%.3f").mkString("[", ",", "]")
    println(s"""{"algo":"$algoName","pairs":"$pairsName","n_pairs":$nPairs,"median_warm":${f"$median%.3f"},"reps":$ts,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Labels frames returned by CC keep their backing checkpoints cached
    * (the one-frame-per-call residue); free every reachable one after
    * the noop write so reps measure the algorithm, not accumulating
    * storage pressure. */
  private def exec(labels: org.apache.spark.sql.DataFrame): Unit = {
    labels.write.format("noop").mode("overwrite").save()
    org.apache.spark.sql.GraftColumnBridge.unpersistReachableLocalCheckpoints(labels)
  }
}
