package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Similarity

/** Graph-lifecycle measurement harness (round 17 — r16 verdict #2):
  * phase-level wall times for build-base / upsert walk / compact
  * rebuild / serve walk, several iterations in one JVM so warm numbers
  * are attributable. The round-17 walk/build trims were A/B'd here
  * (prototype variants below kept as the measured-alternative record);
  * PERF_NOTES carries the numbers. Not part of the registry. */
object GraphProfile {
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

    val GraphK = 14; val GraphRounds = 2; val GraphBeam = 20; val GraphHops = 2
    val UpsertSplit = 400L
    val path = "/tmp/graft-profile/graph"
    def t(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $label%-28s $s%7.2f s"); s
    }
    for (i <- 1 to iters) {
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
      val e = Tables.embeddings(spark, dir)
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
      // the walk alone, decomposed: entry / hops / final re-rank are one
      // lazy plan — time the whole serve against the compacted tier
      val g = spark.read.parquet(s"$path/graph_edges")
      val v = spark.read.parquet(s"$path/vectors")
      val probes = e.filter(col("vec_id") >= UpsertSplit)
      t("walk-only (1600 probes)") {
        Similarity.graphSearchOn(g, v, probes, k = GraphK,
          beam = GraphBeam, hops = GraphHops)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }

  /** Carried-score walk: ranked stages explode (pos, node, score);
    * best-seen rides scores; final = ONE dedup-heap aggregation (no
    * distinct exchange, no vector/probe joins, no cosine recompute).
    * Sound because the walk's score is a pure function of
    * (probe, node). */
  def walkLite(graph: org.apache.spark.sql.DataFrame,
               corpus: org.apache.spark.sql.DataFrame,
               probes: org.apache.spark.sql.DataFrame,
               k: Int, beam: Int, hops: Int,
               perHopDistinct: Boolean, ckpt: Boolean): org.apache.spark.sql.DataFrame = {
    val idCol = "vec_id"; val vecCol = "embedding"
    import graft.functions.BoundedTopK
    val cosine = graft.ext.Similarity.cosine _
    val g = graph.select(col(idCol).as("__src"), col("neighbor_id").as("__dst"))
    val v = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val p = probes.select(col(idCol).as("probe_id"),
      transform(col(vecCol), x => x.cast("double")).as("__pv"))
    val kk = math.max(k, beam)
    def topOf(cands: org.apache.spark.sql.DataFrame, n: Int) = cands
      .join(v.select(col("__id").as("node"), col("__v")), "node")
      .join(broadcast(p), "probe_id")
      .filter(col("node") =!= col("probe_id"))
      .groupBy("probe_id")
      .agg(BoundedTopK.topkDedup(
        cosine(col("__pv"), col("__v")), col("node"), n).as("__nn"))
      .select(col("probe_id"), posexplode(col("__nn")).as(Seq("__pos", "__e")))
      .select(col("probe_id"), col("__pos"),
        col("__e.id").as("node"), col("__e.score").as("__s"))
    val layer = v.filter(pmod(col("__id"), lit(4)) === 0)
      .select(col("__id").as("node"))
    val gSym = g.unionByName(
      g.select(col("__dst").as("__src"), col("__src").as("__dst")))
    def expandVia(frontier: org.apache.spark.sql.DataFrame) = {
      val u = frontier.unionByName(
        frontier.join(gSym, frontier("node") === gSym("__src"))
          .select(col("probe_id"), col("__dst").as("node")))
      if (perHopDistinct) u.distinct() else u
    }
    var ranked = topOf(p.select(col("probe_id")).crossJoin(layer), kk)
    if (ckpt) ranked = ranked.localCheckpoint(true)
    var best = ranked.select("probe_id", "node", "__s")
    var frontier = ranked.select("probe_id", "node")
    for (_ <- 1 to hops) {
      ranked = topOf(expandVia(frontier), kk)
      if (ckpt) ranked = ranked.localCheckpoint(true)
      best = best.unionByName(ranked.select("probe_id", "node", "__s"))
      frontier = ranked.filter(col("__pos") < beam).select("probe_id", "node")
    }
    best.groupBy("probe_id")
      .agg(BoundedTopK.topkDedup(col("__s"), col("node"), k).as("__nn"))
      .select(col("probe_id"), explode(col("__nn")).as("__e"))
      .select(col("probe_id"), col("__e.id").as("neighbor_id"),
        col("__e.score").as("cos_sim"))
  }

  /** Just the entry stage: top-kk of the stride layer per probe. */
  def walkEntryOnly(graph: org.apache.spark.sql.DataFrame,
                    corpus: org.apache.spark.sql.DataFrame,
                    probes: org.apache.spark.sql.DataFrame,
                    k: Int, beam: Int): org.apache.spark.sql.DataFrame = {
    val idCol = "vec_id"; val vecCol = "embedding"
    import graft.functions.BoundedTopK
    val cosine = graft.ext.Similarity.cosine _
    val v = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val p = probes.select(col(idCol).as("probe_id"),
      transform(col(vecCol), x => x.cast("double")).as("__pv"))
    val kk = math.max(k, beam)
    val layer = v.filter(pmod(col("__id"), lit(4)) === 0)
      .select(col("__id").as("node"))
    p.select(col("probe_id")).crossJoin(layer)
      .join(v.select(col("__id").as("node"), col("__v")), "node")
      .join(broadcast(p), "probe_id")
      .filter(col("node") =!= col("probe_id"))
      .groupBy("probe_id")
      .agg(BoundedTopK.topk(cosine(col("__pv"), col("__v")), col("node"), kk).as("__nn"))
      .select(col("probe_id"),
        posexplode(col("__nn").getField("id")).as(Seq("__pos", "node")))
  }

  /** graphSearchOn variant: eager localCheckpoint per ranked stage —
    * the lineage-truncation experiment (each stage computed exactly
    * once, AQE replanning bounded per stage). Output-identical. */
  def walkCkpt(graph: org.apache.spark.sql.DataFrame,
               corpus: org.apache.spark.sql.DataFrame,
               probes: org.apache.spark.sql.DataFrame,
               k: Int, beam: Int, hops: Int): org.apache.spark.sql.DataFrame = {
    val idCol = "vec_id"; val vecCol = "embedding"
    import graft.functions.BoundedTopK
    val cosine = graft.ext.Similarity.cosine _
    val g = graph.select(col(idCol).as("__src"), col("neighbor_id").as("__dst"))
    val v = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val p = probes.select(col(idCol).as("probe_id"),
      transform(col(vecCol), x => x.cast("double")).as("__pv"))
    val kk = math.max(k, beam)
    def topOf(cands: org.apache.spark.sql.DataFrame, n: Int) = cands
      .join(v.select(col("__id").as("node"), col("__v")), "node")
      .join(broadcast(p), "probe_id")
      .filter(col("node") =!= col("probe_id"))
      .groupBy("probe_id")
      .agg(BoundedTopK.topk(cosine(col("__pv"), col("__v")), col("node"), n).as("__nn"))
      .select(col("probe_id"),
        posexplode(col("__nn").getField("id")).as(Seq("__pos", "node")))
    val layer = v.filter(pmod(col("__id"), lit(4)) === 0)
      .select(col("__id").as("node"))
    val gSym = g.unionByName(
      g.select(col("__dst").as("__src"), col("__src").as("__dst")))
    def expandVia(frontier: org.apache.spark.sql.DataFrame) =
      frontier.unionByName(
          frontier.join(gSym, frontier("node") === gSym("__src"))
            .select(col("probe_id"), col("__dst").as("node")))
        .distinct()
    var ranked = topOf(p.select(col("probe_id")).crossJoin(layer), kk)
      .localCheckpoint(true)
    var best = ranked.select("probe_id", "node")
    var frontier = ranked.select("probe_id", "node")
    for (_ <- 1 to hops) {
      ranked = topOf(expandVia(frontier), kk).localCheckpoint(true)
      best = best.unionByName(ranked.select("probe_id", "node"))
      frontier = ranked.filter(col("__pos") < beam).select("probe_id", "node")
    }
    best.distinct()
      .join(v.select(col("__id").as("node"), col("__v")), "node")
      .join(broadcast(p), "probe_id")
      .groupBy("probe_id")
      .agg(BoundedTopK.topk(cosine(col("__pv"), col("__v")), col("node"), k).as("__nn"))
      .select(col("probe_id"), explode(col("__nn")).as("__e"))
      .select(col("probe_id"), col("__e.id").as("neighbor_id"),
        col("__e.score").as("cos_sim"))
  }
}
