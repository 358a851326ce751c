package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.Tables

/** Plan-capture tool (round 18, guide §1: ".explain(\"formatted\") for
  * every declared query"): writes each named query's formatted physical
  * plan to `<outDir>/<name>.txt` without executing it.
  *
  * Usage: runMain graft.PlanDump <outDir> [q1,q2,... | all]
  *
  * Notes:
  *  - `spark.sql.maxMetadataStringLength` is raised so PushedFilters /
  *    ReadSchema in scan nodes are not elided at 100 chars;
  *  - plans are the PRE-EXECUTION shapes (`AdaptiveSparkPlan
  *    isFinalPlan=false` where AQE applies) — Exchange counts, join
  *    strategies and scan pushdown are all decided here; AQE can only
  *    coalesce/convert at runtime;
  *  - queries whose construction itself RUNS jobs (tier builds, replay
  *    harnesses) still only pay their construction; the returned frame
  *    is what gets explained, never executed.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: PlanDump <outDir> [q1,q2,...|all]")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf._1, Tables.nanosAsLongConf._2)
      .config("spark.sql.maxMetadataStringLength", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names: Seq[String] =
      if (args.length < 2 || args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[plandump] no such query: $n")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.write(outDir.resolve(s"$n.txt"),
              txt.getBytes(StandardCharsets.UTF_8))
            println(s"[plandump] $n -> ${outDir.resolve(s"$n.txt")}")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
