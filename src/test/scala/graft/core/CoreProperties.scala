package graft.core

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** ScalaCheck laws for the aggregation core (SURVEY.md §5.2). Each case
  * runs a real Spark job on a tiny DataFrame, so we cap cases per law.
  */
object CoreProperties extends Properties("graft.core") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eventGen: Gen[(Long, String)] = for {
    minute <- Gen.choose(0L, 5L)
    sec <- Gen.choose(0L, 59L)
    typ <- Gen.oneOf("a", "b", "c")
  } yield (minute * 60 + sec, typ)

  private val eventsGen: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(eventGen).map(_.take(60))

  private def df(rows: List[(Long, String)]) =
    rows.toDF("secs", "event_type")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .drop("secs")

  // A2 vs A3: per-minute sum over types equals the per-minute total.
  property("sum of per-type counts = per-minute total") = forAll(eventsGen) { rows =>
    val byType = WindowAgg.minuteTypeCounts(df(rows), "event_type")
      .groupBy("minute").agg(sum("cnt").as("s"))
      .select(unix_micros(col("minute")), col("s"))
      .as[(Long, Long)].collect().toMap
    val totals = WindowAgg.minuteTotals(df(rows))
      .select(unix_micros(col("minute")), col("total_count"))
      .as[(Long, Long)].collect().toMap
    byType == totals
  }

  // P6 law against the reference's piecewise definition
  // (spark_consumer.py:43-46).
  property("scaledCount = if cnt<=1000 then 1 else cnt/1000") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1L, 5000L)).map(_.take(40))) { cnts =>
      val got = cnts.toDF("cnt")
        .select(col("cnt"), WindowAgg.scaledCount(col("cnt")).as("s"))
        .as[(Long, Double)].collect()
      got.forall { case (c, s) =>
        s == (if (c <= 1000L) 1.0 else c.toDouble / 1000.0)
      }
    }

  // A4 law: retained == the model filter over the max minute
  // (analytical_server.py:48-61).
  property("retained keeps exactly the 3-minute horizon") = forAll(eventsGen) { rows =>
    val maxMinute = rows.map(_._1 / 60).max
    val expect = rows.filter { case (s, _) => s / 60 >= maxMinute - 3 }
      .map { case (s, t) => (s / 60 * 60000000L, t) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val got = WindowAgg.retained(df(rows))
      .select(unix_micros(col("minute")).as("us"), col("event_type"))
      .as[(Long, String)].collect().toList
      .groupBy(identity).view.mapValues(_.size).toMap
    got == expect
  }
}
