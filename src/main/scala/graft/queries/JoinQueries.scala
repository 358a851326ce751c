package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Relational join queries over the star schema (SURVEY.md §2.6: the
  * reference has no joins, but the extension inventory the driver's
  * testdata anticipates does).
  *
  * Join strategy is chosen the way a 100 TB plan must be:
  *  - dimensions (customer/nation/region) are `broadcast()` — no shuffle
  *    of the fact side for those joins;
  *  - fact-to-fact (lineitem ⋈ orders) is pinned to sort-merge with a
  *    `merge` hint: at real scale neither side broadcasts, and pinning
  *    keeps the measured plan the one that survives scale-up (local AQE
  *    would otherwise pick a broadcast at sf0.01 and the bench would
  *    measure a plan that can't exist at 100 TB).
  *
  * Money arithmetic follows QueryDef.decimalNote: exact DECIMAL sums,
  * DOUBLE only at the very end — bit-stable under any execution order.
  */
object JoinQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  /** Broadcast dim join: order revenue per market segment. */
  def ordersBySegment(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("c_mktsegment")

  /** Sort-merge fact join: lineitem revenue per order priority. */
  def revenueByPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")

  /** 4-way star: lineitem ⋈ orders (merge) ⋈ customer ⋈ nation (both
    * broadcast): revenue per nation, open orders only. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") =!= "F")
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy("n_name")

  /** Left anti join: customers with no completed ('F') order — the
    * filter rides the anti join's build side, and the anti join shuffles
    * on custkey like the plan would at scale. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  /** Left semi join — the anti join's positive twin: customers with at
    * least one urgent order, counted per segment. Semi joins matter at
    * scale because the probe side never materializes order columns —
    * the build side reduces to a custkey existence set. */
  def customersWithUrgentOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  /** Set ops over (event_type, hour) activity pairs of two user cohorts:
    * EXCEPT (in cohort 0's activity, not cohort 1's) and INTERSECT counts
    * — DISTINCT set semantics on both engines. */
  def eventTypeSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def pairsOf(bucket: Int) =
      ev.filter(pmod(col("user_id"), lit(4)) === bucket)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
    val except = pairsOf(0).except(pairsOf(1)).withColumn("op", lit("except"))
    val intersect = pairsOf(0).intersect(pairsOf(1)).withColumn("op", lit("intersect"))
    except.union(intersect)
      .groupBy("op").agg(count(lit(1)).as("n_pairs"))
      .orderBy("op")
  }

  val queries: Seq[GQuery] = Seq(
    GQuery("join_orders_segment", ordersBySegment, Some("""
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY 1""")),
    GQuery("join_revenue_priority", revenueByPriority, Some("""
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY 1""")),
    GQuery("join_revenue_nation", revenueByNation, Some("""
      SELECT n_name,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderstatus <> 'F'
      GROUP BY 1 ORDER BY 1""")),
    GQuery("join_anti_customers", customersWithoutOrders, Some("""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      GROUP BY 1 ORDER BY 1""")),
    GQuery("join_semi_customers", customersWithUrgentOrders, Some("""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
      GROUP BY 1 ORDER BY 1""")),
    GQuery("set_ops_types", eventTypeSetOps, Some("""
      WITH b0 AS (SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS h
                  FROM events WHERE user_id % 4 = 0),
           b1 AS (SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS h
                  FROM events WHERE user_id % 4 = 1),
           u AS (
             SELECT 'except' AS op FROM (SELECT * FROM b0 EXCEPT SELECT * FROM b1)
             UNION ALL
             SELECT 'intersect' AS op FROM (SELECT * FROM b0 INTERSECT SELECT * FROM b1))
      SELECT op, CAST(count(*) AS BIGINT) AS n_pairs
      FROM u GROUP BY 1 ORDER BY 1"""))
  )
}
