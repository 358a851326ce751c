package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's built-in join strategies don't
  * express directly: as-of join and bounded range join. Both are
  * re-expressed as shapes Catalyst executes well — a single
  * partition-sort window pass and a bucketed equi-join — instead of the
  * per-row point lookup / inequality nested loop a naive translation
  * would produce. (The reference has no joins at all — SURVEY.md §2.6 —
  * these extend the engine the same way the dedup/similarity families
  * do.)
  */
object Temporal {

  /** AS-OF JOIN: for every left row, the single most recent right row
    * with `right.ts <= left.ts` on the same keys (inclusive, matching
    * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`).
    *
    * Execution shape: tag both sides, UNION, and take a running
    * `last(_, ignoreNulls)` over one window partitioned by the keys and
    * ordered by (ts, side) — right rows sort before left rows at equal
    * timestamps, which is exactly the inclusive bound. Cost is ONE
    * shuffle + sort of |L|+|R| rows on (keys, ts): the sort-merge-join
    * shape. The naive forms this replaces — a per-left-row MAX subquery
    * (re-scans R per row) or an inequality theta-join (no equi-keys for
    * the hash/sort-merge planner, falls back to nested loop) — both
    * collapse at 100 TB.
    *
    * Right rows must be unique per (keys, ts) — pre-aggregate ties (the
    * query layer uses max(event_id)) or the "most recent" row is
    * ambiguous. Output: all left columns, plus the matched right
    * payload columns verbatim and the matched right timestamp as
    * `__asof_ts`; unmatched left rows are dropped when `inner`, kept
    * with null payload otherwise.
    *
    * `toleranceUs` bounds the staleness of a match: a right row older
    * than `left.ts - tolerance` no longer qualifies (trade-data
    * semantics: a quote can't be hours stale). Applied as a post-window
    * null-out — the window already found the newest candidate, so if
    * THAT one is too old, every older one is too.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, inner: Boolean = true,
               toleranceUs: Option[Long] = None): DataFrame = {
    val payload = right.columns.toSeq.diff(keys :+ tsCol)
    val leftOnly = left.columns.toSeq.diff(keys :+ tsCol)
    // a shared non-key column would be silently REPLACED by the
    // null-padding below — refuse instead of corrupting
    val clash = payload.intersect(leftOnly)
    require(clash.isEmpty,
      s"asofJoin: rename columns shared by both sides first: ${clash.mkString(", ")}")
    val rTs = "__asof_ts"
    val l = left
      .withColumn("__side", lit(1))
      .withColumn(rTs, lit(null).cast(right.schema(tsCol).dataType))
      .withColumns(payload.map(c => c -> lit(null).cast(right.schema(c).dataType)).toMap)
    val r = right
      .withColumn("__side", lit(0))
      .withColumn(rTs, col(tsCol))
      .withColumns(leftOnly.map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
    val cols = (keys :+ tsCol :+ "__side" :+ rTs) ++ leftOnly ++ payload
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.select(cols.map(col): _*)
      .unionByName(r.select(cols.map(col): _*))
      .withColumns((rTs +: payload).map(c => c -> last(col(c), ignoreNulls = true).over(w)).toMap)
      .filter(col("__side") === 1)
      .drop("__side")
    val joined = toleranceUs.fold(matched) { tol =>
      val fresh = unix_micros(col(tsCol)) - unix_micros(col(rTs)) <= tol
      matched.withColumns(
        (rTs +: payload).map(c => c -> when(fresh, col(c))).toMap)
    }
    if (inner) joined.filter(col(rTs).isNotNull) else joined
  }

  /** Bounded RANGE JOIN: all (left, right) pairs on equal keys with
    * `|left.ts - right.ts| <= maxDeltaUs` (timestamps compared at
    * microsecond precision).
    *
    * Execution shape: both sides bucket their timestamp by the range
    * width; a pair within the range is at most one bucket apart, so the
    * left side EXPLODES to its bucket ± 1 and the join becomes a plain
    * equi-join on (keys, bucket) with the exact |Δts| predicate as a
    * cheap post-filter. A right row's own bucket is unique, so no pair
    * can be emitted twice. Cost: 3× the left row count through one
    * hash join — vs the inequality theta-join's nested loop, which is
    * quadratic per key group. Skew is bounded by rows per (key,
    * range-width) cell, the same cell AQE's skew split re-chunks.
    *
    * Column names of `left` and `right` must be disjoint apart from
    * `keys` (pre-rename; the engine cannot guess intent).
    */
  def rangeJoinBuckets(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       maxDeltaUs: Long): DataFrame = {
    require(maxDeltaUs > 0, s"rangeJoinBuckets: maxDeltaUs must be positive, got $maxDeltaUs")
    val clash = left.columns.toSeq.diff(keys).intersect(right.columns.toSeq.diff(keys))
    require(clash.isEmpty,
      s"rangeJoinBuckets: rename columns shared by both sides first: ${clash.mkString(", ")}")
    val lb = left
      .withColumn("__b", expr(s"unix_micros($leftTs) div $maxDeltaUs"))
      .withColumn("__bb", explode(array(col("__b") - 1, col("__b"), col("__b") + 1)))
      .drop("__b")
    val rb = right
      .withColumn("__bb", expr(s"unix_micros($rightTs) div $maxDeltaUs"))
    lb.join(rb, keys :+ "__bb")
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs))) <= maxDeltaUs)
      .drop("__bb")
  }

  /** Open-interval sentinel for [[scd2History]]'s current rows: the
    * NULL-free encoding of "valid until further notice" (the house
    * discipline avoids nullable output columns — engines disagree on
    * null-vs-NaN round-trips long before they disagree on values). */
  val OpenIntervalUs: Long = Long.MaxValue

  /** SCD TYPE-2 HISTORY from a change stream — the warehouse twin of
    * the CDC latest-per-key op (`dedup_latest` keeps only the newest
    * attribute value; this keeps every VERSION with its validity
    * interval): per key, order updates by (ts, tieCol), collapse
    * consecutive rows whose tracked attribute did not change, and emit
    * one row per surviving version with `valid_from_us` inclusive,
    * `valid_to_us` exclusive (= next version's start, [[OpenIntervalUs]]
    * for the current row), a 1-based `version`, and `is_current`.
    *
    * Equal-timestamp updates are kept as distinct zero-length versions
    * (deterministic via the tieCol order) rather than silently merged —
    * an auditable history never drops a recorded change.
    *
    * Execution shape: both window passes (change detection, interval
    * close) share one partitioning on the key — ONE shuffle of
    * fixed-width rows, per-key sorts parallelize across keys, nothing
    * is quadratic in versions. The naive per-row "next change" subquery
    * this replaces re-scans the history per update. */
  def scd2History(updates: DataFrame, keys: Seq[String], tsCol: String,
                  attrCol: String, tieCol: String): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col(tsCol), col(tieCol))
    updates
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from_us", unix_micros(col(tsCol)))
      .withColumn("valid_to_us",
        coalesce(lead(unix_micros(col(tsCol)), 1).over(w),
          lit(OpenIntervalUs)))
      .withColumn("is_current",
        (col("valid_to_us") === OpenIntervalUs).cast("int"))
      .drop("__prev")
  }
}
