package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded edit-distance (fuzzy) join with blocking — the string-side
  * analogue of the LSH near-dup join: candidates come from an EQUI-join
  * on a caller-chosen block key, never from an all-pairs comparison, and
  * the expensive distance only runs inside a block.
  *
  * Scale notes:
  *  - the block key bounds cost the same way LSH bands do: work is
  *    Σ_blocks |L_b|×|R_b|, so the key must be high-cardinality relative
  *    to the data (callers with skewed blocks should pre-cap them like
  *    [[Dedup]]'s `maxBucketSize`). Recall is also bounded by the key —
  *    a pair that disagrees on the block key is never considered; that
  *    is the documented contract, not a bug.
  *  - a |length(l) − length(r)| ≤ maxDist prefilter runs before the DP:
  *    edit distance is ≥ the length gap, so this discards rows with one
  *    integer compare instead of an O(len²) table.
  *  - the remaining pairs use Spark's THRESHOLD levenshtein overload,
  *    which abandons the DP as soon as the bound is exceeded —
  *    O(maxDist·len) per surviving pair, not O(len²).
  */
object Fuzzy {

  /** Join distinct values of `left(leftCol)` × `right(rightCol)` where
    * edit distance ≤ `maxDist`, candidates blocked by `blockKey`.
    * Output: (left_val, right_val, dist). Self-join callers should
    * filter `left_val < right_val` to de-mirror pairs. */
  def fuzzyJoin(left: DataFrame, leftCol: String,
                right: DataFrame, rightCol: String,
                blockKey: Column => Column,
                maxDist: Int): DataFrame = {
    val l = left.select(col(leftCol).as("left_val")).distinct()
      .select(col("left_val"), blockKey(col("left_val")).as("__bk"),
        length(col("left_val")).as("__ll"))
    val r = right.select(col(rightCol).as("right_val")).distinct()
      .select(col("right_val"), blockKey(col("right_val")).as("__bk"),
        length(col("right_val")).as("__rl"))
    l.join(r, "__bk")
      .filter(abs(col("__ll") - col("__rl")) <= maxDist)
      .withColumn("dist", levenshtein(col("left_val"), col("right_val"), maxDist))
      .filter(col("dist") >= 0) // threshold overload returns -1 when exceeded
      .select(col("left_val"), col("right_val"), col("dist"))
  }
}
