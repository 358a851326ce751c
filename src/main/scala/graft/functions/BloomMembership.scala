package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter set membership, exposed as Columns — the sketch twin of
  * the exact fingerprint equi-join (`dedup_decontaminate`), completing
  * the sketch family (HLL distinct, approx quantiles, frequent items,
  * + membership).
  *
  * Spark ships both halves as Catalyst expressions — the engine uses
  * them for runtime shuffle pruning (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, injected by
  * `InjectRuntimeFilter`) — but registers neither as a public function,
  * so this wrapper goes through the same `private[sql]` bridge as
  * [[BoundedTopK]]. Semantics: NO false negatives ever (a member is
  * always flagged — the property decontamination must not lose), false
  * positives at a rate set by numBits/items.
  *
  * The scale story vs the exact join: the train side collapses to ONE
  * `numBits/8`-byte blob (an agg, no shuffle of its rows beyond the
  * partial-merge), and the eval side is a NARROW filter — no join, no
  * shuffle, no sort. The blob travels as a literal/broadcast, so this
  * is the right shape when the train set is huge and the filter fits
  * memory (1 GB of bits ≈ 10⁹ items at ~1% FPP); past that, partition
  * the key space and apply per-partition filters. The exact join
  * remains the arbiter for flagged rows when false positives matter. */
object BloomMembership {

  /** Aggregate xxhash64-hashed LONGS into a serialized Bloom filter
    * (one binary blob). Sizes are capped by Spark at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * (4M / 64M bits by default) — sized for sketch use, not for
    * billion-item production filters (see scale note above). */
  def bloomAgg(hashedLong: Column, estimatedItems: Long, numBits: Long): Column =
    GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(hashedLong),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: does `hashedLong` belong to the set the blob summarizes?
    * The blob must be a CONSTANT (literal bytes or scalar subquery) —
    * Spark deserializes it once per task, not per row. */
  def mightContain(bloomBinary: Column, hashedLong: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      GraftColumnBridge.expression(bloomBinary),
      GraftColumnBridge.expression(hashedLong)))
}
