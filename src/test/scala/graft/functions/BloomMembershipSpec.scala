package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom membership: the no-false-negative guarantee (the property
  * decontamination must not lose) and a bounded false-positive rate on
  * a generously sized filter. */
class BloomMembershipSpec extends SparkSpec {
  import spark.implicits._

  test("members are ALWAYS flagged; false positives bounded on a sized filter") {
    val members = (0L until 500L).map(i => s"doc-$i")
    val nonMembers = (0L until 500L).map(i => s"other-$i")
    val blob = members.toDF("k")
      .agg(BloomMembership.bloomAgg(xxhash64(col("k")), 1000L, 100000L))
      .head.getAs[Array[Byte]](0)
    blob.length should be > 0

    def flagged(keys: Seq[String]): Long = keys.toDF("k")
      .filter(BloomMembership.mightContain(lit(blob), xxhash64(col("k"))))
      .count()

    // no false negatives, ever — every member must probe true
    flagged(members) shouldBe 500L
    // 100k bits over 500 items ⇒ FPP ≈ 0; allow a hair of slack so the
    // gate tests the CONTRACT (bounded FPP), not one build's hash seeds
    flagged(nonMembers) should be <= 2L
  }

  test("probe is a narrow filter: no join, no shuffle in the eval plan") {
    val blob = (0L until 100L).toDF("v")
      .agg(BloomMembership.bloomAgg(xxhash64(col("v")), 1000L, 100000L))
      .head.getAs[Array[Byte]](0)
    val probe = (0L until 1000L).toDF("v")
      .filter(BloomMembership.mightContain(lit(blob), xxhash64(col("v"))))
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Exchange"
  }
}
