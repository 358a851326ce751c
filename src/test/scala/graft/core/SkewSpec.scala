package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salting must be result-invariant: the salted plans exist purely to
  * spread hot keys, never to change answers. Fixtures are deliberately
  * skewed (90% of rows on one key). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val fact = (1 to 1000).map { i =>
    val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
    (k, i.toLong)
  }.toDF("k", "v")

  private val dim = Seq(
    ("hot", "H"), ("k0", "A"), ("k1", "B"), ("k2", "C"),
    ("k3", "D"), ("k4", "E"), ("k5", "F"), ("k6", "G")
  ).toDF("k", "label")

  test("saltedJoin returns exactly the plain join (multiset equality on skew)") {
    val plain = fact.join(dim, "k").select("k", "v", "label")
      .as[(String, Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "k", saltFactor = 8)
      .select("k", "v", "label")
      .as[(String, Long, String)].collect().sorted.toSeq
    salted shouldBe plain
    plain.size shouldBe 1000
  }

  test("saltedDistinctCount equals exact countDistinct per key") {
    val df = (1 to 500).map(i => (s"g${i % 3}", s"u${i % 47}")).toDF("k", "u")
    val exact = df.groupBy("k").agg(countDistinct(col("u")).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedDistinctCount(df, "k", "u", saltFactor = 8)
      .as[(String, Long)].collect().toMap
    salted shouldBe exact
  }

  test("dim replication count matches the salt factor") {
    Skew.saltedJoin(fact, dim, "k", saltFactor = 4)
      .count() shouldBe 1000L // still one match per fact row
  }

  test("adviseSaltFactor: hot key advises its leveling factor, uniform key advises 1, empty advises 1") {
    // ~90% of rows on "hot" → ceil(0.9 · 32) ≈ 29: the advisor flags
    Skew.adviseSaltFactor(fact, "k") should be >= 28
    // 64 keys, one row each: max share 1/64 < 1/32 → plain plan is level
    val uniform = (0 until 64).map(i => (s"u$i", i)).toDF("k", "v")
    Skew.adviseSaltFactor(uniform, "k") shouldBe 1
    // empty input must not crash the decision (no keys to level)
    Skew.adviseSaltFactor(uniform.filter(col("v") < 0), "k") shouldBe 1
    // the advised factor levels exactly: a key holding the whole table
    // needs all 32 parts
    val allOne = (0 until 10).map(i => ("x", i)).toDF("k", "v")
    Skew.adviseSaltFactor(allOne, "k") shouldBe 32
  }
}
