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
}
