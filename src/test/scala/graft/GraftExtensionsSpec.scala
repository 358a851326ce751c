package graft

/** The SQL surface of the native aggregate, via live-session
  * registration (the `spark.sql.extensions` path uses the same builder
  * triple). */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("bounded_top_k is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((1, 0.5, 10L), (1, 0.9, 20L), (1, 0.7, 30L), (2, 0.1, 40L))
      .toDF("g", "score", "id").createOrReplaceTempView("scored")
    val got = spark.sql(
      "SELECT g, bounded_top_k(score, id, 2) AS nn FROM scored GROUP BY g ORDER BY g")
      .selectExpr("g", "transform(nn, x -> x.id) AS ids")
      .as[(Int, Seq[Long])].collect().toSeq
    got shouldBe Seq((1, Seq(20L, 30L)), (2, Seq(40L)))
  }

  test("bounded_top_k coerces int ids and float scores at analysis time") {
    GraftExtensions.register(spark)
    Seq((1, 0.5f, 10), (1, 0.9f, 20)).toDF("g", "score", "id")
      .createOrReplaceTempView("scored_narrow")
    val got = spark.sql(
      "SELECT bounded_top_k(score, id, 1) AS nn FROM scored_narrow GROUP BY g")
      .selectExpr("transform(nn, x -> x.id) AS ids")
      .as[Seq[Long]].collect()(0)
    got shouldBe Seq(20L)
  }

  test("graft_dot: SQL surface, mixed float/double inputs, null semantics") {
    GraftExtensions.register(spark)
    // float × double (the knnIvf centroid case) through SQL
    val mixed = spark.sql(
      """SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)),
        |                 array(2.0D, 0.5D)) AS d""".stripMargin)
      .as[Double].collect()(0)
    mixed shouldBe 2.0 // 1.5*2.0 + (-2.0)*0.5
    // mismatched lengths and null elements → null (zip_with padding parity)
    val nulls = spark.sql(
      """SELECT graft_dot(array(1.0D), array(1.0D, 2.0D)) AS a,
        |       graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS b""".stripMargin)
      .as[(Option[Double], Option[Double])].collect()(0)
    nulls shouldBe ((None, None))
    // rejects non-array input at analysis time
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(1.0, 2.0)").collect()
    }
    e.getMessage.toLowerCase should include("array")
  }

  test("bounded_top_k rejects a non-literal k") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT bounded_top_k(1.0, 1L, id) FROM range(3)").collect()
    }
    e.getMessage should include("integer literal")
  }
}
