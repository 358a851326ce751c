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

  test("graft_det_ln / graft_det_exp: SQL surface matches the chain and the guard") {
    GraftExtensions.register(spark)
    // the SQL surface evaluates the native expression — bit-identical
    // to the oracle's step chain (DetMathSpec pins that); here we pin
    // the registration plumbing: values, implicit int->double cast,
    // the exp domain guard, and round-trip exp(ln(x)) ~= x
    val got = spark.sql(
      """SELECT graft_det_ln(CAST(7 AS DOUBLE)) AS l,
                graft_det_ln(8) AS li,
                graft_det_ln_signed(0.25) AS ls,
                graft_det_exp(1.0) AS e,
                graft_det_exp(60.0) AS eg""")
      .as[(Double, Double, Double, Double, Option[Double])].collect()(0)
    math.abs(got._1 - math.log(7.0)) should be < 1e-8
    math.abs(got._2 - math.log(8.0)) should be < 1e-8
    math.abs(got._3 - math.log(0.25)) should be < 1e-8
    math.abs(got._4 - math.E) should be < 1e-8
    got._5 shouldBe None // k > 63: NULL, never a silent 2^m error
    val rt = spark.sql("SELECT graft_det_exp(graft_det_ln(CAST(42 AS DOUBLE)))")
      .as[Double].collect()(0)
    math.abs(rt - 42.0) should be < 1e-6
    // the SQL surface is domain-GUARDED (r15 second-pass review):
    // inputs outside each function's exact range read NULL, never a
    // divergent series or a 2^|k|-off exp (the engine's internal call
    // sites are in-domain by construction and unaffected)
    val oob = spark.sql(
      """SELECT graft_det_exp(-1.0) AS a, graft_det_ln(0.5) AS b,
                graft_det_ln(-3.0) AS c, graft_det_ln_signed(0.0) AS d,
                graft_det_ln_signed(-2.0) AS e""")
      .as[(Option[Double], Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect()(0)
    oob shouldBe ((None, None, None, None, None))
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

  test("scalar operator set is callable from SQL and matches the Column API") {
    GraftExtensions.register(spark)
    val row = spark.sql("""
      SELECT graft_redact('mail a@b.io or 555-0000') AS red,
             graft_fingerprint('Hello, World') AS fp1,
             graft_fingerprint('hello world!') AS fp2,
             graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
             graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c,
             graft_hamming64(7L, 1L) AS h,
             size(graft_tokens('a b  c')) AS nt,
             graft_max_run(array('x', 'y', 'x')) AS mr
    """).collect()(0)
    row.getString(0) shouldBe "mail <EMAIL> or <PHONE>"
    row.getString(1) shouldBe row.getString(2) // normalization-insensitive
    row.getDouble(3) shouldBe 0.5
    row.getDouble(4) shouldBe 0.0
    row.getInt(5) shouldBe 2 // bit_count yields INT
    row.getInt(6) shouldBe 3
    row.getLong(7) shouldBe 2L
    // graft_simhash agrees with the DataFrame-level table form
    Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
      .createOrReplaceTempView("one_doc")
    val sqlSim = spark.sql("SELECT graft_simhash(text) FROM one_doc")
      .as[Long].collect()(0)
    val tableSim = graft.ext.Dedup.simhashTable(spark.table("one_doc"))
      .select("simhash").as[Long].collect()(0)
    sqlSim shouldBe tableSim
  }

  test("graft_nfc: composes decomposed sequences, identity on normalized input, null-safe") {
    GraftExtensions.register(spark)
    // combining marks embedded via Scala escapes \u2014 Spark SQL's chr() is
    // ASCII-mod-256 (chr(769) = \x01), unlike DuckDB's codepoint chr()
    val row = spark.sql(s"""
      SELECT graft_nfc('Cafe\u0301') AS composed,
             graft_nfc('already ascii') AS same,
             graft_nfc(CAST(NULL AS STRING)) AS n,
             length(graft_nfc('Cafe\u0301')) AS len_after,
             length('Cafe\u0301') AS len_before
    """).collect()(0)
    row.getString(0) shouldBe "Caf\u00e9" // precomposed e-acute
    row.getString(1) shouldBe "already ascii"
    row.isNullAt(2) shouldBe true
    row.getInt(3) shouldBe 4 // 5 codepoints composed to 4
    row.getInt(4) shouldBe 5
    // idempotence: NFC(NFC(x)) == NFC(x)
    spark.sql(s"SELECT graft_nfc(graft_nfc('Zu\u0308rich')) AS a, " +
        s"graft_nfc('Zu\u0308rich') AS b")
      .collect()(0) match { case r => r.getString(0) shouldBe r.getString(1) }
  }

  test("graft_nfc declares its input contract: atomics coerce, arrays fail analysis") {
    GraftExtensions.register(spark)
    // round-9 advice: ImplicitCastInputTypes(StringType) - an atomic
    // non-string child is coerced at analysis time (pre-fix this was a
    // generated-code ClassCastException at runtime)...
    spark.sql("SELECT graft_nfc(42) AS s").collect()(0).getString(0) shouldBe "42"
    // ...and a non-coercible child is an AnalysisException, not codegen death
    val e = intercept[Exception] {
      spark.sql("SELECT graft_nfc(array(1, 2))").collect()
    }
    e.getMessage.toLowerCase should include("graft_nfc")
  }

  test("bounded_top_k rejects a non-literal k") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT bounded_top_k(1.0, 1L, id) FROM range(3)").collect()
    }
    e.getMessage should include("integer literal")
  }
}
