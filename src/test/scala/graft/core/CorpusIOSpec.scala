package graft.core

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** JSONL corpus IO: the parse-or-quarantine contract. Every input line
  * must land in exactly one of {parsed row, quarantine row} — a reader
  * that crashes on a corrupt line or silently drops it is wrong in both
  * directions at corpus scale. */
class CorpusIOSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.toString
  }

  test("readJsonl: valid lines parse, corrupt lines are quarantined, none dropped") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "alpha"}""",
      """{"doc_id": 2, "text": "beta"}""",
      """{"doc_id": 3 "text": "missing comma"}""", // malformed
      """not json at all"""))
    // persist before splitting: one scan serves both sides, and Spark
    // rejects corrupt-only projections on a raw JSON scan (SPARK-21610)
    val df = CorpusIO.readJsonl(spark, path, schema).persist()
    df.count() shouldBe 4
    CorpusIO.valid(df).as[(Long, String)].collect().toSet shouldBe
      Set((1L, "alpha"), (2L, "beta"))
    // the quarantine carries the RAW lines, replayable after a fix
    val bad = CorpusIO.quarantine(df).as[String].collect()
    bad should have size 2
    bad.exists(_.contains("missing comma")) shouldBe true
    bad should contain("not json at all")
  }

  test("writeJsonl → readJsonl roundtrip preserves rows and types") {
    val src = Seq((10L, "hello\nworld"), (11L, "unicode: é≠🙂"), (12L, ""))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_rt").toString
    CorpusIO.writeJsonl(src, dir)
    val back = CorpusIO.valid(CorpusIO.readJsonl(spark, dir, schema))
    back.as[(Long, String)].collect().toSet shouldBe
      Set((10L, "hello\nworld"), (11L, "unicode: é≠🙂"), (12L, ""))
  }

  test("readCsv: bad arity and type-mismatch rows are quarantined, none dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_spec")
    java.nio.file.Files.write(dir.resolve("part-0.csv"), Seq(
      "doc_id,text",
      "1,alpha",
      "not_a_number,beta", // doc_id fails the Long cast
      "3,gamma,extra,cols" // wrong arity
    ).mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val df = CorpusIO.readCsv(spark, dir.toString, schema).persist()
    df.count() shouldBe 3
    CorpusIO.valid(df).as[(Long, String)].collect().toSet shouldBe
      Set((1L, "alpha"))
    val bad = CorpusIO.quarantine(df).as[String].collect()
    bad should have size 2
    bad.exists(_.contains("not_a_number")) shouldBe true
    bad.exists(_.contains("extra")) shouldBe true
  }

  test("writeCsv → readCsv roundtrip preserves quotes, commas, and newlines") {
    // embedded newline forces multiLine=true on the read — the
    // splittability tradeoff the Scaladoc documents
    val src = Seq((10L, """says "hi", twice"""), (11L, "line1\nline2"), (12L, "plain"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_rt").toString
    CorpusIO.writeCsv(src, dir)
    val back = CorpusIO.valid(CorpusIO.readCsv(spark, dir, schema, multiLine = true))
    back.as[(Long, String)].collect().toSet shouldBe
      Set((10L, """says "hi", twice"""), (11L, "line1\nline2"), (12L, "plain"))
  }

  test("toParquet: one-pass recode splits valid data from quarantine with counts") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "keep"}""",
      """garbage line"""))
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl_pq").toString
    val (nGood, nBad) = CorpusIO.toParquet(spark, path, schema, out)
    nGood shouldBe 1L
    nBad shouldBe 1L
    spark.read.parquet(s"$out/data").as[(Long, String)].collect().toSeq shouldBe
      Seq((1L, "keep"))
    spark.read.text(s"$out/quarantine").as[String].collect().toSeq shouldBe
      Seq("garbage line")
  }
}
