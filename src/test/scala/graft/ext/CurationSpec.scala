package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-fixture gates for the curation wave-2 operators: repetition
  * signals, segment-level dedup, n-gram decontamination, and the blocked
  * fuzzy join. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------ //
  // maxRunCount (repetition core)                                      //
  // ------------------------------------------------------------------ //

  test("maxRunCount: counts the most frequent element; empty array -> 0") {
    val df = Seq(
      (1L, Seq("b", "a", "b", "b", "c")),
      (2L, Seq("x")),
      (3L, Seq.empty[String])
    ).toDF("id", "arr")
      .select(col("id"), Text.maxRunCount(col("arr")).as("m"))
    df.as[(Long, Long)].collect().toMap shouldBe Map(1L -> 3L, 2L -> 1L, 3L -> 0L)
  }

  test("maxRunCount over bigrams flags a template-spam doc; prose stays low") {
    val spam = Array.fill(30)("buy now").mkString(" ") // "buy now buy now ..."
    val prose = "the quick brown fox jumps over the lazy dog near the river bank"
    val df = Seq((1L, spam), (2L, prose)).toDF("doc_id", "text")
      .select(col("doc_id"),
        Text.maxRunCount(Text.ngrams(Text.tokens(col("text")))).as("top_bg"))
    val m = df.as[(Long, Long)].collect().toMap
    // 60 tokens of alternating buy/now: "now buy" x29 or "buy now" x30
    m(1L) shouldBe 30L
    m(2L) should be <= 2L
  }

  // ------------------------------------------------------------------ //
  // segmentDedupStats                                                  //
  // ------------------------------------------------------------------ //

  test("segmentDedupStats: a segment shared by >= dfCap docs is dropped everywhere") {
    val header = (1 to 10).map(i => s"h$i").mkString(" ") // exactly one segment
    def uniq(seed: Int) = (1 to 10).map(i => s"u${seed}x$i").mkString(" ")
    val docs = Seq(
      (1L, s"$header ${uniq(1)}"),
      (2L, s"$header ${uniq(2)}"),
      (3L, s"$header ${uniq(3)}"),
      (4L, uniq(4)),
      (5L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val out = Dedup.segmentDedupStats(docs, segLen = 10, dfCap = 3L)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, segs, dropped, kept) => id -> ((segs, dropped, kept)) }
      .toMap
    out(1L) shouldBe ((2L, 1L, 10L)) // header dropped, unique half kept
    out(2L) shouldBe ((2L, 1L, 10L))
    out(3L) shouldBe ((2L, 1L, 10L))
    out(4L) shouldBe ((1L, 0L, 10L)) // untouched doc keeps everything
    out(5L) shouldBe ((0L, 0L, 0L))  // empty doc: zero segments, present in output
  }

  test("segmentDedupStats: df below the cap keeps the shared segment") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val out = Dedup.segmentDedupStats(docs, segLen = 10, dfCap = 3L)
      .as[(Long, Long, Long, Long)].collect()
    all(out.map(_._3)) shouldBe 0L // nothing dropped at df=2 < cap=3
    all(out.map(_._4)) shouldBe 10L
  }

  // ------------------------------------------------------------------ //
  // ngramContamination                                                 //
  // ------------------------------------------------------------------ //

  test("ngramContamination: planted 8-gram overlap flags exactly the leaked doc") {
    val trainDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val leaked = "completely different words here then " +
      "gamma delta epsilon zeta eta theta iota kappa" // 8 consecutive train tokens
    val clean = "one two three four five six seven eight nine ten eleven twelve"
    val train = Seq((100L, trainDoc)).toDF("doc_id", "text")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val test0 = Seq((1L, leaked), (2L, clean), (3L, "short doc")).toDF("doc_id", "text")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val out = Dedup.ngramContamination(train, test0, n = 8)
      .select("doc_id", "n_ngrams", "n_overlap", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    out(1L)._3 shouldBe true
    out(1L)._2 shouldBe 1L   // exactly the planted shingle
    out(2L) shouldBe ((5L, 0L, false)) // 12 tokens -> 5 distinct 8-grams
    out(3L) shouldBe ((0L, 0L, false)) // shorter than n: zero shingles, clean
  }

  // ------------------------------------------------------------------ //
  // fuzzyJoin                                                          //
  // ------------------------------------------------------------------ //

  test("fuzzyJoin: bounded distance within blocks; cross-block pairs never compared") {
    val names = Seq("red gear", "ted gear", "golden gear", "red ring")
      .toDF("name")
    val pairs = Fuzzy.fuzzyJoin(names, "name", names, "name",
        v => element_at(split(v, " "), -1), maxDist = 2)
      .filter(col("left_val") < col("right_val"))
      .as[(String, String, Int)].collect().toSet
    pairs should contain(("red gear", "ted gear", 1))
    // same block, distance 6 > 2: filtered by the bound
    pairs.map(p => (p._1, p._2)) should not contain (("golden gear", "red gear"))
    // distance 1 pair in a DIFFERENT block ("ring" vs "gear"): blocked out
    pairs.map(p => (p._1, p._2)) should not contain (("red gear", "red ring"))
  }

  test("fuzzyJoin: length-band prefilter and threshold levenshtein agree with plain distance") {
    val left = Seq("abcdef", "abcdxx", "a").toDF("v")
    val out = Fuzzy.fuzzyJoin(left, "v", left, "v", _ => lit(1), maxDist = 2)
      .as[(String, String, Int)].collect()
    out.filter(r => r._1 == "abcdef" && r._2 == "abcdxx").head._3 shouldBe 2
    // "a" vs "abcdef": length gap 5 > 2 -> never reaches the DP
    out.map(r => (r._1, r._2)) should not contain (("a", "abcdef"))
  }
}
