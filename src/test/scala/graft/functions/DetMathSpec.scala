package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[DetMath]] fidelity: the deterministic ln/exp chains must track
  * libm to well inside the 6-dp rounding grid the queries use. The
  * cross-ENGINE bit-identity claim needs no test — both engines
  * evaluate the identical expression text over IEEE primitives — but
  * the series themselves must actually compute ln/exp, which this pins
  * against `Math.log`/`Math.exp` over the live input ranges (counts
  * from 1 to ~10⁹ for ln; nll averages 0–40 for exp), through the REAL
  * `expr`-parsed evaluation path, not a Scala re-derivation. */
class DetMathSpec extends SparkSpec {
  import spark.implicits._

  test("lnSteps tracks Math.log within 1e-8 over count-like inputs") {
    val xs = (1L to 2000L) ++
      Seq(4095L, 4096L, 4097L, 65535L, 65536L, 1000000L, 999999937L,
        (1L << 40) - 1, 1L << 40)
    val got = DetMath.withSteps(
        xs.toDF("x").withColumn("__x", col("x").cast("double")),
        DetMath.lnSteps("__x", "lnx"))
      .select("x", "lnx").as[(Long, Double)].collect()
    got.foreach { case (x, lnx) =>
      withClue(s"x=$x ") { math.abs(lnx - math.log(x.toDouble)) should be < 1e-8 }
    }
  }

  test("lnSteps handles non-integer arguments ≥ 1 (BM25 idf shape)") {
    val xs = Seq(1.0, 1.0000001, 1.5, 2.718281828, 3.5, 7.25, 500.5 / 3.5)
    val got = DetMath.withSteps(xs.toDF("x"),
        DetMath.lnSteps("x", "lnx"))
      .select("x", "lnx").as[(Double, Double)].collect()
    got.foreach { case (x, lnx) =>
      withClue(s"x=$x ") { math.abs(lnx - math.log(x)) should be < 1e-8 }
    }
  }

  test("expSteps tracks Math.exp within 1e-9 relative over the nll range") {
    val xs = (0 to 4000).map(_ * 0.01) // 0.00 .. 40.00
    val got = DetMath.withSteps(xs.toDF("x"),
        DetMath.expSteps("x", "ex"))
      .select("x", "ex").as[(Double, Double)].collect()
    got.foreach { case (x, ex) =>
      val want = math.exp(x)
      withClue(s"x=$x ") { math.abs(ex - want) / want should be < 1e-9 }
    }
  }

  test("expSteps is bit-identical to the all-double reference over k = 0..63") {
    // The reference mirrors what DuckDB computes — FLOOR yielding DOUBLE,
    // every constant a double, every op a single IEEE primitive in the
    // chain's exact order. After the round-15 E-notation/CAST fix the
    // Spark chain must produce the SAME BITS (the old decimal-typed Ln2
    // made Spark's k·ln2 an exact decimal product rounded once — 1 ulp
    // off this reference at k ∈ {33, 35, 51}).
    val Ln2 = 0.6931471805599453
    val fact = (1 to 12).map(k => 1.0 / (1L to k).foldLeft(1.0)(_ * _.toDouble))
    def ref(x: Double): Double = {
      val k = math.floor(x / Ln2 + 0.5)
      var p2 = 1.0
      var kk = k
      for (j <- Seq(32, 16, 8, 4, 2, 1)) {
        // the SQL multiplies all six level factors left-to-right; factors
        // are exact powers of two so grouping cannot change the bits
        if (kk >= j) { p2 *= java.lang.Math.scalb(1.0, j); kk -= j }
      }
      val r = x - k * Ln2
      val horner = fact.reverse.tail.foldLeft(fact.last)((acc, c) => c + r * acc)
      p2 * (1.0 + r * horner)
    }
    // inputs that land on every k in 0..63, including the advisor's
    // divergence cases and off-center remainders
    val xs = (0 to 63).flatMap(k => Seq(k * Ln2, k * Ln2 + 0.31, k * Ln2 - 0.29))
      .filter(x => x >= 0.0 && x < 64 * Ln2 - 0.35)
    val got = DetMath.withSteps(xs.toDF("x"), DetMath.expSteps("x", "ex"))
      .select("x", "ex").as[(Double, Double)].collect()
    got.foreach { case (x, ex) =>
      withClue(s"x=$x k=${math.floor(x / Ln2 + 0.5)} ") {
        java.lang.Double.doubleToLongBits(ex) shouldBe
          java.lang.Double.doubleToLongBits(ref(x))
      }
    }
  }

  test("expSteps yields NULL past the 2^63 ladder instead of a silent 2^m error") {
    val got = DetMath.withSteps(
        Seq(44.0, 44.5, 60.0, -0.3, -0.5, -4.0).toDF("x"),
        DetMath.expSteps("x", "ex"))
      .select("x", "ex").as[(Double, Option[Double])].collect().toMap
    assert(got(44.0).isDefined)   // k = 63, still on the ladder
    assert(got(44.5).isEmpty)     // k = 64 — guarded
    assert(got(60.0).isEmpty)
    assert(got(-0.3).isDefined)   // k = 0 — no ladder rung needed
    assert(got(-0.5).isEmpty)     // k = -1 — the ladder cannot divide
    assert(got(-4.0).isEmpty)
  }

  test("native expressions are BIT-IDENTICAL to the SQL chains over the live ranges") {
    // The engine evaluates DetLn/DetLnSigned/DetExp (one plan node, one
    // codegen'd call) while the oracle evaluates the step chains — the
    // two must agree to the bit or the hash gates flip. Dense grids over
    // every live input range, compared via doubleToLongBits.
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)

    val lnXs = ((1L to 3000L).map(_.toDouble) ++
      (0 to 4000).map(i => 1.0 + i * 0.003123) ++
      Seq(1.0, 1.0000001, 2.718281828, 500.5 / 3.5, 1e6, 999999937.0,
        math.pow(2, 40) - 1, math.pow(2, 40))).distinct
    val ln = DetMath.withSteps(lnXs.toDF("x"), DetMath.lnSteps("x", "chain"))
      .withColumn("native", DetMathExpr.detLn(col("x")))
      .select("x", "chain", "native").as[(Double, Double, Double)].collect()
    ln.foreach { case (x, c, n) =>
      withClue(s"ln x=$x ") { bits(n) shouldBe bits(c) }
    }

    val lsXs = ((1 to 4000).map(i => i * 0.000793) ++
      (1 to 2000).map(i => 1.0 + i * 0.7) ++
      Seq(0.001, 0.5, 0.9999999, 1.0, 1.0000001, 3.0)).distinct.filter(_ > 0)
    val ls = DetMath.withSteps(lsXs.toDF("x"), DetMath.lnSignedSteps("x", "chain"))
      .withColumn("native", DetMathExpr.detLnSigned(col("x")))
      .select("x", "chain", "native").as[(Double, Double, Double)].collect()
    ls.foreach { case (x, c, n) =>
      withClue(s"lnSigned x=$x ") { bits(n) shouldBe bits(c) }
    }

    // negative grid (r16, round-15 ADVICE #1): [-ln2/2, 0) has k = 0 —
    // no ladder, finite Taylor value in BOTH forms; below -ln2/2 the
    // k < 0 guard must agree (NULL on both sides, never 2^|k| wrong)
    val exXs = ((0 to 4430).map(_ * 0.01) ++
      (1 to 400).map(i => -i * 0.001) ++
      Seq(44.5, 60.0, -0.3465, -0.3466, -0.35, -1.0, -7.25)).distinct
    val ex = DetMath.withSteps(exXs.toDF("x"), DetMath.expSteps("x", "chain"))
      .withColumn("native", DetMathExpr.detExp(col("x")))
      .select("x", "chain", "native")
      .as[(Double, Option[Double], Option[Double])].collect()
    ex.foreach { case (x, c, n) =>
      withClue(s"exp x=$x ") {
        n.isDefined shouldBe c.isDefined // the k > 63 NULL guard agrees
        n.foreach(nv => bits(nv) shouldBe bits(c.get))
      }
    }
  }

  test("the emitted SQL uses only IEEE primitives — no libm function names") {
    val all = (DetMath.lnSteps("x", "l") ++ DetMath.expSteps("x", "e"))
      .map(_._2.toLowerCase)
    all.foreach { sql =>
      sql should not include "ln("
      sql should not include "log"
      sql should not include "exp("
      sql should not include "power"
      sql should not include "sqrt"
    }
  }
}
