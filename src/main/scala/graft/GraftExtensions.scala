package graft

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.ext.{Dedup, Similarity, Text}
import graft.functions.{BoundedTopK, DotProduct}

/** Session extensions: exposes the engine's native Catalyst functions to
  * SQL. Two registration paths:
  *
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (cluster-wide,
  *    the SparkSessionExtensions contract);
  *  - live session: `GraftExtensions.register(spark)` (notebooks/tests).
  *
  * SQL surface: the native aggregates/expressions `bounded_top_k(score,
  * id, k)` and `graft_dot(a, b)`, plus the engine's scalar operator set
  * as composed Catalyst expression trees (they stay inside whole-stage
  * codegen exactly like the Column API): `graft_tokens`, `graft_redact`,
  * `graft_fingerprint`, `graft_simhash`, `graft_jaccard`,
  * `graft_cosine`, `graft_hamming64`, `graft_max_run`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def buildBoundedTopK(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"bounded_top_k(score, id, k) takes 3 arguments, got ${args.length}")
    val k = args(2) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"bounded_top_k: k must be an integer literal, got $other")
    }
    BoundedTopK(args(0), args(1), k)
  }

  /** (identifier, info, builder) triple in the injectFunction shape. */
  val boundedTopK: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bounded_top_k"),
    new ExpressionInfo(classOf[BoundedTopK].getName, "bounded_top_k"),
    buildBoundedTopK)

  /** `graft_dot(a, b)` — the codegen'd array dot product. */
  val graftDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"graft_dot(a, b) takes 2 arguments, got ${args.length}")
      DotProduct(args(0), args(1))
    })

  /** A 1-arg scalar function from a Column combinator: the builder
    * composes the same Catalyst expression tree the Column API builds,
    * so SQL and DataFrame callers share one implementation. */
  private def scalar1(name: String, f: Column => Column) = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft.ext", name),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"$name takes 1 argument, got ${args.length}")
      GraftColumnBridge.catalystExpression(f(GraftColumnBridge.column(args(0))))
    })

  private def scalar2(name: String, f: (Column, Column) => Column) = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft.ext", name),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"$name takes 2 arguments, got ${args.length}")
      GraftColumnBridge.catalystExpression(
        f(GraftColumnBridge.column(args(0)), GraftColumnBridge.column(args(1))))
    })

  /** The full SQL surface. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    boundedTopK,
    graftDot,
    scalar1("graft_tokens", Text.tokens),
    scalar1("graft_redact", Text.redact),
    scalar1("graft_fingerprint", t => Text.fingerprint(Text.tokens(t))),
    scalar1("graft_simhash", t => Dedup.simhash64(Dedup.tokenHashes(Text.tokens(t)))),
    scalar2("graft_jaccard", Dedup.jaccard),
    scalar2("graft_cosine", Similarity.cosine),
    scalar2("graft_hamming64", Dedup.hamming64),
    scalar1("graft_max_run", Text.maxRunCount),
    scalar1("graft_nfc", graft.functions.NormalizeNFC.nfc),
    // the deterministic cross-engine math layer (round 15): SQL users
    // get the same bit-reproducible ln/exp the engine's hashed queries
    // run, one native expression node each
    scalar1("graft_det_ln", graft.functions.DetMathExpr.detLn),
    scalar1("graft_det_ln_signed", graft.functions.DetMathExpr.detLnSigned),
    scalar1("graft_det_exp", graft.functions.DetMathExpr.detExp))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
