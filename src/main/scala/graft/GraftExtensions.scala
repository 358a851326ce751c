package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{BoundedTopK, DotProduct}

/** Session extensions: exposes the engine's native Catalyst functions to
  * SQL. Two registration paths:
  *
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (cluster-wide,
  *    the SparkSessionExtensions contract);
  *  - live session: `GraftExtensions.register(spark)` (notebooks/tests).
  *
  * SQL surface: `bounded_top_k(score, id, k)` — see [[BoundedTopK]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.boundedTopK)
    ext.injectFunction(GraftExtensions.graftDot)
  }
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

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    Seq(boundedTopK, graftDot).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
