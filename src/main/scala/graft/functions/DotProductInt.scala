package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd integer dot product — the int8 coarse scorer's
  * replacement for the HOF composition
  * `aggregate(zip_with(a, b, _ * _), 0L, (acc, x) => acc + x.cast(long))`,
  * which materialized the product array and boxed every element per
  * scored pair (the [[DotProduct]] story, integer edition — the
  * quantized scan exists to cut memory traffic 4×, so paying an
  * allocation per pair in its hot loop defeated the point).
  *
  * EXACTLY the composition's semantics ON ITS DOMAIN: inputs are
  * int8-bounded by construction ([[graft.ext.Similarity.int8Quantize]]
  * bounds |q| ≤ 127, so |product| ≤ 16129 — int overflow unreachable),
  * the per-element product is 32-bit int multiplication widened to
  * long AFTER the multiply, and the sum is exact integer addition —
  * order-independent, so the expression is hash-safe by arithmetic
  * alone. Mismatched lengths or a null element yield NULL (zip_with
  * pads the short side with null → null product → null accumulator,
  * sticky to the end); two empty arrays yield 0L. OUT of domain the
  * two forms diverge by design: under ANSI mode the HOF's int multiply
  * throws on overflow while this loop wraps — DotProductIntSpec pins
  * in-domain bit-equality on both eval paths and records that boundary
  * as a fact.
  */
case class DotProductInt(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_int"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var d = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      d += (x.getInt(i) * y.getInt(i)).toLong
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("dotInt")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $d = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $d += (long) ($a.getInt($i) * $b.getInt($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $d;
         |}
       """.stripMargin
    })
}

object DotProductInt {
  /** Fused `graft_dot_int(a, b)` column. */
  def dotInt(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProductInt(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
