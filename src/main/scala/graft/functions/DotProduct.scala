package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product of two numeric arrays (float or double
  * elements, mixed allowed) — the hot scalar of every similarity path.
  *
  * Semantics are EXACTLY the HOF composition it replaces
  * (`aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _ + _)`): each element is widened to double BEFORE the multiply,
  * accumulation is left-to-right from 0.0 (so every oracle-checked cosine
  * keeps identical bits), mismatched lengths and null elements yield
  * null, exactly as zip_with's null-padding does.
  *
  * Why a custom Expression instead of the HOF form: the HOF pipeline
  * materializes an intermediate products array and walks it with boxed
  * lambda variables per element — on a 64-dim corpus that is ~128 boxed
  * allocations per scored pair. `doGenCode` emits a tight primitive loop
  * (no allocation, no boxing) inside whole-stage codegen; `eval` mirrors
  * it for interpreted paths.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  @transient private lazy val leftIsFloat = elemType(left) == FloatType
  @transient private lazy val rightIsFloat = elemType(right) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = leftIsFloat
    val yf = rightIsFloat
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGet =
      if (leftIsFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    val rightGet =
      if (rightIsFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${leftGet(a, i)} * ${rightGet(b, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })
  }
}

object DotProduct {
  /** `graft_dot(a, b)` column. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
