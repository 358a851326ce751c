package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonical-composition pass a curation pipeline must run BEFORE
  * fingerprinting/dedup, so "Café" crawled as precomposed U+00E9 and as
  * "e" + combining U+0301 hash to the same document (without it, the
  * same page from two crawlers defeats exact dedup).
  *
  * Spark has no built-in Unicode normalizer; this wraps the JDK's
  * `java.text.Normalizer` (Unicode 15 canonical composition — a spec
  * with exactly one correct output, so DuckDB's `nfc_normalize`
  * produces byte-identical results and the operator is fully
  * oracle-checkable). A custom Expression rather than a Scala UDF keeps
  * the call inside whole-stage codegen: no closure boxing, null-safety
  * folded into the generated code, and an `isNormalized` fast path that
  * skips allocation for the overwhelmingly-common already-NFC input.
  */
case class NormalizeNFC(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  // Round-9 advice: declare the input contract so a non-string child is
  // coerced (or rejected with an AnalysisException) at ANALYSIS time —
  // without this, SQL users calling graft_nfc on e.g. a bigint column
  // got a generated-code ClassCastException at runtime instead.
  override def inputTypes: Seq[GraftColumnBridge.SqlAbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      s"""
         |final String $s = $in.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $in;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })
}

object NormalizeNFC {
  /** `graft_nfc(s)` column. */
  def nfc(s: Column): Column =
    GraftColumnBridge.column(NormalizeNFC(GraftColumnBridge.expression(s)))
}
