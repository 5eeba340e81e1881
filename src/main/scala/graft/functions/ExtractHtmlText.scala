package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.extract.Html

/** Native Catalyst expression for the HTML→text extractor — the single
  * hottest scalar in the engine (runs once per page). Versus the ScalaUDF
  * wrapper it removes the encoder round-trip and null-handling wrapper and
  * participates in whole-stage codegen via a direct static call.
  *
  * Preference order honored (SURVEY §7.3 / task brief): built-ins can't
  * express a scanner, so tier (b) — custom Expression — before any
  * mapPartitions fallback. Semantics are exactly `Html.extractText`
  * (byte-identity contract, ExtractSpec).
  */
case class ExtractHtmlText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"extract_html_text expects BINARY, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Html.extractText(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.extract.Html.extractText((byte[]) $c))")

  override protected def withNewChildInternal(newChild: Expression): ExtractHtmlText =
    copy(child = newChild)
}

object ExtractHtmlText {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column-level entry point: extract_html_text(htmlBinary). */
  def apply(c: Column): Column =
    ColumnBridge.column(ExtractHtmlText(ColumnBridge.expression(c)))
}
