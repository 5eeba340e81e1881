package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: registers the engine's native expressions
  * for SQL use, so `spark.sql("SELECT extract_html_text(html) ...")` works
  * cluster-wide via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.extractHtmlText)
  }
}

object GraftExtensions {
  val extractHtmlText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("extract_html_text"),
    new ExpressionInfo(classOf[ExtractHtmlText].getName, "extract_html_text"),
    (children: Seq[Expression]) => ExtractHtmlText(children.head))

  /** Imperative registration for an existing session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      extractHtmlText._1, extractHtmlText._2, extractHtmlText._3)
}
