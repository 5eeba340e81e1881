package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ExtractHtmlText
import graft.sources.Pages

/** The native Catalyst extractor expression must match the ScalaUDF
  * reference implementation bit-for-bit, in both codegen and interpreted
  * eval paths, and must remove the UDF from the physical plan. */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("expression == UDF on the full corpus (codegen path)") {
    val pages = Pages.fromDocuments(spark, sfDir)
    val diff = pages
      .withColumn("via_udf", Pages.extractUdf(col("html")))
      .filter(col("via_udf") =!= col("text"))
      .count()
    assert(diff == 0)
  }

  test("interpreted eval path agrees too (codegen disabled)") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val pages = Pages.fromDocuments(spark, sfDir).limit(50)
      val diff = pages
        .withColumn("via_udf", Pages.extractUdf(col("html")))
        .filter(col("via_udf") =!= col("text")).count()
      assert(diff == 0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null html → null text; wrong input type rejected at analysis") {
    import spark.implicits._
    val df = Seq((1L, null: Array[Byte])).toDF("id", "html")
      .select(ExtractHtmlText(col("html")).as("t"))
    assert(df.head.isNullAt(0))
    val bad = intercept[Exception] {
      Seq(1).toDF("x").select(ExtractHtmlText(col("x"))).collect()
    }
    assert(bad.getMessage.contains("BINARY") || bad.getMessage.toLowerCase.contains("type"))
  }

  test("physical plan carries the native expression, not a ScalaUDF") {
    val plan = Pages.fromDocuments(spark, sfDir).select("text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("extracthtmltext") || plan.contains("ExtractHtmlText"),
      s"expression missing from plan:\n$plan")
  }
}
