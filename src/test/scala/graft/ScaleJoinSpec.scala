package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew
import graft.pipeline.{Enrich, Stages}
import graft.sources.Pages

/** The big-KB join shape (SURVEY J3 at scale): when the attr table cannot
  * broadcast, the attach is a SORT-MERGE join on qid with hot-key salting —
  * demonstrated, not assumed. */
class ScaleJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic synthetic attr corpus: `nRows` (qid, kind, text) rows
    * over `nQids` entities (no RNG — pure modular arithmetic). */
  private def syntheticAttrs(nRows: Long, nQids: Long): DataFrame =
    spark.range(nRows).select(
      concat(lit("QX"), (col("id") % nQids).cast("string")).as("qid"),
      element_at(typedLit(Seq("label", "description", "instance of")),
        (col("id") % 3 + 1).cast("int")).as("kind"),
      concat(lit("t"), col("id").cast("string")).as("text"))

  /** Zipf-ish mention table: every 4th row hits the head entity QX7, and
    * every 7th row a qid ABSENT from the attr corpus (a KB miss). */
  private def zipfMentions(n: Long, nQids: Long): DataFrame =
    spark.range(n).select(
      (col("id") % 1000).as("doc_id"),
      when(col("id") % 4 === 0, lit("QX7"))
        .when(col("id") % 7 === 0,
          concat(lit("QMISS"), (col("id") % 50).cast("string")))
        .otherwise(concat(lit("QX"), (col("id") % nQids).cast("string"))).as("qid"))

  /** The broadcast path's contract: left join + default fill. */
  private def wantFilled(ments: DataFrame, attrs: DataFrame): DataFrame =
    ments.join(
        Enrich.resolvedAttrs(attrs).withColumnRenamed("alias", "attr_alias"),
        Seq("qid"), "left")
      .withColumn("label", coalesce(col("label"), col("qid")))
      .withColumn("description", coalesce(col("description"), col("qid")))
      .withColumn("instance_of", coalesce(col("instance_of"), lit("entity")))
      .withColumn("attr_alias", coalesce(col("attr_alias"), col("qid")))

  test("big-KB attach: sort-merge join, salted, row-equal incl. KB misses") {
    val attrs = syntheticAttrs(1000000L, 300000L)
    val ments = zipfMentions(200000L, 300000L)
    val hot = Skew.hotKeys(ments, "qid", 10000L)
    val got = Enrich.attachAttributesLarge(ments, attrs, hot, 8)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"attr join must be SMJ:\n$plan")
    // a KB-missed mention must survive with defaults, never vanish
    assert(got.filter(col("qid").startsWith("QMISS") &&
      col("instance_of") === "entity").count() > 0)
    val want = wantFilled(ments, attrs)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "salted SMJ attach must be row-identical to left-join + default fill")
  }

  test("10M-row KB side: the plan survives and the attr side is never broadcast") {
    val attrs = syntheticAttrs(10000000L, 4000000L)
    val ments = zipfMentions(1000000L, 4000000L)
    val hot = Skew.hotKeys(ments, "qid", 50000L)
    val got = Enrich.attachAttributesLarge(ments, attrs, hot, 8)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"attr join must be SMJ:\n$plan")
    // the only broadcast in the plan is the hot-key SET (tiny, by design);
    // the attr side must reach the join through a shuffle exchange
    assert(!plan.contains("BroadcastHashJoin joined_qid") &&
      plan.split("BroadcastExchange").length <= 3,
      s"unexpected broadcasts:\n$plan")
    // left join against the (unique-per-qid) resolved attrs: exactly one
    // output row per mention, misses included
    assert(got.count() == ments.count())
  }

  test("fixture KB through the large path == the broadcast enrichment path") {
    val linked = Stages.linkedFast(
      Stages.mentionsKernel(Pages.fromDocuments(spark, "/root/testdata/sf0.001"), spark), spark)
      .cache()
    val attrs = Enrich.kgAttrs(spark)
    // every qid is "hot" here — maximal salting must still be lossless
    val hot = linked.select("qid").distinct()
    val got = Enrich.attachAttributesLarge(linked, attrs, hot, 4)
      .select("qid", "doc_id", "label", "description", "instance_of", "attr_alias")
    val want = wantFilled(linked, attrs)
      .select("qid", "doc_id", "label", "description", "instance_of", "attr_alias")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
}
