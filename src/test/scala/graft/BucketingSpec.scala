package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bucketing
import graft.pipeline.Stages
import graft.sources.Pages

/** Bucketed co-located joins: the join-side shuffle must be PAID AT WRITE
  * TIME and absent from the join plan — demonstrated on real engine tables
  * (mentions ⋈ triples on doc_id), not assumed. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("same-bucket-count tables join with zero Exchange, row-identical") {
    val pages = Pages.fromDocuments(spark, sfDir)
    val ments = Stages.mentionsKernel(pages, spark)
    val triples = Stages.extractTriplesKernel(pages, spark)
    Bucketing.writeBucketed(ments, "b_mentions", "doc_id", 8)
    Bucketing.writeBucketed(triples, "b_triples", "doc_id", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // disable broadcast so the test proves the BUCKETED shuffle-free join,
      // not a broadcast that would also be exchange-free at fixture scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_mentions", "b_triples", "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan must be bucket-aware:\n$plan")
      // and it computes the same rows as the plain join
      val want = ments.join(triples, Seq("doc_id"))
      assert(joined.count() == want.count())
      assert(joined.exceptAll(want).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_mentions")
      spark.sql("DROP TABLE IF EXISTS b_triples")
    }
  }
}
