package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.eval.Evaluator
import graft.text.Normalize
import graft.sources.GlreTsv

class EvalExtrasSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("A12: per-relation confusion counts") {
    import spark.implicits._
    val preds = Seq((1L, "A", "P1", "B"), (1L, "A", "P1", "C"), (1L, "A", "P2", "B"))
      .toDF("doc_id", "subj", "pred", "obj")
    val gold = Seq((1L, "A", "P1", "B"), (1L, "X", "P2", "Y"))
      .toDF("doc_id", "subj", "pred", "obj")
    val m = Evaluator.perRelationConfusion(preds, gold).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m("P1") == ((1L, 1L, 0L))) // B hit, C spurious
    assert(m("P2") == ((0L, 1L, 1L))) // A-B spurious, X-Y missed
  }

  test("A13: recall by distance bucket") {
    import spark.implicits._
    val gold = Seq((1L, "A", "P", "B"), (1L, "C", "P", "D")).toDF("doc_id", "subj", "pred", "obj")
    val preds = Seq((1L, "A", "P", "B")).toDF("doc_id", "subj", "pred", "obj")
    val dist = Seq((1L, "A", "B", 0), (1L, "C", "D", 5))
      .toDF("doc_id", "h_qid", "t_qid", "min_sent_dist")
    val m = Evaluator.recallByDistanceBucket(preds, gold, dist).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(m(0) == 1000) // same-sentence pair recalled
    assert(m(3) == 0)    // dist 5 → bucket 3, missed
  }

  test("P2/P3: not_include pairs dropped, then empty docs dropped") {
    import spark.implicits._
    val docs = Seq(
      ("d1", Seq(Map("rel" -> "P1")), 0), ("d2", Seq(Map("rel" -> "not_include")), 0))
      .toDF("title", "raw", "x")
      .withColumn("pairs", expr("transform(raw, m -> named_struct('rel', m['rel']))"))
      .select("title", "pairs")
    val cleaned = GlreTsv.dropEmptyDocs(GlreTsv.dropNotInclude(docs))
    assert(cleaned.select("title").collect().map(_.getString(0)).toSeq == Seq("d1"))
  }

  test("T3: entity-name cleanup strips delimiters and control whitespace") {
    import spark.implicits._
    val got = Seq("4.\nStranmillis\tRoad||x").toDF("n")
      .select(Normalize.cleanupName(col("n"))).head.getString(0)
    assert(got == "4. Stranmillis Road x")
  }

  test("W2 at scale: binned theta sweep matches the exact sweep within 1 permille") {
    import spark.implicits._
    // synthetic scored predictions: 200 rows, scores descending, gold = the
    // top 60 plus 20 misses scattered lower
    val scored = (0 until 200).map(i =>
      (i.toLong, s"E$i", "P", s"F$i", 10.0 - i * 0.05)).toDF("doc_id", "subj", "pred", "obj", "score")
    val gold = ((0 until 60) ++ (100 until 120)).map(i =>
      (i.toLong, s"E$i", "P", s"F$i")).toDF("doc_id", "subj", "pred", "obj")
    val exact = Evaluator.thetaSweep(scored, gold).filter(col("is_best")).head
    val exactF1 = 2.0 * exact.getAs[Long]("cum_correct") / (exact.getAs[Long]("i") + 80.0)
    val binned = Evaluator.thetaSweepBinned(scored, gold, nBins = 10000)
      .filter(col("is_best")).head
    val binnedF1 = binned.getAs[Long]("f1_permille") / 1000.0
    assert(math.abs(binnedF1 - exactF1) <= 0.001,
      s"binned best F1 $binnedF1 vs exact $exactF1")
    // the distributed pass is a plain aggregation: no window, no
    // single-partition exchange anywhere in its plan
    val (bins, _) = Evaluator.binCounts(scored, gold, 10000)
    val plan = bins.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-partition funnel:\n$plan")
    assert(!plan.contains("Window"), s"window in binned sweep:\n$plan")
  }

  test("exact theta sweep refuses corpus-scale inputs (guard fires)") {
    import spark.implicits._
    val scored = (0 until 50).map(i =>
      (i.toLong, s"E$i", "P", s"F$i", 1.0 - i * 0.01))
      .toDF("doc_id", "subj", "pred", "obj", "score")
    val gold = Seq((0L, "E0", "P", "F0")).toDF("doc_id", "subj", "pred", "obj")
    val e = intercept[IllegalArgumentException] {
      Evaluator.thetaSweep(scored, gold, maxRows = 10L)
    }
    assert(e.getMessage.contains("thetaSweepBinned"))
    // at the default ceiling the same frame sweeps fine
    assert(Evaluator.thetaSweep(scored, gold).count() == 50)
  }

  test("P10: lang filter restricts the runner's input") {
    val out = java.nio.file.Files.createTempDirectory("graft_lang").toString
    val pages = graft.sources.Pages.fromDocuments(spark, "/root/testdata/sf0.001")
    val m = graft.pipeline.TripleExtraction.run(pages, out, spark, lang = Some("en"))
    val enDocs = pages.filter(col("lang") === "en").count()
    assert(m.docs == enDocs, s"expected $enDocs, processed ${m.docs}")
  }
}
