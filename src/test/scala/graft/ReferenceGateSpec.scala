package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.docred.DocRED
import graft.eval.{Evaluator, ReferenceDecode}
import graft.sinks.ResultJson

/** THE reference-agreement gate (BASELINE metric: "P/R ≥ 0.95 vs KIRE
  * reference on DocRED+DWIE"): the engine's official predictions are scored
  * against COMMITTED reference-format prediction fixtures — a result.json
  * produced by the reference decode rule (`ATLOP+KIRE/losses.py:32-42`
  * get_label + `evaluation.py:27-41` to_official) over committed per-pair
  * logit vectors — via `ResultJson.read` → `Evaluator.score`.
  *
  * The committed logits carry deterministic disagreement slices (~2.5%
  * suppressed decodes + ~2.5% reference-only decodes, see
  * `graft.tools.GenRefPredictions`), so the gate is a LIVE measurement
  * that must land in [0.95, 1.0) on DocRED — not an identity check.
  */
class ReferenceGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def res(p: String) = getClass.getResource(p).getPath

  test("get_label decode semantics (losses.py:32-42): threshold, cap, ties") {
    import ReferenceDecode.getLabel
    // adaptive threshold: classes must beat the TH logit, not zero
    assert(getLabel(Array(0.5, 0.4, 0.6, -1.0)) == Seq(2))
    // TH above everything → NA (empty)
    assert(getLabel(Array(3.0, 2.0, 2.5)) == Seq.empty)
    // top-4 cap over the FULL vector: 5 positives, lowest one dropped
    val five = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0) ++ Array.fill(91)(-2.0)
    assert(getLabel(five) == Seq(2, 3, 4, 5))
    // tie at the kth value is KEPT (>= comparison, like torch.topk + >=)
    val tie = Array(0.0, 2.0, 2.0, 3.0, 4.0, 5.0) ++ Array.fill(91)(-2.0)
    assert(getLabel(tie) == Seq(1, 2, 3, 4, 5))
    // negative TH: a negative logit above TH still decodes
    assert(getLabel(Array(-1.0, -0.5, -2.0)) == Seq(1))
  }

  test("committed result.json IS the reference decode of the committed logits") {
    for (name <- Seq("docred", "dwie")) {
      val logits = spark.read.json(res(s"/ref_predictions/${name}_ref_logits.jsonl"))
      val rederived = ReferenceDecode.official(logits, spark)
      val committed = ResultJson.read(spark,
          res(s"/ref_predictions/${name}_ref_result.json"))
        .select("title", "h_idx", "t_idx", "r")
      assert(rederived.exceptAll(committed).count() == 0 &&
        committed.exceptAll(rederived).count() == 0,
        s"$name: committed result.json must equal the decode of its logits")
      assert(committed.count() > 0, s"$name: fixture must predict something")
    }
  }

  private def gate(corpus: String, name: String,
                   maxDisBucket: Int): (Long, Long, Long, Long) = {
    val docs = DocRED.read(spark, res(corpus)).cache()
    val eids = DocRED.linkEntities(docs, spark)
    val engineFull =
      ResultJson.officialPredictions(docs, eids, spark, maxDisBucket)
    // format fidelity beyond (title,h,t,r): wherever engine and reference
    // agree on a prediction, the dis field (the corpus's dis2idx ladder —
    // DWIE's 12 rungs vs DocRED's 9) must agree too
    val committedFull = ResultJson.read(spark,
      res(s"/ref_predictions/${name}_ref_result.json"))
    val disClash = engineFull.as("e")
      .join(committedFull.as("c"), Seq("title", "h_idx", "t_idx", "r"))
      .filter(col("e.dis") =!= col("c.dis")).count()
    assert(disClash == 0,
      s"$name: $disClash agreeing predictions carry a different dis bucket")
    val engine = engineFull
      .select(col("title").as("doc_id"), col("h_idx").cast("string").as("subj"),
        col("r").as("pred"), col("t_idx").cast("string").as("obj"))
    val reference = ResultJson.read(spark,
        res(s"/ref_predictions/${name}_ref_result.json"))
      .select(col("title").as("doc_id"), col("h_idx").cast("string").as("subj"),
        col("r").as("pred"), col("t_idx").cast("string").as("obj"))
      .withColumn("intrain", lit(false))
    val row = Evaluator.score(engine, reference).head
    (row.getAs[Long]("p_permille"), row.getAs[Long]("r_permille"),
      row.getAs[Long]("n_pred"), row.getAs[Long]("n_correct"))
  }

  test("DocRED gate: engine P/R >= 0.95 vs committed reference predictions") {
    val (p, r, nPred, nCorrect) = gate("/docred_corpus.jsonl", "docred",
      graft.pipeline.RelationScorer.MaxDisBucketDocRED)
    assert(p >= 950, s"precision $p permille below the 950 gate")
    assert(r >= 950, s"recall $r permille below the 950 gate")
    // the committed disagreement slices are LIVE: the gate measures a real
    // (sub-1.0) agreement, so a semantics drift >5% would actually trip it
    assert(p < 1000 && nCorrect < nPred,
      "fixture must contain reference/engine disagreements")
  }

  test("DWIE gate: engine P/R >= 0.95 vs committed reference predictions") {
    val (p, r, nPred, nCorrect) = gate("/dwie_corpus.jsonl", "dwie",
      graft.pipeline.RelationScorer.MaxDisBucketDwie)
    assert(p >= 950, s"precision $p permille below the 950 gate")
    assert(r >= 950, s"recall $r permille below the 950 gate")
    // same liveness bar as DocRED: the 60-doc DWIE-shaped corpus carries
    // committed disagreement slices, so the gate measures < 1.0 agreement
    assert(p < 1000 && nCorrect < nPred,
      "fixture must contain reference/engine disagreements")
  }

  test("DWIE ladder rungs 10-12 flow through the gate end-to-end") {
    // the three DW_L* long articles pin min_sent_dist into the DWIE-only
    // dis2idx rungs; the committed fixture must carry them (i.e. it was
    // generated ON the 12-rung ladder, not DocRED's 9-rung one)
    val committed = ResultJson.read(spark,
      res("/ref_predictions/dwie_ref_result.json"))
    val rungs = committed.filter(col("dis") > 9)
      .select("dis").distinct().collect().map(_.getInt(0)).sorted
    assert(rungs.toSeq == Seq(10, 11, 12),
      s"expected DWIE-only rungs 10,11,12 in the fixture, got ${rungs.toSeq}")
    // and the DocRED fixture, on its own ladder, must cap at 9
    val docredMax = ResultJson.read(spark,
        res("/ref_predictions/docred_ref_result.json"))
      .agg(max(col("dis"))).head.getInt(0)
    assert(docredMax <= 9, s"DocRED fixture dis must cap at 9, got $docredMax")
  }
}
