package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.docred.{DocRED, Labels}
import graft.sources.PubTator
import graft.text.Vocab
import graft.eval.Evaluator
import graft.pipeline.RelationScorer

class LabelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = DocRED.read(spark,
    getClass.getResource("/docred_fixture.jsonl").getPath).cache()

  test("J5/A8: labeled pairs fold multi-labels, NA fills the rest") {
    val lp = Labels.labeledPairs(docs).cache()
    // total rows = sum n(n-1)
    assert(lp.count() == 2 + 2 + 6 + 2)
    val byKey = lp.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getInt(2)) ->
        (r.getSeq[String](3), r.getSeq[Boolean](4), r.getBoolean(5))).toMap
    val (relsA, vecA, naA) = byKey(("docA", 1, 0))
    assert(relsA == Seq("P800") && !naA)
    assert(vecA(Labels.relVocab.indexOf("P800")) && !vecA(0))
    val (relsN, vecN, naN) = byKey(("docA", 0, 1)) // unlabeled direction
    assert(relsN.isEmpty && naN && vecN(0) && vecN.count(identity) == 1)
  }

  test("W7: coref ids follow first-mention order") {
    val got = Labels.corefIds(docs).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    // docC: batch at pos 0 (v0), group at pos 2 (v1), unknownium at 3 (v2)
    assert(got(("docC", 0)) == 1 && got(("docC", 1)) == 2 && got(("docC", 2)) == 3)
    // docA: spark first (sent 0 pos 0), customer later (sent 1)
    assert(got(("docA", 0)) == 1 && got(("docA", 1)) == 2)
  }

  test("W8: sentence offsets are prefix sums; P4/P5 truncation guard") {
    val ls = Labels.sentOffsets(docs).collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(ls("docA") == Seq(0, 4, 8))   // sents of 4 + 4 tokens
    assert(ls("docD") == Seq(0, 3, 7, 10))
    // truncate at 5 tokens: spark@abs0 and customer@abs4 kept, spark@abs6 dropped
    val kept = Labels.truncateMentions(docs, 5)
      .filter(col("title") === "docA").count()
    assert(kept == 2)
  }

  test("J11: vocab build reserves pad/unk, encode defaults to UNK") {
    import spark.implicits._
    val d = Seq((1L, "a b b c"), (2L, "b z")).toDF("doc_id", "text")
    val v = Vocab.build(d).collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(v("b") == 2) // most frequent gets first id after PAD/UNK
    val enc = Vocab.encode(d, v.map { case (k, i) => k -> i })
      .filter(col("doc_id") === 2).head.getSeq[Int](2)
    assert(enc.head == v("b"))
    val enc2 = Vocab.encode(d.filter(col("doc_id") === 2), Map("b" -> 2))
      .head.getSeq[Int](2)
    assert(enc2 == Seq(2, Vocab.UnkId))
  }

  test("B4 char2id: vocab by char frequency; per-word tensors truncate, pad, UNK") {
    import spark.implicits._
    val d = Seq((1L, "Aba cc")).toDF("doc_id", "text")
    // lowercased char counts: "aba" -> a=2, b=1; "cc" -> c=2
    val cv = Vocab.buildChars(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(cv("a") == ((2L, 2)))  // most frequent, ties by char asc
    assert(cv("c") == ((2L, 3)))
    assert(cv("b") == ((1L, 4)))
    val char2id = cv.map { case (k, v) => k -> v._2 }
    val enc = Vocab.encodeChars(d, char2id, charLimit = 4).head.getSeq[scala.collection.Seq[Int]](2)
    assert(enc(0) == Seq(2, 4, 2, 0))        // "aba" + BLANK pad
    assert(enc(1) == Seq(3, 3, 0, 0))        // "cc" + pads
    // truncation at charLimit + UNK for unseen chars
    val enc2 = Vocab.encodeChars(Seq((1L, "abcdef")).toDF("doc_id", "text"),
      Map("a" -> 2, "b" -> 3), charLimit = 3).head.getSeq[scala.collection.Seq[Int]](2)
    assert(enc2(0) == Seq(2, 3, Vocab.UnkId))
  }

  test("S3: PubTator scan groups title/abstract/entities/relations by pmid") {
    import spark.implicits._
    val lines = Seq(
      "123|t|A title about spark",
      "123|a|An abstract body",
      "123\t0\t5\tspark\tMISC\tQ1",
      "123\t10\t15\ttable\tORG\tQ8",
      "123\tCID\tQ1\tQ8",
      "456|t|Entity-less doc"
    ).toDF("line")
    val got = PubTator.parse(lines, spark).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("123").getString(1) == "A title about spark")
    assert(got("123").getString(2) == "An abstract body")
    assert(got("123").getSeq[Any](3).size == 2)
    assert(got("123").getSeq[Any](4).size == 1)
    assert(got("456").getSeq[Any](3).isEmpty)
  }

  test("M2 sigmoid + M4 AUC + SO2 evidence intersection") {
    import spark.implicits._
    val s = spark.range(1).select(RelationScorer.sigmoid(lit(0.0)).as("s"))
      .head.getDouble(0)
    assert(s == 0.5)
    // evidence: pred evidence [0,1] vs gold [1,2] → overlap 1
    val preds = Seq((1L, "A", "P", "B", Seq(0, 1))).toDF("doc_id", "subj", "pred", "obj", "evidence")
    val gold = Seq((1L, "A", "P", "B", Seq(1, 2))).toDF("doc_id", "subj", "pred", "obj", "evidence")
    val row = Evaluator.evidenceScore(preds, gold).head
    assert(row.getAs[Long]("n_overlap") == 1)
    assert(row.getAs[Long]("evi_p_permille") == 500)
    // AUC of a perfect sweep (all correct) ≈ recall span × precision 1
    val scored = Seq((1L, "A", "P", "B", 0.9)).toDF("doc_id", "subj", "pred", "obj", "score")
    val g2 = Seq((1L, "A", "P", "B")).toDF("doc_id", "subj", "pred", "obj")
    val sweep = Evaluator.thetaSweep(scored, g2)
    assert(Evaluator.prAuc(sweep) >= 0.0) // single point → 0 area, no crash
  }
}
