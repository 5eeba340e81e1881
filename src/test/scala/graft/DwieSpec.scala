package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.docred.{DocRED, Labels}
import graft.pipeline.RelationScorer
import graft.functions.GraftExtensions

/** DWIE-shaped corpus variant: precomputed absolute_pos offsets honored,
  * same pipeline otherwise; plus the SQL function registration path. */
class DwieSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = DocRED.read(spark,
    getClass.getResource("/dwie_fixture.jsonl").getPath).cache()

  test("absolute_pos is read and drives truncation directly") {
    val m = DocRED.mentions(docs).orderBy("vertex_id", "mention_idx").collect()
    assert(m.map(_.getAs[Int]("abs_pos_start")).toSeq == Seq(0, 8, 5))
    // truncate at 6: keeps abs 0 and 5, drops the spark mention at abs 8
    assert(Labels.truncateMentions(docs, 6).count() == 2)
    // consistency: absolute_pos agrees with Ls-derived offsets
    val ls = Labels.sentOffsets(docs).head.getSeq[Int](1)
    assert(ls == Seq(0, 4, 10))
  }

  test("DWIE doc flows through linking + kernel like DocRED") {
    val eids = DocRED.linkEntities(docs, spark)
    val feats = DocRED.pairFeatures(docs, eids)
      .withColumn("doc_id", xxhash64(col("title")))
      .select("doc_id", "h_qid", "h_type", "t_qid", "t_type", "min_sent_dist", "n_cooc", "evidence")
    val triples = RelationScorer.score(feats, spark)
      .select("subj", "pred", "obj").distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(triples == Set(("Q1", "P127", "Q8")))
  }

  test("DWIE distance ladder: buckets 10-12 at 512/1024/2048, DocRED capped at 9") {
    import RelationScorer.{disBucket, disBucketCol, MaxDisBucketDwie}
    // edge pins, scalar + column twin in lockstep (SSAN+KIRE/dataset.py:89-102)
    val pins = Seq(255 -> 8, 256 -> 9, 511 -> 9, 512 -> 10, 1023 -> 10,
      1024 -> 11, 2047 -> 11, 2048 -> 12, 2499 -> 12, 100000 -> 12)
    for ((d, want) <- pins) {
      assert(disBucket(d, MaxDisBucketDwie) == want, s"scalar d=$d")
      val fromCol = spark.range(1)
        .select(disBucketCol(lit(d), MaxDisBucketDwie).as("b")).head.getInt(0)
      assert(fromCol == want, s"column d=$d")
      // DocRED default: same distances never exceed bucket 9
      assert(disBucket(d) == math.min(want, 9), s"docred d=$d")
      assert(spark.range(1).select(disBucketCol(lit(d)).as("b")).head.getInt(0)
        == math.min(want, 9), s"docred column d=$d")
    }
  }

  test("DWIE runner case: the extended ladder reaches the scoring kernel") {
    import spark.implicits._
    // one far pair (512 sentences apart) of a ruled type pair: DocRED caps
    // its distance at bucket 9, DWIE buckets it at 10 — the scored logit
    // must differ by exactly one wDist step
    val feats = Seq((7L, "Q1", "MISC", "Q8", "ORG", 512, 1L, Seq.empty[Int]))
      .toDF("doc_id", "h_qid", "h_type", "t_qid", "t_type",
        "min_sent_dist", "n_cooc", "evidence")
    def best(maxB: Int): Double =
      RelationScorer.score(feats, spark, maxDisBucket = maxB)
        .filter(col("pred") === "P127").head.getAs[Double]("score")
    val w = RelationScorer.fixtureWeights
    val (docred, dwie) =
      (best(RelationScorer.MaxDisBucketDocRED), best(RelationScorer.MaxDisBucketDwie))
    assert(math.abs((docred - dwie) - (-w.wDist)) < 1e-12,
      s"expected one wDist step between ladders, got $docred vs $dwie")
  }

  test("extract_html_text is SQL-callable after extension registration") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val html = graft.extract.Html.wrapHtml("spark joins table", "u", "en")
    Seq(html).toDF("h").createOrReplaceTempView("pages_sql")
    val got = spark.sql(
      "SELECT extract_html_text(CAST(h AS BINARY)) AS t FROM pages_sql")
      .head.getString(0)
    assert(got == "spark joins table")
  }
}
