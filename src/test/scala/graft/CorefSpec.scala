package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Coref, Stages}
import graft.sources.Pages

/** In-row entity-keyed coref top-8 (W1): linear in mention count, no
  * self-join, row-identical to the reference-shaped join formulation, and
  * CROSS-ALIAS — positions of all aliases of one linked entity pair
  * (`gen_coref_data.py:148-188`). */
class CorefSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("doc_id", "qid", "p1", "p2", "dist", "rank")
      .collect().map(_.mkString("|")).sorted.toSeq

  test("in-row entityCoref == join formulation on real fixture mentions") {
    val linked = Stages.linkedFast(
      Stages.mentionsKernel(Pages.fromDocuments(spark, "/root/testdata/sf0.001"), spark), spark)
    assert(canon(Coref.entityCoref(linked)) == canon(Coref.entityCorefJoin(linked)))
  }

  test("cross-alias: different surface forms of one qid corefer") {
    // Q7 has two surfaces ("stream", "data stream"); Q2 ("hash") is a
    // bystander. Mentions of the two Q7 surfaces MUST pair; Q2 must not
    // pair with Q7.
    val linked = Seq(
      (1L, 0, 2, 2, "stream", "Q7", "MISC"),
      (1L, 0, 10, 11, "data stream", "Q7", "MISC"),
      (1L, 1, 20, 20, "stream", "Q7", "MISC"),
      (1L, 0, 5, 5, "hash", "Q2", "MISC"))
      .toDF("doc_id", "sent_id", "pos_start", "pos_end", "alias", "qid", "ner_type")
    val out = Coref.entityCoref(linked)
    val pairs = out.select("qid", "p1", "p2").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    // every ordered pair among Q7's three positions, none for singleton Q2
    assert(pairs == Set(
      ("Q7", 2, 10), ("Q7", 2, 20), ("Q7", 10, 2), ("Q7", 10, 20),
      ("Q7", 20, 10), ("Q7", 20, 2)))
    assert(out.filter(col("qid") === "Q2").count() == 0)
    // and the real fixture has live cross-alias pairs (both surfaces occur)
    val real = Stages.linkedFast(
      Stages.mentionsKernel(Pages.fromDocuments(spark, "/root/testdata/sf0.001"), spark), spark)
    val q7 = real.filter(col("qid") === "Q7")
      .select("doc_id", "alias").distinct()
      .groupBy("doc_id").agg(countDistinct(col("alias")).as("n"))
      .filter(col("n") >= 2).count()
    assert(q7 > 0, "fixture must contain docs with BOTH Q7 surfaces")
  }

  test("in-row entityCoref == join formulation on adversarial synthetic positions") {
    // clustered + tie-heavy positions: equal distances left/right, runs of
    // adjacent mentions, a lone pair, and a singleton (emits nothing)
    val pos = Seq(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 20, 30, 31, 40, 60, 80, 81, 82, 100)
    val linked = (pos.map(p => (1L, 0, p, p, "a", "QA", "MISC")) ++
      Seq((1L, 0, 5, 5, "b", "QB", "MISC"), (1L, 0, 9, 9, "b", "QB", "MISC")) ++
      Seq((2L, 0, 7, 7, "a", "QA", "MISC")))
      .toDF("doc_id", "sent_id", "pos_start", "pos_end", "alias", "qid", "ner_type")
    assert(canon(Coref.entityCoref(linked)) == canon(Coref.entityCorefJoin(linked)))
    // singleton entity in doc 2 emits no partners
    assert(Coref.entityCoref(linked).filter(col("doc_id") === 2).count() == 0)
  }

  test("hot entity: output linear (k·8), no join in the plan") {
    val k = 1000
    val hot = (0 until k).map(i => (1L, 0, i * 3, i * 3, "hot", "QH", "MISC"))
      .toDF("doc_id", "sent_id", "pos_start", "pos_end", "alias", "qid", "ner_type")
    val out = Coref.entityCoref(hot)
    assert(out.count() == k.toLong * Coref.TopPartners,
      "hot-entity output must be exactly k·8 rows — never the k² cross-product")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"coref plan must not self-join:\n$plan")
    // spot-check interior mention: partners are the 8 nearest by distance
    val mid = out.filter(col("p1") === 1500).orderBy(col("rank"))
      .select("p2").collect().map(_.getInt(0)).toSeq
    assert(mid == Seq(1497, 1503, 1494, 1506, 1491, 1509, 1488, 1512))
  }

  test("duplicate positions (duplicated doc) violate the precondition — divergence is real") {
    // entityCoref's distinct-positions precondition (see its scaladoc): a
    // doc ingested 9× duplicates every pos_start and the two formulations
    // no longer even agree on what a "mention" is — the join twin keys its
    // window by VALUE (one 8-capped partition per distinct p1: 2·8 = 16
    // rows, ranked nondeterministically among equal (dist, p2) ties), while
    // the in-row posexplode emits one row per INSTANCE with copy-crowded
    // candidate windows (72 rows here). This pins the divergence the
    // precondition exists to exclude.
    val base = Seq(5, 9).map(p => (1L, 0, p, p, "a", "QA", "MISC"))
    val dup9 = (1 to 9).flatMap(_ => base)
      .toDF("doc_id", "sent_id", "pos_start", "pos_end", "alias", "qid", "ner_type")
    val inRow = Coref.entityCoref(dup9).count()
    val join = Coref.entityCorefJoin(dup9).count()
    assert(join == 16L && inRow == 72L && inRow != join,
      s"expected the documented divergence (in-row $inRow vs join $join)")
  }
}
