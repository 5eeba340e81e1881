package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Coref, Stages}
import graft.sources.Pages

/** In-row coref top-8 (W1): linear in mention count, no self-join, and
  * row-identical to the reference-shaped join formulation. */
class CorefSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("doc_id", "alias", "p1", "p2", "dist", "rank")
      .collect().map(_.mkString("|")).sorted.toSeq

  test("in-row aliasCoref == join formulation on real fixture mentions") {
    val ments = Stages.mentionsKernel(Pages.fromDocuments(spark, "/root/testdata/sf0.001"), spark)
    assert(canon(Coref.aliasCoref(ments)) == canon(Coref.aliasCorefJoin(ments)))
  }

  test("in-row aliasCoref == join formulation on adversarial synthetic positions") {
    // clustered + tie-heavy positions: equal distances left/right, runs of
    // adjacent mentions, a lone pair, and a singleton (emits nothing)
    val pos = Seq(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 20, 30, 31, 40, 60, 80, 81, 82, 100)
    val ments = (pos.map(p => (1L, 0, p, p, "a")) ++
      Seq((1L, 0, 5, 5, "b"), (1L, 0, 9, 9, "b")) ++
      Seq((2L, 0, 7, 7, "a")))
      .toDF("doc_id", "sent_id", "pos_start", "pos_end", "alias")
    assert(canon(Coref.aliasCoref(ments)) == canon(Coref.aliasCorefJoin(ments)))
    // singleton alias in doc 2 emits no partners
    assert(Coref.aliasCoref(ments).filter(col("doc_id") === 2).count() == 0)
  }

  test("hot alias: output linear (k·8), no join in the plan") {
    val k = 1000
    val hot = (0 until k).map(i => (1L, 0, i * 3, i * 3, "hot"))
      .toDF("doc_id", "sent_id", "pos_start", "pos_end", "alias")
    val out = Coref.aliasCoref(hot)
    assert(out.count() == k.toLong * Coref.TopPartners,
      "hot-alias output must be exactly k·8 rows — never the k² cross-product")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"coref plan must not self-join:\n$plan")
    // spot-check interior mention: partners are the 8 nearest by distance
    val mid = out.filter(col("p1") === 1500).orderBy(col("rank"))
      .select("p2").collect().map(_.getInt(0)).toSeq
    assert(mid == Seq(1497, 1503, 1494, 1506, 1491, 1509, 1488, 1512))
  }

  test("duplicate positions (duplicated doc) violate the precondition — divergence is real") {
    // aliasCoref's distinct-positions precondition (see its scaladoc): a doc
    // ingested 9× duplicates every pos_start and the two formulations no
    // longer even agree on what a "mention" is — the join twin keys its
    // window by VALUE (one 8-capped partition per distinct p1: 2·8 = 16
    // rows, ranked nondeterministically among equal (dist, p2) ties), while
    // the in-row posexplode emits one row per INSTANCE with copy-crowded
    // candidate windows (72 rows here). This pins the divergence the
    // precondition exists to exclude.
    val base = Seq(5, 9).map(p => (1L, 0, p, p, "a"))
    val dup9 = (1 to 9).flatMap(_ => base)
      .toDF("doc_id", "sent_id", "pos_start", "pos_end", "alias")
    val inRow = Coref.aliasCoref(dup9).count()
    val join = Coref.aliasCorefJoin(dup9).count()
    assert(join == 16L && inRow == 72L && inRow != join,
      s"expected the documented divergence (in-row $inRow vs join $join)")
  }
}
