package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Hypernyms

/** The CDR hypernym-filter producer vs the reference script's own semantics
  * (`GLRE+KIRE/data_processing/filter_hypernyms.py:78-98`): MeSH-style tree
  * numbers, per-doc scoping, both clauses, and the P2 hand-off. */
class HypernymsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // MeSH hierarchy rows (tree_node, ent): disease D04700 sits UNDER D003
  // ("C01.100" is a substring of "C01.100.200"), chemical M6 sits on a
  // placement containing disease D9's node "C02"
  private def mesh = {
    import spark.implicits._
    Seq(
      ("C01.100", "D003"),      // general disease (the negative)
      ("C01.100.200", "D04700"), // specific descendant (the positive)
      ("C07.300", "D888"),      // unrelated branch
      ("C02", "D9"),
      ("C02.500", "M6")         // chemical placement containing D9's node
    ).toDF("tree_node", "ent")
  }

  test("clause 1: same-chemical negative generalizing a positive disease is relabeled") {
    import spark.implicits._
    val ex = Seq(
      (1L, Hypernyms.PosLabel, "M1", "D04700"), // positive (M1, specific)
      (1L, Hypernyms.NegLabel, "M1", "D003"),   // negative (M1, its hypernym) → flag
      (1L, Hypernyms.NegLabel, "M2", "D003"),   // different chemical → keep
      (1L, Hypernyms.NegLabel, "M1", "D888"),   // unrelated branch → keep
      (2L, Hypernyms.NegLabel, "M1", "D003")    // other doc, no positive → keep
    ).toDF("doc_id", "label", "e1", "e2")
    val got = Hypernyms.filterHypernyms(ex, mesh)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3)) -> r.getString(1)).toMap
    assert(got((1L, "M1", "D003")) == Hypernyms.NotInclude)
    assert(got((1L, "M2", "D003")) == Hypernyms.NegLabel)
    assert(got((1L, "M1", "D888")) == Hypernyms.NegLabel)
    assert(got((2L, "M1", "D003")) == Hypernyms.NegLabel)
    assert(got((1L, "M1", "D04700")) == Hypernyms.PosLabel) // positives untouched
  }

  test("clause 2: same-disease negative whose disease node sits inside a positive chemical placement") {
    import spark.implicits._
    val ex = Seq(
      (3L, Hypernyms.PosLabel, "M6", "D9"), // positive: chemical M6 at C02.500
      (3L, Hypernyms.NegLabel, "M5", "D9")  // negative, same disease D9 (node C02) → flag
    ).toDF("doc_id", "label", "e1", "e2")
    val got = Hypernyms.filterHypernyms(ex, mesh)
      .collect().map(r => (r.getString(2), r.getString(3)) -> r.getString(1)).toMap
    assert(got(("M5", "D9")) == Hypernyms.NotInclude)
    assert(got(("M6", "D9")) == Hypernyms.PosLabel)
  }

  test("entities with no MeSH placement never flag, and P2 drops the produced flag") {
    import spark.implicits._
    val ex = Seq(
      (1L, Hypernyms.PosLabel, "M1", "D04700"),
      (1L, Hypernyms.NegLabel, "M1", "DNOWHERE"), // no tree nodes → keep
      (1L, Hypernyms.NegLabel, "M1", "D003")      // flagged, then dropped by P2
    ).toDF("doc_id", "label", "e1", "e2")
    val relabeled = Hypernyms.filterHypernyms(ex, mesh).cache()
    assert(relabeled.filter(col("label") === Hypernyms.NotInclude).count() == 1)
    // P2 hand-off: the consumer filter removes exactly the produced flags
    val kept = relabeled.filter(col("label") =!= Hypernyms.NotInclude)
    assert(kept.count() == 2)
    assert(kept.filter(col("e2") === "DNOWHERE").count() == 1)
  }
}
