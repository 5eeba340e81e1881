package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Hypernyms
import graft.sources.{GlreTsv, PubTator}

/** The CDR biomedical chain END-TO-END on one committed fixture — the
  * reference flow `GLRE+KIRE/data_processing/readers.py:16-103` (PubTator
  * parse) → `filter_hypernyms.py:78-98` (P2 flag PRODUCER) →
  * `docRedProcess.py:86-121` .data codec → `reader.py:128-130,149-159`
  * (P2 consumer + P3 empty-doc drop) → evaluation, driven in ONE run so the
  * producer's flags are consumed by the same pipeline that scored them. */
class CdrChainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // Committed CDR-shaped PubTator fixture (pmid|t|, pmid|a|, entity and
  // relation lines). Doc 100: the clause-1 shadow (M1–D003 generalizes the
  // true M1–D04700); doc 200: the clause-2 shadow (bystander M5 with D9,
  // whose node sits inside positive chemical M6's placement); doc 300: a
  // chemical-only doc — zero pairs, the P3 case.
  private val pubtatorLines = Seq(
    "100|t|Chemical M1 causes the specific disease .",
    "100|a|It does not cause the general class or the unrelated one .",
    "100\t9\t11\tM1 chem\tChemical\tM1",
    "100\t30\t46\tspecific disease\tDisease\tD04700",
    "100\t60\t73\tgeneral class\tDisease\tD003",
    "100\t80\t89\tunrelated\tDisease\tD888",
    "100\tCID\tM1\tD04700",
    "",
    "200|t|Chemical M6 and bystander M5 with disease D9 .",
    "200|a|Only M6 is causal .",
    "200\t9\t11\tM6 chem\tChemical\tM6",
    "200\t26\t28\tM5 chem\tChemical\tM5",
    "200\t42\t44\tD9 disease\tDisease\tD9",
    "200\tCID\tM6\tD9",
    "",
    "300|t|A lone chemical with no disease mention .",
    "300|a|Nothing to pair here .",
    "300\t7\t15\tM7 chem\tChemical\tM7")

  // MeSH hierarchy fixture (tree_node, ent) — same shape as HypernymsSpec
  private def mesh = {
    import spark.implicits._
    Seq(
      ("C01.100", "D003"),       // the general disease
      ("C01.100.200", "D04700"), // its specific descendant
      ("C07.300", "D888"),       // unrelated branch
      ("C02", "D9"),
      ("C02.500", "M6")          // chemical placement containing D9's node
    ).toDF("tree_node", "ent")
  }

  test("CDR chain: PubTator → hypernym flags → GLRE codec → P2/P3 → evaluation") {
    import spark.implicits._
    val parsed = PubTator.parse(pubtatorLines.toDF("line"), spark).cache()
    assert(parsed.count() == 3)
    assert(parsed.filter(col("pmid") === "100")
      .select(size(col("entities")), size(col("relations"))).head() ===
      org.apache.spark.sql.Row(4, 1))

    // readers.py example construction: every (chemical, disease) id pair of
    // a doc; CID if the relation line exists, NR otherwise
    val ents = parsed.select(col("pmid"), explode(col("entities")).as("e"))
      .select(col("pmid"), col("e.kb_id").as("id"), col("e.ner_type").as("t"))
      .distinct()
    val examples = ents.filter(col("t") === "Chemical")
      .select(col("pmid"), col("id").as("e1"))
      .join(ents.filter(col("t") === "Disease")
        .select(col("pmid"), col("id").as("e2")), "pmid")
      .join(parsed.select(col("pmid"), explode(col("relations")).as("r"))
          .select(col("pmid"), col("r.id1").as("e1"), col("r.id2").as("e2"),
            lit(true).as("is_pos")),
        Seq("pmid", "e1", "e2"), "left")
      .select(col("pmid").cast("long").as("doc_id"),
        when(col("is_pos"), Hypernyms.PosLabel)
          .otherwise(Hypernyms.NegLabel).as("label"),
        col("e1"), col("e2"))
    assert(examples.count() == 5) // doc 100: 1×3 pairs; doc 200: 2×1; doc 300: 0

    // the flag PRODUCER
    val flagged = Hypernyms.filterHypernyms(examples, mesh).cache()
    val flaggedPairs = flagged.filter(col("label") === Hypernyms.NotInclude)
      .select("doc_id", "e1", "e2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(flaggedPairs == Set((100L, "M1", "D003"), (200L, "M5", "D9")),
      s"expected both clause shadows, got $flaggedPairs")

    // encode through the GLRE .data codec (title carries the pmid)
    val pairStruct = struct(
      col("label").as("rel"), lit("L2R").as("dir"), lit("NON-CROSS").as("cross"),
      lit("0-1").as("headPosRange"), lit("2-3").as("tailPosRange"),
      lit(0).as("hIdx"), array(col("e1")).as("hNames"),
      array(lit("Chemical")).as("hTypes"), array(lit("0")).as("hStarts"),
      array(lit("1")).as("hEnds"), array(lit("0")).as("hSentIds"),
      lit(1).as("tIdx"), array(col("e2")).as("tNames"),
      array(lit("Disease")).as("tTypes"), array(lit("2")).as("tStarts"),
      array(lit("3")).as("tEnds"), array(lit("1")).as("tSentIds"),
      lit("train").as("indevTrain"))
    val glreDocs = parsed
      .join(flagged.groupBy(col("doc_id").cast("string").as("pmid"))
        .agg(collect_list(pairStruct).as("pairs")), Seq("pmid"), "left")
      .select(col("pmid").as("title"),
        array(split(col("title"), " "),
          split(coalesce(col("abstract"), lit("")), " ")).as("sents"),
        col("pairs"))
    val lines = GlreTsv.write(glreDocs, spark)
    val decoded = GlreTsv.read(lines, spark).cache()
    assert(decoded.count() == 3, "codec must keep the pair-less doc as a line")

    // P2 consumes the produced flags; P3 drops the pair-less doc
    val kept = GlreTsv.dropEmptyDocs(GlreTsv.dropNotInclude(decoded)).cache()
    assert(kept.filter(col("title") === "300").count() == 0, "P3 must drop doc 300")
    val keptPairs = kept.select(col("title"), explode(col("pairs")).as("p"))
      .select(col("title").cast("long").as("doc_id"),
        col("p.rel").as("label"),
        element_at(col("p.hNames"), 1).as("e1"),
        element_at(col("p.tNames"), 1).as("e2"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(!keptPairs.exists(_._2 == Hypernyms.NotInclude), "P2 must drop every flag")
    assert(keptPairs == Set(
      (100L, Hypernyms.PosLabel, "M1", "D04700"),
      (100L, Hypernyms.NegLabel, "M1", "D888"), // unrelated branch survives
      (200L, Hypernyms.PosLabel, "M6", "D9")),
      s"unexpected surviving pairs: $keptPairs")

    // evaluation closes the chain: decoded positives vs the PubTator gold
    val preds = kept.select(col("title"), explode(col("pairs")).as("p"))
      .filter(col("p.rel") === Hypernyms.PosLabel)
      .select(col("title").cast("long").as("doc_id"),
        element_at(col("p.hNames"), 1).as("subj"),
        lit("CID").as("pred"), element_at(col("p.tNames"), 1).as("obj"))
    val gold = parsed.select(col("pmid"), explode(col("relations")).as("r"))
      .select(col("pmid").cast("long").as("doc_id"), col("r.id1").as("subj"),
        lit("CID").as("pred"), col("r.id2").as("obj"))
    val (p, r) = graft.eval.Evaluator.precisionRecall(preds, gold)
    assert(p == 1.0 && r == 1.0,
      s"round-tripped positives must score perfectly, got P=$p R=$r")
  }
}
