package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.kb.{DocREDVocab, Gazetteer}
import graft.pipeline.{KnowledgeInjection => KI, RelationScorer, Stages}
import graft.sources.Pages

/** The knowledge-injection layer: KG/attr/coref features must actually
  * change decodes (no dataflow-dead enrichment), the kernel must equal its
  * declarative twin, and the weight design must guarantee that ONLY KB
  * evidence can flip a base sign. */
class InjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sfDir = "/root/testdata/sf0.001"

  lazy val pages = Pages.fromDocuments(spark, sfDir).cache()
  lazy val linked = Stages.linkedFast(
    Stages.mentionsKernel(pages, spark), spark).cache()
  lazy val feats = KI.injectedFeatures(linked, spark).cache()

  test("vocabulary closure: kbRel2rel covers the KB predicates and lands in the 96") {
    assert(Gazetteer.kgTriples.map(_._2).toSet.subsetOf(Gazetteer.kbRel2rel.map(_._1).toSet),
      "every KB predicate needs a mapping")
    assert(Gazetteer.kbRel2rel.map(_._2).toSet.subsetOf(DocREDVocab.relations.toSet),
      "suggested relations must be in the output vocabulary")
    assert(Gazetteer.relRules.map(_._3).toSet.subsetOf(DocREDVocab.relations.toSet))
  }

  test("weight design: soft features alone can never flip a base sign") {
    val maxSoft = KI.WCoocUnit * KI.CoocCap + KI.WNbrUnit * KI.NbrCap +
      KI.WCorefUnit * 2 * KI.CorefCap + KI.WAttr
    assert(maxSoft < KI.WBase, s"soft sum $maxSoft must stay below base ${KI.WBase}")
    assert(KI.WDist <= 0, "distance can only penalize")
    // and a direct KB edge always flips: worst case −base + direct − 9·|dist|
    assert(-KI.WBase + KI.WDirect + KI.WDist * 9 > 0)
  }

  test("kernel == relational twin, row for row") {
    val a = KI.scoreInjected(feats, spark)
      .select(col("doc_id"), col("subj"), col("pred"), col("obj"),
        col("score_milli"), col("evidence").cast("string"))
    val b = KI.scoreInjectedRelational(feats)
      .select(col("doc_id"), col("subj"), col("pred"), col("obj"),
        col("score_milli"), col("evidence").cast("string"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("KG evidence flips decodes: injected = rule triples ∪ KB-evidenced triples") {
    val rule = RelationScorer.extract(linked, spark)
      .select("doc_id", "subj", "pred", "obj").distinct().cache()
    val inj = KI.extractInjected(linked, spark)
      .select("doc_id", "subj", "pred", "obj").distinct().cache()
    // injection never loses a rule triple (soft features can't flip down)
    assert(rule.exceptAll(inj).count() == 0, "injection must preserve rule decodes")
    val flips = inj.exceptAll(rule).cache()
    assert(flips.count() > 0, "KG evidence must flip at least one decode")
    // every flipped predicate is a KB-suggested relation
    val flipPreds = flips.select("pred").distinct().collect().map(_.getString(0)).toSet
    assert(flipPreds.nonEmpty && flipPreds.subsetOf(Gazetteer.kbRel2rel.map(_._2).toSet),
      s"unexpected flip predicates: $flipPreds")
    // and each flip is backed by a direct KB edge h→t whose mapped relation
    // is the flipped predicate (KG evidence, not feature noise)
    val kb = Gazetteer.kbRel2rel.toMap
    val edges = Gazetteer.kgTriples.map(t => (t._1, kb(t._2), t._3)).toSet
    val unexplained = flips.select("subj", "pred", "obj").distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .filterNot(edges.contains)
    assert(unexplained.isEmpty, s"flips without KB edge: ${unexplained.take(5).mkString(",")}")
  }

  test("controlled flip with exact milli-logits") {
    // one doc, customer(Q4 PER) + table(Q8 ORG) in one sentence. Rules have
    // (ORG,PER)→P488 but nothing for (PER,ORG); the KB edge Q4→P463→Q8
    // suggests P463 for the (Q4, Q8) direction.
    val one = Seq(
      (1L, 0, 0, 0, "customer", "Q4", "PER"),
      (1L, 0, 2, 2, "table", "Q8", "ORG"))
      .toDF("doc_id", "sent_id", "pos_start", "pos_end", "alias", "qid", "ner_type")
    val got = KI.extractInjected(one, spark)
      .select("subj", "pred", "obj", "score_milli").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    // (Q4,P463,Q8): −2000 (no rule) + 100 cooc + 4500 direct = 2600
    // (Q8,P488,Q4): +2000 (rule) + 100 cooc = 2100
    assert(got == Set(("Q4", "P463", "Q8", 2600L), ("Q8", "P488", "Q4", 2100L)))
  }

  test("long-range: a KB edge reaches across sentences; only KB can") {
    // Q4 in sentence 0, Q8 in sentence 2 — no co-occurrence, so the rule
    // base never fires in either direction; the (Q4, Q8) direction is
    // admitted by the KB edge Q4→P463→Q8 and decodes through it alone,
    // paying the live distance penalty (msd 2 → bucket 2 → −100)
    val one = Seq(
      (1L, 0, 0, 0, "customer", "Q4", "PER"),
      (1L, 2, 2, 2, "table", "Q8", "ORG"))
      .toDF("doc_id", "sent_id", "pos_start", "pos_end", "alias", "qid", "ner_type")
    val got = KI.extractInjected(one, spark)
      .select("subj", "pred", "obj", "score_milli").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    // (Q4,P463,Q8): −2000 (no co-occurrence → no rule base) − 100 dist + 4500 = 2400;
    // (Q8,*,Q4): no KB edge in that direction, not admitted — nothing decodes
    assert(got == Set(("Q4", "P463", "Q8", 2400L)))
  }

  test("fused injected kernel == staged enrichment-join path, row for row") {
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("subj"), col("pred"), col("obj"),
        col("score_milli"), col("evidence").cast("string"))
      .collect().map(_.mkString("|")).sorted.toSeq
    val fused = canon(KI.extractInjectedFused(pages, spark))
    val staged = canon(KI.extractInjected(linked, spark))
    assert(fused.nonEmpty && fused == staged)
  }

  test("decode cap: >=4 higher-scoring KB-suggested relations evict the rule triple") {
    // the reference's top-4 decode cap (ATLOP+KIRE/losses.py:32-42) is
    // UNCONDITIONAL: with 4 distinct KB-suggested relations each scoring
    // −2000 + 100 + 4500 = 2600, the rule triple (2000 + 100 = 2100) falls
    // to rank 5 and is evicted. The fixture KB never suggests 4 relations
    // per pair, so this constructs the feature row directly — pinning the
    // cap semantics (and kernel ≡ twin) where the union property breaks.
    val sugg = DocREDVocab.relations.filter(_ != "P488").sorted.take(4)
    val f = Seq(KI.InjectedFeature(1L, "Q8", "ORG", "Q4", "PER",
      0, 1L, Seq(0), sugg, 0, 0, 0, 0)).toDS().toDF()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("subj", "pred", "obj", "score_milli").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val kernel = canon(KI.scoreInjected(f, spark))
    assert(kernel == sugg.map(r => ("Q8", r, "Q4", 2600L)).toSet,
      s"expected exactly the 4 suggested relations at 2600, got $kernel")
    assert(!kernel.exists(_._2 == "P488"), "rule triple must be evicted by the cap")
    assert(kernel == canon(KI.scoreInjectedRelational(f)), "kernel must equal twin")
  }

  test("hub entity: a 10^5-degree neighbor set stays bounded at MaxNbrSet") {
    // a country-like hub with 100k one-hop KB edges must NOT produce a
    // 100k-element row — the bounded aggregation keeps the MaxNbrSet
    // lexicographically-smallest neighbors, deterministically
    val hubDeg = 100000
    val hubEdges = spark.range(hubDeg).select(
      lit(1L).as("doc_id"), lit("QHUB").as("a"),
      concat(lit("N"), lpad(col("id").cast("string"), 7, "0")).as("b"))
    // a small entity sharing its whole 10-neighbor set with the hub; all 10
    // fall inside the hub's kept-smallest window, so the shared-neighbor
    // witness survives the cap
    val smallEdges = spark.range(10).select(
      lit(1L).as("doc_id"), lit("QX").as("a"),
      concat(lit("N"), lpad(col("id").cast("string"), 7, "0")).as("b"))
    val und = hubEdges.union(smallEdges)
    def setsOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
      KI.boundedNbrSets(df).collect()
        .map(r => r.getString(1) -> r.getSeq[String](2)).toMap
    val sets = setsOf(und)
    val hub = sets("QHUB")
    assert(hub.length == KI.MaxNbrSet, s"row not bounded: ${hub.length}")
    assert(hub == hub.sorted, "bounded set must arrive sorted")
    assert(hub.head == "N0000000" && hub.last == s"N${"%07d".format(KI.MaxNbrSet - 1)}",
      "must keep exactly the MaxNbrSet smallest")
    assert(sets("QX").length == 10)
    assert(sets("QX").toSet.subsetOf(hub.toSet),
      "shared-neighbor witnesses must survive the cap")
    // deterministic across partitionings (map-side partials merge to the
    // same smallest-K regardless of arrival order)
    assert(setsOf(und.repartition(17))("QHUB") == hub)
    assert(setsOf(und.orderBy(col("b").desc))("QHUB") == hub)
  }

  test("coref + neighborhood features are live dataflow (nonzero on fixture)") {
    assert(feats.filter(col("h_coref") > 0).count() > 0, "coref feature dead")
    assert(feats.filter(col("shared_nbrs") > 0).count() > 0, "neighbor feature dead")
    assert(feats.filter(col("same_inst") > 0).count() > 0, "attr feature dead")
    assert(feats.filter(size(col("sugg_rels")) > 0).count() > 0, "direct-edge feature dead")
  }
}
