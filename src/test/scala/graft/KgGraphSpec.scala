package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{KgEmbedding, PageRank}
import graft.pipeline.KgFusion

/** Behavioral pins for the corpus-level KG stage: fusion (support counting,
  * capped noisy-or confidence, functional-relation argmax), snapshot deltas,
  * fixed-point PageRank, and deterministic TransE-style embedding training.
  * The oracles prove engine parity; these prove the operators do what the
  * scaladoc claims on adversarial hand cases. */
class KgGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------- KgFusion

  private def scoredFixture = Seq(
    // (doc_id, subj, pred, obj, score_milli)
    (1L, "Q1", "P569", "Q7", 500L),
    (2L, "Q1", "P569", "Q7", 900L),   // best witness for Q7
    (3L, "Q1", "P569", "Q7", 100L),
    (4L, "Q1", "P569", "Q8", 950L),   // single strong witness for Q8
    (1L, "Q2", "P17", "Q9", 300L)
  ).toDF("doc_id", "subj", "pred", "obj", "score_milli")

  test("fuse: support, max, first_doc, capped fused confidence") {
    val f = KgFusion.fuse(scoredFixture).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r).toMap
    val q7 = f(("Q1", "P569", "Q7"))
    assert(q7.getAs[Long]("support") == 3L)
    assert(q7.getAs[Long]("max_milli") == 900L)
    assert(q7.getAs[Long]("first_doc") == 1L)
    // fused = 900 + 100·min(3−1, 5) = 1100
    assert(q7.getAs[Long]("fused_milli") == 1100L)
    val q8 = f(("Q1", "P569", "Q8"))
    assert(q8.getAs[Long]("support") == 1L && q8.getAs[Long]("fused_milli") == 950L)
  }

  test("fuse: support bonus is capped — a viral triple cannot saturate") {
    val viral = (1L to 50L).map(d => (d, "Q1", "P31", "Q5", 100L))
      .toDF("doc_id", "subj", "pred", "obj", "score_milli")
    val row = KgFusion.fuse(viral).collect().head
    assert(row.getAs[Long]("support") == 50L)
    assert(row.getAs[Long]("fused_milli") ==
      100L + KgFusion.WSupportMilli * KgFusion.SupportCap)
  }

  test("fuse: functional-relation argmax picks the better-fused object") {
    val f = KgFusion.fuse(scoredFixture)
    // Q7: fused 1100 beats Q8: fused 950 for (Q1, P569)
    val best = f.filter(col("subj") === "Q1" && col("pred") === "P569" &&
      col("is_best") === 1).collect()
    assert(best.length == 1 && best.head.getAs[String]("obj") == "Q7")
    // a lone triple for its (subj, pred) is its own best
    assert(f.filter(col("subj") === "Q2" && col("is_best") === 1).count() == 1)
  }

  test("fuseCore == fuse minus the argmax layer, row for row") {
    val core = KgFusion.fuseCore(scoredFixture)
    val full = KgFusion.fuse(scoredFixture)
      .select("subj", "pred", "obj", "support", "max_milli", "first_doc",
        "fused_milli")
    assert(core.columns.toSeq ==
      Seq("subj", "pred", "obj", "support", "max_milli", "first_doc",
        "fused_milli"))
    assert(core.exceptAll(full).count() == 0 && full.exceptAll(core).count() == 0)
    // and the argmax join must be absent from the core plan
    val plan = core.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"fuseCore plan contains a join:\n$plan")
  }

  test("fuse: no WindowExec — argmax is a grouped struct-max") {
    val plan = KgFusion.fuse(scoredFixture).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"fuse plan contains a window:\n$plan")
  }

  test("snapshotDelta: added / removed / support_changed / stable") {
    val oldF = KgFusion.fuse(scoredFixture.filter(col("doc_id") <= 2))
    val newF = KgFusion.fuse(scoredFixture)
    val d = KgFusion.snapshotDelta(oldF, newF).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getAs[Long]("old_support"), r.getAs[Long]("new_support"),
         r.getAs[String]("status"))).toMap
    assert(d(("Q1", "P569", "Q7")) == ((2L, 3L, "support_changed")))
    assert(d(("Q1", "P569", "Q8")) == ((-1L, 1L, "added")))
    assert(d(("Q2", "P17", "Q9")) == ((1L, 1L, "stable")))
    val gone = KgFusion.snapshotDelta(newF, oldF)
      .filter(col("status") === "removed").collect()
    assert(gone.map(r => r.getString(2)).toSet == Set("Q8"))
  }

  // ------------------------------------------------------------- PageRank

  test("pagerank: symmetric cycle ranks equal; star hub outranks leaves") {
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val cm = PageRank.run(cycle, 3).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cm.values.toSet.size == 1, s"cycle masses diverged: $cm")
    val star = Seq(("l1", "hub"), ("l2", "hub"), ("l3", "hub"), ("hub", "l1"))
      .toDF("src", "dst")
    val sm = PageRank.run(star, 5).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sm("hub") > sm("l2") && sm("hub") > sm("l3"))
    // l1 gets the hub's entire outflow → beats the unlinked leaves
    assert(sm("l1") > sm("l2"))
  }

  test("pagerank: mass is sub-stochastic (rounding + dangling leak only down)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "a"), ("d", "a"))
      .toDF("src", "dst")
    val total = PageRank.run(edges, 5).agg(sum("mass")).collect().head.getLong(0)
    assert(total <= PageRank.Scale && total > PageRank.Scale / 2)
  }

  test("pagerank: single-task local twin ≡ distributed iteration, bit-equal") {
    val rng = new scala.util.Random(13)
    val edges = Seq.fill(60)((s"v${rng.nextInt(25)}", s"v${rng.nextInt(25)}"))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    def massMap(lim: Long) = PageRank.run(edges, 5, localLimit = lim)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(massMap(PageRank.LocalEdgeLimit) == massMap(0L))
  }

  test("pagerank: partition-invariant and duplicate-edge-invariant") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "a"), ("b", "a"))
      .toDF("src", "dst")
    val base = PageRank.run(edges, 4).orderBy("v").collect().toSeq
    val rep = PageRank.run(edges.repartition(7), 4).orderBy("v").collect().toSeq
    val dup = PageRank.run(edges.union(edges), 4).orderBy("v").collect().toSeq
    assert(base == rep && base == dup)
  }

  // ---------------------------------------------------------- KgEmbedding

  /** Two relation clusters: r1 links a-entities to b-entities, r2 links
    * b to c — enough structure for the margin loss to have signal. */
  private def kgFixture = {
    val t1 = (1 to 8).map(i => (s"a$i", "r1", s"b${i % 4}"))
    val t2 = (0 to 3).map(i => (s"b$i", "r2", s"c${i % 2}"))
    (t1 ++ t2).toDF("h", "r", "t")
  }

  /** The trainer's corrupted-tail construction, replayed for loss checks. */
  private def negatives(kg: org.apache.spark.sql.DataFrame) = {
    val ents = kg.select(col("h").as("id")).union(kg.select(col("t").as("id"))).distinct()
    val eidx = graft.ops.DenseIds.globalDenseId(ents.select(col("id").as("e")), "idx",
      Seq(col("e").asc))
    val nDf = ents.agg(count(lit(1)).as("n"))
    kg.crossJoin(broadcast(nDf))
      .withColumn("nidx",
        conv(substring(md5(concat_ws("|", col("h"), col("r"), col("t")).cast("binary")), 1, 6),
          16, 10).cast("long") % col("n"))
      .join(eidx.select(col("idx").as("nidx"), col("e").as("tneg")), Seq("nidx"))
      .select(col("h"), col("r"), col("t"), col("tneg"))
  }

  private def hinge(emb: org.apache.spark.sql.DataFrame,
                    negt: org.apache.spark.sql.DataFrame): Long = {
    val pos = KgEmbedding.energies(emb, negt.select("h", "r", "t"))
    val neg = KgEmbedding.energies(emb,
        negt.select(col("h"), col("r"), col("tneg").as("t")))
      .withColumnRenamed("energy", "neg_energy")
      .withColumnRenamed("t", "tneg")
    negt.join(pos, Seq("h", "r", "t"))
      .join(neg, Seq("h", "r", "tneg"))
      .select(greatest(lit(0L), col("energy") + lit(KgEmbedding.Margin) - col("neg_energy"))
        .as("hl"))
      .agg(sum("hl")).collect().head.getLong(0)
  }

  test("train: margin-ranking loss strictly decreases from init") {
    val kg = kgFixture.cache()
    val negt = negatives(kg).cache()
    val ents = kg.select(col("h").as("id")).union(kg.select(col("t").as("id"))).distinct()
    val rels = kg.select(col("r").as("id")).distinct()
    val before = hinge(KgEmbedding.initEmbeddings(ents, rels), negt)
    val after = hinge(KgEmbedding.train(kg, spark, 2), negt)
    assert(after < before, s"hinge loss did not improve: $before -> $after")
    kg.unpersist(); negt.unpersist()
  }

  test("train: one-task local twin ≡ distributed epochs, bit-equal") {
    val kg = kgFixture
    def snap(lim: Long) =
      KgEmbedding.train(kg, spark, 2, localLimit = lim)
        .orderBy("kind", "id", "k").collect().toSeq
    assert(snap(KgEmbedding.LocalTripleLimit) == snap(0L))
  }

  test("train: partition-invariant, bit-equal embeddings") {
    val kg = kgFixture
    def snap(df: org.apache.spark.sql.DataFrame) =
      KgEmbedding.train(df, spark, 1).orderBy("kind", "id", "k").collect().toSeq
    assert(snap(kg) == snap(kg.repartition(5)))
  }

  test("nearestEntities: k rows per entity, no self pairs, symmetric dist") {
    val emb = KgEmbedding.train(kgFixture, spark, 1).cache()
    val nn = KgEmbedding.nearestEntities(emb, 3).cache()
    assert(nn.filter(col("a") === col("b")).count() == 0)
    val perA = nn.groupBy("a").count().agg(max("count"), min("count")).collect().head
    assert(perA.getLong(0) == 3L && perA.getLong(1) == 3L)
    // L1 distance is symmetric: (a,b) dist == (b,a) dist wherever both rank
    val sym = nn.select(col("a"), col("b"), col("dist"))
      .join(nn.select(col("b").as("a"), col("a").as("b"), col("dist").as("dist2")),
        Seq("a", "b"))
      .filter(col("dist") =!= col("dist2")).count()
    assert(sym == 0)
    nn.unpersist(); emb.unpersist()
  }

  // -------------------------------------------------------------- KgGraph

  // chain A→B→C→D plus a side edge A→C and an unreachable island X→Y
  private def bfsEdges = Seq(
    ("A", "B"), ("B", "C"), ("C", "D"), ("A", "C"), ("X", "Y")
  ).toDF("src", "dst")

  test("kHop: min-hop wins when multiple paths reach a vertex") {
    val seeds = Seq("A").toDF("v")
    val got = ops.KgGraph.kHop(bfsEdges, seeds, 3).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // C is at hop 1 via the side edge, NOT hop 2 via B; D therefore hop 2
    assert(got == Map("A" -> 0, "B" -> 1, "C" -> 1, "D" -> 2))
  }

  test("kHop: single-task local twin ≡ iterative frontier expansion") {
    val seeds = Seq("A", "X").toDF("v")
    def hops(lim: Long) = ops.KgGraph.kHop(bfsEdges, seeds, 2, localLimit = lim)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(hops(ops.KgGraph.LocalHopLimit) == hops(0L))
    assert(hops(0L) == Map("A" -> 0, "X" -> 0, "B" -> 1, "C" -> 1, "Y" -> 1, "D" -> 2))
  }

  test("kHop: hop budget truncates; unreached vertices are absent") {
    val seeds = Seq("A").toDF("v")
    val got = ops.KgGraph.kHop(bfsEdges, seeds, 1).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("A" -> 0, "B" -> 1, "C" -> 1)) // D beyond budget; X,Y disconnected
  }

  test("transitiveClosure: chain closes; cycle emits self-pairs; fixpoint exact") {
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val closed = ops.KgGraph.transitiveClosure(chain).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(closed == Set(("a", "b"), ("b", "c"), ("c", "d"),
      ("a", "c"), ("b", "d"), ("a", "d")))
    val cycle = Seq(("p", "q"), ("q", "p")).toDF("src", "dst")
    val cClosed = ops.KgGraph.transitiveClosure(cycle).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(cClosed == Set(("p", "q"), ("q", "p"), ("p", "p"), ("q", "q")))
  }

  test("sameAsMerge: cliques collapse to min qid, self-loops drop, triples dedup") {
    val trips = Seq(
      ("Q5", "P1", "Q9"),  // subj in clique {Q2,Q5}, obj in clique {Q7,Q9}
      ("Q2", "P1", "Q7"),  // same triple after canonicalization → dedups
      ("Q5", "P2", "Q2"),  // becomes a self-loop (both in {Q2,Q5}) → dropped
      ("Q8", "P3", "Q5")   // subj outside any clique passes through
    ).toDF("subj", "pred", "obj")
    val sameAs = Seq(("Q5", "Q2"), ("Q7", "Q9")).toDF("a", "b")
    val got = ops.KgGraph.sameAsMerge(trips, sameAs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("Q2", "P1", "Q7"), ("Q8", "P3", "Q2")))
  }

  test("canonicalize-then-fuse merges alias evidence into one support count") {
    // two docs assert the same fact about sameAs-aliases Q2 ~ Q5:
    // after remap BOTH witness (Q2, P1, Q7) → support 2, fused bonus +100
    val perDoc = Seq(
      (10L, "Q5", "P1", "Q7", 500L),
      (20L, "Q2", "P1", "Q7", 400L)
    ).toDF("doc_id", "subj", "pred", "obj", "score_milli")
    val canon = ops.KgGraph.sameAsCanon(Seq(("Q5", "Q2")).toDF("a", "b"))
    val remapped = perDoc
      .join(canon.select(col("v").as("subj"), col("comp").as("cs")), Seq("subj"), "left")
      .select(col("doc_id"), coalesce(col("cs"), col("subj")).as("subj"),
        col("pred"), col("obj"), col("score_milli"))
    val fused = KgFusion.fuse(remapped).collect()
    assert(fused.length == 1)
    assert(fused.head.getAs[String]("subj") == "Q2") // min qid canonical
    assert(fused.head.getAs[Long]("support") == 2L)  // merged evidence
    assert(fused.head.getAs[Long]("fused_milli") == 600L) // 500 + 100·1
  }

  test("evidence: smallest-K supporting docs, set-deterministic, capped") {
    val scored = Seq(3L, 1L, 9L, 7L, 5L, 11L, 1L) // dup doc: still one witness
      .map(d => (d, "Q1", "P1", "Q2"))
      .toDF("doc_id", "subj", "pred", "obj")
    val ev = KgFusion.evidence(scored).collect().head.getString(3)
    assert(ev == "1,3,5,7,9") // cap 5, ascending, 11 dropped, dup collapsed
    // partition invariance (arrival order must not matter)
    val ev2 = KgFusion.evidence(scored.repartition(6)).collect().head.getString(3)
    assert(ev2 == ev)
    // element 0 is fuse's first_doc anchor
    val fd = KgFusion.fuse(scored.withColumn("score_milli", lit(100L)))
      .collect().head.getAs[Long]("first_doc")
    assert(ev.split(",").head.toLong == fd)
  }

  test("degreeProfile: out/in split, log2 buckets, hot flag at threshold") {
    // hub H: 20 out-edges (hot, bucket 5: 32 > 20+0... 20 → bucket 4);
    // leaves: in_deg 1 (bucket 0)
    val edges = (1 to 20).map(i => ("H", s"L$i")).toDF("src", "dst")
    val prof = ops.KgGraph.degreeProfile(edges).collect()
      .map(r => r.getString(0) -> r).toMap
    val h = prof("H")
    assert(h.getAs[Long]("out_deg") == 20L && h.getAs[Long]("in_deg") == 0L)
    assert(h.getAs[Long]("deg") == 20L)
    assert(h.getAs[Int]("bucket") == 4) // 2^4 = 16 <= 20 < 32
    assert(h.getAs[Int]("is_hot") == 1) // 20 >= HotDegreeThreshold (16)
    val l1 = prof("L1")
    assert(l1.getAs[Long]("out_deg") == 0L && l1.getAs[Long]("in_deg") == 1L)
    assert(l1.getAs[Int]("bucket") == 0 && l1.getAs[Int]("is_hot") == 0)
    // duplicate edges must not inflate degrees
    val dup = ops.KgGraph.degreeProfile(edges.unionAll(edges)).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("deg")).toMap
    assert(dup("H") == 20L)
  }

  test("kgGraph ops are partition-invariant") {
    def canon(df: org.apache.spark.sql.DataFrame, cols: String*) =
      df.orderBy(cols.map(col): _*).collect().toSeq
    val seeds = Seq("A").toDF("v")
    assert(canon(ops.KgGraph.kHop(bfsEdges, seeds, 3), "v") ==
      canon(ops.KgGraph.kHop(bfsEdges.repartition(7), seeds, 3), "v"))
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    assert(canon(ops.KgGraph.transitiveClosure(chain), "src", "dst") ==
      canon(ops.KgGraph.transitiveClosure(chain.repartition(5)), "src", "dst"))
  }
}
