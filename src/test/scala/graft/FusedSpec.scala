package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Stages
import graft.sources.Pages

/** The fused single-shuffle pipeline must be result-identical to the staged
  * path, and its physical plan must actually be shuffle-free before the
  * final dedup. */
class FusedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("fused path == staged path, row for row") {
    val pages = Pages.fromDocuments(spark, sfDir).cache()
    val fused = Stages.extractTriplesFused(pages, spark)
    val staged = Stages.extractTriples(pages, spark)
    assert(fused.exceptAll(staged).count() == 0)
    assert(staged.exceptAll(fused).count() == 0)
  }

  test("fused plan has exactly one exchange (the final dedup)") {
    import spark.implicits._
    // raw in-memory pages: isolates pipeline topology from ingest repartition
    val pages = Seq((1L, "spark joins customer table")).toDF("doc_id", "text")
    val plan = Stages.extractTriplesFused(pages, spark)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected only the dedup exchange, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "fused path must not join at all")
  }

  test("mapPartitions kernel == fused HOF path, row for row") {
    val pages = Pages.fromDocuments(spark, sfDir).cache()
    val kernel = Stages.extractTriplesKernel(pages, spark)
    val fused = Stages.extractTriplesFused(pages, spark)
    assert(kernel.exceptAll(fused).count() == 0)
    assert(fused.exceptAll(kernel).count() == 0)
    // and on punctuated multi-sentence text with multi-word aliases
    import spark.implicits._
    val tricky = Seq(
      (1L, "spark uses sort merge join. customer likes merge join order."),
      (2L, "hash. join table scan batch"),
      (3L, (0 until 40).map(i => if (i == 15) "hash" else if (i == 16) "join" else "x").mkString(" ")))
      .toDF("doc_id", "text")
    val k2 = Stages.extractTriplesKernel(tricky, spark)
    val f2 = Stages.extractTriplesFused(tricky, spark)
    assert(k2.exceptAll(f2).count() == 0 && f2.exceptAll(k2).count() == 0)
  }

  test("duplicate doc_id input: kernel duplicates, fused dedups — the documented divergence") {
    import spark.implicits._
    // the kernel's unique-doc_id PRECONDITION made explicit: same doc_id
    // twice → kernel emits each triple twice, fused's global distinct once
    val dup = Seq((1L, "spark joins customer table"),
                  (1L, "spark joins customer table")).toDF("doc_id", "text")
    val k = Stages.extractTriplesKernel(dup, spark)
    val f = Stages.extractTriplesFused(dup, spark)
    assert(f.count() > 0 && k.count() == 2 * f.count(),
      "kernel must emit per-input-row; fused must dedup globally")
    assert(k.distinct().exceptAll(f).count() == 0 &&
      f.exceptAll(k.distinct()).count() == 0,
      "after an explicit distinct the kernel matches fused")
  }

  test("mentionsKernel == declarative mentions, row for row") {
    val pages = Pages.fromDocuments(spark, sfDir).cache()
    val k = Stages.mentionsKernel(pages, spark)
    val d = Stages.mentions(pages, spark)
    assert(k.exceptAll(d).count() == 0)
    assert(d.exceptAll(k).count() == 0)
    import spark.implicits._
    val tricky = Seq(
      (1L, "spark uses sort merge join. merge join order here."),
      (2L, "hash. join table scan batch"))
      .toDF("doc_id", "text")
    val k2 = Stages.mentionsKernel(tricky, spark)
    val d2 = Stages.mentions(tricky, spark)
    assert(k2.exceptAll(d2).count() == 0 && d2.exceptAll(k2).count() == 0)
  }

  test("fused scored kernel == staged pairFeatures+score path, row for row") {
    val pages = Pages.fromDocuments(spark, sfDir).cache()
    val staged = graft.pipeline.RelationScorer.extract(
      Stages.linkedFast(Stages.mentionsKernel(pages, spark), spark), spark)
      .select(col("doc_id"), col("subj"), col("pred"), col("obj"),
        col("score"), col("evidence").cast("string"))
    val fused = graft.pipeline.RelationScorer.extractKernelFused(pages, spark)
      .select(col("doc_id"), col("subj"), col("pred"), col("obj"),
        col("score"), col("evidence").cast("string"))
    assert(fused.exceptAll(staged).count() == 0)
    assert(staged.exceptAll(fused).count() == 0)
    // and the fused plan has no Exchange at all (scored triples stream
    // straight from the page scan to the sink) — raw in-memory pages so the
    // assert sees pipeline topology, not the cached ingest lineage
    import spark.implicits._
    val raw = Seq((1L, "spark joins customer table")).toDF("doc_id", "text")
    val plan = graft.pipeline.RelationScorer.extractKernelFused(raw, spark)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fused scorer must not shuffle:\n$plan")
  }

  test("resolved dictionary matches the relational vote winners") {
    val pages = Pages.fromDocuments(spark, sfDir)
    val relational = Stages.linked(Stages.mentions(pages, spark), spark)
      .select("alias", "qid").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val resolved = Stages.resolvedAliases.map(r => r._1 -> r._2).toMap
    for ((a, q) <- relational) assert(resolved(a) == q, s"alias $a")
  }

  test("linkedFast is row-identical to the relational vote path") {
    val pages = Pages.fromDocuments(spark, sfDir).cache()
    val m = Stages.mentions(pages, spark)
    val slow = Stages.linked(m, spark)
    val fast = Stages.linkedFast(m, spark)
    assert(fast.exceptAll(slow).count() == 0)
    assert(slow.exceptAll(fast).count() == 0)
  }
}
