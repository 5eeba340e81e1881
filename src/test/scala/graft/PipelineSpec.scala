package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Stages
import graft.sources.Pages

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** Reference data invariants as unit tests (SURVEY §5: the reference's inline
  * asserts, e.g. pair count n·(n−1), ATLOP+KIRE/prepro.py:157). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  lazy val pages = Pages.fromDocuments(spark, sfDir).cache()
  lazy val linked = Stages.linked(Stages.mentions(pages, spark), spark).cache()

  test("pages: per-row invariant — text column equals extractor output over html") {
    val drift = pages.filter(
      Pages.extractUdf(col("html")) =!= col("text")).count()
    assert(drift == 0)
  }

  test("pair count per (doc, sent) is exactly n·(n−1)") {
    val nEnts = linked.select("doc_id", "sent_id", "qid").distinct()
      .groupBy("doc_id", "sent_id").agg(count(lit(1)).as("n"))
    val nPairs = Stages.pairs(linked)
      .groupBy("doc_id", "sent_id").agg(count(lit(1)).as("np"))
    val bad = nEnts.join(nPairs, Seq("doc_id", "sent_id"), "left")
      .withColumn("np", coalesce(col("np"), lit(0)))
      .filter(col("np") =!= col("n") * (col("n") - 1))
      .count()
    assert(bad == 0)
  }

  test("entity linking: prio rule and intra-tier tie rule") {
    // "scan" → Q11 (prio 0 beats Q12 prio 1); "batch" → Q15 (min qid among Q15/Q16)
    val got = linked.select("alias", "qid").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!got.contains("scan") || got("scan") == "Q11")
    assert(!got.contains("batch") || got("batch") == "Q15")
  }

  test("no self-pairs, triples are distinct") {
    val t = Stages.extractTriples(pages, spark).cache()
    assert(t.filter(col("subj") === col("obj")).count() == 0)
    assert(t.count() == t.distinct().count())
  }

  test("driver contract: entry() returns rows; every query has a fn") {
    assert(SparkEntry.entry(spark).count() > 0)
    // every oracle entry must reference an existing query
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("mentions stage is fully in-row: no joins, no shuffle at all") {
    import spark.implicits._
    // hermetic in-memory input isolates the stage plan from ingest repartition
    val raw = Seq((1L, "spark uses hash join on the table")).toDF("doc_id", "text")
    val plan = Stages.mentions(raw, spark)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }
}
