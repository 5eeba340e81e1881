package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** The INCREMENTAL corpus-KG build — the snapshot loop a 10^12-document
  * engine actually runs (`TripleExtraction.run` is the per-crawl extraction
  * job; this is the KG-table lifecycle around it):
  *
  *   crawl N pages → per-doc scored triples → [[KgFusion.fuse]] →
  *   snapshot table `snapshots/snap=N` + delta table `deltas/snap=N`
  *   ([[KgFusion.snapshotDelta]] vs the previous committed snapshot) +
  *   one lineage line in `_kg_manifest.jsonl`.
  *
  * Operational contract (the parquet stand-in for Iceberg snapshots, same
  * justification as TripleExtraction's manifest):
  *
  *  - **commit point**: a snapshot's manifest line is appended only after
  *    BOTH its fused parquet and its delta parquet are fully written; a
  *    crash before that leaves a partial directory that the re-run
  *    overwrites idempotently (`mode=overwrite` to the same paths).
  *  - **resume**: re-invoking with an already-committed snapId is a no-op
  *    (returns the manifest's recorded metrics), so a driver retry loop
  *    can call blindly — the snapshot chain replays only missing links.
  *  - **delta chaining**: the previous snapshot is located from the
  *    manifest (max committed snapId < this one), NOT from directory
  *    listing — an uncommitted partial write can never become a delta
  *    base. Snapshot 0's delta is fuse-vs-empty: every triple 'added'.
  *
  * Scale shape: fuse is the map-side-combinable groupBy family
  * (KgFusion scaladoc); the delta is one full-outer SMJ on the uniform
  * triple key; status counts ride the same pass as a ≤4-row aggregate —
  * no driver-side data, no windows.
  */
object KgBuild {

  case class SnapshotMetrics(snapId: Long, nTriples: Long, added: Long,
                             removed: Long, changed: Long, wallMillis: Long)

  private def manifestPath(outDir: String) = Paths.get(outDir, "_kg_manifest.jsonl")

  /** Anchored full-record shape of one manifest line (we own the writer,
    * so the exact field order is a contract): a TORN line — a crash mid-
    * append leaving a partial record, possibly with the next record
    * concatenated onto it — cannot match the ^…$ anchors and is treated as
    * uncommitted, so the snapshot is rebuilt idempotently instead of the
    * old per-key regex scraping stitching fields from two records into one
    * bogus 'committed' entry and corrupting the delta-base chain. */
  private val ManifestLineRe =
    ("""^\{"snap":(-?\d+),"status":"done","n_triples":(-?\d+),""" +
      """"added":(-?\d+),"removed":(-?\d+),"changed":(-?\d+),""" +
      """"wall_ms":(-?\d+)\}$""").r

  /** Committed snapshots: snapId → its manifest metrics line. */
  def committed(outDir: String): Map[Long, SnapshotMetrics] = {
    val p = manifestPath(outDir)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).asScala.flatMap {
      case ManifestLineRe(id, n, a, r, c, w) =>
        Some(id.toLong -> SnapshotMetrics(id.toLong, n.toLong, a.toLong,
          r.toLong, c.toLong, w.toLong))
      case _ => None // torn/blank line: not a commit
    }.toMap
  }

  /** Build (or skip, if committed) snapshot `snapId` from `pages`.
    * `inject` selects the knowledge-injection kernel (KIRE's production
    * configuration) vs the rule kernel — both zero-shuffle fused forms.
    * `sameAs` (columns a, b) turns on cross-document entity
    * canonicalization BEFORE fusing ([[graft.ops.KgGraph.sameAsCanon]]):
    * alias assertions of one fact merge into one support count, and
    * merge-created self-loops are dropped — the q_kg_pipeline order. */
  def buildSnapshot(pages: DataFrame, outDir: String, snapId: Long,
                    spark: SparkSession, inject: Boolean = true,
                    sameAs: Option[DataFrame] = None): SnapshotMetrics = {
    Files.createDirectories(Paths.get(outDir))
    val done = committed(outDir)
    done.get(snapId) match {
      case Some(m) => return m // already committed: resume is a no-op
      case None =>
    }
    require(!done.keys.exists(_ > snapId),
      s"KgBuild: snapshot $snapId is older than committed ${done.keys.max} — " +
        "snapshots commit in order (the delta base is the previous snapshot)")

    val t0 = System.currentTimeMillis()
    val scored0 =
      (if (inject) KnowledgeInjection.extractInjectedFused(pages, spark)
       else RelationScorer.extractKernelFused(pages, spark)
         .withColumn("score_milli", lit(1000L)))
        .select("doc_id", "subj", "pred", "obj", "score_milli")
    val scored = sameAs.fold(scored0) { sa =>
      val canon = graft.ops.KgGraph.sameAsCanon(sa)
      scored0
        .join(canon.select(col("v").as("subj"), col("comp").as("cs")), Seq("subj"), "left")
        .join(canon.select(col("v").as("obj"), col("comp").as("co")), Seq("obj"), "left")
        .select(col("doc_id"),
          coalesce(col("cs"), col("subj")).as("subj"), col("pred"),
          coalesce(col("co"), col("obj")).as("obj"), col("score_milli"))
        .filter(col("subj") =!= col("obj"))
    }
    val fused = KgFusion.fuse(scored)
    fused.write.mode("overwrite").parquet(s"$outDir/snapshots/snap=$snapId")

    // delta base: previous COMMITTED snapshot (manifest, not ls)
    val written = spark.read.parquet(s"$outDir/snapshots/snap=$snapId")
    val prev = done.keys.filter(_ < snapId).maxOption.map(p =>
      spark.read.parquet(s"$outDir/snapshots/snap=$p"))
      .getOrElse(written.filter(lit(false)))
    val delta = KgFusion.snapshotDelta(prev, written)
    delta.write.mode("overwrite").parquet(s"$outDir/deltas/snap=$snapId")

    // ≤4-row status aggregate over the written delta (re-read: exact
    // committed bytes, one narrow scan)
    val counts = spark.read.parquet(s"$outDir/deltas/snap=$snapId")
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = written.count()
    val m = SnapshotMetrics(snapId, n,
      counts.getOrElse("added", 0L), counts.getOrElse("removed", 0L),
      counts.getOrElse("support_changed", 0L), System.currentTimeMillis() - t0)
    // commit point: everything above is durable before this line. The
    // record is "\n"-PREFIXED so that a previous torn append (partial line
    // without its trailing newline) can never concatenate with this one —
    // the torn fragment stays on its own (rejected) line and this record
    // starts fresh; blank lines are skipped by the anchored parse.
    Files.write(manifestPath(outDir),
      ("\n" + s"""{"snap":${m.snapId},"status":"done","n_triples":${m.nTriples},""" +
        s""""added":${m.added},"removed":${m.removed},"changed":${m.changed},""" +
        s""""wall_ms":${m.wallMillis}}""" + "\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    m
  }
}
