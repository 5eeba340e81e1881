package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity centrality over the constructed KG — fixed-iteration PageRank in
  * INTEGER fixed point.
  *
  * Why it exists here: a 10^12-document build ranks its canonicalized
  * entities (seed selection for the alias dictionary, salting lists for the
  * skew joins, triage for human review), and the natural rank over the
  * fused triple graph is PageRank. The reference has no corpus-level graph
  * step (it scores one document at a time); this is an engine addition in
  * the same family as the fused-KG table.
  *
  * Determinism contract (the whole design): all mass is carried as BIGINT
  * fixed point (`Scale` = 10^9 units of total mass 1.0), every division is
  * INTEGER division — Spark `div` ≡ DuckDB `//` — and the iteration count
  * is fixed, so the result is a pure function of the edge set, bit-equal in
  * both engines and under any partitioning. Rounding mass is lost, never
  * redistributed (same with dangling-node mass — documented leak, as in the
  * original formulation without the dangling patch); ranks are therefore
  * slightly sub-stochastic but exactly reproducible.
  *
  * Scale shape per iteration: one equi-join of edges against the current
  * mass vector on the uniform src key + one map-side-combinable groupBy sum
  * on dst — hub inflow partial-aggregates, no windows, no driver collects.
  * Each iteration is localCheckpoint'd to cut the growing plan lineage
  * (the `labelPropagation` pattern). Out-degrees and the node count are
  * computed once.
  */
object PageRank {

  /** Total mass 1.0 in fixed-point units. */
  val Scale = 1000000000L

  /** Damping factor in permille (0.85). */
  val DampMilli = 850L

  /** Default iteration count — fixed, not convergence-tested, so the oracle
    * can replay the exact same number of unrolled steps. */
  val DefaultIters = 5

  /** edges: directed (src, dst), multiplicity ignored (distinct-ed).
    * Returns (v, mass) for every vertex appearing as src or dst. */
  def run(edges0: DataFrame, iters: Int = DefaultIters): DataFrame = {
    require(iters >= 1, s"PageRank.run: iters must be >= 1, got $iters")
    val edges = edges0.select(col("src"), col("dst")).distinct().cache()
    val nodes = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v"))).distinct().cache()
    val outd = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).cache()
    // n as a broadcast 1-row frame: keeps the op action-free (no .count()
    // on the driver) — base mass = Scale div n rides along as a column
    val nDf = nodes.agg(count(lit(1)).as("n"))
    val withBase = nodes.crossJoin(broadcast(nDf))
      .withColumn("base", expr(s"${Scale}L div n"))
      .select(col("v"), col("base")).cache()
    try {
      var mass = withBase.withColumn("mass", col("base"))
      for (_ <- 1 to iters) {
        val flow = edges
          .join(outd, "src")
          .join(mass.select(col("v").as("src"), col("mass").as("src_mass")), "src")
          .select(col("dst"), expr("src_mass div deg").as("contrib"))
        val inflow = flow.groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
        mass = withBase
          .join(inflow.withColumnRenamed("dst", "v"), Seq("v"), "left")
          .select(col("v"), col("base"),
            (expr(s"((1000 - $DampMilli) * base) div 1000") +
             expr(s"($DampMilli * coalesce(inflow, 0L)) div 1000")).as("mass"))
          .localCheckpoint()
      }
      mass.select(col("v"), col("mass"))
    } finally {
      // the returned frame is checkpoint-rooted (localCheckpoint is eager
      // and iters >= 1), so the loop-invariant inputs are safe to release
      // on every exit path
      edges.unpersist(); nodes.unpersist(); outd.unpersist(); withBase.unpersist()
    }
  }
}
