package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an entity graph — the canonicalization
  * primitive (SO4; reference: `networkx.connected_components` over the
  * mention/kb-id graph, `GLRE+KIRE/data_processing/tools.py:192-225`).
  *
  * Two implementations:
  *  - `labelPropagation`: distributed iterative min-label propagation with
  *    POINTER JUMPING (each round every vertex adopts the min of its own
  *    label, its neighbors' labels, and its label's label) — convergence in
  *    O(log diameter) rounds, not O(diameter), so a 10⁶-long drift chain
  *    needs ~20 rounds, not 10⁶. `localCheckpoint` cuts the growing
  *    lineage; hitting maxIter without converging raises (never silently
  *    returns split components).
  *  - `unionFindLocal`: plain Scala union-find for partition-local graphs
  *    (per-document canonicalization inside a kernel).
  *
  * Determinism: component label = min vertex id of the component — a pure
  * function of the graph, independent of partitioning or iteration order.
  */
object ConnectedComponents {

  /** Distributed min-label propagation with pointer jumping.
    * vertices: (scope, v); edges: (scope, src, dst) undirected.
    * Returns (scope, v, comp). Throws IllegalStateException if maxIter
    * rounds do not reach the fixpoint — an unconverged result silently
    * splits components, which no caller wants. */
  def labelPropagation(vertices: DataFrame, edges: DataFrame,
                       maxIter: Int = 20): DataFrame = {
    val bidir = edges.select(col("scope"), col("src"), col("dst"))
      .union(edges.select(col("scope"), col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    var labels = vertices.select(col("scope"), col("v"), col("v").as("comp"))
    var converged = false
    var iter = 0
    try {
      while (!converged && iter < maxIter) {
        val neighborMin = bidir
          .join(labels, bidir("scope") === labels("scope") && bidir("dst") === labels("v"))
          .select(bidir("scope"), col("src").as("v"), col("comp"))
          .groupBy("scope", "v").agg(min(col("comp")).as("ncomp"))
        val stepped = labels.join(neighborMin, Seq("scope", "v"), "left")
          .select(col("scope"), col("v"),
            least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        // pointer jump: comp := min(comp, comp(comp)) — labels are always
        // vertex ids, so the self-join on (scope, comp = v) always resolves;
        // this is what turns O(diameter) rounds into O(log diameter)
        val parents = stepped.select(col("scope").as("pscope"),
          col("v").as("pv"), col("comp").as("pcomp"))
        val next = stepped
          .join(parents, stepped("scope") === col("pscope")
            && stepped("comp") === col("pv"), "left")
          .select(stepped("scope"), stepped("v"),
            least(stepped("comp"), coalesce(col("pcomp"), stepped("comp"))).as("comp"))
          .localCheckpoint() // cut lineage; also stabilizes the loop condition
        val changed = next.join(labels.withColumnRenamed("comp", "old"), Seq("scope", "v"))
          .filter(col("comp") =!= col("old")).count()
        labels = next
        converged = changed == 0
        iter += 1
      }
    } finally {
      // labels is checkpoint-rooted; release the cache on EVERY exit path —
      // a failed mid-iteration action must not leak it for the session
      bidir.unpersist()
    }
    if (!converged)
      throw new IllegalStateException(
        s"labelPropagation: no fixpoint after $maxIter rounds — raise maxIter")
    labels
  }

  /** Exact CC per scope via partition-local union-find inside mapGroups —
    * ONE shuffle total (the groupBy), no iteration. The right shape when
    * each scope's graph is bounded (per-document graphs are ≤ max-entity
    * sized); use `labelPropagation` only for graphs too large for one task. */
  def perScopeLocal(vertices: DataFrame, edges: DataFrame,
                    spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val vs = vertices.select(col("scope"), col("v"), lit(true).as("isV"))
    val es = edges.select(col("scope"), col("src"), col("dst"))
    val tagged = vs.select(col("scope"), col("v").as("a"), col("v").as("b"), col("isV"))
      .union(es.select(col("scope"), col("src").as("a"), col("dst").as("b"), lit(false).as("isV")))
      .as[(String, String, String, Boolean)]
    tagged.groupByKey(_._1).flatMapGroups { (scope, it) =>
      val rows = it.toSeq
      val verts = rows.filter(_._4).map(_._2).distinct
      val edgeList = rows.filterNot(_._4).map(r => (r._2, r._3))
      unionFindLocal(verts, edgeList).toSeq.map { case (v, c) => (scope, v, c) }
    }.toDF("scope", "v", "comp")
  }

  /** Partition-local union-find (path compression + union by attachment to
    * smaller root id — the min-id root IS the canonical label). */
  def unionFindLocal[T](vertices: Seq[T], edges: Seq[(T, T)])(implicit ord: Ordering[T]): Map[T, T] = {
    val parent = scala.collection.mutable.Map[T, T](vertices.map(v => v -> v): _*)
    def find(x: T): T = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    vertices.map(v => v -> find(v)).toMap
  }
}
