package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Determinism: float embeddings are quantized to exact integers
  * (floor(x*1000 + 0.5)) before any arithmetic, so dot products and norms
  * are exact BIGINTs — invariant under summation order, partitioning, and
  * engine. The only FP op left is one division + sqrt per pair, which is
  * bit-deterministic IEEE.
  *
  * Scale path: brute force is O(Q·N) — fine when Q (the probe set) is small
  * or N is bucketed. The LSH variant buckets by sign-bit sketch so each
  * probe only joins its bucket: the join key is uniform, the shuffle is
  * bounded, and recall is tunable by the number of hyperplanes/probes.
  */
object Similarity {

  /** Let-binding for Column expressions (the Dedup.bind twin): evaluate `c`
    * ONCE and reference it through a lambda variable. A threshold filter
    * that references the same dot-product aggregate several times gets
    * pushed into the candidate join's CONDITION, where interpreted HOFs
    * have no common-subexpression elimination — the 32-dim zip_with
    * aggregate was evaluated three times per candidate pair (measured in
    * q_text_neardup's plan). */
  private def bind(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Sketch-bucket cap (mirrors Dedup.MaxBandDf): a degenerate (band, sig)
    * bucket — e.g. an all-equal embedding cluster — would emit O(df²) join
    * rows; buckets above the cap are dropped from the candidate joins, and
    * the DuckDB oracles apply the identical rule. */
  val MaxBandDf = 1000

  private def cappedBuckets(sk: DataFrame, maxBandDf: Int): DataFrame = {
    // map-side-combinable groupBy + semi-join, NOT a count window: the
    // window form sorts every bucket and single-tasks the degenerate one —
    // the exact funnel the cap defends against. The build side recomputes
    // the in-row sketch projection (cheap, zero shuffle) rather than
    // persisting the frame — a session-lifetime cache with no release
    // point is the worse trade for a lazily-returned operator.
    val sane = sk.groupBy("band", "sig").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxBandDf)
      .select("band", "sig")
    sk.join(sane, Seq("band", "sig"), "left_semi")
  }

  /** Quantize a float-array embedding to exact int space + squared norm. */
  def quantized(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))").as("q"),
      expr("aggregate(transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)), 0L, (acc, v) -> acc + v * v)").as("norm2"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** (-cosine, cell) struct over a (q, norm2) row vs a centroid struct `c`:
    * lexicographic order = cosine desc, cell asc; a zero norm on either
    * side → cosine −2 (see ivfTopK's NaN note). */
  private def negCosCell(c: Column): Column = struct(
    when(col("norm2") === 0 || c.getField("cn") === 0, lit(2.0))
      .otherwise(lit(-1.0) * dotQ(col("q"), c.getField("cq")).cast("double") /
        sqrt(col("norm2").cast("double") * c.getField("cn").cast("double")))
      .as("negcos"),
    c.getField("cell").cast("long").as("cell"))

  /** Nearest-centroid id as a RUNNING lexicographic min over the broadcast
    * `cents` array — O(nlist) comparisons per row with no ranked-array
    * materialization; shared by query-time assignment and k-means. */
  private def nearestCell: Column =
    aggregate(col("cents"),
      struct(lit(Double.MaxValue).as("negcos"), lit(Long.MaxValue).as("cell")),
      // bind: a Scala `val` of the candidate struct still builds the
      // expression TREE twice (comparison + selected branch), so the
      // centroid dot product would run 2× per centroid — the lambda
      // variable evaluates it once
      (acc, c) => bind(negCosCell(c)) { cand =>
        when(cand < acc, cand).otherwise(acc) })
      .getField("cell")

  /** Codebook rows (cell, cq, cn) = the embeddings of the `nlist` lowest
    * vec_ids — deterministic by construction, so the DuckDB oracle replays
    * it exactly. Also the k-means seed. */
  def firstNCodebook(q: DataFrame, nlist: Int): DataFrame =
    q.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cell"), col("q").as("cq"), col("norm2").as("cn"))

  /** K-means IVF codebook in quantized int space — the production hook the
    * first-N codebook stands in for. Lloyd iterations with the SAME cosine
    * assignment used at query time, seeded from `firstNCodebook`.
    *
    * Determinism (partitioning-invariant, run-to-run bit-identical):
    * per-dimension centroid updates are exact BIGINT sums (associative +
    * commutative) divided once with half-up rounding; the seed is fixed;
    * ties in assignment break to the lowest cell id. Empty cells keep
    * their previous centroid, so the codebook always holds `nlist` rows.
    *
    * Scale shape: each iteration broadcasts the codebook (nlist·dims ints)
    * and runs ONE posexplode + groupBy(cell, dim) aggregation — N·d rows
    * into nlist·d groups, map-side combined. Train on a SAMPLE (pass
    * `embeddings.sample(...)` / `.limit(n)`), as production IVF training
    * does; `ivfTopK`'s assign/probe/rerank dataflow is codebook-agnostic. */
  def kmeansCodebook(embeddings: DataFrame, nlist: Int, iters: Int,
                     spark: SparkSession): DataFrame = {
    val q = quantized(embeddings).cache()
    var cents = firstNCodebook(q, nlist)
    try {
      for (_ <- 0 until iters) {
        val cb = cents.agg(
          array_sort(collect_list(struct(col("cell"), col("cq"), col("cn")))).as("cents"))
        val assigned = q.crossJoin(broadcast(cb))
          .withColumn("cell", nearestCell)
          .select(col("cell"), posexplode(col("q")).as(Seq("d", "v")))
        val means = assigned.groupBy("cell", "d")
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          // exact-int mean, half-up: sums are milli-scale ints well inside
          // double's 53-bit mantissa, so the division is deterministic
          .withColumn("m", floor(col("s").cast("double") / col("n") + 0.5).cast("long"))
          .groupBy("cell")
          .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
            x => x.getField("m")).as("cq"))
          .withColumn("cn", aggregate(col("cq"), lit(0L), (a, v) => a + v * v))
        cents = cents.select(col("cell"), col("cq").as("oq"), col("cn").as("on"))
          .join(means.select(col("cell"), col("cq").as("nq"), col("cn").as("nn")),
            Seq("cell"), "left")
          .select(col("cell"), coalesce(col("nq"), col("oq")).as("cq"),
            coalesce(col("nn"), col("on")).as("cn"))
          .localCheckpoint() // cut the per-iteration lineage growth
      }
      cents
    } finally q.unpersist()
  }

  /** Brute-force cosine top-k: for each probe vector (vec_id in probeIds),
    * the k nearest neighbors by cosine over the whole table. */
  def bruteForceTopK(embeddings: DataFrame, k: Int, probeMaxId: Long): DataFrame = {
    val q = quantized(embeddings)
    val probes = q.filter(col("vec_id") < probeMaxId)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("norm2").as("na"))
    val cands = q.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("norm2").as("nb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes.join(cands, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("na").cast("double") * col("nb").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "dot")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Banded sign-bit LSH sketches: `bands` independent hash tables of
    * `bitsPerBand` hyperplane sign bits each (the standard multi-table
    * random-hyperplane LSH: a pair is a candidate if ALL bits of ANY band
    * agree). Hyperplane component (j, d) is +1/-1 from md5(j|d) —
    * deterministic everywhere, no RNG state. Returns (vec_id, band, sig).
    *
    * Fully in-row: the sign matrix is a plan literal and each row computes
    * all its band signatures via array HOFs — ZERO shuffles for sketching
    * (the old posexplode+join formulation moved N×dims×nBits rows through
    * two aggregations). At very large dims×nBits swap the literal for a
    * broadcast variable; at 64×32 it is ~16 KB of plan. */
  def bandSketches(embeddings: DataFrame, bands: Int, bitsPerBand: Int,
                   spark: SparkSession): DataFrame = {
    val q = quantized(embeddings)
    val nBits = bands * bitsPerBand
    // derive dimensionality from the data (one-row job) — a hardcoded dim
    // would silently truncate sketches on any other corpus
    val dims = embeddings.select(size(col("embedding")).as("d")).head.getInt(0)
    require(dims > 0, "bandSketches: empty embedding column")
    // signs(j)(d) = +1 iff first md5 hex digit of "j|d" >= '8' — identical
    // to SQL md5(concat(j, '|', d)) in both Spark and DuckDB
    val signs: Seq[Seq[Long]] = (0 until nBits).map { j =>
      (0 until dims).map(d => if (md5Hex(s"$j|$d").charAt(0) >= '8') 1L else -1L)
    }
    val signsLit = typedLit(signs)
    val pow2 = typedLit((0 until bitsPerBand).map(k => 1L << k))
    q.select(col("vec_id"),
        transform(sequence(lit(0), lit(nBits - 1)), j =>
          when(aggregate(zip_with(col("q"), element_at(signsLit, j + 1),
            (x, s) => x * s), lit(0L), (a, v) => a + v) > 0, lit(1L))
            .otherwise(lit(0L))).as("bits"))
      .select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          aggregate(sequence(lit(0), lit(bitsPerBand - 1)), lit(0L),
            (acc, k) => acc +
              element_at(col("bits"), b * bitsPerBand + k + 1) *
                element_at(pow2, k + 1)))).as(Seq("band", "sig")))
  }

  /** mapPartitions twin of `bandSketches` — row-identical (spec-pinned),
    * ~10× cheaper: the HOF path interprets bands·bits·dims multiply-adds
    * per row through Catalyst's expression walker; here it's a tight long
    * loop. Same md5-derived sign matrix, same floor(x·1000 + 0.5)
    * quantization, same `sum > 0` bit rule — the DuckDB oracles replay the
    * arithmetic, not the execution strategy, so they hold unchanged.
    * Ragged rows fail loudly (the HOF form would zip_with-pad with nulls
    * and emit garbage silently). */
  def bandSketchesKernel(embeddings: DataFrame, bands: Int, bitsPerBand: Int,
                         spark: SparkSession): DataFrame = {
    import spark.implicits._
    val nBits = bands * bitsPerBand
    val dims = embeddings.select(size(col("embedding")).as("d")).head.getInt(0)
    require(dims > 0, "bandSketchesKernel: empty embedding column")
    val signs: Array[Array[Long]] = Array.tabulate(nBits) { j =>
      Array.tabulate(dims)(d => if (md5Hex(s"$j|$d").charAt(0) >= '8') 1L else -1L)
    }
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        it.flatMap { case (id, emb) =>
          require(emb.length == dims,
            s"bandSketchesKernel: row $id has ${emb.length} dims, expected $dims")
          val q = new Array[Long](dims)
          var d = 0
          while (d < dims) { q(d) = math.floor(emb(d) * 1000.0 + 0.5).toLong; d += 1 }
          (0 until bands).iterator.map { b =>
            var sig = 0L
            var k = 0
            while (k < bitsPerBand) {
              val row = signs(b * bitsPerBand + k)
              var s = 0L
              var d2 = 0
              while (d2 < dims) { s += q(d2) * row(d2); d2 += 1 }
              if (s > 0) sig |= (1L << k)
              k += 1
            }
            (id, b, sig)
          }
        }
      }.toDF("vec_id", "band", "sig")
  }

  /** LSH-bucketed ANN: probes join candidates sharing any (band, sig)
    * bucket, then exact cosine re-rank inside the candidate set. At scale
    * the bucket join replaces the O(Q·N) cross join with a uniform-key
    * shuffle whose fan-in is tunable via bands/bitsPerBand. */
  def lshTopK(embeddings: DataFrame, k: Int, probeMaxId: Long,
              bands: Int, bitsPerBand: Int, spark: SparkSession,
              maxBandDf: Int = MaxBandDf): DataFrame = {
    val q = quantized(embeddings)
    val sk = cappedBuckets(
      bandSketchesKernel(embeddings, bands, bitsPerBand, spark), maxBandDf)
    val probeSk = sk.filter(col("vec_id") < probeMaxId)
      .select(col("vec_id").as("query_id"), col("band"), col("sig"))
    val candPairs = probeSk.join(sk.withColumnRenamed("vec_id", "neighbor_id"), Seq("band", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candPairs
      .join(q.select(col("vec_id").as("query_id"), col("q").as("qa"), col("norm2").as("na")), "query_id")
      .join(q.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("norm2").as("nb")), "neighbor_id")
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("na").cast("double") * col("nb").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "dot")
  }

  /** IVF (inverted-file) ANN: a coarse codebook of `nlist` centroids
    * partitions the corpus into cells; each query probes only its `nprobe`
    * nearest cells and re-ranks exactly inside them — the third ANN shape
    * next to brute force (O(Q·N)) and LSH (bucket join).
    *
    * Codebook: `firstNCodebook` by default (deterministic by construction
    * so the DuckDB oracle replays it exactly); pass
    * `Some(kmeansCodebook(...))` for the trained production codebook — the
    * scale-bearing dataflow this operator pins is ASSIGN + PROBE + RERANK,
    * which is codebook-agnostic.
    *
    * Scale shape: the codebook is collected to ONE row and broadcast
    * (nlist·dims ints — ~64 MB at nlist 2¹⁶ × dims 128, broadcastable);
    * cell assignment for CORPUS rows is a RUNNING lexicographic min over
    * the codebook (`aggregate` HOF) — O(nlist) comparisons per row with no
    * per-row array materialization or O(nlist·log nlist) sort; only the
    * (few) probe rows build the fully-ranked cell list. ZERO shuffle for
    * the corpus scan, no N×nlist row blowup. The only shuffle is the
    * candidate join keyed by cell (mean fan-in N/nlist; a hot cell is an
    * AQE skew-join / `Skew.saltedJoin` case). Ties (equal cosine) break to
    * the lowest cell id in both engines. A zero-norm vector or centroid is
    * given cosine −2 (below any true cosine) in BOTH engines — the 0/0 NaN
    * it would otherwise produce sorts oppositely in Spark's ascending
    * array_sort (NaN last) and DuckDB's ORDER BY … DESC (NaN first). */
  def ivfTopK(embeddings: DataFrame, k: Int, probeMaxId: Long,
              nlist: Int, nprobe: Int, spark: SparkSession,
              codebookRows: Option[DataFrame] = None): DataFrame = {
    val q = quantized(embeddings)
    val codebook = codebookRows.getOrElse(firstNCodebook(q, nlist))
      .agg(array_sort(collect_list(struct(col("cell"), col("cq"), col("cn")))).as("cents"))
    val withCents = q.crossJoin(broadcast(codebook))
    val assigned = withCents
      .withColumn("cell", nearestCell)
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        col("q").as("qb"), col("norm2").as("nb"))
    val probes = withCents.filter(col("vec_id") < probeMaxId)
      .withColumn("ranked_cells", array_sort(transform(col("cents"), negCosCell(_))))
      .select(col("vec_id").as("query_id"),
        explode(transform(slice(col("ranked_cells"), 1, nprobe),
          c => c.getField("cell"))).as("cell"),
        col("q").as("qa"), col("norm2").as("na"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // a neighbor reachable through two probed cells must count once; rows
      // for the same pair are identical (same vectors), so keep-any is exact
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      .withColumn("cosine",
        when(col("na") === 0 || col("nb") === 0, lit(-2.0)).otherwise(
          col("dot").cast("double") / sqrt(col("na").cast("double") * col("nb").cast("double"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "dot")
  }

  /** SemDeDup-class SEMANTIC deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embeddings with the IVF codebook, then
    * WITHIN each cluster drop every vector that has a lower-id near
    * duplicate (cosine ≥ minCosPermille/1000). Returns a total annotation —
    * one row per input vector: (vec_id, cell, n_dups, kept) where `n_dups`
    * counts the lower-id in-cell witnesses and `kept = 0` iff n_dups > 0.
    *
    * Drop rule: the paper keeps one representative per near-dup group; the
    * deterministic relational form of that choice is "drop x iff ∃ y in the
    * same cell with y.vec_id < x.vec_id and cos(x, y) ≥ θ" — the lowest-id
    * member of every in-cell duplicate group survives, independent of
    * partitioning and row order. (In a chain a~b, b~c, a≁c this drops c as
    * well — by-witness greedy, the conservative side: never keeps two
    * vectors that are mutual near-dups.)
    *
    * Scale shape: cell assignment is the ivfTopK corpus path — broadcast
    * codebook + running in-row min, ZERO shuffle. The only shuffle is the
    * within-cell self-join keyed by cell: O(m²) dots per cell of size m,
    * which is the SemDeDup design point — nlist is chosen so m = N/nlist
    * stays small (the paper uses ~√N clusters); a hot cell is an AQE
    * skew-join / `Skew.saltedJoin` case. The assignment is recomputed for
    * the second join branch (cheap in-row work) rather than cached — same
    * trade as `cappedBuckets`. Exact integer threshold in decimal(38,0),
    * identical to `cosineNearDups`. */
  def semDedup(embeddings: DataFrame, nlist: Int, minCosPermille: Int,
               spark: SparkSession,
               codebookRows: Option[DataFrame] = None): DataFrame = {
    val q = quantized(embeddings)
    val codebook = codebookRows.getOrElse(firstNCodebook(q, nlist))
      .agg(array_sort(collect_list(struct(col("cell"), col("cq"), col("cn")))).as("cents"))
    val assigned = q.crossJoin(broadcast(codebook))
      .withColumn("cell", nearestCell)
      .select(col("vec_id"), col("cell"), col("q"), col("norm2"))
    val lower = assigned.select(col("cell"), col("vec_id").as("a_id"),
      col("q").as("qa"), col("norm2").as("na"))
    val dups = lower
      .join(assigned.select(col("cell"), col("vec_id"),
        col("q").as("qb"), col("norm2").as("nb")), Seq("cell"))
      .filter(col("a_id") < col("vec_id"))
      // bind: one dot evaluation per in-cell pair even after predicate
      // pushdown into the join condition (see cosineNearDups)
      .filter(bind(dotQ(col("qa"), col("qb"))) { d =>
        d > 0 && d.cast("decimal(38,0)") * d * lit(1000000L) >=
          lit(minCosPermille.toLong * minCosPermille) *
            col("na").cast("decimal(38,0)") * col("nb") })
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("dup_wit"))
    assigned.select(col("vec_id"), col("cell"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("dup_wit"), lit(0L)).as("n_dups"),
        col("dup_wit").isNull.cast("int").as("kept"))
  }

  /** Embedding near-duplicate pairs: cosine above threshold (permille),
    * restricted to LSH bucket mates — the dedup-by-embedding operator.
    *
    * RECALL MODEL (this is approximate by design — a qualifying pair that
    * collides in NO band is dropped): for cosine c, two vectors agree on one
    * random-hyperplane bit with p = 1 − arccos(c)/π, so
    *   P(miss) = (1 − p^bitsPerBand)^bands.
    * At the dedup operating point (SparkEntry.DedupBands ×
    * DedupBitsPerBand = 16 bands × 10 bits):
    *   c = 0.999 → p ≈ 0.9858 → miss ≈ 1e-14
    *   c = 0.99  → p ≈ 0.9549 → miss ≈ 1.2e-7
    *   c = 0.95  → p ≈ 0.8989 → miss ≈ 1.2e-3
    *   c = 0.92  → p ≈ 0.8718 → miss ≈ 9.2e-3
    *   c = 0.80  → p ≈ 0.7952 → miss ≈ 0.18
    * i.e. a dedup point (≥0.92 thresholds), NOT broad 0.8-similarity
    * search — lower the threshold and you must raise bands (miss falls
    * exponentially in `bands`, which is also why 16×10 dominates the old
    * 8×8: measured at sf0.1 it lifted recall 0.928 → 0.982 AND halved the
    * wall clock, because the extra signature bits split the degenerate
    * buckets a self-similar corpus produces). The DuckDB oracle replays the
    * same band buckets, so it pins the arithmetic, not the recall — the
    * recall bound is pinned separately by an exact-all-pairs comparison in
    * OpsSpec. */
  def cosineNearDups(embeddings: DataFrame, minCosPermille: Int,
                     bands: Int, bitsPerBand: Int, spark: SparkSession,
                     maxBandDf: Int = MaxBandDf): DataFrame = {
    val q = quantized(embeddings)
    // bounded-buffer bucket + in-row pair emission (shared Buckets shape):
    // no sketch recompute for a second join branch, no full bucket
    // materialization — over-cap buckets drop exactly as cappedBuckets did
    val pairIds = Buckets.pairsWithin(
      bandSketchesKernel(embeddings, bands, bitsPerBand, spark),
      Seq("band", "sig"), "vec_id", maxBandDf)
    pairIds
      .join(q.select(col("vec_id").as("doc_a"), col("q").as("qa"), col("norm2").as("na")), "doc_a")
      .join(q.select(col("vec_id").as("doc_b"), col("q").as("qb"), col("norm2").as("nb")), "doc_b")
      .filter(col("doc_a") < col("doc_b"))
      // exact integer threshold test in decimal(38,0): dot²·10⁶ ≥ thr²·na·nb.
      // Long math would overflow (and silently wrap) for norms ≳ 2; decimal
      // keeps it exact to 10^38, matching DuckDB's HUGEINT semantics.
      // `bind` evaluates the dot aggregate ONCE per candidate even after
      // the optimizer pushes this predicate into the join condition; the
      // output `dot` column re-evaluates only on the (few) survivors.
      .filter(bind(dotQ(col("qa"), col("qb"))) { d =>
        d > 0 && d.cast("decimal(38,0)") * d * lit(1000000L) >=
          lit(minCosPermille.toLong * minCosPermille) *
            col("na").cast("decimal(38,0)") * col("nb") })
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      .select("doc_a", "doc_b", "dot")
  }
}
