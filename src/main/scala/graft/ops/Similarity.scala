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

  /** Quantize a float-array embedding to exact int space + squared norm. */
  def quantized(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))").as("q"),
      expr("aggregate(transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)), 0L, (acc, v) -> acc + v * v)").as("norm2"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

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

  /** Banded sign-bit LSH sketches: `bands` independent hash tables of
    * `bitsPerBand` hyperplane sign bits each (the standard multi-table
    * random-hyperplane LSH: a pair is a candidate if ALL bits of ANY band
    * agree). Hyperplane component (j, d) is +1/-1 from md5(j|d) —
    * deterministic everywhere, no RNG state. Returns (vec_id, band, sig). */
  def bandSketches(embeddings: DataFrame, bands: Int, bitsPerBand: Int,
                   spark: SparkSession): DataFrame = {
    val q = quantized(embeddings)
    val nBits = bands * bitsPerBand
    // derive dimensionality from the data (one-row job) — a hardcoded dim
    // would silently truncate sketches on any other corpus
    val dims = embeddings.select(size(col("embedding")).as("d")).head.getInt(0)
    require(dims > 0, "bandSketches: empty embedding column")
    val planes = broadcast(
      spark.range(nBits).select(col("id").cast("int").as("j"))
        .crossJoin(spark.range(dims).select(col("id").cast("int").as("d")))
        .withColumn("sign",
          when(md5(concat(col("j").cast("string"), lit("|"), col("d").cast("string"))
            .cast("binary")).substr(1, 1) >= "8", lit(1L)).otherwise(lit(-1L))))
    q.select(col("vec_id"), posexplode(col("q")).as(Seq("d", "v")))
      .join(planes, Seq("d"))
      .groupBy(col("vec_id"), col("j"))
      .agg((sum(col("v") * col("sign")) > 0).cast("long").as("bit"))
      .withColumn("band", (col("j") / bitsPerBand).cast("int"))
      .groupBy(col("vec_id"), col("band"))
      .agg(sum(col("bit") * expr(s"CAST(pow(2, j % $bitsPerBand) AS BIGINT)")).as("sig"))
  }

  /** LSH-bucketed ANN: probes join candidates sharing any (band, sig)
    * bucket, then exact cosine re-rank inside the candidate set. At scale
    * the bucket join replaces the O(Q·N) cross join with a uniform-key
    * shuffle whose fan-in is tunable via bands/bitsPerBand. */
  def lshTopK(embeddings: DataFrame, k: Int, probeMaxId: Long,
              bands: Int, bitsPerBand: Int, spark: SparkSession): DataFrame = {
    val q = quantized(embeddings)
    val sk = bandSketches(embeddings, bands, bitsPerBand, spark)
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

  /** Embedding near-duplicate pairs: cosine above threshold (permille),
    * restricted to LSH bucket mates — the dedup-by-embedding operator. */
  def cosineNearDups(embeddings: DataFrame, minCosPermille: Int,
                     bands: Int, bitsPerBand: Int, spark: SparkSession): DataFrame = {
    val q = quantized(embeddings)
    val sk = bandSketches(embeddings, bands, bitsPerBand, spark)
    val pairIds = sk.select(col("vec_id").as("doc_a"), col("band"), col("sig"))
      .join(sk.select(col("vec_id").as("doc_b"), col("band"), col("sig")), Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    pairIds
      .join(q.select(col("vec_id").as("doc_a"), col("q").as("qa"), col("norm2").as("na")), "doc_a")
      .join(q.select(col("vec_id").as("doc_b"), col("q").as("qb"), col("norm2").as("nb")), "doc_b")
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      // exact integer threshold test in decimal(38,0): dot²·10⁶ ≥ thr²·na·nb.
      // Long math would overflow (and silently wrap) for norms ≳ 2; decimal
      // keeps it exact to 10^38, matching DuckDB's HUGEINT semantics.
      .filter(col("dot") > 0 &&
        col("dot").cast("decimal(38,0)") * col("dot") * lit(1000000L) >=
          lit(minCosPermille.toLong * minCosPermille) *
            col("na").cast("decimal(38,0)") * col("nb"))
      .select("doc_a", "doc_b", "dot")
  }
}
