package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic TransE-style KG-embedding training — the "KG-embedding
  * neighbors" half of KIRE's knowledge injection, reproduced as a batch
  * operator instead of a GPU job.
  *
  * The reference consumes PRETRAINED TransE vectors over the KB dump
  * (`ATLOP+KIRE/knowledge_injection_layer/kg_data_loader.py` loads them;
  * the public TransE recipe is margin-based ranking with corrupted-tail
  * negatives). This operator trains them INSIDE the engine, but under the
  * repo-wide determinism contract so the DuckDB oracle replays training
  * bit-exactly:
  *
  *  - embeddings live in INTEGER quanta (init in [-InitQ, InitQ] derived
  *    from md5(id|dim), the same hash-init family as the doc vectors);
  *  - the loss is L1 margin ranking; its gradient is a SIGN vector, so a
  *    unit learning rate keeps every update an integer;
  *  - negatives are corrupted tails picked by content hash against the
  *    dense entity index (DenseIds) — reproducible, no RNG;
  *  - updates within an epoch are SYNCHRONOUS: every violated triple
  *    contributes sign deltas, deltas are summed per (kind, id, dim) in one
  *    map-side-combinable groupBy, then applied — partition-order exact,
  *    unlike hogwild SGD.
  *
  * Scale shape per epoch: the per-dim diff table is |triples|·Dim rows built
  * from four equi-joins against the embedding table on the uniform (id, k)
  * key; violations are one groupBy on the triple key; the delta sum is one
  * groupBy on (kind, id, k). A hub entity appearing in 10^7 triples partial-
  * aggregates its deltas map-side — no windows, no driver loops; epochs are
  * localCheckpoint'd to cut lineage growth.
  */
object KgEmbedding {

  /** Embedding dimensionality (small: the oracle replays per-dim rows). */
  val Dim = 4

  /** Init quantum bound: init values are uniform-ish in [-InitQ, InitQ]. */
  val InitQ = 8

  /** Unit integer learning rate (sign-gradient updates stay integral). */
  val Lr = 1L

  /** L1 margin in embedding quanta. */
  val Margin = 24L

  /** Default epoch count — fixed so the oracle unrolls the same steps. */
  val DefaultEpochs = 2

  private def hex3(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("binary")), 1, 3), 16, 10).cast("long")

  private def hex6(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("binary")), 1, 6), 16, 10).cast("long")

  private def sgn(c: org.apache.spark.sql.Column) =
    when(c > 0, 1L).when(c < 0, -1L).otherwise(0L)

  /** Per-dim exploded frame: (id) × k in [0, Dim). */
  private def withDims(df: DataFrame): DataFrame =
    df.withColumn("k", explode(sequence(lit(0), lit(Dim - 1))))

  /** Initial embedding rows (kind, id, k, val):
    * val = hex3(md5(id|k)) % (2·InitQ+1) − InitQ. */
  def initEmbeddings(entities: DataFrame, relations: DataFrame): DataFrame = {
    def init(kind: String, df: DataFrame) = withDims(df.select(col("id")))
      .select(lit(kind).as("kind"), col("id"), col("k"),
        (hex3(concat_ws("|", col("id"), col("k"))) % lit(2 * InitQ + 1) - InitQ).as("val"))
    init("e", entities).unionAll(init("r", relations))
  }

  /** Train `epochs` synchronous epochs over kg (h, r, t); returns the final
    * embedding table (kind, id, k, val) — kind 'e' for entities, 'r' for
    * relations. */
  def train(kg0: DataFrame, spark: SparkSession, epochs: Int = DefaultEpochs): DataFrame = {
    require(epochs >= 1, s"KgEmbedding.train: epochs must be >= 1, got $epochs")
    val kg = kg0.select(col("h"), col("r"), col("t")).distinct()
    val ents = kg.select(col("h").as("id")).union(kg.select(col("t").as("id"))).distinct()
    val rels = kg.select(col("r").as("id")).distinct()
    // dense 0-based entity index in id order (two-phase, no global window)
    val eidx = DenseIds.globalDenseId(ents.select(col("id").as("e")), "idx",
      Seq(col("e").asc))
    val nDf = ents.agg(count(lit(1)).as("n"))
    // corrupted tail: the entity whose dense index = hash(h|r|t) mod n —
    // reproducible negative sampling with no RNG state
    val negt = kg.crossJoin(broadcast(nDf))
      .withColumn("nidx", hex6(concat_ws("|", col("h"), col("r"), col("t"))) % col("n"))
      .join(eidx.select(col("idx").as("nidx"), col("e").as("tneg")), Seq("nidx"))
      .select(col("h"), col("r"), col("t"), col("tneg"))
    val perDim = withDims(negt).cache()

    var emb = initEmbeddings(ents, rels).localCheckpoint()
    try {
      for (_ <- 1 to epochs) {
        def side(kind: String, idCol: String, valName: String) =
          emb.filter(col("kind") === kind)
            .select(col("id").as(idCol), col("k"), col("val").as(valName))
        val diff = perDim
          .join(side("e", "h", "vh"), Seq("h", "k"))
          .join(side("r", "r", "vr"), Seq("r", "k"))
          .join(side("e", "t", "vt"), Seq("t", "k"))
          .join(side("e", "tneg", "vn"), Seq("tneg", "k"))
          .select(col("h"), col("r"), col("t"), col("tneg"), col("k"),
            (col("vh") + col("vr") - col("vt")).as("pd"),
            (col("vh") + col("vr") - col("vn")).as("nd"))
        val viol = diff.groupBy(col("h"), col("r"), col("t"), col("tneg"))
          .agg(sum(abs(col("pd"))).as("dpos"), sum(abs(col("nd"))).as("dneg"))
          .filter(col("dpos") + Margin > col("dneg"))
          .select("h", "r", "t", "tneg")
        val dv = diff.join(viol, Seq("h", "r", "t", "tneg"))
          .withColumn("sp", sgn(col("pd"))).withColumn("sn", sgn(col("nd")))
        val upd = dv.select(lit("e").as("kind"), col("h").as("id"), col("k"),
            ((col("sn") - col("sp")) * Lr).as("delta"))
          .unionAll(dv.select(lit("r").as("kind"), col("r").as("id"), col("k"),
            ((col("sn") - col("sp")) * Lr).as("delta")))
          .unionAll(dv.select(lit("e").as("kind"), col("t").as("id"), col("k"),
            (col("sp") * Lr).as("delta")))
          .unionAll(dv.select(lit("e").as("kind"), col("tneg").as("id"), col("k"),
            (-col("sn") * Lr).as("delta")))
          .groupBy(col("kind"), col("id"), col("k")).agg(sum(col("delta")).as("delta"))
        emb = emb.join(upd, Seq("kind", "id", "k"), "left")
          .select(col("kind"), col("id"), col("k"),
            (col("val") + coalesce(col("delta"), lit(0L))).as("val"))
          .localCheckpoint()
      }
      emb
    } finally {
      perDim.unpersist()
      DenseIds.releasePersisted()
    }
  }

  /** L1 energy d(h+r−t) per KG triple under an embedding table — the
    * training objective, exposed for specs and ranking. */
  def energies(emb: DataFrame, kg: DataFrame): DataFrame = {
    def side(kind: String, idCol: String, valName: String) =
      emb.filter(col("kind") === kind)
        .select(col("id").as(idCol), col("k"), col("val").as(valName))
    withDims(kg.select(col("h"), col("r"), col("t")).distinct())
      .join(side("e", "h", "vh"), Seq("h", "k"))
      .join(side("r", "r", "vr"), Seq("r", "k"))
      .join(side("e", "t", "vt"), Seq("t", "k"))
      .groupBy(col("h"), col("r"), col("t"))
      .agg(sum(abs(col("vh") + col("vr") - col("vt"))).as("energy"))
  }

  /** Top-k nearest entities per entity in trained L1 embedding space —
    * the "KG-embedding neighbors" feature KIRE injects. Brute-force pair
    * distance (documented O(n²·Dim) — the KB entity vocabulary is
    * dictionary-scale; corpus-scale vectors go through Similarity's
    * LSH/IVF paths). */
  def nearestEntities(emb: DataFrame, topK: Int): DataFrame = {
    val e = emb.filter(col("kind") === "e")
    val a = e.select(col("id").as("a"), col("k"), col("val").as("va"))
    val b = e.select(col("id").as("b"), col("k"), col("val").as("vb"))
    val d = a.join(b, Seq("k")).filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(sum(abs(col("va") - col("vb"))).as("dist"))
    // rank per a: the per-a partition is bounded by the KB entity
    // vocabulary (dictionary-scale), never by corpus size
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("a")).orderBy(col("dist").asc, col("b").asc)
    d.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("a"), col("b"), col("dist"), col("rank"))
  }
}
