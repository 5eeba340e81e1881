package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *    contributes sign deltas, deltas are summed per (kind, id) in one
  *    map-side-combinable vector aggregation, then applied — partition-
  *    order exact (integer addition), unlike hogwild SGD.
  *
  * Scale shape per epoch — FOUR shuffles total, none carrying a per-dim
  * row blow-up: embeddings travel as (kind, id, vals: array[Dim]) rows;
  * the triple's four embedding reads are one MELTED equi-join (4 rows per
  * triple against the embedding table on the uniform (kind, id) key — one
  * shuffle instead of four chained joins), pivoted back by a bounded
  * 4-row groupBy on the triple key; margin check, sign gradients, and the
  * four per-role delta vectors are pure in-row array arithmetic; delta
  * summation is one groupBy over [[graft.functions.VectorSum]] (fixed
  * Dim-long buffer, so a hub entity touched by 10^7 triples partial-
  * aggregates map-side); the update join applies deltas with `zip_with`.
  * Epochs are localCheckpoint'd to cut lineage growth.
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

  private def hex3(c: Column) =
    conv(substring(md5(c.cast("binary")), 1, 3), 16, 10).cast("long")

  private def hex6(c: Column) =
    conv(substring(md5(c.cast("binary")), 1, 6), 16, 10).cast("long")

  private def sgn(c: Column) =
    when(c > 0, 1L).when(c < 0, -1L).otherwise(0L)

  private def l1(c: Column): Column =
    aggregate(c, lit(0L), (acc, x) => acc + abs(x))

  /** Init vector for one id: vals(k) = hex3(md5(id|k)) % (2·InitQ+1) − InitQ
    * — element-identical to [[initEmbeddings]]'s per-(id, k) rows. */
  private def initVec(idCol: Column): Column =
    transform(sequence(lit(0), lit(Dim - 1)),
      k => hex3(concat_ws("|", idCol, k)) % lit(2 * InitQ + 1) - InitQ)

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

  /** One-task triple ceiling for the exact local training twin
    * (`SPARK_GRAFT_KGE_LOCAL_LIMIT`): at or below this the whole
    * synchronous-epoch recurrence runs inside ONE task — identical integer
    * arithmetic, bit-equal embedding table (spec-pinned in KgGraphSpec) —
    * instead of epochs × (melted join + pivot + delta agg + update join)
    * distributed barriers. Production-scale graphs (10M+ triples) stay on
    * the distributed path. */
  val LocalTripleLimit: Long =
    sys.env.get("SPARK_GRAFT_KGE_LOCAL_LIMIT").map(_.toLong).getOrElse(200000L)

  /** Train `epochs` synchronous epochs over kg (h, r, t); returns the final
    * embedding table (kind, id, k, val) — kind 'e' for entities, 'r' for
    * relations. */
  def train(kg0: DataFrame, spark: SparkSession, epochs: Int = DefaultEpochs,
            localLimit: Long = LocalTripleLimit): DataFrame = {
    require(epochs >= 1, s"KgEmbedding.train: epochs must be >= 1, got $epochs")
    // eager checkpoint: everything below (entity/relation vocab, dense
    // index, negatives, roles) derives from kg through SEPARATE plans — an
    // unsevered lineage would re-run the upstream extraction once per
    // derivation (measured: 24 s -> ~8 s for the sf0.1 bench query)
    val kg = kg0.select(col("h"), col("r"), col("t")).distinct().localCheckpoint()
    // size-adaptive (the ConnectedComponents.adaptive pattern): the count
    // reads the fresh checkpoint; bench/KB-scale graphs take the one-task
    // twin, production graphs the distributed epochs below
    if (kg.schema("h").dataType == org.apache.spark.sql.types.StringType
        && kg.count() <= localLimit)
      return trainLocal(kg, spark, epochs)
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
    // melt: the 4 embedding reads of one triple as 4 rows (role 0..3) —
    // built ONCE and reused every epoch (only emb varies across epochs)
    val roles = negt.select(col("h"), col("r"), col("t"), col("tneg"),
        explode(array(
          struct(lit("e").as("kind"), col("h").as("id"), lit(0).as("role")),
          struct(lit("r").as("kind"), col("r").as("id"), lit(1).as("role")),
          struct(lit("e").as("kind"), col("t").as("id"), lit(2).as("role")),
          struct(lit("e").as("kind"), col("tneg").as("id"), lit(3).as("role")))).as("s"))
      .select(col("h"), col("r"), col("t"), col("tneg"),
        col("s.kind").as("kind"), col("s.id").as("id"), col("s.role").as("role"))
      .cache()
    val vecSum = udaf(new graft.functions.VectorSum(Dim))

    var emb = ents.select(lit("e").as("kind"), col("id"))
      .unionAll(rels.select(lit("r").as("kind"), col("id")))
      .withColumn("vals", initVec(col("id")))
      .localCheckpoint()
    try {
      for (_ <- 1 to epochs) {
        // pivot the melted join back to one row per triple: each role has
        // exactly one row, so max(when(role = i)) is the deterministic pick
        // and every group is bounded at 4 rows
        val pivot = roles.join(emb, Seq("kind", "id"))
          .groupBy(col("h"), col("r"), col("t"), col("tneg"))
          .agg(
            max(when(col("role") === 0, col("vals"))).as("vh"),
            max(when(col("role") === 1, col("vals"))).as("vr"),
            max(when(col("role") === 2, col("vals"))).as("vt"),
            max(when(col("role") === 3, col("vals"))).as("vn"))
        // margin-ranking violation + sign gradients, all in-row
        val viol = pivot
          .withColumn("pd", zip_with(zip_with(col("vh"), col("vr"), _ + _), col("vt"), _ - _))
          .withColumn("nd", zip_with(zip_with(col("vh"), col("vr"), _ + _), col("vn"), _ - _))
          .filter(l1(col("pd")) + Margin > l1(col("nd")))
          .withColumn("sp", transform(col("pd"), sgn(_)))
          .withColumn("sn", transform(col("nd"), sgn(_)))
        val upd = viol.select(explode(array(
            struct(lit("e").as("kind"), col("h").as("id"),
              zip_with(col("sn"), col("sp"), (n, p) => (n - p) * Lr).as("d")),
            struct(lit("r").as("kind"), col("r").as("id"),
              zip_with(col("sn"), col("sp"), (n, p) => (n - p) * Lr).as("d")),
            struct(lit("e").as("kind"), col("t").as("id"),
              transform(col("sp"), x => x * Lr).as("d")),
            struct(lit("e").as("kind"), col("tneg").as("id"),
              transform(col("sn"), x => -x * Lr).as("d")))).as("u"))
          .select(col("u.kind").as("kind"), col("u.id").as("id"), col("u.d").as("d"))
          .groupBy(col("kind"), col("id")).agg(vecSum(col("d")).as("delta"))
        emb = emb.join(upd, Seq("kind", "id"), "left")
          .select(col("kind"), col("id"),
            when(col("delta").isNull, col("vals"))
              .otherwise(zip_with(col("vals"), col("delta"), _ + _)).as("vals"))
          .localCheckpoint()
      }
      emb.select(col("kind"), col("id"), posexplode(col("vals")).as(Seq("k", "val")))
    } finally {
      roles.unpersist()
      DenseIds.releasePersisted()
    }
  }

  /** The small-graph branch of [[train]]: the identical synchronous-epoch
    * recurrence as one task of plain Scala arithmetic. Every rule mirrors
    * the distributed plan exactly — dense entity index = UTF-8-binary
    * ascending rank (what `repartitionByRange(id asc)` + row_number
    * assigns), corrupted tail = entity at index hex6(md5("h|r|t")) mod n,
    * init val(k) = hex3(md5("id|k")) mod (2·InitQ+1) − InitQ, margin check
    * on L1, sign deltas SUMMED per (kind, id) then applied once — so the
    * output table is bit-equal (KgGraphSpec pins it; the q_kg_embed oracle
    * replays the same steps). Eagerly checkpointed: consumers
    * (nearestEntities, energies) walk the embedding table several times. */
  private def trainLocal(kg: DataFrame, spark: SparkSession,
                         epochs: Int): DataFrame = {
    import spark.implicits._
    kg.as[(String, String, String)].groupByKey(_ => 0).flatMapGroups { (_, it) =>
      val triples = it.toArray
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5hex(s: String): String = {
        md.reset()
        md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
      }
      def hex3(s: String): Long = java.lang.Long.parseLong(md5hex(s).substring(0, 3), 16)
      def hex6(s: String): Long = java.lang.Long.parseLong(md5hex(s).substring(0, 6), 16)
      implicit val ord: Ordering[String] = ConnectedComponents.utf8Ordering
      val ents = triples.iterator.flatMap(t => Iterator(t._1, t._3))
        .toArray.distinct.sorted
      val rels = triples.iterator.map(_._2).toArray.distinct
      val n = ents.length.toLong
      val emb = scala.collection.mutable.HashMap.empty[(String, String), Array[Long]]
      (ents.iterator.map("e" -> _) ++ rels.iterator.map("r" -> _)).foreach {
        case (kind, id) =>
          emb.update((kind, id), Array.tabulate(Dim)(k =>
            hex3(s"$id|$k") % (2L * InitQ + 1) - InitQ))
      }
      val negOf = triples.map { case (h, r, t) =>
        ents((hex6(s"$h|$r|$t") % n).toInt)
      }
      for (_ <- 1 to epochs) {
        val delta = scala.collection.mutable.HashMap.empty[(String, String), Array[Long]]
        def add(kind: String, id: String, f: Int => Long): Unit = {
          val d = delta.getOrElseUpdate((kind, id), new Array[Long](Dim))
          var k = 0
          while (k < Dim) { d(k) += f(k); k += 1 }
        }
        var i = 0
        while (i < triples.length) {
          val (h, r, t) = triples(i)
          val tneg = negOf(i)
          val vh = emb(("e", h)); val vr = emb(("r", r))
          val vt = emb(("e", t)); val vn = emb(("e", tneg))
          var l1p = 0L; var l1n = 0L
          var k = 0
          while (k < Dim) {
            l1p += math.abs(vh(k) + vr(k) - vt(k))
            l1n += math.abs(vh(k) + vr(k) - vn(k))
            k += 1
          }
          if (l1p + Margin > l1n) {
            def sgn(x: Long): Long = if (x > 0) 1L else if (x < 0) -1L else 0L
            val sp = Array.tabulate(Dim)(k => sgn(vh(k) + vr(k) - vt(k)))
            val sn = Array.tabulate(Dim)(k => sgn(vh(k) + vr(k) - vn(k)))
            add("e", h, k => (sn(k) - sp(k)) * Lr)
            add("r", r, k => (sn(k) - sp(k)) * Lr)
            add("e", t, k => sp(k) * Lr)
            add("e", tneg, k => -sn(k) * Lr)
          }
          i += 1
        }
        delta.foreach { case (key, d) =>
          val v = emb(key)
          var k = 0
          while (k < Dim) { v(k) += d(k); k += 1 }
        }
      }
      emb.iterator.flatMap { case ((kind, id), vals) =>
        (0 until Dim).iterator.map(k => (kind, id, k, vals(k)))
      }
    }.toDF("kind", "id", "k", "val").localCheckpoint(true)
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
    * the "KG-embedding neighbors" feature KIRE injects.
    *
    * Shape: regroup the long-form table to per-entity vectors (groups
    * bounded at Dim rows), then a broadcast nested-loop against the
    * entity vocabulary with the FULL L1 distance computed in-row — no
    * n²·Dim shuffle. The broadcast side is the KB entity vocabulary
    * (dictionary-scale, the same broadcastability argument as the alias
    * dict); corpus-scale vectors go through Similarity's LSH/IVF paths.
    * The rank window partitions per entity — bounded by the vocabulary,
    * never by corpus size. */
  def nearestEntities(emb: DataFrame, topK: Int): DataFrame = {
    val vecs = emb.filter(col("kind") === "e")
      .groupBy(col("id"))
      .agg(transform(sort_array(collect_list(struct(col("k"), col("val")))),
        s => s.getField("val")).as("vals"))
    val d = vecs.select(col("id").as("a"), col("vals").as("va"))
      .join(broadcast(vecs.select(col("id").as("b"), col("vals").as("vb"))),
        col("a") =!= col("b"))
      .select(col("a"), col("b"),
        l1(zip_with(col("va"), col("vb"), (x, y) => x - y)).as("dist"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("a")).orderBy(col("dist").asc, col("b").asc)
    d.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("a"), col("b"), col("dist"), col("rank"))
  }
}
