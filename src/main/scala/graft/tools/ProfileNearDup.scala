package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry.{TextBands, TextBitsPerBand, TextNearDupPermille}

/** Side harness (guide §1.4): stage-by-stage decomposition of
  * q_text_neardup plus the candidate/threshold restructurings measured and
  * REJECTED in OPTIMIZATION_r06.md §9 (flat codegen dot, raw candidates +
  * post-filter distinct, explicit broadcast(q) hints). Kept so the
  * negative results stay reproducible. */
object ProfileNearDup {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.ops.Corpora.withNearDups(graft.ops.Corpora.normDocs(spark, dir))
    val emb = time("docVectorsKernel+lcp")(
      graft.pipeline.VectorFeatures.docVectorsKernel(corpus, spark).localCheckpoint())
    val sk = graft.ops.Similarity.bandSketchesKernel(emb, TextBands, TextBitsPerBand, spark)
    time("sketches count")(println("  sketch rows: " + sk.count()))
    val pairsD = graft.ops.Buckets.pairsWithin(sk, Seq("band", "sig"), "vec_id", 1000)
    time("pairs dedup count")(println("  distinct pairs: " + pairsD.count()))
    val pairsR = graft.ops.Buckets.pairsWithin(sk, Seq("band", "sig"), "vec_id", 1000,
      dedup = false)
    time("pairs raw count")(println("  raw pairs: " + pairsR.count()))

    val q = graft.ops.Similarity.quantized(emb)
    val dims = emb.select(size(col("embedding")).as("d")).head.getInt(0)
    val thr = TextNearDupPermille
    def dotFlat(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (0 until dims).map(i => a.getItem(i) * b.getItem(i)).reduce(_ + _)
    def joined(p: org.apache.spark.sql.DataFrame) = p
      .join(q.select(col("vec_id").as("doc_a"), col("q").as("qa"), col("norm2").as("na")), "doc_a")
      .join(q.select(col("vec_id").as("doc_b"), col("q").as("qb"), col("norm2").as("nb")), "doc_b")
      .filter(col("doc_a") < col("doc_b"))
    def thrFlat(p: org.apache.spark.sql.DataFrame) = joined(p)
      .filter(dotFlat(col("qa"), col("qb")) > 0 &&
        dotFlat(col("qa"), col("qb")).cast("decimal(38,0)") *
          dotFlat(col("qa"), col("qb")) * lit(1000000L) >=
          lit(thr.toLong * thr) * col("na").cast("decimal(38,0)") * col("nb"))
      .withColumn("dot", dotFlat(col("qa"), col("qb")))
      .select("doc_a", "doc_b", "dot")

    def bindC(c: org.apache.spark.sql.Column)(
        f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      element_at(transform(array(c), f), 1)
    def dotQ(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    def thrBind(p: org.apache.spark.sql.DataFrame) = joined(p)
      .filter(bindC(dotQ(col("qa"), col("qb"))) { d =>
        d > 0 && d.cast("decimal(38,0)") * d * lit(1000000L) >=
          lit(thr.toLong * thr) * col("na").cast("decimal(38,0)") * col("nb") })
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      .select("doc_a", "doc_b", "dot")

    def joinedB(p: org.apache.spark.sql.DataFrame) = p
      .join(broadcast(q.select(col("vec_id").as("doc_a"), col("q").as("qa"), col("norm2").as("na"))), "doc_a")
      .join(broadcast(q.select(col("vec_id").as("doc_b"), col("q").as("qb"), col("norm2").as("nb"))), "doc_b")
      .filter(col("doc_a") < col("doc_b"))
    def thrBindB(p: org.apache.spark.sql.DataFrame) = joinedB(p)
      .filter(bindC(dotQ(col("qa"), col("qb"))) { d =>
        d > 0 && d.cast("decimal(38,0)") * d * lit(1000000L) >=
          lit(thr.toLong * thr) * col("na").cast("decimal(38,0)") * col("nb") })
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      .select("doc_a", "doc_b", "dot")
    def thrFlatB(p: org.apache.spark.sql.DataFrame) = joinedB(p)
      .filter(dotFlat(col("qa"), col("qb")) > 0 &&
        dotFlat(col("qa"), col("qb")).cast("decimal(38,0)") *
          dotFlat(col("qa"), col("qb")) * lit(1000000L) >=
          lit(thr.toLong * thr) * col("na").cast("decimal(38,0)") * col("nb"))
      .withColumn("dot", dotFlat(col("qa"), col("qb")))
      .select("doc_a", "doc_b", "dot")

    val baseline = graft.ops.Similarity.cosineNearDups(
      emb, thr, TextBands, TextBitsPerBand, spark)
    val vG = thrBindB(pairsR).distinct()
    vG.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      .split("\n").take(14).foreach(l => println("[planG] " + l))
    for (r <- 1 to 3) {
      time(s"A baseline rep$r")(println("  survivors: " + baseline.count()))
      time(s"G bcastq+raw+postdist rep$r")(println("  survivors: " + vG.count()))
    }
    spark.stop()
  }
}
