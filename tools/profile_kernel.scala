import org.apache.spark.sql.functions._
import graft.pipeline.Stages
def time[T](name: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[prof] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }
val pages = spark.read.parquet("/tmp/graft_scaling_corpus_r80__root_testdata_sf0.1").withColumn("text", graft.functions.ExtractHtmlText(col("html")))
time("fused warm")(Stages.extractTriplesFused(pages, spark).count())
time("fused")(Stages.extractTriplesFused(pages, spark).count())
time("kernel warm")(Stages.extractTriplesKernel(pages, spark).count())
time("kernel")(Stages.extractTriplesKernel(pages, spark).count())
System.exit(0)
