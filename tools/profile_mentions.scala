// spark-shell -i profiling script for the post-mentions pipeline
import org.apache.spark.sql.functions._
import graft.pipeline.Stages
import graft.sources.Pages

val sf = "/root/testdata/sf0.1"
def time[T](name: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
}
val pages = Pages.fromDocuments(spark, sf).cache()
time("pages count")(pages.count())
val linkedW = Stages.linkedFast(Stages.mentions(pages, spark), spark)
time("linkedFast")(linkedW.count())
time("pairs")(Stages.pairs(linkedW).count())
time("pairs2")(Stages.pairs(linkedW).count())
val prs = Stages.pairs(linkedW).filter(col("h_qid") < col("t_qid"))
val verts = linkedW.select(col("doc_id").cast("string").as("scope"), col("qid").as("v")).distinct()
val edges = prs.select(col("doc_id").cast("string").as("scope"), col("h_qid").as("src"), col("t_qid").as("dst")).distinct()
time("verts")(verts.count())
time("edges")(edges.count())
time("components")(graft.ops.ConnectedComponents.perScopeLocal(verts, edges, spark).count())
time("pairFeatures")(graft.pipeline.RelationScorer.pairFeatures(linkedW).count())
time("scored")(graft.pipeline.RelationScorer.extract(linkedW, spark).count())
System.exit(0)
