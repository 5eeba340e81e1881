// spark-shell -i plan audit: headline query physical plans
import org.apache.spark.sql.functions._
import graft.pipeline.Stages
import graft.sources.Pages

val sf = "/root/testdata/sf0.001"
val pages = Pages.fromDocuments(spark, sf)
println("=== FUSED extractTriples ===")
Stages.extractTriplesFused(pages, spark).explain("formatted")
println("=== q_scored_triples path ===")
val linked = Stages.linkedFast(Stages.mentions(pages, spark), spark)
graft.pipeline.RelationScorer.extract(linked, spark).explain("formatted")
System.exit(0)
