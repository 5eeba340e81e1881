// Component-level wall times for the knowledge-injection path at sf0.1.
// Run: spark-shell --master 'local[32]' --driver-memory 32g \
//   --conf spark.sql.shuffle.partitions=96 --conf spark.ui.enabled=false \
//   --jars target/scala-2.13/kirespark_2.13-0.1.0.jar -I tools/profile_inject.scala
// Caveat: each time() is its own action — AQE re-planning adds ~0.5-1 s of
// per-action overhead that amortizes away inside the single-DAG bench query.
import org.apache.spark.sql.functions._
import graft.pipeline.{Stages, KnowledgeInjection, Enrich, RelationScorer}
import graft.sources.Pages
def time[T](name: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r"); r }
val dir = "/root/testdata/sf0.1"
val linked = Stages.linkedFast(Stages.mentionsKernel(Pages.fromDocuments(spark, dir), spark), spark).cache()
time("linked materialize")(linked.count())
time("coref counts")(KnowledgeInjection.corefCounts(linked).count())
time("onehop")(Enrich.oneHop(linked, spark).count())
time("attributes")(Enrich.attributes(linked, spark).count())
time("features")(KnowledgeInjection.injectedFeatures(linked, spark).count())
time("full inject")(KnowledgeInjection.extractInjected(linked, spark).count())
time("scored (no inject)")(RelationScorer.extract(linked, spark).count())
System.exit(0)
