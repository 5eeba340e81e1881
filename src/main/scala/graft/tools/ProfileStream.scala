package graft.tools

import org.apache.spark.sql.SparkSession

/** Side harness (guide §1.4): streaming fixed cost vs state-store
  * partition count — the measurement behind
  * StreamingExtraction.withDerivedStatePartitions (OPTIMIZATION_r06.md §10). */
object ProfileStream {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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
    import graft.streaming.StreamingExtraction._
    val dupDir = stageDupDocsDir(spark, dir, 4)
    val docsDir = stageDocsDir(spark, dir, 4)
    def run(tag: String, parts: String): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      time(s"dedup  parts=$parts $tag")(
        println("  rows: " + runBoundedDedup(spark, dupDir, s"pd_$tag$parts", 1).count()))
      time(s"fusion parts=$parts $tag")(
        println("  rows: " + runBoundedFusion(spark, docsDir, s"pf_$tag$parts", 2).count()))
      time(s"kb     parts=$parts $tag")(
        println("  rows: " + runBoundedKbUpsert(spark, docsDir, s"pk_$tag$parts", 2).count()))
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
    }
    run("warm", cpus)
    run("a", cpus)
    run("a", "4")
    run("a", "1")
    run("b", cpus)
    run("b", "4")
    run("b", "1")
    spark.stop()
  }
}
