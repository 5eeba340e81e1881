package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // loud: a broken query must not hide inside a plausible timing
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries are independent: drop caches created inside the closure
      // (mention lineage, DenseIds intermediates) so later timings measure
      // their own work, not earlier queries' storage pressure; release also
      // drains DenseIds' plan-tree references (clearCache alone does not)
      spark.catalog.clearCache()
      graft.ops.DenseIds.releasePersisted()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // host load context: this box is multi-tenant — numbers measured under
    // load are not comparable round-over-round without this field
    val loadavg = try {
      java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ").take(3).mkString(" ")
    } catch { case _: Throwable => "unknown" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":$failedJson,"loadavg":"$loadavg"}""")
    if (failed.nonEmpty) {
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
