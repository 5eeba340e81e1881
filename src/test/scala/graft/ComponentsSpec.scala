package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ConnectedComponents

class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("unionFindLocal: known components, min-id labels") {
    val got = ConnectedComponents.unionFindLocal(
      Seq(1, 2, 3, 4, 5, 6), Seq((1, 2), (2, 3), (4, 5)))
    assert(got == Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 4, 5 -> 4, 6 -> 6))
  }

  test("labelPropagation matches unionFindLocal on a random graph") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val n = 60
    val edges = Seq.fill(50)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val verts = (0L until n).map(v => ("g", v)).toDF("scope", "v")
    val edf = edges.map { case (a, b) => ("g", a, b) }.toDF("scope", "src", "dst")
    val got = ConnectedComponents.labelPropagation(verts, edf, maxIter = 30)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val want = ConnectedComponents.unionFindLocal((0L until n).toSeq, edges)
    assert(got == want)
  }

  test("adaptive: single-task branch ≡ labelPropagation (long ids)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val n = 80
    val edges = Seq.fill(70)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val verts = (0L until n).map(v => ("g", v)).toDF("scope", "v")
    val edf = edges.map { case (a, b) => ("g", a, b) }.toDF("scope", "src", "dst")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val local = toMap(ConnectedComponents.adaptive(verts, edf)) // under limit
    val iterative = toMap(ConnectedComponents.adaptive(verts, edf,
      localLimit = 0)) // forced onto the labelPropagation branch
    assert(local == iterative)
    assert(local == ConnectedComponents.unionFindLocal((0L until n).toSeq, edges))
  }

  test("adaptive: single-task branch ≡ labelPropagation (string ids)") {
    import spark.implicits._
    // ids whose numeric and lexicographic orders disagree ("Q9" vs "Q10")
    val verts = Seq("Q9", "Q10", "Q2", "Q100")
      .map(v => ("g", v)).toDF("scope", "v")
    val edf = Seq(("g", "Q9", "Q10"), ("g", "Q2", "Q100"))
      .toDF("scope", "src", "dst")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(1) -> r.getString(2)).toMap
    val local = toMap(ConnectedComponents.adaptive(verts, edf))
    val iterative = toMap(ConnectedComponents.adaptive(verts, edf, localLimit = 0))
    assert(local == iterative)
    assert(local == Map("Q9" -> "Q10", "Q10" -> "Q10", "Q2" -> "Q100", "Q100" -> "Q100"))
  }

  test("labelPropagation respects scopes (per-document isolation)") {
    import spark.implicits._
    val verts = Seq(("d1", 1L), ("d1", 2L), ("d2", 1L), ("d2", 2L)).toDF("scope", "v")
    val edges = Seq(("d1", 1L, 2L)).toDF("scope", "src", "dst")
    val got = ConnectedComponents.labelPropagation(verts, edges)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("d1", 2)) == 1L) // merged in d1
    assert(got(("d2", 2)) == 2L) // untouched in d2
  }
}
