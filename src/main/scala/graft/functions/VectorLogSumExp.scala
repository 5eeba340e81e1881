package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Element-wise log-sum-exp pooling over VECTORS — A9's real shape: the
  * reference pools mention *embedding vectors* into one entity vector,
  * dimension by dimension (`ATLOP+KIRE/model.py:74-98`
  * `torch.logsumexp(dim=0)` over stacked mention embeddings).
  *
  * Buffer carries per-dimension (runningMax, sumOfExpShifted) pairs; reduce
  * and merge rebase the smaller side per dimension — associative and
  * commutative, so Spark's partial aggregation (map-side combine, shuffle
  * merge in any order) yields the same vector as a single-pass fold
  * (VectorLogSumExpSpec pins merge-safety by comparing against random
  * split/merge trees).
  *
  * Vectors of differing lengths: the pool width is the max width seen;
  * missing dimensions contribute nothing (treated as -inf logits).
  */
object VectorLogSumExp
  extends Aggregator[Seq[Double], (Seq[Double], Seq[Double]), Seq[Double]] {

  override def zero: (Seq[Double], Seq[Double]) = (Seq.empty, Seq.empty)

  private def widen(v: Seq[Double], n: Int, fill: Double): Seq[Double] =
    if (v.length >= n) v else v ++ Seq.fill(n - v.length)(fill)

  override def reduce(b: (Seq[Double], Seq[Double]), x: Seq[Double]): (Seq[Double], Seq[Double]) =
    merge(b, (x, Seq.fill(x.length)(1.0)))

  override def merge(a: (Seq[Double], Seq[Double]),
                     b: (Seq[Double], Seq[Double])): (Seq[Double], Seq[Double]) = {
    if (a._1.isEmpty) return b
    if (b._1.isEmpty) return a
    val n = math.max(a._1.length, b._1.length)
    val (am, as) = (widen(a._1, n, Double.NegativeInfinity), widen(a._2, n, 0.0))
    val (bm, bs) = (widen(b._1, n, Double.NegativeInfinity), widen(b._2, n, 0.0))
    val m = new Array[Double](n)
    val s = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (am(i) == Double.NegativeInfinity) { m(i) = bm(i); s(i) = bs(i) }
      else if (bm(i) == Double.NegativeInfinity) { m(i) = am(i); s(i) = as(i) }
      else if (am(i) >= bm(i)) { m(i) = am(i); s(i) = as(i) + bs(i) * math.exp(bm(i) - am(i)) }
      else { m(i) = bm(i); s(i) = bs(i) + as(i) * math.exp(am(i) - bm(i)) }
      i += 1
    }
    (m.toSeq, s.toSeq)
  }

  override def finish(r: (Seq[Double], Seq[Double])): Seq[Double] =
    r._1.zip(r._2).map { case (m, s) =>
      if (m == Double.NegativeInfinity) Double.NegativeInfinity else m + math.log(s)
    }

  override def bufferEncoder: Encoder[(Seq[Double], Seq[Double])] =
    Encoders.product[(Seq[Double], Seq[Double])]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
