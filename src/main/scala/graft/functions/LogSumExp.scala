package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Numerically-stable streaming log-sum-exp `Aggregator` (A9): the pooling
  * the reference uses to collapse mention embeddings into entity
  * representations (`ATLOP+KIRE/model.py:74-98` logsumexp pooling).
  *
  * Buffer carries (runningMax, sumOfExpShifted); merge rebases the smaller
  * side — associative and commutative, so partial aggregation (map-side
  * combine) is sound.
  */
object LogSumExp extends Aggregator[Double, (Double, Double), Double] {

  override def zero: (Double, Double) = (Double.NegativeInfinity, 0.0)

  override def reduce(b: (Double, Double), x: Double): (Double, Double) = {
    val (m, s) = b
    if (x <= m) (m, s + math.exp(x - m))
    else (x, s * math.exp(m - x) + 1.0)
  }

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) = {
    if (a._1 == Double.NegativeInfinity) b
    else if (b._1 == Double.NegativeInfinity) a
    else if (a._1 >= b._1) (a._1, a._2 + b._2 * math.exp(b._1 - a._1))
    else (b._1, b._2 + a._2 * math.exp(a._1 - b._1))
  }

  override def finish(r: (Double, Double)): Double =
    if (r._1 == Double.NegativeInfinity) Double.NegativeInfinity
    else r._1 + math.log(r._2)

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
