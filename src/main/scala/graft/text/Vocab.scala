package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vocabulary build + id encode (A4 / J11):
  *  - word2id assigned by frequency desc then word asc (deterministic),
  *    reserving 0=PAD, 1=UNK (`GLRE+KIRE/data/loader.py:191-232`)
  *  - singleton set = words with frequency ≤ 1 (UNK-noise candidates)
  *  - encode: broadcast map lookup with UNK default
  *    (`B4+KIRE/gen_data.py:150-178`)
  */
object Vocab {

  val PadId = 0
  val UnkId = 1

  def build(docs: DataFrame): DataFrame = {
    val counts = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    // two-phase id assignment: a web-scale vocabulary must never funnel
    // through a single-partition global window
    graft.ops.DenseIds.globalDenseId(counts, "id0",
        Seq(col("freq").desc, col("word").asc))
      .withColumn("id", (col("id0") + 2).cast("int")) // 0=PAD, 1=UNK reserved
      .drop("id0")
      .withColumn("singleton", col("freq") <= 1)
  }

  /** Encode token arrays to id arrays with UNK default, via a broadcast
    * map literal (no join, stays in whole-stage codegen). */
  def encode(docs: DataFrame, vocab: Map[String, Int]): DataFrame = {
    val m = typedLit(vocab)
    docs.withColumn("token_ids",
      transform(split(col("text"), " "),
        t => coalesce(element_at(m, t), lit(UnkId))))
  }
}
