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

  // -------------------------------------------------- char-level (B4 char2id)

  val CharLimit = 16 // B4 char_limit (`B4+KIRE/gen_data.py:148,165-167`)

  /** Char vocabulary by frequency (ids 0=BLANK pad, 1=UNK reserved), built
    * over the lowercased non-space characters of the corpus — the B4
    * char2id dictionary. Scale-safe two-phase id assignment. */
  def buildChars(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(explode(split(lower(col("text")), "")).as("ch"))
      .filter(col("ch") =!= " " && col("ch") =!= "")
      .groupBy("ch").agg(count(lit(1)).as("freq"))
    graft.ops.DenseIds.globalDenseId(counts, "id0",
        Seq(col("freq").desc, col("ch").asc))
      .withColumn("id", (col("id0") + 2).cast("int"))
      .drop("id0")
  }

  /** Per-word char-id tensors (`B4+KIRE/gen_data.py:158-167`): each token
    * lowercased, its first `charLimit` chars mapped through char2id with UNK
    * default, BLANK(0)-padded to exactly charLimit. Pure HOFs — in-row. */
  def encodeChars(docs: DataFrame, char2id: Map[String, Int],
                  charLimit: Int = CharLimit): DataFrame = {
    val m = typedLit(char2id)
    docs.withColumn("char_ids",
      transform(split(lower(col("text")), " "), w =>
        transform(sequence(lit(1), lit(charLimit)), i =>
          when(i <= length(w),
            coalesce(element_at(m, w.substr(i, lit(1))), lit(UnkId)))
            .otherwise(lit(PadId)))))
  }
}
