package graft.core

import java.sql.Timestamp

/** Typed row models at the engine's API boundaries (SURVEY §1.1).
  * Internal join/agg stages use DataFrames; these case classes give
  * Dataset[T] typing where the contract matters.
  */
object Schemas {

  /** input_hint contract row. */
  case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                  text: String, lang: String)

  /** One detected mention of a KB alias in a document token stream. */
  case class Mention(docId: Long, sentId: Int, pos: Int, alias: String)

  /** Mention after entity linking (qid null ⇒ NT fallback id assigned later). */
  case class LinkedMention(docId: Long, sentId: Int, pos: Int, alias: String,
                           qid: String, nerType: String)

  /** Canonical output triple with provenance (SURVEY §1.1 "Prediction"). */
  case class Triple(docId: Long, subj: String, pred: String, obj: String)

  /** Scored candidate triple pre-decode. */
  case class ScoredPair(docId: Long, h: String, t: String, rel: String, score: Double)

  /** Per-partition lineage row — the restart manifest (north_rule:
    * "per-partition lineage rows"; reference analog: `train_finsh.ok` marker
    * + .pkl caches, `GLRE+KIRE/nnet/trainer.py:320-321`). */
  case class LineageRow(partitionId: Int, status: String, docCount: Long,
                        mentionCount: Long, tripleCount: Long, wallMillis: Long)

  /** DocRED-shaped document (reference fixture format,
    * `ATLOP+KIRE/prepro.py:30-51`). */
  case class VertexMention(name: String, pos: Seq[Int], sent_id: Int,
                           `type`: String, link: Option[String])
  case class RelLabel(h: Int, t: Int, r: String, evidence: Seq[Int])
  case class DocREDDoc(title: String, sents: Seq[Seq[String]],
                       vertexSet: Seq[Seq[VertexMention]], labels: Seq[RelLabel])
}
