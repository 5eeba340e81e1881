package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.kb.DocREDVocab

/** Candidate-pruned decode ≡ full 96-class walk — for every soft value,
  * including above the prune guard (where decodeFast must fall back), and
  * for unknown type pairs. Pure functions, no Spark. */
class DecodeSpec extends AnyFunSuite {
  val w = RelationScorer.compile(RelationScorer.fixtureWeights)

  test("decodeFast == decode across soft values, rule and unknown type pairs") {
    val softs = Seq(-0.45, -0.05, 0.0, 0.3, 1.9, 1.999, 2.0, 2.5, 5.0)
    // every real type pair (some with rules, some without)
    for {
      h <- DocREDVocab.nerTypes; t <- DocREDVocab.nerTypes
      base = w.base((h, t)); soft <- softs
    } assert(RelationScorer.decodeFast(w, (h, t), base, soft) ==
        RelationScorer.decode(w, base, soft), s"($h,$t) soft=$soft")
    // unknown type pair → default base
    for (soft <- softs)
      assert(RelationScorer.decodeFast(w, ("FOO", "BAR"), w.default, soft) ==
        RelationScorer.decode(w, w.default, soft))
  }

  test("the prune guard equals the fixture's negative-base margin") {
    assert(w.negGuard == 2.0)
    // at soft just below the guard the pruned path runs; just above it the
    // full walk runs — both asserted equal above; here pin that a
    // guard-exceeding soft CAN flip a non-rule relation (the case pruning
    // must not miss)
    val base = w.base(("ORG", "PER"))
    val above = RelationScorer.decode(w, base, 2.5)
    assert(above.size > RelationScorer.MaxLabels - 1,
      "above the guard every class decodes — the fallback path is live")
  }
}
