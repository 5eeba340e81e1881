package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Behavioral tests for the training-data-pipeline operators: the injected
  * duplicates must actually be FOUND (the oracle only proves engine parity,
  * not that the operators detect what they claim to detect). */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  lazy val docs = Corpora.normDocs(spark, sfDir).cache()

  test("exact dedup finds all 20 injected exact duplicates, keeps canonical") {
    val d = Dedup.exact(Corpora.withExactDups(docs)).cache()
    val dupGroups = d.filter(col("group_size") > 1)
    assert(dupGroups.count() == 40)  // 20 originals + 20 copies
    // copies are never the canonical representative
    assert(d.filter(col("doc_id") >= 1000000L && col("keep")).count() == 0)
    assert(d.filter(col("doc_id") < 1000000L && col("group_size") > 1 && !col("keep")).count() == 0)
  }

  test("minhash LSH recalls the injected near-duplicates") {
    val corpus = Corpora.withNearDups(docs)
    val nInjected = corpus.filter(col("doc_id") >= 1000000L).count()
    val pairs = Dedup.lshCandidates(Dedup.lshBands(Dedup.minhash(corpus, spark)))
      .filter(col("doc_b") === col("doc_a") + 1000000L)
    // ≥90% recall of the planted pairs (prob. of all 4 bands missing is tiny)
    assert(pairs.count() >= (nInjected * 9) / 10, s"recall too low: ${pairs.count()}/$nInjected")
  }

  test("docSketches kernel ≡ staged lshBands(minhash(shingles)) + verify arrays") {
    import spark.implicits._
    val corpus = Corpora.withNearDups(docs).cache()
    val sk = Dedup.docSketches(corpus, spark).cache()
    // bands: exploded kernel rows == the staged three-shuffle pipeline
    val kernelBands = sk.select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.band_sig").as("band_sig"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val stagedBands = Dedup.lshBands(Dedup.minhash(corpus, spark))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(kernelBands == stagedBands)
    // verify arrays: kernel shs == sorted capped collect_list of shingles
    val sh = Dedup.shingles(corpus)
    val staged = sh.groupBy("doc_id")
      .agg(slice(array_sort(collect_list(col("shingle"))), 1,
        Dedup.MaxVerifyShingles).as("shs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val kernelShs = sk.select(col("doc_id"), col("shs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // staged has no row for shingle-less docs; kernel emits an empty array
    assert(kernelShs.filter(_._2.nonEmpty) == staged)
    kernelShs.filter(_._2.isEmpty).keys.foreach(id => assert(!staged.contains(id)))
    sk.unpersist(); corpus.unpersist()
  }

  test("jaccard pairs: every planted pair passes the 600-permille gate") {
    val corpus = Corpora.withNearDups(docs)
    val nInjected = corpus.filter(col("doc_id") >= 1000000L).count()
    val planted = Dedup.jaccardPairs(corpus, 600)
      .filter(col("doc_b") === col("doc_a") + 1000000L)
    assert(planted.count() == nInjected)
  }

  test("hot-shingle cap drops viral shingles from the join, keeps true pairs") {
    import spark.implicits._
    // 30 docs all sharing one viral shingle; docs 0/1 also share unique text
    val viral = "breaking news today"
    val rows = (0 until 30).map { i =>
      val uniq = if (i <= 1) "alpha beta gamma delta epsilon zeta"
                 else s"u$i v$i w$i x$i y$i z$i"
      (i.toLong, s"$viral $uniq")
    }
    val df = rows.toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(df, 300, maxShingleDf = 10).cache()
    // only the genuinely-similar pair survives; the viral-only pairs are gone
    assert(capped.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((0L, 1L)))
    // uncapped: the viral shingle alone creates 30·29/2 candidate pairs
    val uncapped = Dedup.jaccardPairs(df, 0, maxShingleDf = 1000)
    assert(uncapped.count() == 435)
  }

  test("LSH band-bucket cap drops degenerate buckets, keeps sane ones") {
    import spark.implicits._
    // 12 byte-identical boilerplate docs: every band bucket holds all 12
    // (> cap 5) → O(df²) pair emission is suppressed entirely. Docs 100/101
    // are an honest duplicate pair in their own (small) buckets.
    val clones = (0 until 12).map(i =>
      (i.toLong, "the same boilerplate page text every single time"))
    val pairTx = "alpha beta gamma delta epsilon zeta eta theta"
    val df = (clones ++ Seq((100L, pairTx), (101L, pairTx))).toDF("doc_id", "text")
    val bands = Dedup.lshBands(Dedup.minhash(df, spark)).cache()
    val capped = Dedup.lshCandidates(bands, maxBandDf = 5).cache()
    assert(capped.filter(col("doc_a") < 12L).count() == 0,
      "overfull clone bucket must emit no pairs")
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((100L, 101L)))
    // uncapped the clone bucket alone emits 12·11/2 = 66 pairs
    assert(Dedup.lshCandidates(bands).filter(col("doc_a") < 12L).count() == 66)
    bands.unpersist(); capped.unpersist()
  }

  test("sketch-bucket cap bounds an all-equal embedding cluster") {
    import spark.implicits._
    // a degenerate cluster: 12 identical embeddings share every band bucket
    val emb = (0 until 12).map(i => (i.toLong, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.cosineNearDups(emb, 990, 8, 4, spark, maxBandDf = 5).count() == 0)
    assert(Similarity.lshTopK(emb, 3, 20L, 8, 4, spark, maxBandDf = 5).count() == 0)
    // at the default (uncapped at this df) ceiling the cluster still joins
    assert(Similarity.cosineNearDups(emb, 990, 8, 4, spark).count() == 66)
  }

  test("simhash is a pure projection: zero shuffles, zero row blowup") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Dedup.simhash(df, spark).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"simhash must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"simhash must not join:\n$plan")
  }

  test("simhash: hamming distance between near-dups is small, random pairs large") {
    val corpus = Corpora.withNearDups(docs)
    val sh = Dedup.simhash(corpus, spark).cache()
    val a = sh.select(col("doc_id").as("doc_a"), col("simhash").as("ha"))
    val b = sh.select(col("doc_id").as("doc_b"), col("simhash").as("hb"))
    val planted = a.join(b, col("doc_b") === col("doc_a") + 1000000L)
      .select(Dedup.hamming(col("ha"), col("hb")).as("d"))
    val maxPlanted = planted.agg(max(col("d")).cast("long")).head.getLong(0)
    assert(maxPlanted <= 8, s"near-dup hamming too large: $maxPlanted")
  }

  test("brute-force ANN matches a driver-side exact recomputation") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val got = Similarity.bruteForceTopK(emb, 3, 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    // exact recomputation with the same quantization rule
    val vecs = emb.collect().map { r =>
      val e = r.getSeq[Float](r.fieldIndex("embedding"))
      r.getLong(r.fieldIndex("vec_id")) ->
        e.map(x => math.floor(x.toDouble * 1000.0 + 0.5).toLong).toArray
    }.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / math.sqrt(a.map(x => x * x).sum.toDouble * b.map(x => x * x).sum.toDouble)
    }
    for (qid <- vecs.keys.filter(_ < 5)) {
      val expected = vecs.keys.filter(_ != qid).toSeq
        .sortBy(n => (-cos(vecs(qid), vecs(n)), n)).take(3)
      for ((n, i) <- expected.zipWithIndex)
        assert(got((qid, i + 1)) == n, s"query $qid rank ${i + 1}")
    }
  }

  test("LSH ANN concentrates true neighbors better than uniform sampling") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.count()
    val bf = Similarity.bruteForceTopK(emb, 3, 20).select("query_id", "neighbor_id")
    val sk = Similarity.bandSketches(emb, 8, 4, spark)
    val probeSk = sk.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("band"), col("sig"))
    val cands = probeSk.join(sk.withColumnRenamed("vec_id", "neighbor_id"), Seq("band", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct().cache()
    val candFrac = cands.count().toDouble / (20.0 * (n - 1))
    val recall = cands.intersect(bf).count().toDouble / bf.count()
    // the defining LSH property: P(candidate | true neighbor) >> P(candidate)
    assert(recall >= 1.5 * candFrac,
      s"LSH no better than sampling: recall=$recall candFrac=$candFrac")
    assert(recall >= 0.4, s"absolute recall too low: $recall")
    // and the end-to-end operator returns ranked rows
    assert(Similarity.lshTopK(emb, 3, 20, 8, 4, spark).count() > 0)
  }

  test("IVF ANN concentrates true neighbors better than uniform sampling") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.count()
    val bf = Similarity.bruteForceTopK(emb, 3, 20).select("query_id", "neighbor_id")
    val ivf = Similarity.ivfTopK(emb, 3, 20, SparkEntry.IvfNlist, SparkEntry.IvfNprobe, spark)
      .select("query_id", "neighbor_id").cache()
    // candidate volume bound: nprobe of nlist cells → expected scanned
    // fraction ≈ nprobe/nlist of the corpus per query
    val hit = ivf.intersect(bf).count().toDouble / bf.count()
    val scannedFrac = SparkEntry.IvfNprobe.toDouble / SparkEntry.IvfNlist
    // cells group similar vectors, so top-k recall must beat the scanned
    // fraction by a wide margin (uniform sampling would give hit ≈ frac)
    assert(hit >= 1.5 * scannedFrac,
      s"IVF no better than sampling: recall=$hit scannedFrac=$scannedFrac")
    assert(hit >= 0.4, s"absolute recall too low: $hit")
    // every query returns exactly k ranked rows (cells are never empty here)
    assert(ivf.count() == 60)
    // plan pin for the in-row assignment claim: the ONLY Window is the final
    // top-k re-rank — a windowed argmax over an N×nlist blowup would show a
    // second one
    val plan = Similarity.ivfTopK(emb, 3, 20,
      SparkEntry.IvfNlist, SparkEntry.IvfNprobe, spark)
      .queryExecution.executedPlan.toString
    assert(plan.split("\\bWindow\\b").length - 1 == 1,
      s"expected exactly one Window (re-rank) in the IVF plan:\n$plan")
  }

  test("k-means codebook: partition-invariant determinism, recall >= first-N seed") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    def dump(cb: org.apache.spark.sql.DataFrame) = cb.orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSeq
    val trained = Similarity.kmeansCodebook(emb, SparkEntry.IvfNlist, 3, spark).cache()
    // bit-identical under a different input partitioning AND on a re-run
    assert(dump(trained) ==
      dump(Similarity.kmeansCodebook(emb.repartition(7), SparkEntry.IvfNlist, 3, spark)))
    assert(trained.count() == SparkEntry.IvfNlist) // empty cells kept
    // Lloyd iterations must not lose recall vs the raw first-N seed
    val bf = Similarity.bruteForceTopK(emb, 3, 20).select("query_id", "neighbor_id").cache()
    def recall(cb: Option[org.apache.spark.sql.DataFrame]) =
      Similarity.ivfTopK(emb, 3, 20, SparkEntry.IvfNlist, SparkEntry.IvfNprobe, spark, cb)
        .select("query_id", "neighbor_id").intersect(bf).count().toDouble / bf.count()
    val (seeded, kmeans) = (recall(None), recall(Some(trained)))
    assert(kmeans >= seeded, s"k-means recall $kmeans < first-N $seeded")
  }

  test("NA down-sampling: deterministic, positives kept, per-doc rescue") {
    import spark.implicits._
    val pairs = (for {
      doc <- 0L until 40L
      i <- 0 until 6
    } yield (doc, s"Q$i", s"Q${i + 1}", i != 0)) // 1 positive + 5 NA per doc
      .toDF("doc_id", "h", "t", "is_na")
    val half = Sampling.downsampleNa(pairs, "800").cache()
    // every positive survives
    assert(half.filter(!col("is_na")).count() == 40)
    // keep rate of NA pairs is near 1/2 (200 draws, hash-uniform)
    val naKept = half.filter(col("is_na")).count()
    assert(naKept > 60 && naKept < 140, s"NA keep rate off: $naKept/200")
    // partition-invariant: same rows regardless of physical layout
    val re = Sampling.downsampleNa(pairs.repartition(17), "800")
    assert(half.exceptAll(re).count() == 0 && re.exceptAll(half).count() == 0)
    // threshold 000 drops every NA by hash → the rescue keeps EXACTLY one
    // NA per doc (the reference's at-least-one guarantee)
    val none = Sampling.downsampleNa(pairs, "000")
    val perDoc = none.filter(col("is_na")).groupBy("doc_id").count()
    assert(perDoc.count() == 40 && perDoc.filter(col("count") =!= 1).count() == 0)
  }

  test("near-dup clustering: transitive closure over verified candidates, canonical keep") {
    import spark.implicits._
    // chain: doc 2 is a suffix of doc 1 (Jaccard ≈ 689‰), doc 3 a suffix of
    // doc 2 (≈ 675‰), but 1–3 is only ≈ 465‰ — BELOW the 600‰ gate. The
    // pairwise verifier alone would split {1,2} from {2,3}; the transitive
    // closure must merge all three into one cluster. Doc 4 is unrelated.
    def toks(r: Range, p: String = "tok") = r.map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, toks(1 to 60)),
      (2L, toks(19 to 60)),
      (3L, toks(32 to 60)),
      (4L, toks(1 to 60, "zzz")))
      .toDF("doc_id", "text")
    val out = Dedup.nearDupClusters(docs, 600, spark).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false), 4L -> (4L, true)),
      s"expected one transitive cluster {1,2,3} + singleton 4, got $out")
  }

  test("near-dup clustering: a 50-doc drift chain beyond the old iteration bound is ONE cluster") {
    import spark.implicits._
    // sliding-window docs: doc k covers tokens [5k, 5k+60) of one stream —
    // consecutive Jaccard ≈ 841‰, distance-2 ≈ 705‰, distance-3 ≈ 589‰
    // (below the 600‰ gate), so the verified graph is a chain with
    // diameter ≈ 25. Plain O(diameter) min-label propagation at the old
    // maxIter=20 would stop early and SILENTLY split this cluster; pointer
    // jumping converges in ~6 rounds, and non-convergence now raises.
    val stream = (0 until 310).map(i => s"w$i")
    val docs = (0 until 50)
      .map(k => (k.toLong + 1, stream.slice(5 * k, 5 * k + 60).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.nearDupClusters(docs, 600, spark).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == 50 && out.values.map(_._1).toSet == Set(1L),
      s"drift chain must form ONE cluster labeled 1: $out")
    assert(out.count(_._2._2) == 1, "exactly one canonical keep")
  }

  test("winnowing: shared substrings of length >= w+k-1 share a fingerprint") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val b = "completely different prefix text " + a.substring(10) // long shared suffix
    val fa = TextAnalysis.winnow(a).toSet
    val fb = TextAnalysis.winnow(b).toSet
    assert((fa & fb).nonEmpty, "shared substring must yield shared fingerprint")
    val c = "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn"
    assert((fa & TextAnalysis.winnow(c).toSet).isEmpty)
    // distributed op agrees with the local kernel
    import spark.implicits._
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val rows = TextAnalysis.winnowFingerprints(df, spark).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(rows(1L) == fa && rows(2L) == fb)
  }

  test("winnowing hashes Unicode codepoints, not UTF-16 units (oracle parity)") {
    // DuckDB's substring/unicode/length are codepoint-based; an astral-plane
    // char (one codepoint, two UTF-16 units) must hash as ONE symbol. The
    // expected value is computed by an INDEPENDENT path — the direct
    // polynomial Σ cp·B^(k−1−j) mod M (the oracle SQL's formulation) —
    // against the kernel's incremental rolling recurrence.
    val t = "ab😀cdefghij" // "ab😀cdefghij": 12 codepoints, 13 UTF-16 units
    val cps = t.codePoints.toArray
    val k = TextAnalysis.WinnowK
    val B = BigInt(TextAnalysis.WinnowB); val M = BigInt(TextAnalysis.WinnowM)
    val grams = (0 to cps.length - k).map { g =>
      (0 until k).map(j => BigInt(cps(g + j)) * B.modPow(k - 1 - j, M)).sum.mod(M).toLong
    }
    assert(grams.length == cps.length - k + 1) // 5 grams (≤ w) → single min fingerprint
    assert(TextAnalysis.winnow(t) == Seq(grams.min),
      "rolling-hash kernel must equal the direct codepoint polynomial")
  }

  test("token chunking: chunk count, size bound, overlap carry, full coverage") {
    import spark.implicits._
    val tiny = Seq(
      (1L, (1 to 150).map(i => s"t$i").mkString(" ")),
      (2L, "short doc")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(tiny, maxTokens = 64, overlap = 16).collect()
    val c1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(c1.length == 3, "150 tokens at stride 48 -> starts 0/48/96")
    assert(c1.forall(_.getLong(2) <= 64))
    val texts = c1.map(_.getString(3).split(" "))
    assert(texts(0).takeRight(16).sameElements(texts(1).take(16)),
      "consecutive chunks must share the overlap window")
    assert(texts.flatten.toSet == (1 to 150).map(i => s"t$i").toSet,
      "every token must land in some chunk")
    val c2 = out.filter(_.getLong(0) == 2L)
    assert(c2.length == 1 && c2.head.getString(3) == "short doc")
  }

  test("sequence packing: next-fit budget respected, oversize isolated, layout-invariant") {
    import spark.implicits._
    val tiny = Seq(
      (0L, "a b c d"),                                // 4  -> bin 0 (fill 4)
      (1L, "e f g h i"),                              // 5  -> bin 0 (fill 9)
      (2L, "j k"),                                    // 2  -> bin 1 (9+2 > 10)
      (3L, (1 to 12).map(_.toString).mkString(" ")),  // 12 -> bin 2 (oversize, own bin)
      (4L, "x")                                       // 1  -> bin 3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(tiny, spark, budget = 10, rangeSize = 100)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // corpus property: a bin only exceeds the budget as a single oversize doc
    val packed = TextAnalysis.packSequences(docs, spark).cache()
    val over = packed.groupBy("range_id", "bin")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("k"))
      .filter(col("tot") > TextAnalysis.PackBudget && col("k") > 1).count()
    assert(over == 0, "multi-doc bin over budget")
    // ranges derive from ids, not layout
    val b = TextAnalysis.packSequences(docs.repartition(17), spark)
    assert(packed.exceptAll(b).count() == 0 && b.exceptAll(packed).count() == 0)
    packed.unpersist()
  }

  test("per-key quota: at most n per key, partition-invariant selection") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source")
    val a = Sampling.capPerKey(d, "source", "doc_id", 2).cache()
    assert(a.groupBy("source").count().filter(col("count") > 2).count() == 0)
    // keys with <= n rows keep everything
    val small = d.groupBy("source").count().filter(col("count") <= 2).count()
    assert(a.count() >= small)
    // the hash keep is a property of content, not layout
    val b = Sampling.capPerKey(d.repartition(13), "source", "doc_id", 2)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    a.unpersist()
  }

  test("PII scrub: planted emails/phones/ips counted and replaced, clean rows untouched") {
    import spark.implicits._
    val out = TextAnalysis.piiStats(Corpora.piiDocs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(2000000L)._1 == 2 && out(2000000L)._4 ==
      "contact <EMAIL> or <EMAIL> for details")
    assert(out(2000001L)._2 == 2 && out(2000001L)._4 == "call <PHONE> or <PHONE> now")
    assert(out(2000002L)._3 == 2 && out(2000002L)._4 == "server at <IP> and <IP> responded")
    assert(out(2000003L) == ((1L, 1L, 1L, "mixed <EMAIL> on <IP> dial <PHONE>")))
    assert(out(2000004L) == ((0L, 0L, 0L, "no personal data in this row at all")))
  }

  test("repetition stats: degenerate repeated text scores high, varied text low") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "buy now buy now buy now buy now buy now"),      // one dominant 2-gram
      (2L, "alpha bravo charlie delta echo foxtrot golf"),  // all distinct
      (3L, "word")                                          // no 2-grams at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(tiny, spark)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // doc 1: 10 toks, 2 distinct -> 800 permille dup; 9 grams, "now buy" x4
    // and "buy now" x5 -> top gram 5/9 = 555 permille
    assert(out(1L) == ((800L, 9L, 5L, 555L)))
    assert(out(2L) == ((0L, 6L, 1L, 166L)))
    assert(out(3L) == ((0L, 0L, 0L, 0L)))
  }

  test("BoundedCollect: matches collect_list under the cap, over-cap groups droppable") {
    import spark.implicits._
    import graft.functions.BoundedCollect
    val cap = 100
    // a 5000-member hot group (the OOM class for collect_list at web df),
    // plus two sane groups, spread over partitions to exercise merge()
    val rows = (0 until 5000).map(i => ("hot", i.toLong)) ++
      Seq(("a", 1L), ("a", 2L), ("b", 7L))
    val df = rows.toDF("key", "v").repartition(16)
    val bounded = udaf(new BoundedCollect(cap))
    val out = df.groupBy("key").agg(bounded(col("v")).as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a").toSet == Set(1L, 2L) && out("b") == Seq(7L),
      "under-cap groups must collect exactly their elements")
    assert(out("hot").size == cap + 1,
      "over-cap group must surface as cap+1 elements (the drop signal)")
    // the pair op's filter semantics: hot dropped, sane kept
    val kept = df.groupBy("key").agg(bounded(col("v")).as("vs"))
      .filter(size(col("vs")).between(2, cap)).collect().map(_.getString(0))
    assert(kept.toSeq == Seq("a"))
  }

  test("duplicate-span stats: planted shared spans found, unique docs report zero") {
    import spark.implicits._
    // synthetic: a & b share a long span (>= w+k-1 chars), c is unique
    val shared = "the quick brown fox jumps over the lazy dog near the river"
    val tiny = Seq(
      (1L, "prefix one " + shared),
      (2L, "another opening here " + shared),
      (3L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo")
    ).toDF("doc_id", "text")
    val st = TextAnalysis.duplicateSpanStats(tiny, spark)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(st(1L)._2 > 0 && st(2L)._2 > 0, "shared span must be detected")
    assert(st(3L)._2 == 0 && st(3L)._3 == 0, "unique doc must report zero")
    // the planted near-copies (full-text-minus-3-tokens overlap) surface in
    // both the per-doc mass and the pair report on the engine corpus
    val corpus = Corpora.withNearDups(docs)
    val stats = TextAnalysis.duplicateSpanStats(corpus, spark).cache()
    val planted = stats.filter(col("doc_id") >= 1000000L).cache()
    assert(planted.count() > 0)
    assert(planted.filter(col("dup_permille") === 0).count() == 0,
      "every planted copy must carry duplicated span mass")
    assert(stats.filter(col("dup_permille") > lit(1000)).count() == 0)
    val pairs = TextAnalysis.duplicateSpanPairs(corpus, spark)
    val hits = pairs.filter(col("doc_b") === col("doc_a") + 1000000L).count()
    assert(hits == planted.count(),
      "each planted (original, copy) pair must appear in the pair report")
    planted.unpersist(); stats.unpersist()
  }

  test("IVF: zero-norm vectors/centroids are NaN-free and match an independent twin") {
    import spark.implicits._
    // 10 vectors, dims 4; vec 1 is a ZERO CENTROID (nlist 4), vec 7 a zero
    // corpus vector — the 0/0 cosine case that would sort oppositely in
    // Spark (array_sort: NaN last) and DuckDB (ORDER BY DESC: NaN first)
    // without the cosine := −2 guard.
    val dims = 4
    val vecs: Seq[(Long, Array[Double])] = (0L to 9L).map { i =>
      i -> (if (i == 1 || i == 7) Array.fill(dims)(0.0)
            else Array.tabulate(dims)(d => math.sin(i * 7 + d * 3) + 0.1 * d))
    }
    val emb = vecs.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
    val nlist = 4; val nprobe = 2; val k = 3; val probeMax = 3L
    val got = Similarity.ivfTopK(emb, k, probeMax, nlist, nprobe, spark)
      .select("query_id", "neighbor_id", "rank", "dot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    // independent driver-side twin with identical declared semantics
    val q = vecs.map { case (id, v) => id -> v.map(x => math.floor(x * 1000 + 0.5).toLong) }.toMap
    def dot(a: Array[Long], b: Array[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val na = dot(a, a); val nb = dot(b, b)
      if (na == 0L || nb == 0L) -2.0 else dot(a, b).toDouble / math.sqrt(na.toDouble * nb.toDouble)
    }
    val cells = (0L until nlist.toLong).toSeq
    def rankedCells(id: Long) = cells.sortBy(c => (-cos(q(id), q(c)), c))
    val assign = (0L to 9L).map(id => id -> rankedCells(id).head).toMap
    val twin = (for {
      qid <- 0L until probeMax
      probed = rankedCells(qid).take(nprobe).toSet
      cands = (0L to 9L).filter(n => n != qid && probed.contains(assign(n)))
      (n, r) <- cands.sortBy(n => (-cos(q(qid), q(n)), n)).take(k).zipWithIndex
    } yield (qid, n, r + 1, dot(q(qid), q(n)))).toSet
    assert(got == twin, s"ivfTopK ${got.toSeq.sorted} != twin ${twin.toSeq.sorted}")
  }

  test("cosineNearDups finds planted embedding duplicates via LSH buckets") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = Corpora.withEmbeddingDups(emb)
    val got = Similarity.cosineNearDups(corpus, 990,
        SparkEntry.DedupBands, SparkEntry.DedupBitsPerBand, spark)
      .filter(col("doc_b") === col("doc_a") + 100000L)
    // tiny perturbation almost never flips a sign bit in any of 16 bands
    assert(got.count() >= 9, s"found only ${got.count()}/10 planted pairs")
  }

  test("cosineNearDups recall vs exact all-pairs at the blessed operating point") {
    // regression pin for the documented recall model: at threshold 990‰ with
    // 16 bands × 10 bits the predicted miss rate is ~1e-7 — on the planted
    // corpus the LSH result must recover ≥95% of the EXACT all-pairs result
    // (computed brute-force here, affordable only at test scale)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = Corpora.withEmbeddingDups(emb).cache()
    val q = Similarity.quantized(corpus)
    val exact = q.select(col("vec_id").as("doc_a"), col("q").as("qa"), col("norm2").as("na"))
      .join(q.select(col("vec_id").as("doc_b"), col("q").as("qb"), col("norm2").as("nb")),
        col("doc_a") < col("doc_b"))
      .withColumn("dot", Similarity.dotQ(col("qa"), col("qb")))
      .filter(col("dot") > 0 &&
        col("dot").cast("decimal(38,0)") * col("dot") * lit(1000000L) >=
          lit(990L * 990L) * col("na").cast("decimal(38,0)") * col("nb"))
      .select("doc_a", "doc_b").cache()
    val lsh = Similarity.cosineNearDups(corpus, 990,
        SparkEntry.DedupBands, SparkEntry.DedupBitsPerBand, spark)
      .select("doc_a", "doc_b")
    val nExact = exact.count()
    assert(nExact >= 10, s"fixture must plant exact pairs, got $nExact")
    val recalled = exact.intersect(lsh).count()
    assert(lsh.exceptAll(exact).count() == 0, "LSH must never emit a sub-threshold pair")
    assert(recalled.toDouble / nExact >= 0.95,
      s"LSH recall ${recalled.toDouble / nExact} below documented bound at 990 permille")
  }

  test("pages→vectors→near-dup end-to-end: planted text dups recovered, recall ≥ 95% vs exact") {
    // the text-driven twin of the fixture-embedding path: doc vectors come
    // from the page text itself (VectorFeatures.docVectorsKernel), then the
    // same LSH-bucketed exact-threshold dedup — no embeddings.parquet
    val corpus = Corpora.withNearDups(docs).cache()
    val vecs = graft.pipeline.VectorFeatures.docVectorsKernel(corpus, spark).cache()
    val thr = SparkEntry.TextNearDupPermille.toLong
    val lsh = Similarity.cosineNearDups(vecs, SparkEntry.TextNearDupPermille,
        SparkEntry.TextBands, SparkEntry.TextBitsPerBand, spark)
      .select("doc_a", "doc_b").cache()
    // every planted near-copy (3-of-≥13 tokens dropped) must be recovered
    val nPlantedDocs = corpus.filter(col("doc_id") >= 1000000L).count()
    val plantedFound = lsh.filter(col("doc_b") === col("doc_a") + 1000000L).count()
    assert(nPlantedDocs > 0 && plantedFound == nPlantedDocs,
      s"recovered $plantedFound/$nPlantedDocs planted near-dup pairs")
    // exact all-pairs sweep over the SAME vectors (affordable at test scale)
    val q = Similarity.quantized(vecs)
    val exact = q.select(col("vec_id").as("doc_a"), col("q").as("qa"), col("norm2").as("na"))
      .join(q.select(col("vec_id").as("doc_b"), col("q").as("qb"), col("norm2").as("nb")),
        col("doc_a") < col("doc_b"))
      .withColumn("dot", Similarity.dotQ(col("qa"), col("qb")))
      .filter(col("dot") > 0 &&
        col("dot").cast("decimal(38,0)") * col("dot") * lit(1000000L) >=
          lit(thr * thr) * col("na").cast("decimal(38,0)") * col("nb"))
      .select("doc_a", "doc_b").cache()
    val nExact = exact.count()
    assert(nExact >= nPlantedDocs, s"exact sweep found only $nExact pairs")
    assert(lsh.exceptAll(exact).count() == 0, "LSH must never emit a sub-threshold pair")
    val recalled = exact.intersect(lsh).count()
    assert(recalled.toDouble / nExact >= 0.95,
      s"text near-dup recall ${recalled.toDouble / nExact} below bound")
  }

  test("BMP/WAV parsers decode hand-assembled golden bytes; text stays raw") {
    import spark.implicits._
    def meta(bytes: Array[Byte]): Multimodal.MediaMeta =
      Multimodal.decodeMeta(Seq((1L, bytes)).toDF("doc_id", "text"), spark).head()
    def fromHex(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // 2x2 24-bit BMP, 70 bytes, assembled offset by offset — independent of
    // encodeBmp, so an encoder/decoder shared bug cannot self-verify
    val bmp = fromHex(
      "424d" + "46000000" + "00000000" + "36000000" + // BM, size 70, off 54
      "28000000" + "02000000" + "02000000" +          // DIB 40, w 2, h 2
      "0100" + "1800" + "00000000" + "10000000" +     // planes, 24bpp, raw, 16
      "00000000" * 4 + "00" * 16)                     // resolutions/colors, pixels
    val mb = meta(bmp)
    assert((mb.kind, mb.n_bytes, mb.width, mb.height, mb.channels, mb.first_byte)
      == (("bmp", 70, 2, 2, 3, 0x42)))
    // canonical WAV header: stereo, 44100 Hz, 16-bit, 4 zero samples
    val wav = fromHex(
      "52494646" + "34000000" + "57415645" + "666d7420" + "10000000" +
      "0100" + "0200" + "44ac0000" + "10b10200" + "0400" + "1000" +
      "64617461" + "10000000" + "00" * 16)
    val mw = meta(wav)
    assert((mw.kind, mw.n_bytes, mw.width, mw.height, mw.channels)
      == (("wav", 60, 44100, 16, 2)))
    // our own encoders round-trip through the same parsers
    val eb = meta(Multimodal.encodeBmp(17, 9))
    assert((eb.kind, eb.width, eb.height, eb.n_bytes) == (("bmp", 17, 9, 54 + 52 * 9)))
    val ew = meta(Multimodal.encodeWav(1, 8000, 8, 5))
    assert((ew.kind, ew.width, ew.height, ew.channels, ew.n_bytes)
      == (("wav", 8000, 8, 1, 49)))
    // a text payload that merely STARTS with the magic stays on the stub
    // path — the structural zero-byte pins cannot occur mid-text
    val textBm = ("BM" + "x" * 100).getBytes("UTF-8")
    assert(meta(textBm).kind == "raw")
    assert(meta(("RIFFxxxxWAVEfmt " + "y" * 40).getBytes("UTF-8")).kind == "raw")
  }

  test("decontamination flags planted eval overlap, keeps zero-hit docs, filters") {
    import spark.implicits._
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // 5 shared tokens -> 3 distinct shared 3-grams -> flagged at minHits=3
      (1L, "intro alpha beta gamma delta epsilon outro words"),
      // exactly one shared 3-gram -> annotated, NOT flagged
      (2L, "alpha beta gamma unrelated trailing tokens here"),
      // the shared 3-gram repeated twice still counts ONCE (distinct grams)
      (3L, "alpha beta gamma filler alpha beta gamma filler2"),
      // no overlap -> zero-hit row must still be present
      (4L, "completely disjoint vocabulary in this document"),
      // shorter than n tokens -> zero n-grams, zero hits, no div-by-zero
      (5L, "tiny doc")).toDF("doc_id", "text")
    val stats = TextAnalysis.decontaminationStats(corpus, bench)
      .orderBy("doc_id").collect()
    assert(stats.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val byId = stats.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(byId(1L)._2 == 3 && byId(1L)._4, s"doc 1: ${byId(1L)}")
    assert(byId(2L)._2 == 1 && !byId(2L)._4)
    assert(byId(3L)._2 == 1 && !byId(3L)._4, "repeated gram must count once")
    assert(byId(4L) == ((4L, 0L, 0L, false)))
    assert(byId(5L) == ((0L, 0L, 0L, false)))
    // permille arithmetic: doc 1 has 6 distinct 3-grams, 3 hits -> 500
    assert(byId(1L)._1 == 6 && byId(1L)._3 == 500)
    // the filter form drops exactly the flagged doc
    assert(TextAnalysis.decontaminate(corpus, bench)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L, 5L))
    // scale shape: the benchmark n-gram side must come in as a broadcast
    val plan = TextAnalysis.decontaminationStats(corpus, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("bigram-LM perplexity matches hand-computed quanta, flags and filters") {
    import spark.implicits._
    val train = Seq((700L, "a b a b")).toDF("doc_id", "text")
    // model: cbi (<s>,a)=1 (a,b)=2 (b,a)=1; cctx <s>=1 a=2 b=1; |V|=2, vtot=3
    val corpus = Seq(
      // (<s>,a) p=2/4 → 6931; (a,b) p=3/5 → 5108; (b,<unk>) p=1/4 → 13863
      (1L, "a b c"),
      // (<s>,<unk>) p=1/4 → 13863; (<unk>,<unk>) p=1/3 → 10986
      (2L, "z z")).toDF("doc_id", "text")
    val stats = LanguageModel.perplexityStats(corpus, train, flagAvgNllE4 = 10000L)
      .orderBy("doc_id").collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq == Seq(
      (1L, 3L, 25902L, 8634L, false),
      (2L, 2L, 24849L, 12424L, true)))
    assert(LanguageModel.perplexityFilter(corpus, train, 10000L)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // scale shape: model probes are broadcast, never sort-merge
    val plan = LanguageModel.perplexityStats(corpus, train)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      plan.take(2000))
  }

  test("mixture sampling: rate endpoints, partition invariance, realized rate") {
    import spark.implicits._
    val d = docs.join(
      spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "source"),
      "doc_id")
    // rate 1000 keeps everything, rate 0 keeps nothing
    assert(Sampling.sampleByRate(d, "source", "doc_id", Map.empty, 1000).count()
      == d.count())
    assert(Sampling.sampleByRate(d, "source", "doc_id", Map.empty, 0).count() == 0)
    // content-hash keep is partition-invariant
    val kept = Sampling.sampleByRate(d, "source", "doc_id", Map.empty, 500)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val keptRepart = Sampling.sampleByRate(d.repartition(17), "source", "doc_id",
        Map.empty, 500)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == keptRepart)
    // realized rate tracks the target (binomial, wide tolerance)
    val frac = kept.size.toDouble / d.count()
    assert(frac > 0.4 && frac < 0.6, s"realized $frac")
    // per-source override: a dropped source contributes nothing
    val mixed = Sampling.sampleByRate(d, "source", "doc_id",
      Map("src0" -> 0, "src1" -> 1000), 500)
    assert(mixed.filter(col("source") === "src0").count() == 0)
    assert(mixed.filter(col("source") === "src1").count()
      == d.filter(col("source") === "src1").count())
  }

  test("shuffle shards: dense positions, balanced shards, seed-deterministic") {
    import spark.implicits._
    val d = docs.select("doc_id")
    val n = d.count()
    val sh = Sharding.shuffleShards(d, 8).cache()
    assert(sh.count() == n)
    assert(sh.filter(col("shard") < 0 || col("shard") >= 8).count() == 0)
    // positions are dense 1..count within every shard
    val dense = sh.groupBy("shard")
      .agg(count(lit(1)).as("c"), max("pos").as("mx"), min("pos").as("mn"))
    assert(dense.filter(col("mx") =!= col("c") || col("mn") =!= 1).count() == 0)
    // md5 keys balance the shards (uniform multinomial, wide tolerance)
    val sizes = dense.select("c").as[Long].collect()
    assert(sizes.min > n / 8 / 2 && sizes.max < n / 8 * 2, sizes.mkString(","))
    // layout is a pure function of (seed, id): partitioning cannot move rows
    val again = Sharding.shuffleShards(d.repartition(13), 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect().sorted.toSeq
    assert(again == sh.select("doc_id", "shard", "pos")
      .as[(Long, Int, Int)].collect().sorted.toSeq)
    // a different seed is a genuinely different order
    val other = Sharding.shuffleShards(d, 8, seed = "epoch-2")
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect().sorted.toSeq
    assert(other != again)
    sh.unpersist()
  }

  test("importance weighting: target-like docs keep, raw-like docs drop") {
    import spark.implicits._
    val target = Seq((700L, "a b a b")).toDF("doc_id", "text")
    val raw = Seq((500L, "z z z")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b"), (2L, "z z")).toDF("doc_id", "text")
    val got = LanguageModel.importanceWeights(corpus, target, raw)
      .orderBy("doc_id")
      .select("doc_id", "nll_target_e4", "nll_raw_e4", "weight_e4",
        "avg_weight_e4", "keep")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    // doc 1 "a b": target 6931+5108, raw (both <unk>) 10986+6931
    // doc 2 "z z": target (both <unk>) 13863+10986, raw 4055+2877
    assert(got == Seq(
      (1L, 12039L, 17917L, 5878L, 2939L, true),
      (2L, 24849L, 6932L, -17917L, -8958L, false)))
  }

  test("url canonicalization: every rule on hand cases; canon-url dedup") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host case, default port, fragment
      ("HTTPS://WWW.Example.COM:443/A/b#frag", "https://www.example.com/A/b"),
      // http:80 stripped, https:80 kept
      ("http://a.org:80/x", "http://a.org/x"),
      ("https://a.org:80/x", "https://a.org:80/x"),
      // non-default port kept
      ("http://a.org:8080/x", "http://a.org:8080/x"),
      // tracking params dropped, order of the rest preserved, ? dropped when empty
      ("https://a.org/p?utm_source=f&id=7&fbclid=zz&b=2", "https://a.org/p?id=7&b=2"),
      ("https://a.org/p?utm_source=f&utm_medium=m", "https://a.org/p"),
      // utm_ is a PREFIX rule, fbclid an exact-key rule
      ("https://a.org/p?utmost=1&fbclid2=x", "https://a.org/p?utmost=1&fbclid2=x"),
      // empty path → /, trailing slash stripped on non-root
      ("https://a.org", "https://a.org/"),
      ("https://a.org/", "https://a.org/"),
      ("https://a.org/dir/", "https://a.org/dir"),
      // query on root path
      ("https://a.org?id=1#f", "https://a.org/?id=1"))
    val got = UrlOps.urlStats(cases.map(_._1).zipWithIndex
        .map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "url"))
      .orderBy("doc_id").select("canon_url").as[String].collect().toSeq
    assert(got == cases.map(_._2), got.zip(cases).filter(p => p._1 != p._2._2).toString)

    val keys = UrlOps.urlStats(Seq((1L, "https://WWW.News.Example.CO:8443/x"))
      .toDF("doc_id", "url")).select("host", "registered_domain", "host_rev")
      .as[(String, String, String)].head()
    assert(keys == (("www.news.example.co", "example.co", "co.example.news.www")))

    // dedup: the variant (scheme case + fragment) loses to the earlier crawl
    val pages = Seq(
      (1L, "https://a.org/p?utm_source=x&id=1", "2026-01-01 00:00:00"),
      (2L, "HTTPS://a.org/p?id=1#dup", "2026-01-02 00:00:00"),
      (3L, "https://b.org/q", "2026-01-03 00:00:00"))
      .toDF("doc_id", "url", "ts")
      .withColumn("warc_ts", col("ts").cast("timestamp")).drop("ts")
    val kept = UrlOps.dedupByCanonUrl(pages)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
    // plan shape: groupBy+semi-join, no window funnel
    val plan = UrlOps.dedupByCanonUrl(pages).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("training-data pipeline: monotone attrition, every gate actually enforced") {
    val all = docs
    val bench = all.filter(col("doc_id") % 97 === 0)
    val corpus = Corpora.withExactDups(all.filter(col("doc_id") % 97 =!= 0))
      .union(bench.select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
    val att = TrainingData.attrition(corpus, bench, spark)
      .orderBy(col("stage_id")).collect()
    // monotone non-increasing survival, and each demo gate actually bites
    val counts = att.map(_.getLong(2))
    assert(counts.sliding(2).forall(p => p(1) <= p(0)), counts.mkString(","))
    assert(counts.last < counts.head)
    val out = TrainingData.survivors(corpus, bench, spark).cache()
    try {
      assert(out.count() == counts.last)
      // no survivor violates any gate it passed through
      assert(TextAnalysis.langId(out).filter(col("lang_pred") =!= "en").count() == 0)
      assert(TextAnalysis.quality(out).filter(!col("keep")).count() == 0)
      assert(TextAnalysis.repetitionStats(out, spark)
        .filter(col("dup_tok_permille") > TrainingData.MaxDupTokPermille ||
          col("top_gram_permille") > TrainingData.MaxTopGramPermille).count() == 0)
      assert(TextAnalysis.decontaminationStats(out, bench,
          n = TrainingData.PipelineDecontamN)
        .filter(col("contam_permille") >= TrainingData.MaxContamPermille)
        .count() == 0)
      // planted verbatim eval leaks (+3M copies of bench docs) never
      // survive — they are 1000-permille contaminated by construction
      // (those that reach the decontam stage), and the ones stopped
      // earlier are still gone
      assert(out.filter(col("doc_id") >= 3000000L).count() == 0)
      assert(out.groupBy(md5(col("text"))).count().filter(col("count") > 1).count() == 0)
      // a planted copy never survives alongside its original
      val survIds = out.select(col("doc_id")).cache()
      val both = survIds.filter(col("doc_id") >= 1000000L)
        .select((col("doc_id") - 1000000L).as("doc_id"))
        .join(survIds, Seq("doc_id"), "left_semi").count()
      assert(both == 0, s"$both duplicate pairs both survived")
      survIds.unpersist()
    } finally out.unpersist()
  }

  test("keywords: tf desc then df asc then token asc on a hand corpus") {
    import spark.implicits._
    // df: a=1 b=2 c=2 d=1 — doc1 ranks a (tf 2) then b before c (tf tie,
    // df tie, token asc); doc2 ranks c (tf 2) then d before b (df 1 < 2)
    val tiny = Seq((1L, "a a b c"), (2L, "b c c d")).toDF("doc_id", "text")
    val r = TextAnalysis.keywords(tiny, k = 2).collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> ((x.getString(2), x.getLong(3), x.getLong(4))))
      .toMap
    assert(r((1L, 1)) == (("a", 2L, 1L)))
    assert(r((1L, 2)) == (("b", 1L, 2L)))
    assert(r((2L, 1)) == (("c", 2L, 2L)))
    assert(r((2L, 2)) == (("d", 1L, 1L)))
    assert(r.size == 4)
  }

  test("incremental dedup: index copies dropped, near copies flagged, delta self-dedup") {
    val (standing, delta) = Corpora.incrementalSplit(docs)
    val idxMd5 = Dedup.exact(standing).select("md5")
    val idxBands = Dedup.lshBands(Dedup.minhash(standing, spark))
    val out = Dedup.incrementalDedup(delta, idxMd5, idxBands, spark).cache()
    try {
      // exact copies of standing docs (+1M, ids < 1000010) must be dropped
      assert(out.filter(col("doc_id") >= 1000000L && col("doc_id") < 1000010L).count() == 0)
      // the within-delta copy (+2M) must lose to its first writer (doc 250)
      assert(out.filter(col("doc_id") >= 2000000L).count() == 0)
      assert(out.filter(col("doc_id") === 250L).count() == 1)
      // near copies of standing docs survive AND are flagged (LSH recall)
      val near = out.filter(col("doc_id") >= 1000010L && col("doc_id") < 1000020L)
      val nNear = near.count()
      assert(nNear >= 9, s"near copies lost: $nNear/10 survive")
      val flagged = near.filter(col("near_hit") === 1).count()
      assert(flagged >= (nNear * 9) / 10, s"flagged only $flagged/$nNear near copies")
      // a genuinely new doc is never dropped: every 250..499 id present
      assert(out.filter(col("doc_id") >= 250L && col("doc_id") < 500L).count() ==
        docs.filter(col("doc_id") >= 250L).count())
    } finally out.unpersist()
  }

  test("bandSketchesKernel is row-identical to the HOF form on both vector sources") {
    // the kernel is the production sketching path (tight long loop); the
    // HOF form is the declarative twin the DuckDB oracles mirror — pin
    // them row-identical on float-array (parquet) AND double-array
    // (docVectorsKernel) inputs
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val hof = Similarity.bandSketches(emb,
      SparkEntry.DedupBands, SparkEntry.DedupBitsPerBand, spark)
    val ker = Similarity.bandSketchesKernel(emb,
      SparkEntry.DedupBands, SparkEntry.DedupBitsPerBand, spark)
    assert(hof.exceptAll(ker).count() == 0 && ker.exceptAll(hof).count() == 0)
    val dv = graft.pipeline.VectorFeatures.docVectorsKernel(docs, spark)
    val h2 = Similarity.bandSketches(dv, 8, 4, spark)
    val k2 = Similarity.bandSketchesKernel(dv, 8, 4, spark)
    assert(h2.exceptAll(k2).count() == 0 && k2.exceptAll(h2).count() == 0)
  }

  test("segment dedup: first global occurrence wins, within-doc repeats collapse") {
    import spark.implicits._
    // segTokens = 2 → doc1: ["a b","c d"]; doc2: ["a b","x y","a b"] (first
    // "a b" already owned by doc1, second is a within-doc repeat); doc3's
    // only segment is owned by doc1 → fully deduplicated, EMPTY kept_text
    val tiny = Seq(
      (1L, "a b c d"),
      (2L, "a b x y a b"),
      (3L, "c d")).toDF("doc_id", "text")
    val out = TextAnalysis.segmentDedup(tiny, segTokens = 2)
    val r = out.collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((2L, 2L, "a b c d")))
    assert(r(2L) == ((3L, 1L, "x y")))
    assert(r(3L) == ((1L, 0L, "")))
    // plan shape: two hash aggs + equi-join, never a window funnel
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("segment dedup: planted exact copies lose everything; partition-invariant") {
    val corpus = Corpora.withExactDups(docs)
    val r = TextAnalysis.segmentDedup(corpus).cache()
    try {
      val copies = r.filter(col("doc_id") >= 1000000L)
      assert(copies.count() == 20)
      // an exact copy's every segment is owned by its lower-id original
      assert(copies.filter(col("n_kept") =!= 0L || col("kept_text") =!= "").count() == 0)
      // total annotation: one row per input doc
      assert(r.count() == corpus.count())
      // layout must never leak into results
      val r2 = TextAnalysis.segmentDedup(corpus.repartition(7, col("text")))
      assert(r.exceptAll(r2).count() == 0 && r2.exceptAll(r).count() == 0)
    } finally r.unpersist()
  }

  test("semDedup in-cell drop rule on a hand corpus: lowest id survives, chain drops") {
    import spark.implicits._
    // nlist = 1 → a single cell; v0~v1, v0~v2, v1~v2 all ≥ 990‰; v3 orthogonal
    val rows = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9999f, 0.01f)),
      (2L, Array(0.9999f, -0.01f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val r = Similarity.semDedup(rows, 1, 990, spark).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getInt(3)))).toMap
    assert(r(0L) == ((0L, 1)))  // lowest id of the dup group survives
    assert(r(1L) == ((1L, 0)))  // witness: v0
    assert(r(2L) == ((2L, 0)))  // witnesses: v0 AND v1 (by-witness greedy)
    assert(r(3L) == ((0L, 1)))  // no near-dup → kept
  }

  test("semDedup drops every planted near-dup; every drop has a true witness") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = Corpora.withEmbeddingDups(emb).cache()
    val r = Similarity.semDedup(corpus, 8, 990, spark).cache()
    try {
      assert(r.count() == corpus.count())
      val planted = r.filter(col("vec_id") >= 100000L)
      assert(planted.count() == 10)
      // the original is a smaller-id in-cell near-identical vector, so no
      // planted copy can survive
      assert(planted.filter(col("kept") === 1).count() == 0)
      // soundness: every dropped vector has a GENUINE smaller-id cosine
      // witness corpus-wide (the in-cell restriction can only shrink the
      // witness set, never invent one) — brute-force affordable at test scale
      val q = Similarity.quantized(corpus)
      val dropped = r.filter(col("kept") === 0).select("vec_id")
      val witnessed = dropped
        .join(q.select(col("vec_id"), col("q").as("qb"), col("norm2").as("nb")), "vec_id")
        .join(q.select(col("vec_id").as("a_id"), col("q").as("qa"), col("norm2").as("na")),
          col("a_id") < col("vec_id"))
        .withColumn("dot", Similarity.dotQ(col("qa"), col("qb")))
        .filter(col("dot") > 0 &&
          col("dot").cast("decimal(38,0)") * col("dot") * lit(1000000L) >=
            lit(990L * 990L) * col("na").cast("decimal(38,0)") * col("nb"))
        .select("vec_id").distinct()
      assert(witnessed.count() == dropped.count(),
        "a dropped vector has no true sub-threshold... witness anywhere in the corpus")
    } finally { r.unpersist(); corpus.unpersist() }
  }

  test("multimodal kernel output matches metadata contract") {
    val meta = Multimodal.decodeMeta(docs, spark).toDF().cache()
    assert(meta.filter(col("width") < 32 || col("width") >= 672).count() == 0)
    assert(meta.filter(col("n_bytes") <= 0).count() == 0)
    val frames = Multimodal.sampleFrames(docs, 50, spark)
    // every doc yields ceil(n_bytes/50) frames
    val bad = frames.groupBy("doc_id").agg(count(lit(1)).as("nf"))
      .join(meta, "doc_id")
      .filter(col("nf") =!= ceil(col("n_bytes") / lit(50.0)).cast("long"))
    assert(bad.count() == 0)
  }
}
