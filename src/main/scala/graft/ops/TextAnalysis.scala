package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure Column expressions (whole-stage codegen, no UDFs) and all
  * integer-arithmetic ("permille/centi" fixed-point) so results are
  * bit-reproducible across engines and partitionings — floating-point
  * aggregation order can never leak into results.
  */
object TextAnalysis {

  /** English-y marker words for the heuristic language scorer. */
  val enMarkers: Seq[String] = Seq("the", "a", "of", "is", "and")

  def tokensCol(text: Column): Column = split(text, " ")

  /** Per-doc token statistics: counts + fixed-point mean token length. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      // mean token length in centi-chars: 100*(chars excl. spaces)/n_tokens
      (length(regexp_replace(col("text"), " ", "")) * 100
        / size(toks)).cast("long").as("mean_tok_len_centi"))
  }

  /** Heuristic language ID: marker-token ratio in permille, thresholded.
    * (A real n-gram profile model slots into the same shape; the synthetic
    * corpus shares one vocabulary so markers are the observable signal.) */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    val markerArr = array(enMarkers.map(lit): _*)
    val enCnt = size(filter(toks, t => array_contains(markerArr, t)))
    docs.select(
      col("doc_id"),
      enCnt.as("n_markers"),
      (enCnt * 1000 / size(toks)).cast("long").as("en_permille"))
      .withColumn("lang_pred",
        when(col("en_permille") >= 30, lit("en")).otherwise(lit("und")))
  }

  /** Quality scoring: length, stopword ratio, lexical diversity — the
    * standard pre-training corpus filters, fixed-point. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    val stopArr = array((enMarkers ++ Seq("to", "in")).map(lit): _*)
    val stopCnt = size(filter(toks, t => array_contains(stopArr, t)))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      (stopCnt * 1000 / size(toks)).cast("long").as("stop_permille"),
      (size(array_distinct(toks)) * 1000 / size(toks)).cast("long").as("ttr_permille"))
      .withColumn("keep",
        (col("n_tokens") >= 10) && (col("ttr_permille") >= 100))
  }

  /** Document fingerprint: md5 of the full text plus a 64-bit prefix key —
    * the exact-dedup join key at scale (hash-partitionable). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("md5"),
      substring(md5(col("text").cast("binary")), 1, 16).as("fp64"))

  /** Winnowing fingerprint (rolling hash): k-gram polynomial rolling hash
    * over the character stream, then the minimum hash of every window of w
    * consecutive k-grams (classic winnowing). Guarantees: any shared
    * substring of length ≥ w + k − 1 yields a shared fingerprint. Pure
    * Scala kernel (the rolling recurrence is inherently sequential per doc,
    * perfectly parallel across docs). */
  // winnowing constants, shared with the DuckDB oracle generator (the SQL
  // replays the polynomial as Σ char·B^(k−1−j) mod M with precomputed
  // power-mod literals — identical to the incremental recurrence below)
  val WinnowK = 8
  val WinnowW = 6
  val WinnowB = 131L
  val WinnowM = 1000000007L
  def winnowPowMods: Seq[Long] =
    (0 until WinnowK).map(j =>
      BigInt(WinnowB).modPow(BigInt(WinnowK - 1 - j), BigInt(WinnowM)).toLong)

  def winnow(text: String, k: Int = WinnowK, w: Int = WinnowW): Seq[Long] = {
    // hash UNICODE CODEPOINTS, not UTF-16 code units: the DuckDB oracle's
    // substring/unicode/length are codepoint-based, so hashing surrogate
    // halves would silently diverge on any astral-plane char (emoji)
    val s = text.codePoints.toArray
    if (s.length < k) return Seq.empty
    // modulus sized so h*B and char*pow never overflow a Long
    val B = WinnowB
    val M = WinnowM
    var pow = 1L
    for (_ <- 1 until k) pow = pow * B % M
    val hashes = new Array[Long](s.length - k + 1)
    var h = 0L
    for (i <- 0 until s.length) {
      if (i >= k) h = (h - s(i - k) * pow % M + M * 2) % M
      h = (h * B + s(i)) % M
      if (i >= k - 1) hashes(i - k + 1) = h
    }
    if (hashes.length <= w) return Seq(hashes.min).distinct
    // min per window via a monotonic index deque: O(n) total instead of the
    // naive O(n·w) slice-per-window (and zero per-window allocation) —
    // emits the same min sequence, deduped in first-seen order
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    val deque = new java.util.ArrayDeque[Int]()
    var i = 0
    while (i < hashes.length) {
      while (!deque.isEmpty && hashes(deque.peekLast) >= hashes(i))
        deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst <= i - w) deque.pollFirst()
      if (i >= w - 1) out += hashes(deque.peekFirst)
      i += 1
    }
    out.toSeq
  }

  /** Winnowing as a Dataset op: (doc_id, fingerprint) rows. The rows are
    * ALREADY DISTINCT — `winnow` dedups per doc (LinkedHashSet) and
    * doc_id is unique per input row (the repo-wide corpus precondition) —
    * so consumers must NOT append `.distinct()`: it is a full exchange of
    * the fingerprint stream that removes nothing. */
  def winnowFingerprints(docs: DataFrame, spark: SparkSession,
                         k: Int = WinnowK, w: Int = WinnowW): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) => winnow(t, k, w).map(id -> _) }
      .toDF("doc_id", "fingerprint")
  }

  /** Chunking window for the demo query, shared with the DuckDB oracle. */
  val ChunkMaxTokens = 64
  val ChunkOverlap = 16

  /** Sliding-window token chunking (training/RAG sequence preparation):
    * split each document into chunks of at most `maxTokens` whitespace
    * tokens with `overlap` tokens carried between consecutive chunks.
    * Chunk starts advance by `maxTokens − overlap`; every document emits
    * at least one chunk. Pure in-row generation (sequence + explode +
    * slice) — zero shuffle, output order (doc_id, chunk_id). */
  def chunkTokens(docs: DataFrame, maxTokens: Int = ChunkMaxTokens,
                  overlap: Int = ChunkOverlap): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"chunkTokens: need 0 <= overlap < maxTokens, got ($maxTokens, $overlap)")
    val stride = maxTokens - overlap
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      // integer ceil: one chunk for n <= max, then one per started stride
      .withColumn("n_chunks", expr(
        s"CASE WHEN n <= $maxTokens THEN 1L ELSE 1L + (n - $maxTokens + $stride - 1) div $stride END"))
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(0L, n_chunks - 1)")).as("chunk_id"))
      .withColumn("chunk",
        expr(s"slice(toks, CAST(chunk_id * $stride + 1 AS INT), $maxTokens)"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Packing constants for the demo query, shared with the DuckDB oracle. */
  val PackBudget = 512
  val PackRange = 256

  /** SEQUENCE PACKING (training-batch preparation): assign documents to
    * fixed-token-budget bins with the next-fit rule — docs are taken in
    * doc_id order, appended to the current bin while they fit, otherwise a
    * new bin starts; a doc longer than the budget gets a bin of its own.
    *
    * Global sequential packing cannot scale, so the corpus is split into
    * deterministic doc_id RANGES (`doc_id div rangeSize`) packed
    * independently: sequential inside a range, embarrassingly parallel
    * across ranges, and — because ranges derive from ids, not layout —
    * the result is partition/retry-invariant. Bin ids are (range_id, bin);
    * the per-range tail bin is the only fill loss vs a global pack.
    *
    * Output: (range_id, doc_id, n_tokens, bin), one row per doc. */
  def packSequences(docs: DataFrame, spark: SparkSession,
                    budget: Int = PackBudget,
                    rangeSize: Int = PackRange): DataFrame = {
    import spark.implicits._
    require(budget > 0 && rangeSize > 0)
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("int").as("n_tokens"))
      .withColumn("range_id", expr(s"doc_id div $rangeSize"))
      .select(col("range_id"), col("doc_id"), col("n_tokens"))
      .as[(Long, Long, Int)]
      .repartition(col("range_id"))
      .sortWithinPartitions(col("range_id"), col("doc_id"))
      .mapPartitions { it =>
        // the kernel pattern: sequential per range, parallel across ranges
        var curRange = Long.MinValue
        var fill = 0L
        var bin = 0L
        it.map { case (r, d, n) =>
          if (r != curRange) { curRange = r; fill = 0L; bin = 0L }
          if (fill > 0 && fill + n > budget) { bin += 1; fill = 0L }
          fill += n
          (r, d, n.toLong, bin)
        }
      }
      .toDF("range_id", "doc_id", "n_tokens", "bin")
  }

  /** PII patterns — deliberately STRICT, deterministic formats (simple
    * character classes + bounded repeats only) whose semantics are
    * identical in Java regex (Spark codegen'd RegExpReplace/Count) and
    * RE2 (the DuckDB oracle). Production pipelines widen these; the
    * operator shape — count + ordered scrub, all column expressions —
    * is the part that scales. */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhone = "\\+[0-9]{1,2} [0-9]{3}-[0-9]{3}-[0-9]{4}"
  val PiiIpv4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Per-doc PII detection counts + the scrubbed text (email → phone → ip
    * replacement order, fixed placeholders). Pure column expressions:
    * whole-stage codegen, zero shuffle, trivially 100 TB-safe. */
  def piiStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(PiiEmail)).cast("long").as("n_email"),
      regexp_count(col("text"), lit(PiiPhone)).cast("long").as("n_phone"),
      regexp_count(col("text"), lit(PiiIpv4)).cast("long").as("n_ipv4"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), PiiEmail, "<EMAIL>"),
          PiiPhone, "<PHONE>"),
        PiiIpv4, "<IP>").as("scrubbed"))

  /** WITHIN-document repetition statistics (the Gopher/MassiveText
    * repetition-removal family): duplicate-token mass and the mass of the
    * single most frequent word 2-gram, both integer permille. High values
    * flag degenerate/boilerplate pages (keyword stuffing, navigation
    * spam) that length/stopword heuristics miss.
    *
    * Scale shape: the 2-gram counting shuffles on (doc_id, gram) — a
    * map-side-combinable hash aggregation keyed by the doc, so partitions
    * stay balanced regardless of corpus size; everything else is in-row. */
  def repetitionStats(docs: DataFrame, spark: SparkSession): DataFrame = {
    val toks = split(col("text"), " ")
    val base = docs.select(
      col("doc_id"),
      size(toks).as("n_toks"),
      size(array_distinct(toks)).as("n_distinct"),
      // word 2-grams: zip the tokens with their successors
      expr("""zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
                       slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
                       (a, b) -> concat(a, ' ', b))""").as("grams"))
    val gramTop = base
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("max_gram"),
        sum(col("c")).as("n_grams"))
    base.drop("grams")
      .join(gramTop, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_toks").cast("long").as("n_toks"),
        col("n_distinct").cast("long").as("n_distinct"),
        // widen BEFORE the multiply: size() is INT, and a 10-MB spam page
        // can push (n_toks - n_distinct) * 1000 past Int.MaxValue
        expr("((CAST(n_toks AS BIGINT) - n_distinct) * 1000) div n_toks")
          .as("dup_tok_permille"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("max_gram"), lit(0L)).as("max_gram"),
        coalesce(expr("(max_gram * 1000) div n_grams"), lit(0L))
          .as("top_gram_permille"))
  }

  // decontamination constants, shared with the q_decontam oracle: word
  // n-gram size and the flag threshold (real pipelines run 13-grams —
  // GPT-3 appendix C / Llama 2 use 13-token overlap; the synthetic corpus'
  // 10-99-token docs only express overlap at 3-grams, measured live at
  // sf0.01: 171 docs ≥ 1 hit, 10 docs ≥ 3)
  val DecontamN = 3
  val DecontamMinHits = 3

  /** Distinct word `n`-grams of `text`, in-row (1-based slice — identical
    * to the oracle's `toks[i : i+n-1]`); empty array when the doc is
    * shorter than `n` tokens. */
  def ngramsCol(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
  }

  /** Benchmark DECONTAMINATION (the GPT-3/Llama-class eval-overlap filter):
    * per corpus doc, how many of its distinct word n-grams appear anywhere
    * in the benchmark/eval set, and a `contaminated` flag at `minHits`.
    *
    * Scale shape: the benchmark side is an EVAL SET — bounded by
    * definition (10^3–10^5 docs) — so its distinct-n-gram table is
    * broadcast and the corpus side stays map-local: in-row n-gram
    * generation, explode, broadcast-hash probe, partial count before the
    * one (doc_id-keyed) shuffle. Every corpus doc is returned (zero-hit
    * docs included) so the output is a total annotation, not a hit list.
    * If an oversized benchmark ever outgrows the broadcast ceiling the
    * same plan runs as an SMJ with identical semantics — drop the
    * broadcast hint, nothing else changes. */
  def decontaminationStats(docs: DataFrame, bench: DataFrame,
                           n: Int = DecontamN,
                           minHits: Int = DecontamMinHits): DataFrame = {
    val benchGrams = bench
      .select(explode(ngramsCol(col("text"), n)).as("gram")).distinct()
    val hits = docs
      .select(col("doc_id"), explode(ngramsCol(col("text"), n)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    docs.select(col("doc_id"),
        size(ngramsCol(col("text"), n)).cast("long").as("n_ngrams"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_ngrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(expr("(n_hits * 1000) div n_ngrams"), lit(0L))
          .as("contam_permille"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).as("contaminated"))
  }

  /** The filter form: corpus docs with the contaminated rows removed. */
  def decontaminate(docs: DataFrame, bench: DataFrame,
                    n: Int = DecontamN,
                    minHits: Int = DecontamMinHits): DataFrame =
    docs.join(
      decontaminationStats(docs, bench, n, minHits)
        .filter(col("contaminated")).select("doc_id"),
      Seq("doc_id"), "left_anti")

  /** Cross-document duplicate-SPAN statistics — substring-level dedup (the
    * class of filter that trims spans copied across pages, distinct from
    * the whole/near-doc dedup family), re-expressed on winnowing
    * fingerprints instead of a suffix array: a fingerprint appearing in
    * ≥ 2 documents witnesses a shared substring of length ≥ w + k − 1 (the
    * winnowing guarantee above), so the fraction of a document's distinct
    * fingerprints that recur in other documents is the decision statistic
    * a span-trim / doc-drop filter consumes.
    *
    * Output: (doc_id, n_fp, n_dup_fp, dup_permille) — integer permille via
    * long division, bit-reproducible.
    *
    * Scale shape: two hash-partitioned aggregations (per-fingerprint df,
    * per-doc counts) and one equi-join on the fingerprint — NO pairwise
    * blowup anywhere, so unlike the pair ops no df cap is required: a
    * boilerplate fingerprint shared by 10^6 docs contributes one df row
    * and 10^6 join rows, linear in input size. */
  def duplicateSpanStats(docs: DataFrame, spark: SparkSession,
                         k: Int = WinnowK, w: Int = WinnowW): DataFrame = {
    // df via map-side-combinable groupBy + equi-join back, NOT a count
    // window: WindowExec sorts and single-tasks each fingerprint's whole
    // partition — a 10^9-doc boilerplate fingerprint becomes one straggler
    // — while the groupBy ships only combiner outputs and the join streams.
    // The fingerprint frame is persisted for the two consumers; the
    // per-doc result (bounded: one row per doc) is materialized eagerly so
    // the cache releases before returning.
    // no .distinct(): winnowFingerprints rows are distinct by construction
    val fps = winnowFingerprints(docs, spark, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val fpdf = fps.groupBy("fingerprint").agg(count(lit(1)).as("df"))
      fps.join(fpdf, "fingerprint")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_fp"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_fp"))
        // `div`, not `/`: Spark's / on longs is DOUBLE division; the oracle
        // (and the fixed-point contract) needs exact integral permille
        .withColumn("dup_permille", expr("(n_dup_fp * 1000) div n_fp"))
        .localCheckpoint(true)
    } finally fps.unpersist()
  }

  /** Document pairs ranked by shared winnowing fingerprints (the MOSS-style
    * overlap report): (doc_a, doc_b, n_shared) for pairs sharing at least
    * `minShared` fingerprints. This one IS pairwise, so the band-cap
    * discipline applies: fingerprints with df > maxDf (site boilerplate
    * shared by everyone) are dropped from the pair join — both sides,
    * conservative for recall exactly like `Dedup.lshCandidates` — while
    * `duplicateSpanStats` above still counts them as duplicated mass. */
  /** Demo-query pair threshold: ≥ 8 shared fingerprints ≈ sustained copied
    * text, not two coincidentally shared phrases (the synthetic corpus
    * repeats short phrases heavily; real pipelines tune this). Shared with
    * the DuckDB oracle. */
  val MinSharedFpDemo = 8

  /** Fingerprint-df ceiling for the pair join. Much tighter than the
    * generic band cap on purpose: a fingerprint present in >100 documents
    * is boilerplate (the winnowing/MOSS practice is to DISCARD over-common
    * fingerprints — they carry no duplication signal), and its C(df,2)
    * pair mass would dominate the join: on the sf0.1 corpus the df≤1000
    * tail is 51.8M pair rows, the df≤100 tail 0.98M. Per-doc duplicated
    * MASS (duplicateSpanStats) still counts boilerplate — only pairing
    * ignores it. */
  val MaxFingerprintDf = 100

  def duplicateSpanPairs(docs: DataFrame, spark: SparkSession,
                         minShared: Int = 2,
                         maxDf: Int = MaxFingerprintDf,
                         k: Int = WinnowK, w: Int = WinnowW): DataFrame = {
    // bounded-buffer bucket + in-row pair emission (shared Buckets shape):
    // one shuffle, no self-join (which would recompute the whole winnow
    // pipeline for its second branch), and a df=10^9 boilerplate
    // fingerprint can never materialize its full doc list
    // no .distinct(): winnowFingerprints rows are distinct by construction
    Buckets.pairsWithin(winnowFingerprints(docs, spark, k, w),
        Seq("fingerprint"), "doc_id", maxDf, dedup = false)
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Keyword top-k for the demo query, shared with the DuckDB oracle. */
  val KeywordsK = 5

  /** Per-doc salient-token extraction (the tf-idf class, determinism-safe):
    * tokens ranked by (tf desc, df asc, token asc) — highest in-document
    * frequency first, rarest-in-corpus as the tiebreak. A float idf
    * (ln N/df) would hang bit-reproducibility on libm differences between
    * engines; at fixed tf the rank order ln(N/df) induces is EXACTLY
    * df ascending, so the integer form is order-equivalent per document
    * and bit-stable. Output: (doc_id, rank, token, tf, df).
    *
    * Scale shape: tf is a map-side-combinable (doc, token) aggregation;
    * df aggregates the tf rows, so a viral token ("the" in 10^12 docs) is
    * ONE df row; the df attach is a broadcast join (vocabulary-bounded —
    * at a web-scale vocabulary swap for an SMJ and note the viral-token
    * key skew is exactly the `Skew.saltedJoin` case, since every doc holds
    * the hot token); the rank window partitions by doc_id — bounded by a
    * single document's distinct-token count, never a global funnel. */
  def keywords(docs: DataFrame, k: Int = KeywordsK): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(broadcast(df), "token")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"))
  }

  /** Segment width (tokens) for segment-level dedup, shared with the
    * DuckDB oracle. Real pipelines use the natural paragraph/line break;
    * the synthetic corpus has none, so fixed token blocks stand in. */
  val SegTokens = 16

  /** Segment-level exact-hash deduplication — the CCNet/RefinedWeb
    * paragraph- and line-dedup class (Wenzek et al. 2020 §4.1 dedup
    * paragraph hashes; Penedo et al. 2023 line-level dedup): split each doc
    * into non-overlapping `segTokens`-token segments, md5 each, and keep
    * only the globally FIRST occurrence of every distinct segment — first =
    * lexicographic min (doc_id, seg_id), so later docs lose segments the
    * corpus has already seen, and a segment repeated within one doc
    * survives only at its first position. Returns one row per input doc:
    * (doc_id, n_segments, n_kept, kept_text) — kept segments rejoined in
    * original order; a fully-deduplicated doc keeps an EMPTY kept_text row
    * (total annotation, so a downstream min-length filter sees it).
    *
    * Scale shape: one map-side-combinable `groupBy(hash).agg(min(key))`
    * (a viral boilerplate segment — 10⁶–10⁹ occurrences — is ONE group
    * row), one streaming equi-join on the hash, one doc-keyed reassembly
    * aggregation. No windows, no funnels, no pairwise blowup.
    *
    * The (doc_id, seg_id) order key is encoded as doc_id·10⁹ + seg_id so
    * the min is a plain BIGINT min in both engines; exact while segments
    * per doc < 10⁹ (a 16·10⁹-token doc) and doc_id < ~9.2·10⁹. */
  def segmentDedup(docs: DataFrame, segTokens: Int = SegTokens): DataFrame = {
    require(segTokens > 0, s"segmentDedup: segTokens must be > 0, got $segTokens")
    val segs = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, (size(toks) - 1) div $segTokens),
              i -> array_join(slice(toks, i * $segTokens + 1, $segTokens), ' '))"""))
        .as(Seq("seg_id", "seg_text")))
      .withColumn("h", md5(col("seg_text")))
      .withColumn("ord", col("doc_id") * lit(1000000000L) + col("seg_id"))
    val owner = segs.groupBy("h").agg(min(col("ord")).as("first_ord"))
    segs.join(owner, "h")
      .withColumn("kept", col("ord") === col("first_ord"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_segments"),
        sum(col("kept").cast("long")).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("seg_id"), col("seg_text"))))),
          x => x.getField("seg_text")), " ").as("kept_text"))
  }
}
