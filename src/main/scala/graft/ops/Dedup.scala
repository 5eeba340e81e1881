package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Scale design: every variant is a hash-partitioned groupBy/self-join on a
  * *bounded* key (md5, minhash band, shingle) — never an all-pairs cross
  * join. At 10^12 docs the LSH band join is the only shuffle whose key
  * cardinality grows with corpus size, and it is uniformly distributed by
  * construction (md5 keys), so no skew handling is needed beyond AQE.
  *
  * Hash function: md5 (hex) everywhere — deterministic, available in every
  * engine, and uniformly distributed; min() over hex strings is a valid
  * MinHash order statistic.
  */
object Dedup {

  val NumHashes = 8      // minhash permutations
  val BandRows = 2       // rows per LSH band → 4 bands
  val ShingleSize = 3    // word n-gram width
  val MaxShingleDf = 1000 // hot-shingle cap: document-frequency ceiling
  val MaxBandDf = 1000   // LSH band-bucket cap: same blowup class as shingles
  val MaxVerifyShingles = 20000 // per-doc bound on the in-row verify arrays

  /** Exact dedup: md5 group, group size, canonical representative = min id.
    * The `keep` flag implements "first writer wins" dedup at scale.
    *
    * Group stats are a map-side-combinable `groupBy(md5).agg` joined back on
    * md5 — NOT a `Window.partitionBy(md5)`: a hot content hash (empty pages,
    * parked-domain boilerplate — routinely 10⁶–10⁸ identical copies at web
    * scale) funnels a window into ONE sorting task, while the groupBy
    * partial-aggregates it on every input partition and ships one tiny
    * (count, min) row per hash. The equi-join back redistributes the group
    * rows across all tasks holding that hash, so no single task ever sees
    * the full hot group. Same rows, same oracle, no straggler. */
  def exact(docs: DataFrame): DataFrame = {
    val fp = TextAnalysis.fingerprint(docs)
    val stats = fp.groupBy(col("md5"))
      .agg(count(lit(1)).as("group_size"), min(col("doc_id")).as("canonical_id"))
    fp.join(stats, "md5")
      .select(col("doc_id"), col("md5"), col("fp64"), col("group_size"),
        col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("keep"))
  }

  /** Distinct word-shingles per doc. Fully partition-local: distinctness
    * of (doc_id, shingle) is a PER-DOCUMENT property, so `array_distinct`
    * inside the row before the explode yields the identical row set with
    * ZERO shuffle — the previous `.distinct()` after the explode
    * hash-exchanged the whole shingle stream to deduplicate rows that were
    * already unique across documents. PRECONDITION (unchanged, all callers
    * satisfy it): doc_id is unique per input row. */
  def shingles(docs: DataFrame): DataFrame = {
    val k = ShingleSize
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        explode(expr(
          s"array_distinct(transform(sequence(1, size(toks) - ${k - 1}), i -> concat_ws(' ', slice(toks, i, $k))))"
        )).as("shingle"))
  }

  /** MinHash signatures, long format (doc_id, seed, minhash).
    * h_seed(doc) = min over shingles of md5(seed || '|' || shingle). */
  def minhash(docs: DataFrame, spark: SparkSession): DataFrame =
    minhashFromShingles(shingles(docs), spark)

  /** Same, over an already-materialized shingle frame (callers that reuse
    * the shingles elsewhere cache it and pass it here).
    *
    * All NumHashes hashes are computed IN-ROW per shingle and reduced by a
    * single doc_id-keyed aggregation of NumHashes positional `min`s, then
    * unpivoted back to long format. The previous crossJoin-with-seeds form
    * replicated every (doc, shingle) row NumHashes× through the exchange
    * and keyed the aggregation on NumHashes× more groups — measured 8×
    * more exchange rows for identical output. */
  def minhashFromShingles(sh: DataFrame, spark: SparkSession): DataFrame = {
    val hashed = sh.select(col("doc_id"), expr(
      s"""transform(sequence(0, ${NumHashes - 1}), s ->
            md5(cast(concat(cast(s as string), '|', shingle) as binary)))""")
      .as("hs"))
    val minCols = (0 until NumHashes)
      .map(i => min(element_at(col("hs"), i + 1)).as(s"m$i"))
    val mins = hashed.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
    val unpivot = (0 until NumHashes)
      .map(i => s"struct(CAST($i AS INT) AS seed, m$i AS minhash)")
      .mkString("array(", ", ", ")")
    mins.select(col("doc_id"), explode(expr(unpivot)).as("p"))
      .select(col("doc_id"), col("p.seed").as("seed"),
        col("p.minhash").as("minhash"))
  }

  /** LSH banding: band signature per (doc, band); docs sharing any band
    * signature are near-dup candidates. BandRows=2 → signature is a hash of
    * the (min,max) pair of the band's two minhashes (order-free but
    * collision-safe: the pair is recoverable). */
  def lshBands(minhashes: DataFrame): DataFrame =
    minhashes
      .withColumn("band", (col("seed") / BandRows).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(concat(min(col("minhash")), lit("|"), max(col("minhash")))
        .cast("binary")).as("band_sig"))

  /** Candidate near-dup pairs from LSH bucket join (doc_a < doc_b).
    *
    * Band-bucket cap (ENFORCED, mirroring MaxShingleDf): a bucket holding
    * > maxBandDf docs — boilerplate-heavy web pages whose minhashes all
    * collide — would emit O(df²) join rows; such buckets are DROPPED from
    * the pair join (both sides). Conservative for recall: a true near-dup
    * pair sharing ONLY an overfull bucket is missed, exactly like the
    * shingle cap's conservative Jaccard; a pair that also shares any sane
    * bucket still surfaces. The DuckDB oracle applies the identical cap. */
  def lshCandidates(bands: DataFrame, maxBandDf: Int = MaxBandDf): DataFrame = {
    // bounded-buffer bucket + in-row pair emission (shared Buckets shape):
    // a degenerate bucket (all-equal boilerplate signatures) can never
    // materialize its full doc list — it dies in the size filter, the same
    // DROP the earlier windowed-count form applied
    Buckets.pairsWithin(bands, Seq("band", "band_sig"), "doc_id", maxBandDf)
  }

  /** Exact n-gram Jaccard over shingle sets, integer permille, for pairs
    * sharing at least one shingle. Shuffles on shingle.
    *
    * Hot-shingle cap (ENFORCED, not aspirational): a shingle present in
    * > maxShingleDf documents — one viral sentence fragment shared by 1M
    * docs — would emit O(df²) join rows. Such shingles are dropped from the
    * pair JOIN only; set sizes keep the true cardinality, so capped pairs
    * report a (slightly) conservative Jaccard rather than exploding the
    * shuffle. The DuckDB oracle applies the identical cap. */
  def jaccardPairs(docs: DataFrame, minPermille: Int,
                   maxShingleDf: Int = MaxShingleDf): DataFrame = {
    val sh = shingles(docs).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // shingle document-frequency via map-side-combinable groupBy + semi-join
    // (the Similarity.cappedBuckets shape) — NOT a count window: the viral
    // shingle this cap exists to drop would be single-tasked by the window
    // sort BEFORE the filter could drop it, i.e. the straggler would arrive
    // at the df computation instead of the join it defends.
    val sane = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
      .select("shingle")
    val kept = sh.join(sane, Seq("shingle"), "left_semi")
    val a = kept.select(col("shingle"), col("doc_id").as("doc_a"))
    val b = kept.select(col("shingle"), col("doc_id").as("doc_b"))
    val common = a.join(b, "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard_permille",
        (col("n_common") * 1000 / (col("n_a") + col("n_b") - col("n_common"))).cast("long"))
      .filter(col("jaccard_permille") >= minPermille)
      .select("doc_a", "doc_b", "n_common", "jaccard_permille")
  }

  /** 32-bit SimHash from md5 nibbles: bit i is the sign of the
    * count-weighted sum of tokens whose md5 hex digit i is >= '8'.
    * Returned packed as a long via exact powers of two.
    *
    * Fully in-row: each token's md5 is computed once, then all 32 bit sums
    * fold over the hash array — ONE projection, zero shuffles, zero row
    * blowup (the count-weighted sum over distinct tokens equals the plain
    * sum over occurrences, so no token-count map is needed). The previous
    * formulation shuffled twice with a ×32 crossJoin expansion. */
  def simhash(docs: DataFrame, spark: SparkSession): DataFrame =
    docs
      .select(col("doc_id"),
        expr("transform(split(text, ' '), t -> md5(cast(t as binary)))").as("hs"))
      .select(col("doc_id"), expr(
        """aggregate(
             transform(sequence(0, 31), i ->
               IF(aggregate(hs, CAST(0 AS BIGINT),
                    (acc, h) -> acc + IF(substring(h, i + 1, 1) >= '8',
                                         CAST(1 AS BIGINT), CAST(-1 AS BIGINT))) > 0,
                  shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
             CAST(0 AS BIGINT), (acc, b) -> acc + b)""").as("simhash"))

  /** Hamming distance between two packed simhash longs (for near-dup pairing
    * on rotated-band keys — Scala-side helper + bit_count expression). */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    bit_count(a.bitwiseXOR(b))

  case class BandSig(band: Int, band_sig: String)
  case class DocSketch(doc_id: Long, bands: Seq[BandSig], shs: Seq[String])

  /** ONE-PASS per-document sketch kernel: the full LSH band-signature array
    * AND the (sorted, `maxVerify`-capped) verify shingle set of every doc
    * in a single mapPartitions scan — the inputs `nearDupClusters` needs,
    * with ZERO shuffles.
    *
    * Row-identical (spec-pinned in OpsSpec) to the staged batch form
    *   bands  ≡ lshBands(minhashFromShingles(shingles(docs)))  (exploded)
    *   shs    ≡ slice(array_sort(collect_list(shingle)), 1, maxVerify)
    * which costs THREE shuffles (shingle distinct, minhash agg, band agg)
    * plus a fourth collect_list agg for the verify arrays, and interprets
    * NumHashes md5 expressions per shingle row through Catalyst. Here the
    * per-doc shingle set never leaves the row: distinct shingles, all
    * NumHashes minhashes (digest-byte min — hex-lexicographic ≡ unsigned
    * byte order), and the per-band (min,max) signature hash are a tight
    * Scala loop. A doc shorter than ShingleSize tokens emits empty arrays
    * (no shingles → no bands, exactly like the batch path, where such docs
    * simply have no rows). */
  def docSketches(docs: DataFrame, spark: SparkSession,
                  maxVerify: Int = MaxVerifyShingles): DataFrame = {
    import spark.implicits._
    val k = ShingleSize
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexChars = "0123456789abcdef".toCharArray
        def hex(d: Array[Byte]): String = {
          val out = new Array[Char](d.length * 2)
          var i = 0
          while (i < d.length) {
            out(2 * i) = hexChars((d(i) >> 4) & 0xF)
            out(2 * i + 1) = hexChars(d(i) & 0xF)
            i += 1
          }
          new String(out)
        }
        def ltUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
          var i = 0
          while (i < a.length) {
            val d = (a(i) & 0xFF) - (b(i) & 0xFF)
            if (d != 0) return d < 0
            i += 1
          }
          false
        }
        it.map { case (id, text) =>
          val toks = text.split(" ", -1)
          val set = new java.util.LinkedHashSet[String]()
          if (toks.length >= k) {
            var i = 0
            val sb = new java.lang.StringBuilder()
            while (i + k <= toks.length) {
              sb.setLength(0)
              var j = 0
              while (j < k) {
                if (j > 0) sb.append(' ')
                sb.append(toks(i + j)); j += 1
              }
              set.add(sb.toString); i += 1
            }
          }
          if (set.isEmpty) DocSketch(id, Seq.empty, Seq.empty)
          else {
            val mins = new Array[Array[Byte]](NumHashes)
            val itr = set.iterator()
            while (itr.hasNext) {
              val sh = itr.next()
              var s = 0
              while (s < NumHashes) {
                md.reset()
                val d = md.digest((s.toString + "|" + sh)
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8))
                if (mins(s) == null || ltUnsigned(d, mins(s))) mins(s) = d
                s += 1
              }
            }
            val bands = (0 until NumHashes / BandRows).map { b =>
              val h1 = hex(mins(b * BandRows))
              val h2 = hex(mins(b * BandRows + 1))
              val (lo, hi) = if (h1 <= h2) (h1, h2) else (h2, h1)
              md.reset()
              BandSig(b, hex(md.digest((lo + "|" + hi)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
            }
            val verify = set.toArray(new Array[String](set.size()))
            java.util.Arrays.sort(verify,
              new java.util.Comparator[String] {
                def compare(a: String, b: String): Int =
                  graft.ops.ConnectedComponents.utf8Ordering.compare(a, b)
              })
            DocSketch(id, bands, verify.take(maxVerify).toSeq)
          }
        }
      }.toDF("doc_id", "bands", "shs")
  }

  /** Long-format (doc_id, band, band_sig) rows from the one-pass kernel —
    * drop-in, value-identical replacement for
    * `lshBands(minhash(docs))` (spec-pinned via docSketches) at zero
    * shuffles instead of three. */
  def bandSigsKernel(docs: DataFrame, spark: SparkSession): DataFrame =
    docSketches(docs, spark)
      .select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.band_sig").as("band_sig"))

  /** End-to-end near-duplicate CLUSTERING — the production web-corpus dedup
    * pipeline (candidates → verify → cluster → keep-canonical), composed
    * from the operators above:
    *
    *   1. candidates from the LSH band-bucket join (bounded, uniform keys);
    *   2. CANDIDATE-DRIVEN exact verification: each candidate pair joins its
    *      two per-doc shingle arrays (one row per doc — the in-row unit) and
    *      computes exact n-gram Jaccard via array_intersect. Work scales
    *      with |candidates|, never with shingle df² (unlike the exploratory
    *      `jaccardPairs`, which discovers pairs by shingle join);
    *   3. connected components over the verified pair graph — transitive
    *      closure, so A≈B≈C dedups as ONE cluster even when the A–C edge
    *      misses the threshold. Distributed min-label propagation; only
    *      docs appearing in ≥1 verified pair enter the iteration
    *      (singletons bypass it entirely via the final left join);
    *   4. canonical representative = min doc_id per cluster; `keep` =
    *      "first writer wins", same contract as `exact`.
    *
    * Returns one row per input doc: (doc_id, cluster, keep). */
  def nearDupClusters(docs: DataFrame, minPermille: Int,
                      spark: SparkSession): DataFrame = {
    // ONE kernel pass owns both sketch surfaces: band signatures for the
    // candidate join AND the bounded verify shingle arrays ride in the same
    // per-doc row (docSketches scaladoc) — the previous staged form spent
    // three shuffles plus a collect_list aggregation deriving them from an
    // exploded 10⁵–10⁶-row shingle frame, and cached THAT frame instead of
    // these one-row-per-doc sketches.
    //
    // Verification arrays are BOUNDED: a pathologically long document
    // contributes at most MaxVerifyShingles (sorted-prefix, deterministic)
    // to its in-row shingle set, so no candidate-join row grows without
    // limit. Above the cap the verify Jaccard is computed over the prefix
    // sets (documented approximation — web documents sit far below it; the
    // oracle applies the identical prefix rule).
    val sk = docSketches(docs, spark).cache()
    val cands = lshCandidates(
      sk.select(col("doc_id"), explode(col("bands")).as("b"))
        .select(col("doc_id"), col("b.band").as("band"),
          col("b.band_sig").as("band_sig")))
    val shSets = sk.select(col("doc_id"), col("shs"))
    val verified = cands
      .join(shSets.select(col("doc_id").as("doc_a"), col("shs").as("sha")), "doc_a")
      .join(shSets.select(col("doc_id").as("doc_b"), col("shs").as("shb")), "doc_b")
      // bind: the jaccard formula references n_common twice (numerator +
      // union denominator), and pushdown puts it in the join condition
      // where interpreted array_intersect has no CSE — one intersection
      // per candidate pair, not two
      .filter(bind(size(array_intersect(col("sha"), col("shb")))) { nc =>
        (nc * 1000 / (size(col("sha")) + size(col("shb")) - nc))
          .cast("long") >= minPermille })
      .select("doc_a", "doc_b").cache()
    val verts = verified.select(col("doc_a").as("v"))
      .union(verified.select(col("doc_b").as("v"))).distinct()
      .select(lit("g").as("scope"), col("v"))
    val edges = verified.select(lit("g").as("scope"),
      col("doc_a").as("src"), col("doc_b").as("dst"))
    // size-adaptive components: the verified pair graph is usually far
    // below the one-task ceiling (near-dup clusters are sparse by
    // construction), where the exact union-find skips the iterative path's
    // per-round join/checkpoint/count barriers entirely; above the ceiling
    // the pointer-jumping propagation runs unchanged (64 rounds cover
    // diameters to ~2⁶⁴, non-convergence raises)
    val comp =
      try ConnectedComponents.adaptive(verts, edges, maxIter = 64)
        .select(col("v").as("doc_id"), col("comp").as("cluster"))
      finally {
        // both branches of adaptive run eagerly enough (size probe /
        // checkpoint-rooted labels) that the intermediate caches are done —
        // release them (also on the non-convergence throw) instead of
        // pinning the sketch frame for the session lifetime
        sk.unpersist(); verified.unpersist()
      }
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"),
        (coalesce(col("cluster"), col("doc_id")) === col("doc_id")).as("keep"))
  }

  /** In-row LSH band signatures over a text column: array of
    * (band, band_sig) structs, value-identical to
    * `lshBands(minhash(docs))` rows (spec-pinned) but computed with ZERO
    * shuffles — shingles, all NumHashes minhashes, and the per-band
    * (min,max) signature hash are array HOFs over the single row. This is
    * the STREAMING shape: a stream allows only one aggregation per query,
    * and the batch form spends its two groupBys getting per-doc minima
    * that a row already owns. Docs shorter than ShingleSize tokens get an
    * EMPTY array (no shingles → no bands, exactly like the batch path). */
  /** Let-binding for Column expressions: evaluate `c` ONCE and reference
    * the bound value through a lambda variable. Scala `val` reuse of a
    * Column builds a DAG but Catalyst stores a TREE — every reference
    * re-substitutes (and re-EVALUATES) the whole subtree, and interpreted
    * HOFs get no common-subexpression elimination. Measured on
    * `inRowBandSigs`: the un-bound form referenced the 8-minhash array 16×
    * and the shingle array 8× inside it → ~19k md5s per doc instead of
    * ~1.2k (q_stream_incr_dedup: 206 s → ~3 s at sf0.1). */
  private def bind(c: org.apache.spark.sql.Column)
                  (f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    element_at(transform(array(c), f), 1)

  def inRowBandSigs(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val k = ShingleSize
    val toks = split(text, " ")
    val sh = array_distinct(transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => concat_ws(" ", slice(toks, i, lit(k)))))
    // the when-guard keeps sequence() from ever seeing stop < start (it
    // would generate DESCENDING values, not an empty array)
    when(size(toks) >= k,
      bind(sh) { shv =>
        bind(transform(sequence(lit(0), lit(NumHashes - 1)), s =>
          array_min(transform(shv, shi =>
            md5(concat(s.cast("string"), lit("|"), shi).cast("binary")))))) { m =>
          def mh(b: org.apache.spark.sql.Column, r: Int) =
            element_at(m, (b * BandRows + r + 1).cast("int"))
          transform(sequence(lit(0), lit(NumHashes / BandRows - 1)), b =>
            struct(b.cast("int").as("band"),
              md5(concat(least(mh(b, 0), mh(b, 1)), lit("|"),
                greatest(mh(b, 0), mh(b, 1))).cast("binary")).as("band_sig")))
        }
      })
      .otherwise(
        expr("CAST(array() AS array<struct<band:int,band_sig:string>>)"))
  }

  /** INCREMENTAL (snapshot-delta) dedup: clean a batch of NEW docs against
    * a STANDING corpus index without re-deduplicating the standing corpus.
    * At 10^12 docs a full re-dedup per crawl snapshot is quadratic in
    * snapshots; the production loop instead keeps the previous snapshot's
    * content-hash and LSH band tables (exactly what `exact` and `lshBands`
    * already materialize) and runs only the delta against them.
    *
    * Levels, mirroring the batch operators:
    *   1. within-delta exact: first-writer-wins on the content md5 (two
    *      copies of a new page in one snapshot keep one);
    *   2. vs-index exact: survivors whose md5 exists in `indexMd5` are
    *      DROPPED (left-anti on the hash — an SMJ on a uniform key at
    *      scale, never a broadcast of the 10^12-row index);
    *   3. vs-index near: survivors sharing ANY LSH band bucket with
    *      `indexBands` are FLAGGED (near_hit = 1), not dropped — band
    *      collision is candidate evidence, routed to the same bounded
    *      in-row Jaccard verify the batch path uses.
    *
    * Output: one row per SURVIVING delta doc — (doc_id, md5, near_hit). */
  def incrementalDedup(delta: DataFrame, indexMd5: DataFrame,
                       indexBands: DataFrame, spark: SparkSession): DataFrame = {
    val h = delta.select(col("doc_id"), col("text"), md5(col("text")).as("md5"))
    // groupBy + equi-join, not a window: the hot-hash discipline of `exact`
    val own = h.groupBy("md5").agg(min(col("doc_id")).as("keep_id"))
    // no .distinct() on the index sides: anti/semi joins are insensitive
    // to duplicate build-side keys, and a distinct would full-shuffle the
    // 10^12-row index before the join can prune anything
    val fresh = h.join(own, "md5").filter(col("doc_id") === col("keep_id"))
      .join(indexMd5.select("md5"), Seq("md5"), "left_anti")
      .select("doc_id", "text", "md5")
    // kernel band signatures (value-identical to lshBands(minhash(...)),
    // spec-pinned): the survivors' sketches never shuffle before the probe
    val flagged = bandSigsKernel(fresh, spark)
      .join(indexBands.select("band", "band_sig"),
        Seq("band", "band_sig"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("near_hit", lit(1))
    fresh.join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("md5"),
        coalesce(col("near_hit"), lit(0)).as("near_hit"))
  }
}
