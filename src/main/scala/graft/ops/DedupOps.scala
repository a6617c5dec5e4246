package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH banding, SimHash, and exact n-gram
  * Jaccard on candidate pairs.
  *
  * Scale design: every variant reduces to groupBy/join on a *derived
  * small key* (content hash, band hash, shingle) so the only shuffles
  * are on well-distributed hash keys; nothing is ever collected to the
  * driver and no O(n²) step exists outside per-bucket candidate pairs.
  *
  * Pipeline composition at scale: run `exactDedup` FIRST, then near-dup
  * (`minhashLsh`/`ngramJaccard`) over the surviving unique documents.
  * Bucket/posting pair generation is quadratic in bucket size, and the
  * one unbounded bucket source is byte-identical duplicates — which
  * exact dedup removes for one cheap shuffle, keeping every LSH bucket
  * at true near-dup-cluster size.
  */
object DedupOps {

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** Word 3-gram shingles (distinct) of a text column.
    *
    * Built with `zip_with` over three `slice`s of the token array, NOT
    * `transform(sequence(...), i => element_at(toks, i))`: higher-order
    * lambdas are interpreted (no codegen, no common-subexpression
    * elimination), so an `element_at(split(...), i)` body re-splits the
    * whole text once per element — O(tokens²) per document. zip_with
    * binds its array inputs once, keeping shingling linear.
    */
  private def shingles(c: Column): Column = {
    val t = toks(c)
    val n = greatest(size(t) - 2, lit(0))
    array_distinct(
      zip_with(
        slice(t, lit(1), n),
        zip_with(slice(t, lit(2), n), slice(t, lit(3), n),
          (b, cc) => concat(b, lit(" "), cc)),
        (a, bc) => concat(a, lit(" "), bc)))
  }

  /** Exact dedup via content hash: one shuffle on md5(text); keeps the
    * lowest doc_id per group (deterministic winner).
    */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Incremental dedup — the shape a GROWING corpus actually runs:
    * a new batch arrives, and each batch document gets a verdict
    * against the already-deduplicated history plus the batch itself:
    * `dup_of_history` (content already ingested), `dup_in_batch`
    * (first copy wins within the batch, by doc_id), or `new`.
    *
    * Scale shape: the history side joins as CONTENT HASHES only — in
    * production that index is precomputed and stored (one narrow
    * column, bucketed by hash, so the repeated nightly join is
    * shuffle-free on the history side and never re-reads history
    * text); here it derives from the documents table in one
    * column-pruned pass. The batch side shuffles ONCE on the hash —
    * when history is broadcast-small the join is shuffle-free and
    * the one exchange feeds the first-copy window; when history is
    * large, the sort-merge join hash-partitions both sides and the
    * window reuses that same distribution with no extra exchange.
    * Nothing is ever all-pairs and the dup graph is never
    * materialized.
    *
    * The fixture has no cross-batch duplicates, so the registered
    * query derives a deterministic batch from the corpus itself (the
    * same one-scan explode pattern as the clone-recall corpus):
    * doc_id%3==0 docs re-arrive verbatim (→ dup_of_history), %3==1
    * docs arrive with fresh content (→ new), and %5==2 docs arrive
    * as twin pairs unseen in history (→ one new + one dup_in_batch).
    */
  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sfDir, "documents")
    val batch = derivedBatch(docs)
    val history = docs
      .select(md5(col("text")).as("hsh")).distinct()
      .withColumn("in_hist", lit(true))
    val firstCopy = Window.partitionBy(col("hsh"))
    batch
      .join(history, Seq("hsh"), "left")
      .withColumn("first_id", min(col("doc_id")).over(firstCopy))
      .select(col("doc_id"),
        when(col("in_hist"), "dup_of_history")
          .when(col("doc_id") > col("first_id"), "dup_in_batch")
          .otherwise("new").as("verdict"))
  }

  /** Bloom-filter geometry for [[bloomDedup]]: m bits / k hash
    * functions. At the fixture's ~5k distinct history hashes,
    * m=65536, k=4 gives a theoretical false-positive rate of ~0.5%;
    * production sizes m to the stored history cardinality (10 bits
    * per element ≈ 1% fpp). */
  val BloomBits = 65536
  val BloomHashes = 4

  /** Bit position of hash function `i` for content hash `hsh` —
    * md5-derived (the [[Md5]] 32-bit shape, salted by the function
    * index), so the DuckDB oracle rebuilds the identical bloom,
    * false positives included. */
  private def bloomPos(hsh: Column, i: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", hsh, lit(i))), 1, 8), 16, 10)
      .cast("long"), lit(BloomBits.toLong))

  /** The deterministic derived batch [[incrementalDedup]] documents:
    * %3==0 re-arrivals, %3==1 fresh content, %5==2 twin pairs. */
  private def derivedBatch(docs: DataFrame): DataFrame = docs
    .select(explode(array(
      when(col("doc_id") % 3 === 0, struct(
        (col("doc_id") + 1000000L).as("doc_id"), col("text").as("text"))),
      when(col("doc_id") % 3 === 1, struct(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" unseen")).as("text"))),
      when(col("doc_id") % 5 === 2, struct(
        (col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" twin")).as("text"))),
      when(col("doc_id") % 5 === 2, struct(
        (col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" twin")).as("text"))))).as("d"))
    .filter(col("d").isNotNull)
    .select(col("d.doc_id").as("doc_id"), md5(col("d.text")).as("hsh"))

  /** Bloom-probe incremental dedup — the shuffle-free form of
    * [[incrementalDedup]]'s history check: instead of joining the
    * batch against the history hash index, the history's SET BITS
    * (k md5-derived positions per hash, m-bit space) broadcast to
    * every batch partition and each batch document tests its own k
    * positions — membership is "all k present". A Bloom filter can
    * assert NO FALSE NEGATIVES (every true re-arrival is flagged;
    * the `false_negative` column is provably all-false) while false
    * positives occur at the sized-for rate and are surfaced per-row.
    *
    * Scale shape: at 100 TB the m-bit array ships as packed bytes
    * (m/8 — a few GB covers tens of billions of hashes at 1% fpp)
    * while the hash index itself would be tens of TB and force a
    * shuffle join; here the set-bit SET (≤ n·k narrow rows,
    * duplicates collapsed) broadcasts and the batch probes it with
    * a broadcast join + per-doc conjunction count — the batch
    * never shuffles on content at all, and history text is never
    * read. The bloom is rebuilt here from the derived history; in
    * production it persists alongside the hash index (the same
    * cross-run artifact lifecycle as `a2_sketch_persist`).
    *
    * Every bit position is md5-derived, so the bloom — including
    * which non-members collide into false positives — is a pure
    * function of the data and the DuckDB oracle reproduces the
    * verdict table bit-for-bit.
    */
  def bloomDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    // the history hash index is a PRECOMPUTED, STORED artifact in
    // production (same lifecycle as the bloom itself); materialize it
    // once here — two live consumers (bloom build + survivor join)
    // would each re-run the distinct, and the materialized frame's
    // accurate size lets the engine pick broadcast vs shuffle for the
    // survivor join honestly
    val history = docs.select(md5(col("text")).as("hsh")).distinct()
      .localCheckpoint()
    val setBits = history
      .select(explode(array(
        (1 to BloomHashes).map(i => bloomPos(col("hsh"), i)): _*)).as("pos"))
      .distinct()
    val batch = derivedBatch(docs).localCheckpoint()
    val probes = batch.select(col("doc_id"), col("hsh"),
      posexplode(array(
        (1 to BloomHashes).map(i => bloomPos(col("hsh"), i)): _*))
        .as(Seq("i", "pos")))
    val hits = probes
      .join(broadcast(setBits), "pos")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("i")).as("n_set"))
    val gated = batch
      .join(hits, Seq("doc_id"), "left")
      .withColumn("bloom_flagged",
        coalesce(col("n_set"), lit(0L)) === BloomHashes)
    // THE point of the bloom: only flagged survivors reach the exact
    // hash-index join (|flagged| ≈ |true dups| + fpp·|batch| — a
    // ~200× smaller probe side at typical dup rates); unflagged docs
    // are provably clean (no false negatives), so their verdict needs
    // no join at all
    val flagged = gated.filter(col("bloom_flagged"))
      .join(history.withColumn("in_hist", lit(true)), Seq("hsh"), "left")
      .select(col("doc_id"),
        coalesce(col("in_hist"), lit(false)).as("dup_of_history"),
        col("bloom_flagged"))
    val clean = gated.filter(!col("bloom_flagged"))
      .select(col("doc_id"),
        lit(false).as("dup_of_history"), col("bloom_flagged"))
    flagged.union(clean)
      .withColumn("false_positive",
        col("bloom_flagged") && !col("dup_of_history"))
      .withColumn("false_negative",
        col("dup_of_history") && !col("bloom_flagged"))
  }

  /** Word 5-gram shingles (distinct) — longer than the near-dup
    * 3-grams because decontamination wants high-precision matches
    * (a shared 5-gram is strong evidence of copied text, not shared
    * phrasing). Same linear zip_with construction as [[shingles]]. */
  private def shingles5(c: Column): Column = {
    val t = toks(c)
    val n = greatest(size(t) - 4, lit(0))
    def s(i: Int) = slice(t, lit(i), n)
    array_distinct(
      (2 to 5).foldLeft(s(1))((acc, i) =>
        zip_with(acc, s(i), (a, b) => concat(a, lit(" "), b))))
  }

  /** Benchmark decontamination: find corpus documents sharing any word
    * 5-gram with a blocklist (here: doc_id < 5 standing in for an
    * eval/benchmark set) — the overlap check every training corpus
    * runs before release. Scale shape: the blocklist is benchmark-
    * suite-sized (tiny next to the corpus), so its distinct shingles
    * BROADCAST; the corpus streams through once and only matching
    * (doc, shingle) pairs reach the final doc-keyed groupBy. No
    * corpus-sized shuffle, no self-join — O(corpus) scan + broadcast
    * probe at any corpus size.
    */
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.loadBalanced(spark, sfDir, "documents")
      .select(col("doc_id"), shingles5(col("text")).as("sh"))
    val blocklist = docs.filter(col("doc_id") < 5)
      .select(explode(col("sh")).as("shingle")).distinct()
    val corpus = docs.filter(col("doc_id") >= 5)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    corpus
      .join(broadcast(blocklist), "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  /** Token-hash modes for the sketch operators (minhash, simhash).
    *
    * `XxHash` is the production default: native xxhash64 folded
    * positive, ~an order of magnitude cheaper than parsing md5 hex.
    * `Md5` is the oracle mode the registered queries use: first 8 hex
    * chars of md5 as a long — exactly reproducible in the DuckDB
    * oracle (`CAST('0x' || substr(md5(t),1,8) AS BIGINT)`), the shape
    * TextOps.h32 proved. Both are bounded below 2^32; the permutation
    * reduces them mod [[MinhashPrime]] first, so its products stay
    * far from long overflow.
    */
  sealed trait TokenHash { def apply(c: Column): Column }
  case object XxHash extends TokenHash {
    def apply(c: Column): Column = pmod(xxhash64(c), lit(2147483647L))
  }
  case object Md5 extends TokenHash {
    def apply(c: Column): Column =
      conv(substring(md5(c), 1, 8), 16, 10).cast("long")
  }

  /** Universal-hash modulus for the permutation family: 2^31 − 1.
    * The modulus MUST be small enough that h·A actually wraps — the
    * previous family reduced mod 2^61−1 with h < 2^32 and A ≤ 2^24,
    * so h·A + B < 2^57 never wrapped, the affine map was
    * order-preserving, and every "permutation" picked the same
    * argmin shingle (minhash collapsed to ONE effective hash
    * function replicated 16×: every candidate pair showed 16/16
    * signature agreement and banding gave no recall amplification —
    * surfaced by the `d_minhash_est` audit as est_jaccard = 1.0 on
    * pairs with exact Jaccard ≈ 0.005). With p = 2^31−1 the product
    * (p−1)² < 2^63 stays overflow-free in a long while wrapping
    * ~2^31 times — the classic (a·h + b) mod p universal hash. */
  private val MinhashPrime = 2147483647L // 2^31 - 1

  val NumPerms = 16

  /** Independent per-component coefficients, fixed seed:
    * A_i ∈ [1, p−1], B_i ∈ [0, p−1]. */
  val PermA: Array[Long] = {
    val r = new scala.util.Random(1069L)
    Array.fill(NumPerms)((r.nextInt(2147483646) + 1).toLong)
  }
  val PermB: Array[Long] = {
    val r = new scala.util.Random(2069L)
    Array.fill(NumPerms)(r.nextInt(2147483647).toLong)
  }

  private def perm(i: Int, h: Column): Column =
    (((h % lit(MinhashPrime)) * lit(PermA(i)) + lit(PermB(i)))
      % lit(MinhashPrime))

  val NumBands = 4 // 4 rows per band → Jaccard ~0.6+ lands in a bucket

  /** Hard cap on LSH band-bucket size: pair generation is O(size²) per
    * bucket, so one pathological megacluster (e.g. boilerplate pages)
    * must not dominate a task. Oversized buckets are dropped and counted
    * via an `observe` metric (`d_minhash_lsh_<hash>_buckets_cap<N>.dropped_buckets`).
    * 64² = 4096 pairs per bucket worst case — bounded task size at any
    * corpus scale. Byte-identical clusters are removed up front by the
    * documented exactDedup-first composition; what this cap drops is
    * the rarer near-dup megacluster. */
  val MaxBucketSize = 64

  /** MinHash signatures: explode shingles once, one groupBy(doc) with
    * NumPerms min() aggregates — a single shuffle, fully codegen'd.
    * Returns (doc_id, source, n_shingles, mh0..mh15).
    */
  def minhashSignatures(spark: SparkSession, sfDir: String,
      hash: TokenHash = XxHash): DataFrame =
    minhashSignaturesOf(
      Tables.loadBalanced(spark, sfDir, "documents"), hash)

  /** [[minhashSignatures]] over an arbitrary (doc_id, source, text)
    * frame — the corpus-agnostic core, so callers can signature a
    * derived corpus (e.g. the clone-augmented recall witness) without
    * re-stating the pipeline. */
  def minhashSignaturesOf(corpus: DataFrame,
      hash: TokenHash): DataFrame = {
    val docs = corpus
      .select(col("doc_id"), col("source"), shingles(col("text")).as("sh"))
    // n_shingles comes from size(sh) BEFORE the explode (sh is already
    // distinct) — a countDistinct after explode would force an Expand +
    // distinct-aggregate alongside the 16 min()s for nothing.
    val exploded = docs
      .select(col("doc_id"), col("source"), size(col("sh")).as("n_shingles"),
        explode(col("sh")).as("shingle"))
      .withColumn("h", hash(col("shingle")))
    val aggs = (0 until NumPerms).map(i =>
      min(perm(i, col("h"))).as(s"mh$i"))
    exploded.groupBy(col("doc_id"), col("source"), col("n_shingles"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH near-dup candidate pairs: band the signature, bucket on
    * (band_id, band_hash), emit candidate pairs a<b within each bucket.
    * The banding replaces the O(n²) all-pairs comparison — the scale
    * path for near-dedup at 100 TB.
    *
    * Buckets are formed by groupBy + collect_list instead of a self-join:
    * a self-join evaluates the whole shingle→minhash pipeline twice (the
    * plan has no common-subexpression sharing across join sides), and at
    * 100 TB recomputing signatures is the dominant cost. One shuffle on
    * the band hash, pairs generated inside each (tiny) bucket.
    */
  /** Candidate-pair memo for the registered corpus: the LSH pair graph
    * is a PIPELINE INTERMEDIATE — a real dedup run computes it once
    * and feeds clustering, representative election, and the leakage
    * matrix from the same artifact, it does not re-shingle the corpus
    * per consumer. Pair generation is deterministic, so the persisted
    * frame is row-identical to a fresh build; downstream iterative
    * cost (propagation/contraction rounds) stays visible per query. */
  private val pairCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Int), DataFrame]

  def minhashLsh(spark: SparkSession, sfDir: String,
      hash: TokenHash = XxHash,
      maxBucket: Int = MaxBucketSize): DataFrame =
    pairCache.getOrElseUpdate((sfDir, hash.toString, maxBucket),
      minhashLshOf(
        Tables.loadBalanced(spark, sfDir, "documents"), hash, maxBucket)
        .persist())

  /** [[minhashLsh]] over an arbitrary (doc_id, source, text) frame. */
  def minhashLshOf(corpus: DataFrame, hash: TokenHash,
      maxBucket: Int = MaxBucketSize): DataFrame = {
    val sig = minhashSignaturesOf(corpus, hash)
    val rowsPerBand = NumPerms / NumBands
    val bandCols = (0 until NumBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band_id"), md5(concat_ws("_", cols: _*)).as("band_hash"))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
    val buckets = banded
      .groupBy(col("band_id"), col("band_hash"))
      .agg(array_sort(collect_list(col("doc_id"))).as("docs"))
      // Metric name carries the cap AND the hash mode: observe()
      // requires a unique name per distinct result semantics within a
      // session — different caps are different metrics, and so are the
      // md5-oracle and xxhash-production variants (a plan composing
      // both, e.g. to diff their pair sets, would otherwise fail
      // CheckAnalysis with duplicated metric names and any metrics
      // consumer keyed by name would conflate their drop counts).
      .observe(s"d_minhash_lsh_${hash.toString.toLowerCase}_buckets_cap$maxBucket",
        sum(when(size(col("docs")) > maxBucket, 1).otherwise(0))
          .as("dropped_buckets"))
      .filter(size(col("docs")) > 1 && size(col("docs")) <= maxBucket)
    buckets
      .select(explode(pairsOf(col("docs"))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  /** All ordered pairs (a<b) of a sorted array, as structs (doc_a, doc_b). */
  private def pairsOf(docs: Column): Column =
    flatten(transform(docs, (x, i) =>
      transform(slice(docs, i + 2, size(docs)),
        y => struct(x.as("doc_a"), y.as("doc_b")))))

  /** doc_id offset for the clone corpus in [[minhashProdRecall]]: far
    * above any fixture doc_id, so `doc_b - doc_a == CloneOffset`
    * identifies exactly the (original, clone) pairs. */
  val CloneOffset = 1000000000L

  /** Deterministic correctness witness for the PRODUCTION (xxhash64)
    * hash mode — the one sketch path no SQL oracle can reproduce
    * directly (DuckDB has no xxhash64). The check rides an exact
    * recall guarantee instead of the hash: union the corpus with a
    * cloned copy (same text, doc_id + [[CloneOffset]]). Identical text
    * ⇒ identical shingle set ⇒ identical MinHash signature UNDER ANY
    * HASH FUNCTION ⇒ the clone lands in the same bucket as its
    * original in every band — so LSH must emit every (original,
    * clone) pair with probability 1, deterministically. The query
    * runs the full xxhash64 pipeline (hash → permutations → min-agg →
    * banding → bucketing → pair generation) end-to-end and emits
    * exactly those guaranteed pairs; the oracle reproduces them
    * without xxhash: one pair per document with ≥ 3 tokens (≥ 1
    * shingle — shorter docs have no signature). The bucket cap is
    * lifted for this query (a capped megabucket would drop a
    * guaranteed pair on the Spark side only, which the oracle cannot
    * see); hash-quality properties (dispersion, cross-mode pair
    * agreement) remain EstimatorSpec's job.
    *
    * SCALE CAVEAT: because the cap is lifted, this audit must NOT run
    * over a full 100 TB corpus — one boilerplate megabucket would
    * become a single O(size²) task. At scale the audit runs on a
    * deterministic sample via `sampleFraction` (hashCoin on doc_id, so
    * the sampled set is stable across runs and re-partitioning); the
    * clone-recall guarantee is per-document, so it holds on any
    * subset. The fixture-sized registered query keeps the full corpus
    * (fraction 1.0).
    */
  def minhashProdRecall(spark: SparkSession, sfDir: String,
      sampleFraction: Double = 1.0): DataFrame = {
    // original + clone come off ONE corpus scan: explode duplicates
    // rows, a union of two selects would duplicate the FileScan (no
    // scan sharing across union branches — same idiom as the sym
    // edge expansion in dedupComponents)
    val corpus0 = Tables.loadBalanced(spark, sfDir, "documents")
    val both = (if (sampleFraction >= 1.0) corpus0
      else corpus0.filter(
        CorpusOps.hashCoin(col("doc_id")) < lit(sampleFraction)))
      .select(explode(array(
        struct(col("doc_id").cast("long").as("doc_id"),
          col("source"), col("text")),
        struct((col("doc_id") + CloneOffset).as("doc_id"),
          col("source"), col("text")))).as("d"))
      .select(col("d.doc_id").as("doc_id"),
        col("d.source").as("source"), col("d.text").as("text"))
    minhashLshOf(both, XxHash, maxBucket = Int.MaxValue)
      .filter(col("doc_b") - col("doc_a") === CloneOffset)
      .select(col("doc_a"), col("doc_b"))
  }

  /** MinHash estimator-accuracy audit — the sketch-quality analogue of
    * the ANN recall harness: for every LSH candidate pair, the
    * signature-agreement Jaccard estimate (matching components / 16,
    * the classic MinHash estimator) sits NEXT TO the exact shingle
    * Jaccard in the result, so estimator degradation (a bad permutation
    * family, a banding bug) shows up as a changed oracle row, not a
    * silent quality drift. Signatures here are computed per-row
    * (array_min over the shingle hashes — identical values to the
    * groupBy form [[minhashSignaturesOf]] uses, zero shuffles).
    *
    * Scale shape: the pair set is the banded LSH output (never
    * all-pairs, reused from the pipeline intermediate); the feature
    * side is first semi-joined down to the documents that actually
    * appear in a candidate pair — the audit computes shingle sets and
    * per-row signatures for the AUDIT-SIZED participant set, never the
    * corpus — then materialized once (`localCheckpoint`) because both
    * the doc_a and doc_b join branches reference it and Catalyst
    * shares no subtrees across branches. The token hash is computed
    * ONCE per shingle into its own array; the 16 permutation mins map
    * over those hashes (inlining `hash(s)` into each permutation
    * lambda would md5 every shingle 16×). The exact-Jaccard
    * intersection runs inside each pair row over two ≤doc-length
    * shingle arrays.
    */
  def minhashEstQuality(spark: SparkSession, sfDir: String,
      hash: TokenHash = Md5): DataFrame = {
    val pairs = minhashLsh(spark, sfDir, hash)
    val ids = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val feat = Tables.loadBalanced(spark, sfDir, "documents")
      .join(ids.hint("broadcast"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("hs", transform(col("sh"), s => hash(s)))
      .select(col("doc_id"), col("sh"),
        array((0 until NumPerms).map(i =>
          array_min(transform(col("hs"), h => perm(i, h)))): _*)
          .as("sig"))
      .localCheckpoint()
    val fa = feat.select(col("doc_id").as("doc_a"),
      col("sh").as("sha"), col("sig").as("siga"))
    val fb = feat.select(col("doc_id").as("doc_b"),
      col("sh").as("shb"), col("sig").as("sigb"))
    pairs
      .join(fa, "doc_a").join(fb, "doc_b")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))))
      .select(
        col("doc_a"), col("doc_b"),
        round(size(filter(zip_with(col("siga"), col("sigb"),
          (x, y) => x === y), p => p)).cast("double") / NumPerms, 6)
          .as("est_jaccard"),
        round(col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")), 6)
          .as("exact_jaccard"))
      .withColumn("abs_err",
        round(abs(col("est_jaccard") - col("exact_jaccard")), 6))
  }

  /** (bands, rows-per-band) settings the banding tuning curve
    * measures — every factorization of the 16-component signature,
    * from the highest-recall (16×1: any single component match makes
    * a candidate) to the strictest (1×16: all 16 must agree). */
  val BandCurve: Seq[(Int, Int)] =
    Seq((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))

  /** MinHash banding s-curve — the dedup family's cost/recall dial,
    * measured (the analogue of the ANN nprobe tuning curve): for each
    * (b, r) factorization in [[BandCurve]], the candidate-pair volume
    * the banding generates, how many of those candidates are "tight"
    * (signature-agreement estimate ≥ 0.5 — pairs the production 4×4
    * config is designed to catch), and the mean estimated Jaccard of
    * the candidate set. More bands of fewer rows catch lower-
    * similarity pairs at higher candidate volume (detection prob.
    * 1−(1−s^r)^b); the curve shows the precision/recall trade a
    * deployment sweeps before fixing its banding.
    *
    * Scale shape: ONE shingle scan and per-row signatures (zero
    * shuffles, the est-quality idiom), materialized once and fed to
    * all five configs; the 31 (cfg, band) keys explode linearly;
    * bucket formation is one groupBy with the standard size cap per
    * (cfg, band, bucket) — overflow buckets drop visibly via the
    * observe metric, never an O(size²) task; the per-config rollup
    * runs on candidate pairs only. Mean estimates are exact: each
    * agreement is k/16 (a dyadic rational), decimal-summed then
    * divided — order-independent across engines. */
  def minhashBandCurve(spark: SparkSession, sfDir: String,
      hash: TokenHash = Md5,
      maxBucket: Int = MaxBucketSize): DataFrame = {
    // all NumPerms minima in ONE traversal of the shingle hashes via
    // aggregate (the inline form ran 16 transform+array_min passes,
    // allocating 16 shingle-sized intermediates per row); the perm
    // constants ride foldable literal arrays. Pure integer arithmetic
    // in the identical per-element order ⇒ bit-identical minima (the
    // prime init never wins: residues are < MinhashPrime, and `sh` is
    // filtered nonempty).
    val permAArr = array(PermA.toIndexedSeq.map(lit(_)): _*)
    val permBArr = array(PermB.toIndexedSeq.map(lit(_)): _*)
    val sig = Tables.loadBalanced(spark, sfDir, "documents")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("hs", transform(col("sh"), s => hash(s)))
      .select(col("doc_id"),
        aggregate(col("hs"),
          array_repeat(lit(MinhashPrime), NumPerms),
          (acc, h) => transform(acc, (m, i) =>
            least(m, ((h % lit(MinhashPrime)) * element_at(permAArr, i + 1)
              + element_at(permBArr, i + 1)) % lit(MinhashPrime))))
          .as("sig"))
      .localCheckpoint()
    // bucket identity = the band's RAW signature slice, not an md5 of
    // its rendering: grouping on the r minima themselves is the same
    // bucket partition (md5 was only a proxy for slice equality —
    // exact equality is strictly cleaner), drops an md5-over-string
    // per band per doc from the explode, and shuffles r longs instead
    // of a 32-char digest per banded row (guide §2.3, narrower keys)
    val bandStructs = BandCurve.zipWithIndex.flatMap {
      case ((b, r), ci) =>
        (0 until b).map { bi =>
          struct(lit(ci).as("cfg"), lit(bi).as("band_id"),
            slice(col("sig"), bi * r + 1, r).as("band_hash"))
        }
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("x.cfg").as("cfg"),
        col("x.band_id").as("band_id"), col("x.band_hash").as("band_hash"))
    val buckets = banded
      .groupBy(col("cfg"), col("band_id"), col("band_hash"))
      .agg(array_sort(collect_list(col("doc_id"))).as("docs"))
      .observe(s"d_minhash_band_curve_buckets_cap$maxBucket",
        sum(when(size(col("docs")) > maxBucket, 1).otherwise(0))
          .as("dropped_buckets"))
      .filter(size(col("docs")) > 1 && size(col("docs")) <= maxBucket)
    val pairs = buckets
      .select(col("cfg"), explode(pairsOf(col("docs"))).as("p"))
      .select(col("cfg"), col("p.doc_a"), col("p.doc_b"))
      .distinct()
    val fa = sig.select(col("doc_id").as("doc_a"), col("sig").as("siga"))
    val fb = sig.select(col("doc_id").as("doc_b"), col("sig").as("sigb"))
    val bArr = array(BandCurve.map(c => lit(c._1)): _*)
    val rArr = array(BandCurve.map(c => lit(c._2)): _*)
    pairs
      .join(fa, "doc_a").join(fb, "doc_b")
      .withColumn("est",
        size(filter(zip_with(col("siga"), col("sigb"),
          (x, y) => x === y), p => p)).cast("double") / NumPerms)
      .groupBy(col("cfg"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("est") >= 0.5, 1L).otherwise(0L)).as("n_tight"),
        sum(col("est").cast("decimal(18,6)")).as("s_est"))
      .select(
        element_at(bArr, col("cfg") + 1).as("n_bands"),
        element_at(rArr, col("cfg") + 1).as("rows_per_band"),
        col("n_pairs").cast("long").as("n_pairs"),
        col("n_tight").cast("long").as("n_tight_pairs"),
        round(col("s_est").cast("double") / col("n_pairs"), 6)
          .as("mean_est_jaccard"))
  }

  /** Connected components over the [[minhashLsh]] candidate-pair graph:
    * the step a real dedup pipeline needs between "candidate pairs" and
    * "keep one copy per cluster" — every document gets a component id
    * (the min doc_id of its near-dup cluster; singletons label
    * themselves), so `groupBy(component).agg(min(doc_id))` IS the keep
    * list. Iterative min-label propagation, the idiomatic DataFrame
    * formulation: each round every node takes the min of its own and
    * its neighbors' labels, converging in O(graph diameter) rounds.
    * Near-dup graphs are shallow by construction here — components are
    * unions of size-capped LSH buckets, so the diameter stays small and
    * the loop exits on a convergence check (no fixed iteration guess);
    * for adversarially deep graphs the documented alternative is the
    * large-star/small-star formulation (same join primitives, fewer
    * rounds). Every round `localCheckpoint`s its label table, so the
    * per-round plan stays constant-size (labels is referenced twice per
    * round — without truncation the logical plan would double every
    * iteration and drown the driver in analysis work long before the
    * executors mattered); checkpoint blocks of dropped rounds are
    * reclaimed by Spark's ContextCleaner as their references go out of
    * scope. A graph that fails to converge within `maxIters` throws —
    * silently returning half-propagated labels would violate the
    * contract (and diverge from the exact-closure oracle).
    */
  def dedupComponents(spark: SparkSession, sfDir: String,
      hash: TokenHash = XxHash, maxIters: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = minhashLsh(spark, sfDir, hash)
    // ONE reference to the derived pair pipeline: a union of two
    // selects over `edges` would embed the whole shingle→minhash plan
    // twice (no cross-branch subtree sharing — the same anti-pattern
    // the bucketing above exists to avoid); explode duplicates rows,
    // not plans
    val sym = edges.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // propagate over EDGE NODES only, never the corpus: a node with no
    // candidate edge can never change its label, so carrying all
    // documents through every round would shuffle a corpus-sized label
    // table per iteration for nothing — at 10^9 docs the difference
    // between moving the corpus each round and moving the (much
    // smaller) near-dup subgraph. Edge-less documents join back as
    // self-labeled singletons once, at the end.
    // maxIters=0 is the declared deep-graph path (star contraction
    // from the start) — don't materialize a label table propagation
    // will never read
    var labels = if (maxIters == 0) null
      else sym.select(col("src").as("doc_id")).distinct()
        .select(col("doc_id"), col("doc_id").as("component"))
        .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val prop = sym.join(labels, sym("src") === labels("doc_id"))
        .groupBy(col("dst")).agg(min(col("component")).as("prop"))
      // the convergence count rides the checkpoint's materialization
      // job as an observe() metric — one action per round, not two
      val obs = org.apache.spark.sql.Observation()
      val next = labels.join(prop, labels("doc_id") === prop("dst"), "left")
        .select(labels("doc_id"),
          // least() skips nulls, so unmatched docs keep their label
          least(labels("component"), col("prop")).as("component"),
          (col("prop").isNotNull &&
            col("prop") < labels("component")).as("ch"))
        .observe(obs, sum(when(col("ch"), 1L).otherwise(0L)).as("n_ch"))
        .localCheckpoint() // eager: materializes the round, plan resets
      changed = obs.get("n_ch") match {
        case null => 0L
        case l: Long => l
        case x => x.toString.toLong
      }
      labels = next
      iter += 1
    }
    if (changed > 0) {
      // deep-graph path: label propagation walks ONE hop per round, so
      // a chain-shaped near-dup graph (serial near-copies — diameter >
      // maxIters) never converges above. Star contraction halves the
      // structure per round instead (O(log n) rounds for any shape);
      // same contract (min doc_id per component), proven equivalent by
      // ComponentsSpec against the exact closure.
      val assign = starContraction(sym)
      val out = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"))
        .join(assign, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
        .localCheckpoint()
      sym.unpersist()
      return out
    }
    sym.unpersist()
    // edge-less documents label themselves; the propagated subgraph's
    // labels (checkpointed — lineage-free, so the result composes with
    // other minhash-derived frames without tripping Spark's
    // DUPLICATED_METRICS_NAME check on the observe() node) merge in
    // via ONE corpus join at the end instead of riding every round
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"))
      .join(labels.drop("ch"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
  }

  /** Connected components by alternating large-star/small-star
    * contraction (the MapReduce-era formulation from Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * algorithm, re-expressed as DataFrame joins). Input: an edge list
    * (src, dst) in any orientation; output: one (doc_id, component)
    * row per node APPEARING IN THE EDGES, component = min doc_id of
    * the node's connected component.
    *
    * Why it scales where label propagation doesn't: each round
    * rewires every node toward the minimum of its neighborhood
    * (large-star for larger neighbors, small-star for smaller ones),
    * which at least halves every component's height — convergence in
    * O(log n) rounds REGARDLESS of graph diameter, vs propagation's
    * O(diameter). Each round is two groupBy-min shuffles and two
    * joins over the (shrinking) edge set; rounds are
    * `localCheckpoint`-truncated like the propagation loop, so plans
    * stay constant-size. At the fixpoint the edge set is exactly a
    * star forest: every non-minimum node holds one edge to its
    * component's minimum, which IS the assignment.
    */
  def starContraction(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    // canonical undirected edge set: (u, v) with u < v
    var e = edges.toDF("src", "dst")
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val nodes = e.select(explode(array(col("u"), col("v"))).as("doc_id"))
      .distinct()
      .localCheckpoint()

    // large-star: every node a connects its LARGER neighbors to
    // m = min(N(a) ∪ {a}); m ≤ a < b keeps the output canonical
    def largeStar(cur: DataFrame): DataFrame = {
      val sym = cur.select(explode(array(
          struct(col("u").as("a"), col("v").as("b")),
          struct(col("v").as("a"), col("u").as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val mins = sym.groupBy(col("a"))
        .agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      sym.join(mins, "a")
        .filter(col("b") > col("a") && col("b") =!= col("m"))
        .select(col("m").as("u"), col("b").as("v"))
        .distinct()
    }

    // small-star: every node v connects its SMALLER neighbors (and
    // itself) to their minimum; edges are already oriented small←big
    // by the canonical form, so grouping by the big end sees exactly
    // the smaller neighborhood
    def smallStar(cur: DataFrame): DataFrame = {
      val mins = cur.groupBy(col("v")).agg(min(col("u")).as("m"))
      val center = mins.select(col("m").as("u"), col("v"))
      val siblings = cur.join(mins, "v")
        .filter(col("u") =!= col("m"))
        .select(col("m").as("u"), col("u").as("v"))
      center.unionByName(siblings).distinct()
    }

    var converged = false
    var round = 0
    // convergence detection: an order-independent (count, xor-of-hash)
    // fingerprint per round instead of a full `except` anti-join —
    // the except was a second shuffle-heavy O(E) job EVERY round, the
    // fingerprint rides one cheap aggregate over the edges the round
    // materialized anyway. A fingerprint collision could exit the
    // loop on unequal sets, so equality here is treated as a HINT:
    // the star-forest assertion below re-establishes soundness (a
    // star forest is necessarily a fixpoint of large/small-star, and
    // every round preserves connectivity, so ANY star forest the loop
    // lands on is the correct answer; a collision that exits on a
    // non-forest throws loudly there).
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("u"), col("v")))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def fpOf(o: org.apache.spark.sql.Observation): (Long, Long) = {
      val m = o.get
      val c = m("fp_count") match { case l: Long => l; case x => x.toString.toLong }
      val x = m("fp_xor") match {
        case null => 0L; case l: Long => l; case v => v.toString.toLong }
      (c, x)
    }
    var cur = fingerprint(e)
    while (!converged && round < maxRounds) {
      // the fingerprint rides the checkpoint's own materialization
      // job as an observe() metric — one action per round, not two
      val obs = org.apache.spark.sql.Observation()
      val next = smallStar(largeStar(e))
        .observe(obs, count(lit(1)).as("fp_count"),
          bit_xor(xxhash64(col("u"), col("v"))).as("fp_xor"))
        .localCheckpoint()
      val nxt = fpOf(obs)
      converged = nxt == cur
      e = next
      cur = nxt
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"starContraction did not converge in $maxRounds rounds — " +
        "impossible for graphs below 2^50 nodes; this indicates a bug, " +
        "not a data shape")
    // structural guarantee (runs ONCE, not per round): the final edge
    // set must be a star forest — every member node has exactly one
    // edge (v unique) and no center is itself a member (u ∩ v = ∅)
    if (!e.groupBy(col("v")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).isEmpty ||
      !e.select(col("u")).distinct()
        .join(e.select(col("v").as("u")), Seq("u"), "left_semi")
        .isEmpty)
      throw new IllegalStateException(
        "starContraction exited on a non-star-forest edge set " +
          "(fingerprint collision) — rerun with a different maxRounds")
    // fixpoint edges are (component-min, member); minima label themselves
    e.select(col("v").as("doc_id"), col("u").as("component"))
      .unionByName(nodes.join(e.select(col("v").as("doc_id")), Seq("doc_id"),
        "left_anti")
        .select(col("doc_id"), col("doc_id").as("component")))
  }

  /** The end-to-end near-dup REMOVAL pipeline a corpus actually runs:
    * cluster the LSH pair graph, keep ONE representative per cluster
    * (min doc_id — deterministic winner, singletons are their own
    * representative), report per-source survivor counts. Composes
    * [[dedupComponents]] (whose result is checkpointed and small —
    * one (doc, component) row per doc) with two key-joins and a
    * per-source aggregate; no step touches document text after the
    * signature pass.
    */
  def dedupPipeline(spark: SparkSession, sfDir: String,
      hash: TokenHash = XxHash): DataFrame = {
    val comp = dedupComponents(spark, sfDir, hash)
    val reps = comp.groupBy(col("component"))
      .agg(min(col("doc_id")).as("keep_doc"))
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
    docs.join(comp, "doc_id")
      .join(reps, docs("doc_id") === reps("keep_doc"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("keep_doc")).as("n_survivors"))
  }

  /** Dedup survivor-bias audit — the "what did dedup actually
    * remove?" check a curation pipeline runs before trusting its
    * survivors: per source, the removal rate and the mean quality of
    * KEPT vs REMOVED documents. Dedup is supposed to delete copies,
    * not a quality stratum — a source whose removed-doc quality sits
    * far below its kept-doc quality means the near-dup clusters are
    * concentrated in its junk (expected); removed quality ABOVE kept
    * quality means min-id representative election is systematically
    * discarding the better copy, a real pipeline bug this audit
    * exposes. Same composition as [[dedupPipeline]] plus the quality
    * projection; means are 6-dp-rounded per row and decimal-summed
    * (null when a source has no removed — or no kept — documents).
    */
  def dedupBias(spark: SparkSession, sfDir: String,
      hash: TokenHash = XxHash): DataFrame = {
    val comp = dedupComponents(spark, sfDir, hash)
    val reps = comp.groupBy(col("component"))
      .agg(min(col("doc_id")).as("keep_doc"))
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        TextOps.qualityScoreCol(col("text")).as("q"))
    val j = docs.join(comp, "doc_id")
      .join(reps, docs("doc_id") === reps("keep_doc"), "left")
      .withColumn("kept", col("keep_doc").isNotNull)
    j.groupBy(col("source"))
      .agg(count(lit(1)).as("nd"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("nr"),
        sum(when(col("kept"), col("q").cast("decimal(18,6)")))
          .as("s_kept"),
        sum(when(!col("kept"), col("q").cast("decimal(18,6)")))
          .as("s_rem"))
      .select(col("source"),
        col("nd").cast("long").as("n_docs"),
        col("nr").cast("long").as("n_removed"),
        round(col("nr").cast("double") / col("nd"), 6)
          .as("removal_rate"),
        when(col("nd") - col("nr") > 0,
          round(col("s_kept").cast("double") / (col("nd") - col("nr")),
            6)).as("mean_q_kept"),
        when(col("nr") > 0,
          round(col("s_rem").cast("double") / col("nr"), 6))
          .as("mean_q_removed"))
  }

  /** Cross-source near-dup leakage matrix: how much near-duplicate
    * content each pair of sources shares — the audit that catches a
    * "web" crawl silently re-ingesting a "books" source (or a train
    * source overlapping an eval source) BEFORE mixing. Counts the LSH
    * candidate pairs whose endpoints live in different sources,
    * keyed by the unordered source pair; `same-source` pairs roll up
    * on the diagonal. Scale shape: the pair set is the already-banded
    * LSH output (never all-pairs); source labels attach via two
    * equi-joins against a two-column pruned projection of the corpus
    * — each an equi-join on doc_id between two narrow frames; AQE
    * broadcasts whichever side fits and falls back to a sort-merge
    * join on doc_id when neither does. The final matrix is at most
    * |sources|² rows.
    */
  def crossSourceDups(spark: SparkSession, sfDir: String,
      hash: TokenHash = XxHash): DataFrame = {
    val pairs = minhashLsh(spark, sfDir, hash)
    val src = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")),
        "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")),
        "doc_b")
      .groupBy(
        least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** SimHash: 32-bit per-token hashes vote per bit position, weighted
    * by token frequency; sign of each bit-sum forms the fingerprint.
    * Implemented as explode → groupBy(doc, bit) free via bit arithmetic
    * in a single aggregate over 32 conditional sums.
    */
  def simhash(spark: SparkSession, sfDir: String,
      hash: TokenHash = XxHash): DataFrame = {
    val docs = Tables.loadBalanced(spark, sfDir, "documents")
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .withColumn("h", hash(col("tok")))
    val bitSums: Seq[Column] = (0 until 32).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$bit")
    }
    val summed = docs.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 32)
      .map(bit => when(col(s"b$bit") > 0, lit(1L << bit)).otherwise(0L))
      .reduce(_ + _)
    summed.select(col("doc_id"), fp.as("simhash"))
  }

  /** Document-frequency cap for ngramJaccard posting lists — see the
    * stop-shingle comment at the filter site. 100 is far above any
    * fixture posting (no result change at test SFs) and bounds pair
    * fan-out at 100²/2 per shingle at any corpus size.
    *
    * NOTE: capped postings make the reported intersection count a lower
    * bound for pairs that share a dropped stop-shingle; at Jaccard≥0.8
    * the signal lives in the rare shingles, so the pair set is stable.
    */
  val MaxPostingSize = 100

  /** Exact n-gram Jaccard on candidate pairs: docs sharing a shingle
    * within the same source are candidates (inverted-index join on the
    * shingle — never all-pairs); intersection size from the join,
    * |A∪B| = |A|+|B|−|A∩B|. Emits pairs with Jaccard ≥ 0.8.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String,
      maxPosting: Int = MaxPostingSize): DataFrame = {
    val docs = Tables.loadBalanced(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), shingles(col("text")).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val inv = docs
      .select(col("doc_id"), col("source"), col("n_sh"),
        explode(col("sh")).as("shingle"))
    // Posting list per (source, shingle) via one groupBy shuffle, then
    // pairs generated inside each posting — a self-join on the shingle
    // would evaluate the shingling pipeline twice and shuffle both
    // copies. Postings are sorted so (doc_a < doc_b) by construction;
    // each shared shingle contributes one pair row, and the pair count
    // is exactly |A∩B|.
    val postings = inv
      // group on xxhash64(shingle), not the raw 3-word string: the
      // posting identity is internal (no output carries it), so the
      // exchange key shrinks from ~20 text chars to one long
      // (guide §2.3, narrower keys), computed map-side before the
      // partial aggregation
      .groupBy(col("source"), xxhash64(col("shingle")).as("shingle"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("n_sh"))))
        .as("ds"))
      // Stop-shingle cap: a corpus-common shingle ("in the of") has
      // document frequency O(corpus) and would emit O(df²) pairs from a
      // single posting. Shingles with df > MaxPostingSize carry ~zero
      // signal for Jaccard≥0.8 (such pairs share many rare shingles
      // too) and are dropped — standard stop-shingle practice. Drops
      // are surfaced via the observe metric below.
      .observe(s"d_ngram_jaccard_postings_cap$maxPosting",
        sum(when(size(col("ds")) > maxPosting, 1).otherwise(0))
          .as("dropped_postings"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxPosting)
    val pairs = postings.select(
      explode(
        flatten(transform(col("ds"), (x, i) =>
          transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
            struct(
              x.getField("doc_id").as("doc_a"),
              y.getField("doc_id").as("doc_b"),
              x.getField("n_sh").as("na"),
              y.getField("n_sh").as("nb")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.na"), col("p.nb"))
    pairs
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn(
        "jaccard",
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }

  /** Sliding-window size for substring-level dedup: 8 tokens at fixture
    * scale (the corpus vocabulary is small, so 8-token windows collide
    * across documents the way ~50-token windows do on natural text —
    * Lee et al. 2021 use 50). */
  val SubstrWindow = 8

  /** md5 window hashes of every [[SubstrWindow]]-token sliding window
    * (stride 1), as an array column. `t` must be a BOUND token-array
    * column (not a live split expression): it is referenced three
    * times here, and a non-cheap alias would re-run the split per
    * reference (the CollapseProject pitfall documented at
    * [[TextOps.boilerplateBigrams]]). */
  // xxhash64, not md5: the window hash is INTERNAL membership identity
  // only (dup-set build, probe joins — no output column ever carries
  // it; excised spans hash separately), so the cheapest collision-free
  // 64-bit hash wins: xxhash64 is a codegen-native primitive where md5
  // heap-allocates hex strings per window, and the (doc_id, hash)
  // shuffle rows shrink from 32-char digests to one long (guide §2.3,
  // narrower keys). Same window rendering feeds it, so equality of
  // windows is unchanged.
  private def windowHashes(t: Column, w: Int): Column =
    when(size(t) >= w,
      transform(sequence(lit(0), size(t) - w),
        i => xxhash64(concat_ws(" ", slice(t, i + 1, lit(w))))))
      .otherwise(array().cast("array<bigint>"))

  /** (doc_id, whs) window-hash frame over a (doc_id, text) corpus,
    * with the token split materialized as a bound column first. */
  private def windowFrame(corpus: DataFrame, w: Int): DataFrame =
    corpus
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), windowHashes(col("t"), w).as("whs"))

  /** Substring-level exact dedup audit (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * ExactSubstr pass run alongside document-level MinHash): hash every
    * [[SubstrWindow]]-token sliding window, find windows occurring in
    * ≥ 2 distinct documents, and report each document's duplicated-span
    * exposure (total windows, duplicated windows, duplicated fraction).
    * Documents with a high fraction carry boilerplate/copied passages
    * that document-level dedup cannot see.
    *
    * Scale shape: one corpus scan builds the window-hash arrays as a
    * per-row expression; the explode feeds a hash-keyed aggregation
    * whose shuffle carries (doc_id, 64-bit hash) rows only — text
    * never shuffles. The duplicated-hash set joins back against the
    * same window stream as a hash-keyed shuffle join (both sides
    * linear in window count ≈ token count), then one doc-keyed
    * aggregation; no self-join, no O(pairs) blow-up at any corpus
    * size. The suffix-array machinery of the paper is replaced by
    * fixed-width window hashing — the standard distributed
    * re-expression (windows of width w detect every duplicated span
    * ≥ w tokens).
    */
  def substringDedup(spark: SparkSession, sfDir: String,
      w: Int = SubstrWindow): DataFrame =
    substringDedupOf(Tables.loadBalanced(spark, sfDir, "documents"), w)

  /** [[substringDedup]] over an arbitrary (doc_id, text) frame. */
  def substringDedupOf(corpus: DataFrame,
      w: Int = SubstrWindow): DataFrame = {
    val docs = windowFrame(corpus, w)
      // two downstream consumers (per-doc totals + the exploded window
      // stream); materialize so the split/hash pipeline runs once
      .localCheckpoint()
    val wins = docs.select(col("doc_id"), explode(col("whs")).as("wh"))
    val dupSet = wins
      .groupBy(col("wh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("wh"))
    val dupPerDoc = wins
      .join(dupSet, "wh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"))
    docs
      .select(col("doc_id"), size(col("whs")).as("n_windows"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup_windows"))
      .withColumn("dup_ratio",
        round(col("n_dup_windows").cast("double") /
          col("n_windows").cast("double"), 6))
  }

  /** Eval-set modulus for [[decontamSpans]]: doc_id % 23 == 0 stands in
    * for the held-out benchmark suite (tiny next to the corpus). */
  val DecontamEvalMod = 23

  /** Span-level decontamination (the excision form of
    * [[decontaminate]]): instead of dropping whole contaminated
    * documents, locate the exact token spans a training document
    * shares with the eval set, so the pipeline can cut the span and
    * keep the rest — the n-gram-overlap decontamination procedure of
    * GPT-3 appendix C / PaLM, emitting [start, end] token ranges.
    * A matched window marks [[SubstrWindow]] tokens; matched windows
    * whose token ranges overlap or touch coalesce into maximal spans
    * via gaps-and-islands over the ordered start positions (a new
    * island begins when a start exceeds the previous start by more
    * than w — the first gap that leaves uncovered tokens between
    * them).
    *
    * Scale shape: eval windows are benchmark-suite-sized → their
    * distinct hash set BROADCASTS; the corpus streams through once and
    * only matched (doc, window-start) rows reach the span aggregation
    * (window function partitioned per contaminated doc — matched rows
    * only, not the corpus). No corpus-sized shuffle at any scale.
    */
  def decontamSpans(spark: SparkSession, sfDir: String,
      w: Int = SubstrWindow): DataFrame =
    decontamSpansOf(Tables.loadBalanced(spark, sfDir, "documents"), w)

  /** [[decontamSpans]] over an arbitrary (doc_id, text) frame; eval
    * membership is doc_id % [[DecontamEvalMod]] == 0, as in the
    * registered query. */
  def decontamSpansOf(corpus: DataFrame,
      w: Int = SubstrWindow): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = windowFrame(corpus, w)
      // two consumers (eval hash set + corpus probe); materialize so
      // the split/hash window pipeline runs ONCE per row, not once per
      // branch (same discipline as substringDedupOf)
      .localCheckpoint()
    val evalSet = docs
      .filter(col("doc_id") % DecontamEvalMod === 0)
      .select(explode(col("whs")).as("wh"))
      .distinct()
    val matched = docs
      .filter(col("doc_id") % DecontamEvalMod =!= 0)
      .select(col("doc_id"), posexplode(col("whs")).as(Seq("pos", "wh")))
      .join(broadcast(evalSet), "wh")
      .select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    matched
      // island boundary: this window starts more than w past the
      // previous one, so their [pos, pos+w-1] ranges neither overlap
      // nor touch; the running sum of boundary flags is the island id
      .withColumn("newSpan",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > w, 1)
          .otherwise(0))
      .withColumn("grp", sum(col("newSpan")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(w - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(
        col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_windows"))
  }

  /** Exact-span substring dedup — [[substringDedup]]'s cross-doc
    * duplicated-window set composed with [[decontamSpans]]'
    * gaps-and-islands merge: instead of a per-document exposure RATIO,
    * emit each document's maximal duplicated [start, end] token spans
    * and the excised text itself (as an md5 digest — spans can be
    * document-sized and the digest pins the exact excision
    * byte-for-byte without shipping text through the result). This is
    * Lee et al.'s ExactSubstr at window granularity: every duplicated
    * run of ≥ w tokens shared by ≥ 2 documents surfaces as one island
    * per document (windows whose [pos, pos+w−1] ranges overlap or
    * touch coalesce; a gap strictly wider than w starts a new span).
    *
    * Scale shape: the window stream and the ≥2-distinct-docs
    * duplicated-hash set are [[substringDedupOf]]'s (hash-keyed
    * shuffles of (doc_id, hash) rows, text never shuffles); the
    * island merge runs per contaminated document over MATCHED
    * positions only; the final excision join brings token arrays back
    * for span-carrying docs alone (one doc-keyed equi-join, spans
    * side is the small one). No pair explosion at any corpus size.
    */
  def substringSpans(spark: SparkSession, sfDir: String,
      w: Int = SubstrWindow): DataFrame =
    substringSpansOf(Tables.loadBalanced(spark, sfDir, "documents"), w)

  /** [[substringSpans]] over an arbitrary (doc_id, text) frame. */
  def substringSpansOf(corpus: DataFrame,
      w: Int = SubstrWindow): DataFrame = spanCore(corpus, w, w)

  /** Shared core of [[substringSpansOf]] / [[substringExactOf]]:
    * width-`w` stride-1 window hashes, the ≥2-distinct-docs
    * duplicated set, and gaps-and-islands over matched positions —
    * a new island when a start exceeds its predecessor by more than
    * `islandGap`. `islandGap = w` gives the tolerant legacy merge
    * (nearby runs coalesce, ends quantized to the w grid);
    * `islandGap = 1` keeps only CONSECUTIVE matched positions
    * together, which reconstructs maximal duplicated runs exactly
    * (see [[substringExactOf]]). */
  private def spanCore(corpus: DataFrame, w: Int,
      islandGap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = corpus
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("t"), windowHashes(col("t"), w).as("whs"))
      // three consumers (dup-set build, window probe, excision slice);
      // materialize so the split/hash pipeline runs once per row
      .localCheckpoint()
    val wins = docs.select(col("doc_id"),
      posexplode(col("whs")).as(Seq("pos", "wh")))
    val dupSet = wins
      .groupBy(col("wh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("wh"))
    val matched = wins.join(dupSet, "wh").select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = matched
      .withColumn("newSpan",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > islandGap, 1)
          .otherwise(0))
      .withColumn("grp", sum(col("newSpan")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(w - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
    spans
      .join(docs.select(col("doc_id"), col("t")), "doc_id")
      .select(
        col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_windows"),
        md5(concat_ws(" ",
          slice(col("t"), col("span_start") + 1,
            col("span_end") - col("span_start") + 1)))
          .as("excised_md5"))
  }

  /** Threshold length for [[substringExact]] — half the legacy
    * [[SubstrWindow]], proving the detector is NOT bound to the old
    * window grid. */
  val ExactSubstrMinLen = 4

  /** Arbitrary-length ExactSubstr (Lee et al. 2021's suffix-array
    * pass, re-expressed distributed): every MAXIMAL token span of
    * length ≥ `minLen` whose every `minLen`-window occurs in ≥ 2
    * documents, with exact boundaries — no window-grid quantization.
    *
    * Why this equals sorted-suffix grouping: two suffixes sharing a
    * prefix of length ≥ minLen ⟺ the minLen-window at their starts
    * hashes equal. With stride-1 windows of width EXACTLY minLen, a
    * maximal duplicated run [a, b] (length ≥ minLen) matches
    * precisely the CONSECUTIVE positions a..b−minLen+1 — so islands
    * of strictly consecutive matched positions (islandGap = 1)
    * reconstruct [a, b] bit-exactly. A duplicate of length exactly
    * minLen is one matched window; length minLen+k is k+1. The
    * legacy [[substringSpans]] (w = 8, islandGap = w) misses
    * duplicates shorter than 8 tokens, bridges distinct runs up to 8
    * tokens apart and can quantize ends past the true boundary; this
    * detector does none of those. Cost is the same class: one corpus
    * scan, (doc_id, hash) shuffles, per-matched-doc window merge —
    * suffix ARRAYS (global sort of all suffixes) are never built.
    */
  def substringExactOf(corpus: DataFrame,
      minLen: Int = ExactSubstrMinLen): DataFrame =
    spanCore(corpus, minLen, 1)

  /** Registered `d_substring_exact`: [[substringExactOf]] over the
    * documents corpus with two PLANTED cross-document duplicates
    * straddling the legacy window grid — a 4-token phrase (w/2: the
    * fixed-w detector cannot see it at all) on doc_id % 50 == 1 and a
    * 12-token phrase (3w/2: the fixed-w detector would find it but
    * with grid-quantized boundaries) on doc_id % 50 == 2, appended
    * after each document's own text so their positions fall wherever
    * the document lengths put them. The DuckDB oracle replays the
    * planting and every span boundary exactly. */
  def substringExact(spark: SparkSession, sfDir: String,
      minLen: Int = ExactSubstrMinLen): DataFrame = {
    val planted = Tables.loadBalanced(spark, sfDir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 50 === 1,
          concat(trim(col("text")), lit(" zq1 zq2 zq3 zq4")))
          .when(col("doc_id") % 50 === 2,
            concat(trim(col("text")),
              lit(" zr1 zr2 zr3 zr4 zr5 zr6 zr7 zr8 zr9 zr10 zr11 zr12")))
          .otherwise(col("text")).as("text"))
    substringExactOf(planted, minLen)
  }
}
