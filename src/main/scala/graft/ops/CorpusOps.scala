package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus assembly operators: weighted source mixing and
  * token-budget sequence packing — the two steps between "filtered,
  * deduplicated documents" and "batches a trainer can consume".
  * Neither exists in the reference (it stops at rewritten SSTables);
  * both are core to what a 100 TB text pipeline does with the engine's
  * output, same first-class footing as the dedup/similarity suite.
  */
object CorpusOps {

  /** Uniform-in-[0,1) deterministic per-row coin: the first 8 hex
    * chars of md5 over the key rendered as a string, scaled. Chosen
    * over `rand(seed)` (partitioning-dependent) and `xxhash64` (no
    * DuckDB twin): the SAME expression runs in both engines, and the
    * value depends only on the KEY — stable under repartitioning,
    * shuffles, and re-runs, so a mixing decision is reproducible
    * forever from the doc id alone. That reproducibility is the whole
    * point: re-running the mix on a grown corpus keeps every
    * previously-kept document kept.
    */
  def hashCoin(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  /** Weighted source mixing: subsample each source at its own rate so
    * the mixed corpus matches a target composition (the "20% code,
    * 40% web, ..." knob every training run turns). Pure per-row
    * projection + filter — one scan, zero shuffles, no sampling
    * state; rates are exact in expectation and the decision is
    * per-document deterministic (see [[hashCoin]]).
    */
  def sourceMix(docs: DataFrame, rates: Map[String, Double],
      keyCol: String = "doc_id"): DataFrame = {
    // null rate for unlisted sources, NOT NaN: Spark orders NaN above
    // every number, so `coin < NaN` would silently KEEP unknown
    // sources; `coin < null` is null and filters out in both engines
    val rate = rates.foldLeft(lit(null).cast("double")) {
      case (acc, (src, r)) => when(col("source") === src, lit(r)).otherwise(acc)
    }
    // unknown sources drop: a mixing spec that misses a source is a
    // curation decision, not a pass-through
    docs.withColumn("mix_rate", rate)
      .filter(hashCoin(col(keyCol)) < col("mix_rate"))
  }

  /** Registered mixing query: rates cycle 0.25/0.5/0.75/1.0 over the
    * fixture's src0..src19 (a deterministic stand-in for a real
    * composition spec), reported as per-source audit rows — input
    * size, kept size, the configured rate. The oracle reproduces the
    * identical coin, so kept-set membership is checked exactly, not
    * statistically.
    */
  def sourceMixAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val rates = (0 until 20)
      .map(i => s"src$i" -> ((i % 4) + 1) / 4.0).toMap
    val docs = Tables.load(spark, sfDir, "documents")
    val kept = sourceMix(docs, rates)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(length(col("text"))).cast("long").as("kept_chars"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_in"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_in"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"))
  }

  /** Token-budget sequence packing: assign documents to fixed-budget
    * packs by cumulative token count in a deterministic order — the
    * standard contiguous-fill formulation (a document belongs to the
    * pack its first token lands in; a straddling document overflows
    * its pack rather than splitting). One window + one groupBy.
    *
    * Scale shape: the window partitions by `source`, so packing
    * parallelizes across sources and never builds a global order. A
    * single source too large for one task sub-shards via `spanSize`:
    * the window partitions by (source, doc_id div spanSize) and packs
    * within each contiguous doc_id span — pack ids are then local to
    * a span (`sub_id` disambiguates). Packing quality is unaffected
    * because pack boundaries never needed to be globally optimal,
    * only budgeted and reproducible; the cost is at most one
    * under-filled pack per span.
    */
  def tokenPack(docs: DataFrame, budget: Int,
      spanSize: Option[Long] = None): DataFrame = {
    val nTok = size(split(trim(col("text")), "\\s+"))
    val sub = spanSize
      .map(s => floor(col("doc_id") / lit(s)).cast("long"))
      .getOrElse(lit(0L))
    val w = Window.partitionBy(col("source"), col("sub_id"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("source"), col("doc_id"), nTok.as("n_tokens"))
      .withColumn("sub_id", sub)
      .withColumn("cum_excl",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id",
        floor(col("cum_excl") / lit(budget.toDouble)).cast("long"))
  }

  /** Registered packing query: per-pack audit rows (doc count, token
    * fill) at a 128-token budget over the fixture corpus. Every pack
    * except a source's last must fill to at least the budget minus
    * the largest straddle — the spec pins that invariant; the oracle
    * pins exact pack membership.
    */
  def tokenPackAudit(spark: SparkSession, sfDir: String): DataFrame =
    tokenPack(Tables.load(spark, sfDir, "documents"), budget = 128)
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("pack_tokens"))

  /** Token-window document chunking — how long documents become
    * training sequences: sliding windows of `window` tokens at
    * `stride` steps (stride < window ⇒ overlapping context at the
    * seams, the standard continuity trick). Pure per-row explode —
    * zero shuffles, chunk identity (doc_id, chunk_id) deterministic,
    * and the final short tail chunk is kept (dropping it silently
    * loses every document's ending). Emits the chunk text digest
    * rather than the text so the audit row stays narrow; downstream
    * consumers call the same slice to materialize.
    */
  def chunk(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(stride >= 1 && window >= stride,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val toks = split(trim(col("text")), "\\s+")
    docs
      .select(col("doc_id"), col("source"), toks.as("t"))
      .withColumn("n_tokens", size(col("t")))
      // starts 0, stride, 2·stride, … strictly below n_tokens
      .select(col("doc_id"), col("source"), col("t"), col("n_tokens"),
        explode(sequence(lit(0), col("n_tokens") - 1, lit(stride)))
          .as("start"))
      .select(
        col("doc_id"),
        col("source"),
        (col("start") / stride).cast("long").as("chunk_id"),
        least(lit(window), col("n_tokens") - col("start"))
          .as("n_chunk_tokens"),
        md5(concat_ws(" ",
          slice(col("t"), col("start") + 1, lit(window)))).as("chunk_md5"))
  }

  /** Registered chunking audit: 64-token windows at stride 48 (16
    * tokens of overlap) over the fixture corpus — every chunk row,
    * digest-checked, so the oracle pins exact window contents and
    * boundaries, not just counts.
    */
  def chunkAudit(spark: SparkSession, sfDir: String): DataFrame =
    chunk(Tables.load(spark, sfDir, "documents"), window = 64, stride = 48)

  /** CDC hash-window width and boundary modulus: a token position
    * ends a chunk when the md5-derived hash of the [[CdcWindow]]
    * tokens ending there is ≡ 0 mod [[CdcModulus]] — so chunks
    * average ~[[CdcModulus]] tokens and every boundary is a pure
    * function of LOCAL content. */
  val CdcWindow = 4
  val CdcModulus = 16L

  /** Content-defined chunking (the FastCDC/rsync boundary idea on
    * token streams): fixed-stride chunking ([[chunk]]) shatters under
    * a single inserted token — every downstream window shifts and no
    * chunk digest survives — while CDC cuts where the CONTENT says
    * to, so after an insertion the boundaries realign as soon as the
    * hash window clears the edit and the rest of the document's
    * chunks are byte-identical again. That re-alignment is what makes
    * chunk-level dedup robust on near-identical documents (the
    * dominant large-corpus case: boilerplate edits, prepended
    * headers), and CurationSpec pins it: a prefix insertion preserves
    * most CDC digests and ~none of the fixed-stride ones.
    *
    * No min/max chunk caps: caps would need a sequential fold over
    * candidate cuts (cut admission depends on the previous admitted
    * cut), which neither engine expresses as a pure projection —
    * the uncapped form keeps boundaries locally decidable and
    * SQL-replayable; pathological runs of boundary hashes merely
    * yield short chunks (mean stays ~modulus), and a production
    * deployment wanting caps composes [[chunk]]'s stride as a
    * fallback splitter on oversized CDC chunks.
    *
    * Scale shape: everything per-row expressions over one scan
    * (candidate cuts → boundary list → chunk explode); the output is
    * chunk rows carrying 32-char digests, never re-joined to text. */
  def chunkCdc(docs: DataFrame, w: Int = CdcWindow,
      m: Long = CdcModulus): DataFrame = {
    val t = split(trim(col("text")), "\\s+")
    val base = docs
      .select(col("doc_id"), col("source"), t.as("t"))
      .withColumn("n", size(col("t")))
      .filter(col("n") >= 1)
    // candidate cut AFTER token i+w (1-based): the hash window is
    // tokens [i+1, i+w]; cuts strictly inside the document only
    val cuts = filter(
      transform(
        filter(sequence(lit(0), col("n") - w - 1),
          i => conv(substring(md5(concat_ws(" ",
            slice(col("t"), i + 1, lit(w)))), 1, 8), 16, 10).cast("long")
            % m === 0),
        i => i + w),
      c => c < col("n"))
    // n <= w admits no interior cut (the only candidate would be the
    // document end); the guard also keeps sequence() ascending
    val withB = base.withColumn("b",
      concat(array(lit(0)),
        when(col("n") > w, cuts).otherwise(array().cast("array<int>")),
        array(col("n"))))
    withB
      .select(col("doc_id"), col("source"), col("t"),
        explode(sequence(lit(1), size(col("b")) - 1)).as("k"),
        col("b"))
      .select(col("doc_id"), col("source"),
        (col("k") - 1).cast("long").as("chunk_idx"),
        (element_at(col("b"), col("k")) + 1).cast("long").as("start_tok"),
        (element_at(col("b"), col("k") + 1) -
          element_at(col("b"), col("k"))).cast("long").as("n_tokens"),
        md5(concat_ws(" ", slice(col("t"),
          element_at(col("b"), col("k")) + 1,
          element_at(col("b"), col("k") + 1) -
            element_at(col("b"), col("k"))))).as("chunk_md5"))
  }

  def chunkCdcAudit(spark: SparkSession, sfDir: String): DataFrame =
    chunkCdc(Tables.load(spark, sfDir, "documents"))

  /** Corpus version diff — the release audit: what changed between
    * corpus v1 and v2, per source. Each side reduces to a narrow
    * (doc_id, source, content-hash) projection, then ONE full-outer
    * equi-join on doc_id classifies every document as added / removed
    * / changed / unchanged and collapses to |sources| audit rows.
    * Scale shape: two column-pruned scans + one hash-partitioned
    * join on a unique well-distributed key — no text ever shuffles
    * (hashes travel, 32 bytes/doc); in production both versions'
    * hash indexes are the same precomputed narrow tables incremental
    * dedup probes, bucketed on doc_id, making the nightly diff
    * shuffle-free.
    */
  def versionDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), col("source").as("src1"),
      md5(col("text")).as("h1"))
    val b = v2.select(col("doc_id"), col("source").as("src2"),
      md5(col("text")).as("h2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("src1"), col("src2")).as("source"),
        col("h1"), col("h2"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("h1").isNull, 1).otherwise(0)).as("n_added"),
        sum(when(col("h2").isNull, 1).otherwise(0)).as("n_removed"),
        sum(when(col("h1").isNotNull && col("h2").isNotNull &&
          col("h1") =!= col("h2"), 1).otherwise(0)).as("n_changed"),
        sum(when(col("h1") === col("h2"), 1).otherwise(0))
          .as("n_unchanged"))
  }

  /** Registered diff: v2 derives deterministically from the fixture in
    * ONE scan (the explode pattern — a union of filtered selects would
    * duplicate the FileScan): docs with doc_id%7==0 are dropped, %5==0
    * survivors get edited text, and %3==0 docs also re-enter as new
    * documents under offset ids. All four verdict classes populated.
    */
  def versionDiffAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val kept = when(col("doc_id") % 7 =!= 0,
      struct(col("doc_id").as("doc_id"), col("source").as("source"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text")))
    val added = when(col("doc_id") % 3 === 0,
      struct((col("doc_id") + lit(1000000000L)).as("doc_id"),
        col("source").as("source"), col("text").as("text")))
    val v2 = docs
      .select(explode(array(kept, added)).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.doc_id"), col("r.source"), col("r.text"))
    versionDiff(docs, v2)
  }

  /** Fractional-epoch source upsampling — the other half of the
    * mixing knob: [[sourceMix]] DOWN-samples a source below rate 1.0;
    * training runs also need to repeat scarce high-quality sources
    * (e.g. "wiki at 2.5 epochs"). Every document gets floor(epochs)
    * full copies plus one more iff its salted coin clears the
    * fractional part — deterministic bag semantics (a rerun or a
    * grown corpus replicates every existing doc identically; the
    * ":up" salt decorrelates from mix and split coins). The explode
    * is a per-row projection — zero shuffles before the audit
    * groupBy, and the replica column keeps downstream global-shuffle
    * keys unique ((doc_id, replica) feeds the shard hash so copies
    * of a doc land in DIFFERENT shards — repeats spread across the
    * training order instead of clumping).
    */
  def upsample(docs: DataFrame, epochs: Map[String, Double]): DataFrame = {
    // per-source epoch spec as a column (null for unlisted → dropped,
    // same curation rule as sourceMix)
    val e = epochs.foldLeft(lit(null).cast("double")) {
      case (acc, (src, v)) => when(col("source") === src, lit(v)).otherwise(acc)
    }
    val coin = hashCoin(concat(col("doc_id").cast("string"), lit(":up")))
    val nCopies = (floor(col("epochs")) +
      when(coin < col("epochs") - floor(col("epochs")), 1).otherwise(0))
      .cast("int")
    docs
      .withColumn("epochs", e)
      .filter(col("epochs").isNotNull)
      .withColumn("n_copies", nCopies)
      .filter(col("n_copies") > 0)
      .select(col("source"), col("doc_id"),
        explode(sequence(lit(0), col("n_copies") - 1)).as("replica"))
  }

  /** Registered upsampling audit: epochs cycle 0.5/1.0/1.5/2.5 over
    * the fixture's sources; emits per-source replicated volume plus
    * an order-independent membership checksum over (doc_id, replica).
    */
  def upsampleAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val epochs = (0 until 20)
      .map(i => s"src$i" -> Seq(0.5, 1.0, 1.5, 2.5)(i % 4)).toMap
    upsample(Tables.load(spark, sfDir, "documents"), epochs)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("doc_id") * lit(7L) + col("replica")).cast("long")
          .as("rep_sum"))
  }

  /** Temperature-scaled source mixing (α = 0.5): sampling weights
    * q_s ∝ p_s^α over the sources' token shares p_s — the standard
    * knob (multilingual BERT / XLM-R style) that flattens a skewed
    * source distribution: big sources sample below their natural
    * share, small sources above, α→0 approaching uniform. Expressed
    * as per-source epoch multipliers e_s = q_s / p_s, which keeps the
    * expected total token count unchanged (Σ n_s·e_s = N·Σ q_s = N) —
    * temperature reshapes the mix, the budget stays the corpus's.
    * Replication then reuses the [[upsample]] bag semantics: floor(e)
    * full copies + a salted fractional [[hashCoin]] (":tmp" salt
    * decorrelates from the mix/split/up coins).
    *
    * α is FIXED at 0.5 so the weight is `sqrt` — IEEE-exact
    * (correctly rounded) in every engine, which keeps the epoch
    * arithmetic bit-replayable by the SQL oracle; a general-α variant
    * would use `pow`, which libm does not guarantee identically
    * across engines. The per-source epoch is rounded to 6 decimals
    * BEFORE the fractional coin comparison: the window sums feeding
    * it add ≤|sources| doubles in engine-chosen order (±1 ulp), and
    * the round re-synchronizes both engines on one value.
    *
    * Scale shape: one corpus scan → one tiny groupBy (|sources|
    * rows); the unpartitioned window runs over that AGGREGATE frame,
    * never the corpus; epochs broadcast-join back; replication is a
    * per-row explode. Same zero-corpus-shuffle shape as [[sourceMix]].
    */
  def temperatureMix(docs: DataFrame): DataFrame = {
    val nTok = size(split(trim(col("text")), "\\s+")).cast("long")
    val base = docs.select(col("source"), col("doc_id"), nTok.as("n_tok"))
    val whole = Window.partitionBy()
    val epochs = base.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("tok_in"))
      .withColumn("epochs", round(
        (sqrt(col("tok_in").cast("double")) /
          sum(sqrt(col("tok_in").cast("double"))).over(whole)) *
          (sum(col("tok_in")).over(whole).cast("double") /
            col("tok_in").cast("double")), 6))
      .select(col("source"), col("epochs"))
    val coin = hashCoin(concat(col("doc_id").cast("string"), lit(":tmp")))
    val nCopies = (floor(col("epochs")) +
      when(coin < col("epochs") - floor(col("epochs")), 1).otherwise(0))
      .cast("int")
    base.join(epochs.hint("broadcast"), "source")
      .withColumn("n_copies", nCopies)
      .filter(col("n_copies") > 0)
      .select(col("source"), col("doc_id"), col("n_tok"), col("epochs"),
        explode(sequence(lit(0), col("n_copies") - 1)).as("replica"))
  }

  /** Registered temperature-mixing audit: per-source epoch multiplier
    * and replicated volume, with the same order-independent
    * (doc_id, replica) membership checksum as [[upsampleAudit]] — the
    * oracle pins exact bag membership, not just totals. */
  def temperatureMixAudit(spark: SparkSession, sfDir: String): DataFrame =
    temperatureMix(Tables.load(spark, sfDir, "documents"))
      .groupBy(col("source"))
      .agg(
        max(col("epochs")).as("epochs"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_tok")).cast("long").as("tok_out"),
        sum(col("doc_id") * lit(7L) + col("replica")).cast("long")
          .as("rep_sum"))

  /** Deterministic train/val/test split. The assignment coin is the
    * key-derived [[hashCoin]] over a SALTED key (`doc_id || ":split"`)
    * — salting decorrelates the split from every other coin-driven
    * decision (an unsalted coin would send exactly the docs kept by a
    * 0.8-rate source mix into an 0.8 train split: nested thresholds
    * on the SAME uniform variate are perfectly correlated, and val/
    * test would go empty after mixing). Pure per-row projection, zero
    * shuffles before the audit groupBy; membership is reproducible
    * forever from the doc id, so a grown corpus never reassigns an
    * existing document across splits (the property that keeps eval
    * sets uncontaminated release over release). The audit reports
    * per-(source, split) counts plus an order-independent id-sum
    * checksum, so the oracle comparison pins exact membership, not
    * just marginals.
    */
  def evalSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val coin = hashCoin(concat(col("doc_id").cast("string"), lit(":split")))
    val assignment = when(coin < 0.8, "train")
      .when(coin < 0.9, "val").otherwise("test")
    Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"), assignment.as("split"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).cast("long").as("id_sum"))
  }

  /** Per-source dataset card — the "datasheet" every corpus release
    * ships: volume (docs / tokens / chars), quality distribution
    * (decimal-summed order-independent mean + exact interpolated
    * median, the same cross-engine-stable form as
    * `a5_approx_percentile`), and language breadth. One scan, one
    * groupBy; at 100 TB the exact median is the only non-mergeable
    * aggregate and its per-group buffer is bounded by docs-per-source
    * — swap in `percentile_approx` when a single source outgrows
    * executor memory (same column, sketch-mergeable, documented knob).
    */
  def datasetCard(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("lang"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"),
        length(col("text")).as("n_chars"),
        TextOps.qualityScoreCol(col("text")).as("q"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        round(sum(col("q").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("mean_quality"),
        round(expr("percentile(q, 0.5)"), 4).as("p50_quality"),
        countDistinct(col("lang")).as("n_langs"))

  /** Deterministic global training-order shuffle. Training wants
    * documents in a reproducible pseudo-random order with no source
    * or time locality; at 100 TB a single global `row_number` window
    * would serialize the corpus through one task, so the order is
    * defined hierarchically: shard = first hex digit of the key hash
    * (16 ways here; hundreds in production), position = rank within
    * the shard by (full hash, doc_id). The global order is the
    * lexicographic (shard, pos) — readers stream shards in sequence.
    * Each shard's window is hash-partitioned (scale-safe), the
    * permutation is a pure function of doc_id (stable across reruns
    * and repartitioning, same property as [[hashCoin]]), and the sort
    * within a shard is Spark's range-partitioned sort. `hexDigits`
    * sizes the shard count (16^d): pick d so a shard's rows fit one
    * task comfortably — d=2 (256 shards) or d=3 (4096) at 100 TB.
    */
  def globalShuffle(spark: SparkSession, sfDir: String,
      hexDigits: Int = 1): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 8,
      s"hexDigits must be in [1, 8], got $hexDigits")
    val h = md5(col("doc_id").cast("string"))
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), substring(h, 1, hexDigits).as("shard"), h.as("h"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))))
      .select(col("shard"), col("pos"), col("doc_id"))
  }

  /** Per-source adaptive quality gate: keep each source's top (1−p)
    * quality quantile instead of one global threshold — a fixed bar
    * either guts low-register sources or admits junk from clean ones.
    * Two passes, both scale-flat: (1) per-source exact percentile
    * (one groupBy over ~tens of sources; swap `percentile_approx`
    * if a source outgrows its buffer — documented knob, same column),
    * (2) broadcast the tiny threshold table back and filter. Reports
    * the audit row a curation run logs: threshold, kept/total, kept
    * mean quality (decimal-summed, order-independent).
    */
  def adaptiveQualityGate(spark: SparkSession, sfDir: String,
      p: Double = 0.25): DataFrame = {
    val scored = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        TextOps.qualityScoreCol(col("text")).as("q"))
    // round-4 threshold: exact-percentile ≙ DuckDB quantile_cont is
    // established at this precision (a5_approx_percentile), so the
    // >= comparison below is engine-stable even for boundary docs
    val thr = scored.groupBy(col("source"))
      .agg(round(expr(s"percentile(q, $p)"), 4).as("q_thr"),
        count(lit(1)).as("n_total"))
    scored.join(broadcast(thr), "source")
      .filter(col("q") >= col("q_thr"))
      .groupBy(col("source"))
      .agg(
        first(col("q_thr")).as("q_thr"),
        first(col("n_total")).as("n_total"),
        count(lit(1)).as("n_kept"),
        round(sum(col("q").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("kept_mean_q"))
  }

  /** Shard-partitioned corpus write with BOUNDED file sizes — the
    * sink end of assembly. Shard comes from the same key-derived
    * [[hashCoin]] (uniform, reproducible: a doc's shard never changes
    * across runs); `repartition(n, shard)` lands each shard in one
    * task, `partitionBy` lays out `shard=K/` dirs, and
    * `maxRecordsPerFile` rolls files at the cap — so every output
    * file is individually sized for downstream loaders regardless of
    * corpus size, and a shard's file count is exactly
    * ceil(rows / cap). Returns the manifest (docs + files per shard)
    * from one read-back of the written layout, checkpointed so the
    * scratch dir can be deleted eagerly; a production run keeps the
    * layout and the manifest is the cheap audit of it.
    */
  def shardWrite(spark: SparkSession, sfDir: String,
      nShards: Int = 8, maxRecordsPerFile: Int = 25): DataFrame = {
    val out = graft.Scratch.dir("graft-shards-")
    Tables.load(spark, sfDir, "documents")
      .withColumn("shard",
        floor(hashCoin(col("doc_id")) * nShards).cast("long"))
      .repartition(nShards, col("shard"))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      // commit algorithm v2: tasks rename their files straight to the
      // final location instead of leaving the whole rename fan-out to
      // a SERIAL driver-side job commit — with the record cap rolling
      // hundreds of small files, the v1 job commit was the write's
      // driver tail (guide §6 output-commit cost; v2's task-commit
      // visibility caveat is irrelevant to a scratch dir consumed only
      // after awaited completion)
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .partitionBy("shard")
      .mode("overwrite")
      .parquet(out.toString)
    val manifest = spark.read.parquet(out.toString)
      .select(col("shard").cast("long").as("shard"),
        col("_metadata.file_path").as("fp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_files"))
      .localCheckpoint()
    graft.Scratch.delete(out)
    manifest
  }

  /** The whole assembly funnel — quality filter → weighted mix →
    * token packing — as ONE staged plan: per-row stage flags instead
    * of per-stage sub-frames, so the corpus is scanned ONCE, shuffled
    * once for the packing window and once for the audit groupBy.
    * The naive composition (filter frame, mix frame, pack frame, then
    * join four per-source aggregates) re-scans the corpus per branch —
    * Catalyst shares no subtrees across aggregation branches, and at
    * 100 TB the extra scans ARE the cost (same lesson as
    * [[TextOps.tfidfTopTerms]]'s df-from-tf rewrite).
    *
    * Packing rides the same window trick: the exclusive cumsum sums
    * `n_tokens` only over rows that survived mix (zero otherwise), so
    * surviving rows see exactly the cumsum they'd see in a dedicated
    * pass over the filtered corpus, and dropped rows get no pack.
    * Output: one funnel row per source — raw / post-quality /
    * post-mix doc counts, pack count, packed token mass.
    */
  def assemblyFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val rates = (0 until 20)
      .map(i => s"src$i" -> ((i % 4) + 1) / 4.0).toMap
    val rate = rates.foldLeft(lit(null).cast("double")) {
      case (acc, (src, r)) => when(col("source") === src, lit(r)).otherwise(acc)
    }
    val budget = 128
    val staged = Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"),
        (TextOps.qualityScoreCol(col("text")) >= 0.6).as("pass_q"))
      .withColumn("pass_mix",
        col("pass_q") && (hashCoin(col("doc_id")) < rate))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    staged
      .withColumn("cum_excl", coalesce(
        sum(when(col("pass_mix"), col("n_tokens")).otherwise(0L)).over(w),
        lit(0L)))
      .withColumn("pack_id", when(col("pass_mix"),
        floor(col("cum_excl") / lit(budget.toDouble)).cast("long")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_raw"),
        sum(when(col("pass_q"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("pass_mix"), 1L).otherwise(0L)).as("n_mixed"),
        // max+1, NOT count(distinct): pack ids start at 0 and advance
        // with the token cumsum, but a single document larger than the
        // budget skips the ids its overflow straddles — so n_packs is
        // the pack ID SPAN (straddle gaps included), the number a
        // budget-sized sequential writer would allocate, not the count
        // of non-empty packs. The oracle states the same definition.
        coalesce(max(col("pack_id")) + 1L, lit(0L)).as("n_packs"),
        sum(when(col("pass_mix"), col("n_tokens")).otherwise(0L))
          .cast("long").as("packed_tokens"))
  }
}
