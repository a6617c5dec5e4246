package graft

import graft.ops.{DedupOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/** Round-8 curation operators: substring-level dedup, span-level
  * decontamination, SemDeDup, Gopher rules, perplexity buckets.
  * Fixture frames are hand-built so expected spans/verdicts are known
  * exactly; the registered corpus queries are additionally held to the
  * DuckDB oracle (tools/compare.py).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 12-token base sentence; w=4 windows make span arithmetic easy
  private val w = 4

  test("substringDedup: duplicated windows counted per doc, unique text clean") {
    // docs 1 and 2 share an 8-token prefix -> both carry 5 duplicated
    // 4-token windows (starts 0..4 of the shared prefix); doc 3 is
    // disjoint -> zero
    val shared = "a b c d e f g h"
    val corpus = Seq(
      (1L, s"$shared x1 y1 z1 w1"),
      (2L, s"$shared x2 y2 z2 w2"),
      (3L, "p q r s t u v m n o")).toDF("doc_id", "text")
    val out = DedupOps.substringDedupOf(corpus, w)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Int]("n_windows")).toSeq === Seq(9, 9, 7))
    assert(out.map(_.getAs[Long]("n_dup_windows")).toSeq === Seq(5, 5, 0))
    assert(out(0).getAs[Double]("dup_ratio") === 0.555556)
    assert(out(2).getAs[Double]("dup_ratio") === 0.0)
  }

  test("substringDedup: windows duplicated only WITHIN a doc don't count") {
    // doc 10 repeats its own 4 tokens; no cross-doc sharing
    val corpus = Seq(
      (10L, "a b c d a b c d"),
      (11L, "p q r s t u v m")).toDF("doc_id", "text")
    val out = DedupOps.substringDedupOf(corpus, w).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_dup_windows")).toSeq === Seq(0, 0))
  }

  test("decontamSpans: overlapping matches merge, distant matches split") {
    // doc 0 (eval: 0 % 23 == 0) donates two separated 4-token phrases;
    // doc 24 embeds phrase1 at token 2 and phrase2 at token 14 ->
    // two spans: [2,5] and [14,17]
    val phrase1 = "c1 c2 c3 c4"
    val phrase2 = "d1 d2 d3 d4"
    val corpus = Seq(
      (0L, s"$phrase1 e1 e2 e3 e4 $phrase2"),
      (24L, s"x1 x2 $phrase1 y1 y2 y3 y4 y5 y6 y7 y8 $phrase2 z1 z2"))
      .toDF("doc_id", "text")
    val out = DedupOps.decontamSpansOf(corpus, w)
      .orderBy("span_start").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("doc_id") === 24L)
    assert((out(0).getAs[Int]("span_start"), out(0).getAs[Int]("span_end"))
      === (2, 5))
    assert((out(1).getAs[Int]("span_start"), out(1).getAs[Int]("span_end"))
      === (14, 17))
    assert(out.map(_.getAs[Int]("span_tokens")).toSeq === Seq(4, 4))
  }

  test("decontamSpans: a long shared run coalesces into ONE maximal span") {
    // doc 50 copies eval doc 0's full 12 tokens at offset 3: matched
    // window starts 3..11 are consecutive -> one span [3, 14], 9 windows
    val evalText = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"
    val corpus = Seq(
      (0L, evalText),
      (50L, s"x1 x2 x3 $evalText y1 y2")).toDF("doc_id", "text")
    val out = DedupOps.decontamSpansOf(corpus, w).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("doc_id") === 50L)
    assert((r.getAs[Int]("span_start"), r.getAs[Int]("span_end")) === (3, 14))
    assert(r.getAs[Int]("span_tokens") === 12)
    assert(r.getAs[Long]("n_windows") === 9L)
  }

  test("substringSpans: cross-doc spans carry exact bounds and the excised text digest") {
    // docs 1 and 2 share one 6-token run (→ one merged span each) and
    // one disjoint 4-token run far enough away (→ a second span);
    // doc 3 is clean. Every boundary and digest is hand-computable.
    val runA = "a1 a2 a3 a4 a5 a6"
    val runB = "b1 b2 b3 b4"
    val corpus = Seq(
      (1L, s"$runA x1 x2 x3 x4 x5 $runB"),
      (2L, s"y1 y2 $runA z1 z2 z3 z4 z5 z6 z7 $runB"),
      (3L, "p q r s t u v m n o")).toDF("doc_id", "text")
    val out = DedupOps.substringSpansOf(corpus, w)
      .orderBy("doc_id", "span_start").collect()
    // doc 1: runA at [0,5] (3 windows), runB at [11,14] (1 window)
    // doc 2: runA at [2,7] (3 windows), runB at [15,18] (1 window)
    assert(out.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("span_start"), r.getAs[Int]("span_end"),
      r.getAs[Int]("span_tokens"), r.getAs[Long]("n_windows"))).toSeq ===
      Seq((1L, 0, 5, 6, 3L), (1L, 11, 14, 4, 1L),
        (2L, 2, 7, 6, 3L), (2L, 15, 18, 4, 1L)))
    // the excised digest is md5 of the exact shared text — identical
    // across BOTH documents (that equality is what excision relies on)
    def md5Of(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    val d1 = byDoc(1L).map(_.getAs[String]("excised_md5")).toSeq
    val d2 = byDoc(2L).map(_.getAs[String]("excised_md5")).toSeq
    assert(d1 === Seq(md5Of(runA), md5Of(runB)))
    assert(d1 === d2)
  }

  test("substringSpans: within-doc repeats alone produce no spans; seam windows don't bleed") {
    // doc 20 repeats its own phrase (no cross-doc duplicate → no span);
    // docs 30/31 share exactly w tokens at a seam — the span is exactly
    // those w tokens, not the seam's neighbors
    val corpus = Seq(
      (20L, "a b c d a b c d"),
      (30L, s"s1 s2 s3 k1 k2 k3 k4 t1 t2"),
      (31L, s"u1 u2 k1 k2 k3 k4 v1 v2 v3")).toDF("doc_id", "text")
    val out = DedupOps.substringSpansOf(corpus, w)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("span_start"), r.getAs[Int]("span_end"))).toSeq ===
      Seq((30L, 3, 6), (31L, 2, 5)))
  }

  test("substringExact: arbitrary-length duplicates with exact boundaries, no grid quantization") {
    // minLen = 4, and the duplicates are sized against the LEGACY
    // window w = 8: one 4-token run (w/2 — invisible to the fixed-w
    // detector), one 12-token run (3w/2), one 3-token run (below
    // threshold — must NOT surface), and two runs 2 tokens apart
    // (the legacy islandGap = w merge would bridge them; the exact
    // detector must not)
    val legacyW = 8
    val short4 = "q1 q2 q3 q4"            // length minLen exactly
    val long12 = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 r11 r12"
    val tiny3 = "s1 s2 s3"
    val runA = "m1 m2 m3 m4"
    val runB = "n1 n2 n3 n4"
    val corpus = Seq(
      (1L, s"$short4 x1 x2 x3 $long12"),
      (2L, s"y1 $short4 y2 y3 y4 y5 $long12 y6"),
      (3L, s"$tiny3 z1 z2 z3 z4 z5 z6 z7"),
      (4L, s"z8 $tiny3 z9 za zb zc zd ze"),
      (5L, s"$runA g1 g2 $runB h1 h2 h3"),
      (6L, s"k1 k2 $runA g3 g4 $runB")).toDF("doc_id", "text")
    val out = DedupOps.substringExactOf(corpus, 4)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"), r.getAs[Int]("span_tokens"),
        r.getAs[Long]("n_windows")))
    assert(out.toSeq === Seq(
      // doc 1: short4 at [0,3] (1 window), long12 at [7,18] (9 windows)
      (1L, 0, 3, 4, 1L), (1L, 7, 18, 12, 9L),
      // doc 2: short4 at [1,4], long12 at [9,20]
      (2L, 1, 4, 4, 1L), (2L, 9, 20, 12, 9L),
      // docs 5/6: runA and runB stay SEPARATE spans despite the
      // 2-token gap between them
      (5L, 0, 3, 4, 1L), (5L, 6, 9, 4, 1L),
      (6L, 2, 5, 4, 1L), (6L, 8, 11, 4, 1L)))
    // the 3-token duplicate never surfaces (below threshold) — and
    // the LEGACY fixed-w detector misses the 4-token runs entirely
    // and is allowed to bridge runA/runB: the exact detector's
    // advantage made executable
    val legacy = DedupOps.substringSpansOf(corpus, legacyW)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end")))
    assert(legacy.toSeq === Seq((1L, 7, 18), (2L, 9, 20)),
      "legacy w=8 sees only the 12-token run")
    // excised digests equal across partners for every exact span
    def md5Of(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val digests = DedupOps.substringExactOf(corpus, 4)
      .orderBy("doc_id", "span_start").collect()
      .map(_.getAs[String]("excised_md5")).toSeq
    assert(digests === Seq(md5Of(short4), md5Of(long12),
      md5Of(short4), md5Of(long12),
      md5Of(runA), md5Of(runB), md5Of(runA), md5Of(runB)))
  }

  test("semDedup: keep-first invariants over the embeddings corpus") {
    val out = SimilarityOps.semDedup(spark, sfDir)
    val n = Tables.load(spark, sfDir, "embeddings").count()
    assert(out.count() === n, "one verdict row per vector")
    // the lowest vec_id of every cell can have no smaller-id neighbor
    val firstRemoved = out.groupBy("cell")
      .agg(min("vec_id").as("first_id"))
      .join(out.filter(col("verdict") === "remove"),
        col("first_id") === col("vec_id"))
      .count()
    assert(firstRemoved === 0L, "cell-minimum vector marked removed")
    // every removed vector names a SMALLER-id keeper in ITS OWN cell
    // whose cosine clears the threshold
    val removed = out.filter(col("verdict") === "remove")
    val bad = removed.filter(
      col("dup_of").isNull || col("dup_of") >= col("vec_id") ||
        col("cos_sim") < SimilarityOps.SemDedupTau).count()
    assert(bad === 0L)
    val crossCell = removed.alias("r")
      .join(out.alias("o"), col("r.dup_of") === col("o.vec_id"))
      .filter(col("r.cell") =!= col("o.cell")).count()
    assert(crossCell === 0L, "dup_of must live in the same cell")
    // kept rows carry no duplicate attribution
    assert(out.filter(col("verdict") === "keep")
      .filter(col("dup_of").isNotNull || col("cos_sim").isNotNull)
      .count() === 0L)
  }

  test("bloomDedup: no false negatives ever; false positives within the sized-for rate") {
    val out = DedupOps.bloomDedup(spark, sfDir).cache()
    try {
      // the Bloom law: a member's k positions are all set by its own
      // insertion — a true re-arrival can never probe unflagged
      assert(out.filter(col("false_negative")).count() === 0L)
      // flagged set = true dups + false positives, consistently labeled
      assert(out.filter(col("dup_of_history") && !col("bloom_flagged"))
        .count() === 0L)
      assert(out.filter(col("false_positive") && col("dup_of_history"))
        .count() === 0L)
      // fp rate over the non-member batch stays under 2x the
      // theoretical (1 - e^(-kn/m))^k bound for the fixture history
      val nonMembers = out.filter(!col("dup_of_history")).count()
      val fps = out.filter(col("false_positive")).count().toDouble
      val nHist = Tables.load(spark, sfDir, "documents")
        .select(md5(col("text"))).distinct().count()
      val kk = DedupOps.BloomHashes.toDouble
      val theo = math.pow(
        1 - math.exp(-kk * nHist / DedupOps.BloomBits), kk)
      assert(fps / nonMembers <= 2 * theo + 1e-9,
        s"fp rate ${fps / nonMembers} above 2x theoretical $theo")
    } finally out.unpersist()
  }

  test("gopherRules: verdict is exactly the conjunction of its rules") {
    val out = TextOps.gopherRules(spark, sfDir)
    val mismatch = out.filter(
      col("keep") =!= (col("n_words").between(30, 90) &&
        col("mean_word_len").between(3.0, 6.0) &&
        col("alpha_word_frac") >= 0.9 &&
        col("n_stopwords") >= 1)).count()
    assert(mismatch === 0L)
    // the gate must discriminate on this corpus (both verdicts present)
    val kept = out.filter(col("keep")).count()
    assert(kept > 0L && kept < out.count(),
      s"degenerate gate: $kept of ${out.count()} kept")
  }

  test("pplBuckets: terciles are per-language, balanced, and ordered") {
    val out = TextOps.pplBuckets(spark, sfDir).cache()
    try {
      // bucket label matches tercile index everywhere
      assert(out.filter(
        col("bucket") =!= element_at(
          array(lit("head"), lit("middle"), lit("tail")),
          col("tercile"))).count() === 0L)
      // within each language: tercile sizes differ by at most 1 (ntile
      // contract) and score ranges do not interleave (max(head) <=
      // min(middle) <= ... on the rounded score)
      val sizes = out.groupBy("lang", "tercile").count()
        .groupBy("lang").agg((max("count") - min("count")).as("spread"))
      assert(sizes.filter(col("spread") > 1).count() === 0L)
      val ranges = out.groupBy("lang", "tercile")
        .agg(min("avg_neg_logprob").as("lo"), max("avg_neg_logprob").as("hi"))
      val interleaved = ranges.alias("a").join(ranges.alias("b"),
        col("a.lang") === col("b.lang") &&
          col("a.tercile") < col("b.tercile") &&
          col("a.hi") > col("b.lo")).count()
      assert(interleaved === 0L, "tercile score ranges interleave")
    } finally out.unpersist()
  }

  test("CDC chunking realigns after a prefix insertion; fixed stride does not") {
    import graft.ops.CorpusOps
    // a long document and a copy with three tokens prepended — the
    // dominant near-identical-document shape (prepended header)
    val toks = (1 to 200).map(i => s"w${i % 37}x$i")
    val orig = toks.mkString(" ")
    val shifted = "hdr1 hdr2 hdr3 " + orig
    val docs = Seq((1L, "a", orig), (2L, "a", shifted))
      .toDF("doc_id", "source", "text")
    def digests(df: org.apache.spark.sql.DataFrame, id: Long): Set[String] =
      df.filter(col("doc_id") === id).select("chunk_md5")
        .collect().map(_.getString(0)).toSet
    val cdc = CorpusOps.chunkCdc(docs).localCheckpoint()
    val c1 = digests(cdc, 1L); val c2 = digests(cdc, 2L)
    val cdcShared = (c1 & c2).size.toDouble / c1.size
    // content-defined boundaries realign once the hash window clears
    // the edit: most of the original's chunks survive verbatim
    assert(cdcShared >= 0.5,
      f"CDC kept only $cdcShared%.2f of chunks across a prefix edit")
    val fix = CorpusOps.chunk(docs, window = 16, stride = 16)
      .localCheckpoint()
    val f1 = fix.filter(col("doc_id") === 1L).select("chunk_md5")
      .collect().map(_.getString(0)).toSet
    val f2 = fix.filter(col("doc_id") === 2L).select("chunk_md5")
      .collect().map(_.getString(0)).toSet
    val fixShared = (f1 & f2).size.toDouble / f1.size
    assert(fixShared < cdcShared,
      s"fixed stride ($fixShared) not worse than CDC ($cdcShared)")
    // CDC chunks partition each document exactly
    val part = CorpusOps.chunkCdc(docs)
      .groupBy(col("doc_id")).agg(sum(col("n_tokens")).as("s"),
        min(col("start_tok")).as("mn"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(part(1L) === ((200L, 1L)))
    assert(part(2L) === ((203L, 1L)))
  }
}
