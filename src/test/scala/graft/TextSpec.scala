package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Analytic invariants of the text quality signals — bounds that hold
  * for ANY corpus, pinned at a layer the value-matching oracle can't
  * cover (the oracle proves engine agreement on one fixture; these
  * prove the math is the math).
  */
class TextSpec extends SparkSpec {

  test("topNgrams is a descending deterministic top-k of true counts") {
    val k = 10
    val out = TextOps.topNgrams(spark, sfDir, k).collect()
    assert(out.length === k)
    val counts = out.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)), "not descending")
    // (n desc, ngram asc) total order: ties must be ngram-sorted
    out.sliding(2).foreach { case Array(a, b) =>
      if (a.getLong(1) == b.getLong(1))
        assert(a.getString(0) < b.getString(0), "tie-break violated")
    }
    // spot-check the head count against a direct recount
    val (top, n) = (out.head.getString(0), out.head.getLong(1))
    val Array(w1, w2) = top.split(" ")
    val recount = Tables.load(spark, sfDir, "documents")
      .select(transform(split(trim(col("text")), "\\s+"),
        x => lower(x)).as("t"))
      .select(explode(expr(
        "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1), " +
          "(a, b) -> struct(a, b))")).as("bg"))
      .filter(col("bg.a") === w1 && col("bg.b") === w2)
      .count()
    assert(recount === n, s"'$top': top-k says $n, recount $recount")
  }

  test("entropy is within [0, ln(n_tokens)] and repetition within [0, 1)") {
    // epsilon budget: per-term contributions are rounded at 1e-8
    // (determinism discipline) and the result at 1e-6, so the bound
    // can be undershot by ~1e-6 — not an analytic violation
    val ent = TextOps.tokenEntropy(spark, sfDir)
    assert(ent.filter(col("entropy") < -1e-4 ||
      col("entropy") > log(col("n_tokens").cast("double")) + 1e-4)
      .isEmpty, "entropy outside [0, ln(n)]")
    val rep = TextOps.wordRepetition(spark, sfDir)
    assert(rep.filter(col("dup_ratio") < 0 || col("dup_ratio") >= 1)
      .isEmpty, "dup_ratio outside [0, 1)")
    // consistency, forward direction only: all-distinct tokens must
    // report exactly 0. (The converse is not rounding-safe for ANY
    // corpus: a single duplicate in a >2M-token document rounds a
    // positive ratio to 0.0 at the 1e-6 output precision.)
    assert(rep.filter(col("n_distinct") === col("n_tokens") &&
      col("dup_ratio") =!= 0.0).isEmpty)
  }

  test("unigram logprob: uniform lower bound and boilerplate threshold") {
    // mean −log p is minimized by the most frequent token: every doc's
    // score is ≥ −ln(max_tf/total) over the corpus... the cheap
    // checkable bound is positivity (p ≤ max_tf/total < 1 on any
    // multi-type corpus) and finiteness (every scored token was in
    // the training vocab by construction)
    val lp = TextOps.unigramLogprob(spark, sfDir)
    assert(lp.filter(col("avg_neg_logprob") <= 0 ||
      isnan(col("avg_neg_logprob"))).isEmpty,
      "nonpositive or NaN logprob score")
    // boilerplate: every reported bigram clears the relative threshold
    val bp = TextOps.boilerplateBigrams(spark, sfDir)
    assert(bp.filter(col("doc_pct") < 0.05 - 1e-9).isEmpty,
      "bigram below the 5% corpus threshold")
  }

  test("bigram LM: per-doc counts and conditional-probability bounds") {
    val bg = TextOps.bigramLogprob(spark, sfDir)
    // a conditional −log p is 0 exactly when the context is
    // deterministic (c_ab = c_a); never negative, never NaN
    assert(bg.filter(col("avg_neg_logprob") < 0 ||
      isnan(col("avg_neg_logprob"))).isEmpty,
      "negative or NaN bigram score")
    // every (≥2-token) document contributes exactly n_tokens − 1
    // bigram instances
    val tok = TextOps.tokenCount(spark, sfDir)
      .select(col("doc_id"), col("ws_tokens"))
    assert(bg.join(tok, "doc_id")
      .filter(col("n_bigrams") =!= col("ws_tokens") - 1).isEmpty,
      "bigram count is not n_tokens - 1")
  }

  test("GD quality probe: learns above the base rate, deterministic") {
    val row = TextOps.qualityClf(spark, sfDir).head()
    val n = row.getAs[Long]("n_docs").toDouble
    val pos = row.getAs[Long]("n_pos").toDouble
    val base = math.max(pos / n, 1.0 - pos / n)
    val acc = row.getAs[Double]("accuracy")
    // the label is long-vs-short and x1 is the bounded length feature,
    // so three GD rounds must beat always-guess-majority
    assert(acc > base + 0.05, s"accuracy $acc did not beat base rate $base")
    // the length feature must carry positive weight (positive class =
    // long documents) and separate the class score means
    assert(row.getAs[Double]("w1") > 0.0, "length weight not positive")
    assert(row.getAs[Double]("mean_score_pos") >
      row.getAs[Double]("mean_score_neg"), "score means not separated")
    // a one-extra-iteration run retrains from scratch (different memo
    // key) and must agree with the 3-round weights to GD-step order —
    // cheap determinism witness that training is data-, not
    // partitioning-, dependent (the true bit-replay check is the
    // DuckDB oracle retraining from zero)
    val w3 = TextOps.trainQualityClf(spark, sfDir)
    val w4 = TextOps.trainQualityClf(spark, sfDir, iters = 4)
    assert(w3.indices.forall(j => math.abs(w3(j) - w4(j)) < 0.2),
      s"4-iter weights ${w4.toSeq} diverged from ${w3.toSeq}")
  }
}
