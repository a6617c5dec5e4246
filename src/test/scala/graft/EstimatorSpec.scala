package graft

import graft.ops.{DedupOps, ScanAggOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Bounds/consistency checks for the estimator-based operators that
  * have no SQL oracle (engine-internal sketches differ across engines;
  * SURVEY §2.4 A2, dedup/ANN extensions). All inputs are deterministic,
  * so these assertions are stable, not flaky.
  */
class EstimatorSpec extends SparkSpec {

  test("A2: approx_count_distinct within its rsd bound") {
    val row = ScanAggOps.hllKeyCount(spark, sfDir).head()
    val exact = Tables.load(spark, sfDir, "lineitem")
      .select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(row.getAs[Long]("exact_keys") === exact)
    assert(row.getAs[Boolean]("est_in_bounds"),
      "HLL++ estimate outside the declared 10% bound")
  }

  test("A2: merged per-bucket HLL sketches estimate the global distinct count") {
    val row = ScanAggOps.sketchMerge(spark, sfDir).head()
    assert(row.getAs[Long]("n_buckets") === 8L)
    assert(row.getAs[Boolean]("est_in_bounds"),
      "merged-sketch estimate outside the declared 10% bound")
  }

  test("A2: sketch bytes survive a parquet round-trip bit-exactly") {
    // the cross-job workflow's risky part is the binary round-trip:
    // the estimate merged from RELOADED sketch bytes must EQUAL the
    // estimate merged from the never-persisted sketches (same bytes ⇒
    // same sketch ⇒ same estimate, exactly — not merely within bounds)
    def mergedEst(sk: org.apache.spark.sql.DataFrame): Any =
      sk.agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("est")).head().get(0)
    val sketches = Tables.load(spark, sfDir, "orders")
      .groupBy((col("o_orderkey") % 8).as("bucket"))
      .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("sketch"))
    val direct = mergedEst(sketches)
    val dir = graft.Scratch
      .dir("graft-sketch-rt-").toString + "/sketches"
    sketches.write.parquet(dir)
    val roundTripped = mergedEst(spark.read.parquet(dir))
    assert(roundTripped === direct,
      s"parquet round-trip changed the merged estimate: " +
        s"$roundTripped vs $direct")
    // and the registered query (which performs exactly this round
    // trip) holds its bounds contract
    val row = ScanAggOps.sketchPersist(spark, sfDir).head()
    assert(row.getAs[Long]("n_buckets") === 8L)
    assert(row.getAs[Boolean]("est_in_bounds"),
      "round-tripped merged estimate outside the declared 10% bound")
  }

  test("xxhash production mode recovers every guaranteed (clone) pair") {
    val rec = DedupOps.minhashProdRecall(spark, sfDir)
    val eligible = Tables.load(spark, sfDir, "documents")
      .filter(size(split(trim(col("text")), "\\s+")) >= 3)
    assert(rec.count() === eligible.count(),
      "a guaranteed clone pair was missed by the xxhash LSH pipeline")
    // every emitted pair is exactly (doc, doc + CloneOffset)
    assert(rec.filter(col("doc_b") - col("doc_a") =!=
      DedupOps.CloneOffset).count() === 0)
  }

  test("A4: deterministic md5-sample estimate lands near the true count") {
    val row = ScanAggOps.sampledKeyCount(spark, sfDir).head()
    val est = row.getAs[Long]("est_rows")
    val actual = Tables.load(spark, sfDir, "orders").count()
    assert(math.abs(est - actual).toDouble / actual < 0.15,
      s"est=$est actual=$actual")
  }

  test("simhash is deterministic and defined for every document") {
    val a = DedupOps.simhash(spark, sfDir)
    val b = DedupOps.simhash(spark, sfDir)
    assert(a.exceptAll(b).count() === 0)
    assert(a.count() === Tables.load(spark, sfDir, "documents").count())
  }

  test("minhash-LSH candidates contain every exact-Jaccard>=0.8 pair") {
    val lsh = DedupOps.minhashLsh(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val exact = DedupOps.ngramJaccard(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val missed = exact.exceptAll(lsh).count()
    assert(missed === 0,
      s"$missed high-similarity pairs missed by LSH banding")
  }

  test("IVF-PQ: ADC score is exactly the query·reconstruction cosine") {
    val books = SimilarityOps.pqCodebooks(spark, sfDir)
    val len = 64 / books.length
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // recompute each vector's codes the definitional way (true argmin
    // L2 per subspace) and check ADC output rows against the identity
    // adc = dot(query, concat(chosen centroids))
    def codesOf(v: Array[Double]): Array[Int] =
      books.indices.map { s =>
        val sub = v.slice(s * len, (s + 1) * len)
        books(s).indices.minBy { j =>
          val c = books(s)(j)
          // argmin L2; mirror the operator's tie-break (highest code)
          (sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, -j)
        }
      }.toArray
    val out = SimilarityOps.annIvfPq(spark, sfDir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (qid, nid, adc) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val recon = codesOf(emb(nid)).zipWithIndex
        .flatMap { case (c, s) => books(s)(c) }
      val dotQR = emb(qid).zip(recon).map { case (a, b) => a * b }.sum
      val expected = dotQR / math.sqrt(recon.map(x => x * x).sum)
      assert(math.abs(adc - expected) < 1e-6,
        s"q$qid n$nid: adc $adc != reconstruction cosine $expected")
    }
    // ranks are 1..3 per query, scores descending within a query
    for ((_, g) <- out.groupBy(_.getLong(0))) {
      val byRk = g.sortBy(_.getInt(4))
      assert(byRk.map(_.getInt(4)).sameElements(1 to byRk.length))
      assert(byRk.map(_.getDouble(3)).sliding(2).forall(
        p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("cross-source matrix conserves the LSH pair set") {
    val m = DedupOps.crossSourceDups(spark, sfDir).collect()
    // unordered-pair key: canonical orientation, no double counting
    for (r <- m) assert(r.getString(0) <= r.getString(1))
    assert(m.map(t => (t.getString(0), t.getString(1)))
      .distinct.length === m.length)
    // every candidate pair lands in exactly one matrix cell
    val total = DedupOps.minhashLsh(spark, sfDir).count()
    assert(m.map(_.getLong(2)).sum === total,
      "matrix total != LSH pair count")
  }

  test("minhash-LSH md5 oracle mode finds the same candidate pairs as xxhash mode") {
    // Both hashes are uniform over tokens: the banded signatures differ
    // but the fixture's near-dup clusters must be recovered either way.
    val xx = DedupOps.minhashLsh(spark, sfDir, DedupOps.XxHash)
    val md = DedupOps.minhashLsh(spark, sfDir, DedupOps.Md5)
    val exact = DedupOps.ngramJaccard(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    assert(exact.exceptAll(md.select(col("doc_a"), col("doc_b"))).count() === 0)
    assert(xx.count() > 0 && md.count() > 0)
  }

  test("dedup components: pairs co-labeled, labels are component minima, converged") {
    val comp = DedupOps.dedupComponents(spark, sfDir, DedupOps.Md5)
    val pairs = DedupOps.minhashLsh(spark, sfDir, DedupOps.Md5)
    // every document is labeled exactly once
    val docs = Tables.load(spark, sfDir, "documents")
    assert(comp.count() === docs.count())
    assert(comp.select("doc_id").distinct().count() === docs.count())
    // a label never exceeds its doc (component id = min member)
    assert(comp.filter(col("component") > col("doc_id")).count() === 0)
    // every candidate pair ended up in ONE component (propagation
    // really converged — a too-early exit would split some pair)
    val ca = comp.select(col("doc_id").as("doc_a"),
      col("component").as("comp_a"))
    val cb = comp.select(col("doc_id").as("doc_b"),
      col("component").as("comp_b"))
    assert(pairs.join(ca, "doc_a").join(cb, "doc_b")
      .filter(col("comp_a") =!= col("comp_b")).count() === 0)
    // every component's label is a member of the component
    val labelIsMember = comp.select(col("component")).distinct()
      .join(comp.select(col("doc_id")),
        col("component") === col("doc_id"), "left_anti")
    assert(labelIsMember.count() === 0)
  }

  test("LSH band buckets and ngram postings are size-capped with drop metrics") {
    // Default caps must not bite at fixture scale (0 drops reported via
    // the observe metric, identical results to effectively-uncapped)...
    val lsh = DedupOps.minhashLsh(spark, sfDir)
    lsh.collect()
    val lshDrops = lsh.queryExecution.observedMetrics(
      s"d_minhash_lsh_xxhash_buckets_cap${DedupOps.MaxBucketSize}")
    assert(lshDrops.getAs[Long]("dropped_buckets") === 0L)
    val unc = DedupOps.minhashLsh(spark, sfDir, maxBucket = Int.MaxValue)
    assert(lsh.exceptAll(unc).count() === 0 && unc.exceptAll(lsh).count() === 0)

    val ng = DedupOps.ngramJaccard(spark, sfDir)
    ng.collect()
    val ngDrops = ng.queryExecution.observedMetrics(
      s"d_ngram_jaccard_postings_cap${DedupOps.MaxPostingSize}")
    assert(ngDrops.getAs[Long]("dropped_postings") === 0L)

    // ...and a tight cap must actually drop oversized buckets and say so.
    // (cap=1 would be a contradictory filter the optimizer folds to an
    // empty LocalRelation — taking the CollectMetrics node with it — so
    // use the smallest satisfiable cap instead.)
    val capped = DedupOps.minhashLsh(spark, sfDir, maxBucket = 2)
    // collect() (not count()) so the metrics land on THIS QueryExecution
    val cappedPairs = capped.collect()
    val cappedDrops =
      capped.queryExecution.observedMetrics("d_minhash_lsh_xxhash_buckets_cap2")
    assert(cappedDrops.getAs[Long]("dropped_buckets") > 0L)
    assert(cappedPairs.length < lsh.count())
    assert(capped.exceptAll(lsh).count() === 0) // capped ⊆ uncapped
  }

  test("embedding near-dup: banded-LSH recall vs the brute-force same-label baseline") {
    // The banded bucket key makes candidate generation probabilistic
    // (recall 1-(1-s^2)^4 per pair) where the old label-join was
    // exhaustive within a label. This pins the achieved recall on the
    // fixture: at the documented seed every brute-force pair above the
    // 0.25 output threshold is recovered (full recall).
    val lsh = SimilarityOps.embeddingNearDup(spark, sfDir)
      .select(col("vec_a"), col("vec_b"))
    val v = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(graft.functions.GraftFunctions
        .array_dot(col("e"), col("e"))))
    val a = v.select(col("vec_id").as("vec_a"), col("label"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("vec_b"), col("label"),
      col("e").as("eb"), col("nrm").as("nb"))
    val brute = a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", graft.functions.GraftFunctions
        .array_dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") > 0.25)
      .select(col("vec_a"), col("vec_b"))
    val missed = brute.exceptAll(lsh).count()
    assert(missed === 0,
      s"$missed same-label pairs above threshold missed by banded LSH")
  }

  test("near-dup buckets are size-capped with a drop metric") {
    // default cap must not bite at fixture scale: zero drops reported,
    // result identical to effectively-uncapped
    val full = SimilarityOps.embeddingNearDup(spark, sfDir)
    full.collect()
    val drops = full.queryExecution.observedMetrics(
      s"sim_embed_neardup_buckets_cap${SimilarityOps.NearDupMaxBucket}")
    assert(drops.getAs[Long]("dropped_buckets") === 0L)
    val unc = SimilarityOps.embeddingNearDup(spark, sfDir,
      maxBucket = Int.MaxValue)
    assert(full.exceptAll(unc).count() === 0 &&
      unc.exceptAll(full).count() === 0)
  }

  test("near-dup bucket cap bites and reports on a degenerate megacluster") {
    // 10 identical vectors, one label: every band puts all of them in
    // ONE bucket — the exact pathological shape the cap exists for.
    // A second, 2-vector cluster survives the tight cap so the capped
    // result stays non-empty: a fully-empty result would let AQE's
    // empty-relation propagation replace the subtree ABOVE the
    // materialized stage — dropping the CollectMetrics node and its
    // metric with it (the runtime twin of the cap=1 constant-folding
    // note in the minhash cap test).
    import spark.implicits._
    val dir = graft.Scratch
      .dir("graft-neardup-").toString
    val mega = Array.fill(64)(0.5f).toSeq
    val small = Array.fill(64)(-0.5f).toSeq
    ((0 until 10).map(i => (i * 10L, "mega", mega)) ++
      Seq((100L, "pair", small), (110L, "pair", small)))
      .toDF("vec_id", "label", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    // at the default cap both buckets pass: 45 megacluster pairs + 1
    assert(SimilarityOps.embeddingNearDup(spark, dir).count() === 46)
    // cap=2 drops the size-10 bucket in every band and reports it;
    // the 2-vector cluster's single pair is all that survives
    val capped = SimilarityOps.embeddingNearDup(spark, dir, maxBucket = 2)
    val cappedRows = capped.collect()
    val cappedDrops = capped.queryExecution
      .observedMetrics("sim_embed_neardup_buckets_cap2")
    assert(cappedDrops.getAs[Long]("dropped_buckets") > 0L)
    assert(cappedRows.map(_.getAs[Long]("vec_a")).toSet === Set(100L))
  }

  test("LSH-ANN results are a subset of brute-force candidates with sane cosines") {
    val ann = SimilarityOps.annLsh(spark, sfDir)
    assert(ann.filter(col("cos_sim") > 1.000001 || col("cos_sim") < -1.000001)
      .count() === 0)
    // within-bucket top-k can never beat brute-force top-k cosine
    val brute = SimilarityOps.cosineTopK(spark, sfDir)
      .groupBy("q_vec_id").agg(max("cos_sim").as("best"))
    val joined = ann.filter(col("rk") === 1)
      .join(brute, "q_vec_id")
      .filter(col("cos_sim") > col("best") + 1e-9)
    assert(joined.count() === 0)
  }

  test("IVF-ANN: nonempty, sane cosines, never beats brute-force best") {
    val ann = SimilarityOps.annIvf(spark, sfDir)
    assert(ann.count() > 0)
    assert(ann.filter(col("cos_sim") > 1.000001 || col("cos_sim") < -1.000001)
      .count() === 0)
    val brute = SimilarityOps.cosineTopK(spark, sfDir)
      .groupBy("q_vec_id").agg(max("cos_sim").as("best"))
    assert(ann.filter(col("rk") === 1)
      .join(brute, "q_vec_id")
      .filter(col("cos_sim") > col("best") + 1e-9)
      .count() === 0)
  }

  /** Per-query recall dominance of a wider probe set: a probed cell
    * set is a superset, so a candidate list only grows — recall can
    * never drop for ANY query (provable for exact-cosine IVF ranking;
    * for ADC-ranked PQ it is a deterministic fixture property), and
    * on the asserted fixture some query's true neighbor sits in the
    * second-nearest cell, so the total strictly improves. */
  private def assertProbeDominance(p1: org.apache.spark.sql.DataFrame,
      p2: org.apache.spark.sql.DataFrame): Unit = {
    val joined = p1.select(col("q_vec_id"), col("n_hits").as("h1"))
      .join(p2.select(col("q_vec_id"), col("n_hits").as("h2")), "q_vec_id")
      .localCheckpoint()
    assert(joined.count() === 8)
    assert(joined.filter(col("h2") < col("h1")).count() === 0)
    val Array(s1, s2) = joined.agg(sum("h1"), sum("h2")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    assert(s2 > s1, s"nprobe=2 total hits $s2 not > nprobe=1 $s1")
  }

  test("multi-probe IVF: recall dominates nprobe=1 per query, strictly in total") {
    assertProbeDominance(
      SimilarityOps.annRecallIvf(spark, sfDir),
      SimilarityOps.annRecallIvfMp(spark, sfDir))
  }

  // At sf0.001 the PQ index's nprobe=1 misses happen to be
  // quantization (not cell-pruning) losses, so widening the probes
  // changes nothing there; sf0.01 has a boundary query whose true
  // neighbor lives in the second cell — assert the strict gain where
  // it exists.
  test("multi-probe IVF-PQ: recall dominates nprobe=1 per query, strictly in total") {
    val sf01 = "/root/testdata/sf0.01"
    assertProbeDominance(
      SimilarityOps.annRecallIvfPq(spark, sf01),
      SimilarityOps.annRecallIvfPqMp(spark, sf01))
  }

  test("PQ exact re-rank: recall dominates plain PQ per query") {
    // structural guarantee, not a fixture accident: the rerank top-3
    // is the exact-cosine top-3 of an ADC-top-8 SUPERSET of the ADC
    // top-3, and only a true-top-3 vector outranks a true-top-3
    // vector in exact cosine — so per-query hits can never drop
    // sf0.001's PQ misses sit below the ADC-top-8 shortlist (or in
    // unprobed cells), so the refine can't reach them there; sf0.01
    // has within-shortlist ADC misorderings — assert the strict gain
    // where it exists (same fixture split as the multi-probe test)
    val sf01 = "/root/testdata/sf0.01"
    val p1 = SimilarityOps.annRecallIvfPq(spark, sf01)
    val rr = SimilarityOps.annRecallPqRerank(spark, sf01)
    val joined = p1.select(col("q_vec_id"), col("n_hits").as("h1"))
      .join(rr.select(col("q_vec_id"), col("n_hits").as("h2")), "q_vec_id")
      .localCheckpoint()
    assert(joined.count() === 8)
    assert(joined.filter(col("h2") < col("h1")).count() === 0,
      "re-rank lost recall on some query")
    val Array(s1, s2) = joined.agg(sum("h1"), sum("h2")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    assert(s2 > s1, s"re-rank total hits $s2 not > plain PQ's $s1")
  }

  test("PQ exact re-rank: every returned neighbor carries its exact cosine") {
    // the rerank result's cos_sim must agree with the brute-force
    // pipeline's cosine for the same (query, neighbor) pair — the
    // refine stage serves EXACT scores, unlike ADC's approximation
    val rr = SimilarityOps.annPqRerank(spark, sfDir)
    val brute = SimilarityOps.cosineTopK(spark, sfDir)
      .select(col("q_vec_id"), col("neighbor_vec_id"),
        col("cos_sim").as("bcos"))
    val mism = rr.join(brute, Seq("q_vec_id", "neighbor_vec_id"))
      .filter(abs(col("cos_sim") - col("bcos")) > 1e-9)
    assert(mism.count() === 0, "rerank cosine differs from brute cosine")
  }

  test("banding curve: candidate volume shrinks as rows-per-band grows; 4x4 matches the production pair set") {
    val rows = DedupOps.minhashBandCurve(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("rows_per_band"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_tight_pairs"))).sortBy(_._1)
    assert(rows.length === DedupOps.BandCurve.length)
    // nested factorizations (1|2|4|8|16): an aligned r2-block match is
    // an aligned r1-block match for every r1 | r2, so absent cap drops
    // (none on this fixture) the candidate set only shrinks with r
    rows.sliding(2).foreach { case Array((r1, n1, _), (r2, n2, _)) =>
      assert(n2 <= n1, s"candidates grew from $n1 (r=$r1) to $n2 (r=$r2)")
    }
    rows.foreach { case (r, n, t) =>
      assert(t <= n, s"tight pairs $t exceed candidates $n at r=$r")
    }
    // the 4x4 point IS the production banding — its candidate count
    // must equal the registered d_minhash_lsh pair set's
    val prod = DedupOps.minhashLsh(spark, sfDir, DedupOps.Md5).count()
    val p44 = rows.find(_._1 == 4).get._2
    assert(p44 === prod, s"4x4 curve point $p44 != production $prod")
  }

  test("SQ8: flat byte-quantized recall dominates 4-code IVF-PQ") {
    // byte-per-dim precision + no cell pruning: the SQ8 flat scan is
    // the compressed family's recall ceiling — it must beat the
    // coarser PQ (4 codes/vector, cell-pruned) on any fixture
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("n_hits")).head().getLong(0)
    val sq8 = hits(SimilarityOps.annRecallSq8(spark, sfDir))
    val pq = hits(SimilarityOps.annRecallIvfPq(spark, sfDir))
    assert(sq8 >= pq, s"SQ8 hits $sq8 below PQ's $pq")
    assert(sq8 >= 20, s"SQ8 hits $sq8 unexpectedly low (24 = perfect)")
  }

  test("trained index round-trips parquet bit-exactly (write_index/read_index)") {
    val cs = SimilarityOps.trainedCentroids(spark, sfDir)
    val back = SimilarityOps.reloadedCentroids(spark, sfDir)
    assert(back.length === cs.length)
    cs.indices.foreach { i =>
      assert(java.util.Arrays.equals(cs(i), back(i)),
        s"centroid $i changed across the parquet round-trip")
    }
  }

  test("source drift: histogram divergence and shares are well-formed") {
    val rows = SimilarityOps.sourceDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (share, coh, l1) = (r.getAs[Double]("top_cell_share"),
        r.getAs[Double]("mean_coherence"), r.getAs[Double]("l1_drift"))
      assert(share > 0.0 && share <= 1.0, s"share $share out of range")
      assert(coh >= -1.0 && coh <= 1.0, s"coherence $coh out of range")
      // L1 distance between two distributions is bounded by 2
      assert(l1 >= 0.0 && l1 <= 2.0, s"l1 $l1 out of range")
    }
  }

  test("IVF-SQ8: bounded above by both parents (cells bound one error, codes the other)") {
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("n_hits")).head().getLong(0)
    val ivfsq = hits(SimilarityOps.annRecallIvfSq8(spark, sfDir))
    val sq = hits(SimilarityOps.annRecallSq8(spark, sfDir))
    val ivf = hits(SimilarityOps.annRecallIvf(spark, sfDir))
    // adding cell pruning to SQ8-flat can only lose candidates, and
    // exact-cosine IVF ranks at least as well as byte-quantized IVF
    // on the same candidate set (fixture property, near-exact codes)
    assert(ivfsq <= sq, s"IVF-SQ8 hits $ivfsq above SQ8-flat's $sq")
    assert(ivfsq <= ivf + 1,
      s"IVF-SQ8 hits $ivfsq well above exact IVF's $ivf")
  }

  test("SQ8: reconstruction error is within half a quantization step") {
    // the scalar-quantizer invariant: for any value inside the trained
    // [min, max] the decoded center is within range/512; corpus values
    // OUTSIDE the trained bounds clamp (their error is the overshoot),
    // so assert over the training sample, whose values define the
    // bounds. Verifies encode/decode round-trip, not just ranking.
    import SimilarityOps.{KmeansTrainBase, KmeansTrainCap}
    val e = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") >= KmeansTrainBase &&
        col("vec_id") < KmeansTrainBase + KmeansTrainCap)
      .select(explode(col("embedding").cast("array<double>")).as("x"))
      .localCheckpoint()
    val Seq(mn, mx) = e.agg(min("x"), max("x")).head().toSeq
      .map(_.asInstanceOf[Double])
    // per-dim bounds are tighter than the global ones used here, so
    // the global half-step is a CONSERVATIVE ceiling on the per-dim
    // guarantee only if per-dim range <= global range — always true
    val step = (mx - mn) / 256.0
    val err = e.select(abs(col("x") - (lit(mn) +
        (least(greatest(floor((col("x") - mn) * 256.0 / (mx - mn)),
          lit(0L)), lit(255L)) + 0.5) * (mx - mn) / 256.0)).as("err"))
      .agg(max("err")).head().getDouble(0)
    assert(err <= step / 2 + 1e-12,
      s"reconstruction error $err exceeds half-step ${step / 2}")
  }

  test("Lloyd training: k-means objective decreases monotonically per round") {
    val cs0 = SimilarityOps.centroids(64, 16)
    val cs1 = SimilarityOps.trainedCentroids(spark, sfDir, iters = 1)
    val cs2 = SimilarityOps.trainedCentroids(spark, sfDir, iters = 2)
    val Seq(o0, o1, o2) =
      Seq(cs0, cs1, cs2).map(SimilarityOps.kmeansObjective(spark, sfDir, _))
    // Lloyd guarantees non-increase; on this fixture round 1 is a
    // ~17× drop (random centroids sit far off the data manifold)
    assert(o1 < o0 / 2, s"round 1 objective $o1 not well below init $o0")
    assert(o2 <= o1, s"round 2 objective $o2 above round 1's $o1")
  }

  test("Lloyd training: trained cells are better balanced than random ones") {
    def stats(cs: Array[Array[Double]]): (Long, Double) = {
      val occ = SimilarityOps.cellOccupancy(spark, sfDir, cs, l2 = true)
        .collect().map(_.getLong(1))
      val mean = occ.sum.toDouble / 16 // over all k cells, empty included
      (occ.max, math.sqrt(occ.map(c => (c - mean) * (c - mean)).sum / 16))
    }
    val (mx0, sd0) = stats(SimilarityOps.centroids(64, 16))
    val (mx1, sd1) = stats(SimilarityOps.trainedCentroids(spark, sfDir))
    // the latent 100 TB risk being trained away: one hot cell = one
    // giant candidate set per query landing in it
    assert(mx1 < mx0, s"max cell occupancy $mx1 not below random's $mx0")
    assert(sd1 < sd0, s"occupancy stddev $sd1 not below random's $sd0")
  }

  test("Lloyd training: trained-index recall beats the random-centroid index") {
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("n_hits")).head().getLong(0)
    // same brute-force truth on both sides of each comparison; the
    // fixture gaps are wide (4→12 IVF, 3→5 PQ at sf0.001), so these
    // are robust strict assertions, not near-ties
    assert(hits(SimilarityOps.annRecallIvfTrained(spark, sfDir)) >
      hits(SimilarityOps.annRecallIvf(spark, sfDir)))
    assert(hits(SimilarityOps.annRecallIvfPqTrained(spark, sfDir)) >
      hits(SimilarityOps.annRecallIvfPq(spark, sfDir)))
  }

  test("trained multi-probe recall dominates plain trained recall") {
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("n_hits"))).head().getLong(0)
    assert(hits(SimilarityOps.annRecallIvfTrainedMp(spark, sfDir)) >=
      hits(SimilarityOps.annRecallIvfTrained(spark, sfDir)),
      "nprobe=2 lost recall on the trained index")
  }

  test("full-index persistence: every component round-trips bit-exactly and serves identically") {
    val dir = Scratch.dir("graft-fullidx-")
    try {
      SimilarityOps.writeFullIndex(spark, sfDir, dir.toString)
      val (cs, books, (mins, rng), codes) =
        SimilarityOps.readFullIndex(spark, dir.toString)
      // coarse centroids: bit equality with the builder's arrays
      val csB = SimilarityOps.trainedCentroids(spark, sfDir)
      assert(cs.length === csB.length)
      cs.zip(csB).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
      // PQ codebooks: per-subspace, per-code bit equality
      val booksB = SimilarityOps.trainedPqCodebooks(spark, sfDir)
      assert(books.length === booksB.length)
      books.zip(booksB).foreach { case (ba, bb) =>
        assert(ba.length === bb.length)
        ba.zip(bb).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
      }
      // SQ8 bounds: exact min/range per dimension
      assert(mins.length === 64 && rng.length === 64)
      assert(rng.forall(_ > 0.0))
      // the reloaded encoded-corpus frame equals a fresh encode —
      // and the persist-serving query equals the trained one
      val persist = SimilarityOps.annIvfPqPersist(spark, sfDir)
        .localCheckpoint()
      val trained = SimilarityOps.annIvfPqTrained(spark, sfDir)
        .localCheckpoint()
      assert(persist.exceptAll(trained).count() === 0)
      assert(trained.exceptAll(persist).count() === 0)
      assert(codes.columns.toSeq ===
        Seq("vec_id", "cell", "c0", "c1", "c2", "c3", "recon_nrm"))
    } finally Scratch.delete(dir)
  }

  test("incremental add: growing the persisted index answers like rebuilding it") {
    val added = SimilarityOps.annIvfPqAdd(spark, sfDir).localCheckpoint()
    val rebuilt = SimilarityOps.annIvfPqTrained(spark, sfDir)
      .localCheckpoint()
    assert(added.count() > 0)
    assert(added.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(added).count() === 0)
  }

  test("remove_ids: removed vectors never surface; the answer genuinely changes") {
    val removed = SimilarityOps.annIvfPqRemove(spark, sfDir)
      .localCheckpoint()
    assert(removed.count() > 0)
    // no removed id is ever returned as a neighbor
    assert(removed.filter(
      col("neighbor_vec_id") % SimilarityOps.RemoveMod
        === SimilarityOps.RemoveRes).count() === 0)
    // the removal predicate actually bit: the shrunk index answers
    // differently from the full one (some removed vector was a result)
    val full = SimilarityOps.annIvfPqTrained(spark, sfDir)
      .localCheckpoint()
    assert(full.filter(col("neighbor_vec_id") % SimilarityOps.RemoveMod
      === SimilarityOps.RemoveRes).count() > 0,
      "fixture never returned a removed id; the test proves nothing")
    assert(removed.exceptAll(full).count() > 0)
  }

  test("graph index persistence: reloaded edges serve identically") {
    val persist = SimilarityOps.annHnswPersist(spark, sfDir)
      .localCheckpoint()
    val direct = SimilarityOps.annHnsw(spark, sfDir).localCheckpoint()
    assert(persist.count() > 0)
    assert(persist.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(persist).count() === 0)
  }

  test("graph ANN (NSW): recall beats every quantized single-probe tier on the fixture") {
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("n_hits")).head().getLong(0)
    val hnsw = hits(SimilarityOps.annRecallHnsw(spark, sfDir))
    // the layered walk explores enough of the fixture graph for high
    // recall; the structural claim is dominance over the cell-pruned
    // tiers whose boundary losses the graph walk dodges
    assert(hnsw >= hits(SimilarityOps.annRecallIvf(spark, sfDir)),
      "graph tier lost to untrained IVF")
    assert(hnsw >= hits(SimilarityOps.annRecall(spark, sfDir)),
      "graph tier lost to bucket LSH")
    assert(hnsw >= 20, s"graph recall collapsed: $hnsw/24 hits")
  }

  test("layered search: fewer flat hops than the flat-only walk, bounded descent fan") {
    // the spine descent does the coarse navigation, so the expensive
    // phase — flat hops, each joining the beam against the full
    // ~2M-degree edge list — is pinned BELOW the flat-only walk's
    // count (recall non-regression is the ≥20/24 pin above, under
    // the same oracle gate)
    assert(SimilarityOps.HnswHops < SimilarityOps.HnswFlatOnlyHops,
      "layered serving no longer cuts flat hops")
    // each descent hop expands ≤ FanCap tree children per beam slot:
    // the spine is the adjacency, and its out-fan (children per
    // anchor) is capped by construction — pin it on the fixture
    val vn = SimilarityOps.withNorm(Tables.load(spark, sfDir, "embeddings"))
    val fanOut = SimilarityOps.hnswSpineOf(vn, sfDir)
      .groupBy("dst").count().agg(max("count")).head().getLong(0)
    assert(fanOut <= (SimilarityOps.HnswAnchorLevels + 1)
      * (SimilarityOps.HnswFanCap - 1) + 16,
      s"descent fan $fanOut not capped")
    // total hops: descent levels are fixed by the spine depth
    assert(SimilarityOps.HnswDescentHops ===
      SimilarityOps.HnswAnchorLevels + 2)
  }

  test("graph ANN: serving is deterministic and neighbors carry exact cosines") {
    val a = SimilarityOps.annHnsw(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4))
    val b = SimilarityOps.annHnsw(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4))
    assert(a.nonEmpty && a.toSeq === b.toSeq,
      "graph serving is not run-deterministic")
    // per query: exactly top-3, ranks 1..3, cosines non-increasing
    a.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length === 3, s"query $q returned ${rows.length} rows")
      assert(rows.map(_._4).toSeq === Seq(1, 2, 3))
      assert(rows.sliding(2).forall(p => p(0)._3 >= p(1)._3 - 1e-9))
      assert(rows.forall(_._2 != q), "query returned itself")
    }
  }

  test("beam tuning curve: recall is monotone non-decreasing in beam width") {
    val pts = SimilarityOps.annBeamCurve(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("recall")).sortBy(_._1)
    assert(pts.map(_._1).toSeq === SimilarityOps.BeamCurve.sorted,
      "curve points missing")
    pts.sliding(2).foreach { case Array((b1, r1), (b2, r2)) =>
      assert(r2 >= r1 - 1e-9,
        s"recall fell from $r1 (beam=$b1) to $r2 (beam=$b2)")
    }
    // the widest beam must actually find something
    assert(pts.last._2 > 0.0)
  }

  test("nprobe tuning curve: recall is monotone non-decreasing in probes") {
    val pts = SimilarityOps.annProbeCurve(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("recall")).sortBy(_._1)
    assert(pts.map(_._1).toSeq === SimilarityOps.ProbeCurve,
      "curve points missing")
    pts.sliding(2).foreach { case Array((p1, r1), (p2, r2)) =>
      assert(r2 >= r1 - 1e-9,
        s"recall fell from $r1 (nprobe=$p1) to $r2 (nprobe=$p2)")
    }
  }

  test("cluster profile: conserves the corpus, coherence and dominance sane") {
    val prof = SimilarityOps.clusterProfile(spark, sfDir).collect()
    val corpus = Tables.load(spark, sfDir, "embeddings").count()
    // every embedding lands in exactly one profiled cluster
    assert(prof.map(_.getAs[Long]("n_docs")).sum === corpus,
      "cluster sizes do not sum to the corpus")
    prof.foreach { r =>
      val coh = r.getAs[Double]("mean_coherence")
      assert(coh >= -1.0 - 1e-9 && coh <= 1.0 + 1e-9,
        s"coherence $coh outside [-1,1]")
      val q = r.getAs[Double]("mean_quality")
      assert(q > 0.0 && q <= 1.0 + 1e-9, s"mean quality $q out of range")
      assert(r.getAs[Long]("top_source_docs") <= r.getAs[Long]("n_docs"),
        "dominant source larger than its cluster")
    }
  }

  test("anchor spine: constant fan-in, one parent per node, tree to the entry, loud capacity guard") {
    import spark.implicits._
    val F = SimilarityOps.HnswFanCap
    val D = SimilarityOps.HnswAnchorLevels
    // skewed synthetic buckets: one at the capacity edge (F^(D+1) =
    // 512), one mid, one tiny, one singleton
    val nodes = (0L until 500L).map(i => (i, 0)) ++
      (1000L until 1300L).map(i => (i, 1)) ++
      (2000L until 2012L).map(i => (i, 2)) ++ Seq((3000L, 3))
    val b = nodes.toDF("vec_id", "bucket")
    val spine = SimilarityOps.anchorSpine(b.select("vec_id"), b)
      .localCheckpoint()
    // 1. fan-in bounded by a CONSTANT independent of bucket size:
    // ≤ (levels+1)·(cap−1) group children + one apex edge per bucket
    val bound = (D + 1) * (F - 1) + 4
    val maxIn = spine.groupBy("dst").count()
      .agg(max("count")).head().getLong(0)
    assert(maxIn <= bound, s"spine fan-in $maxIn exceeds $bound")
    // the old one-hub spine hung all ~499 bucket members off one
    // anchor; the hierarchy never comes near bucket size
    assert(maxIn < 100, s"fan-in $maxIn is bucket-scale, not capped")
    // 2. the spine is a tree: every node except the entry has exactly
    // one parent edge, and following parents reaches the entry in
    // ≤ levels+2 hops (anchor chain → apex → entry)
    assert(spine.groupBy("src").count()
      .filter(col("count") =!= 1).count() === 0)
    assert(spine.select("src").distinct().count() === nodes.size - 1)
    val parent = spine.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    nodes.map(_._1).foreach { n =>
      var cur = n
      var hops = 0
      while (cur != 0L) {
        cur = parent(cur)
        hops += 1
        assert(hops <= D + 2, s"node $n: anchor chain too deep")
      }
    }
    // 3. a bucket past the configured capacity refuses loudly with
    // the fix named, instead of silently re-growing a hot spot
    val over = (0L until 600L).map(i => (i, 0)).toDF("vec_id", "bucket")
    val ex = intercept[IllegalArgumentException] {
      SimilarityOps.anchorSpine(over.select("vec_id"), over)
    }
    assert(ex.getMessage.contains("HnswAnchorLevels"))
  }
}
