package graft

import graft.ops.CorpusOps
import org.apache.spark.sql.functions._

/** Invariants of corpus assembly that hold for ANY corpus — the oracle
  * proves engine agreement on the fixture; these prove the semantics.
  */
class CorpusOpsSpec extends SparkSpec {

  test("sourceMix keeps a deterministic subset and drops unlisted sources") {
    val docs = Tables.load(spark, sfDir, "documents")
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    val kept = CorpusOps.sourceMix(docs, rates)
    // rate 1.0 keeps everything (coin is strictly below 1), 0.0 nothing,
    // unlisted sources never pass
    val src0 = docs.filter(col("source") === "src0").count()
    assert(kept.filter(col("source") === "src0").count() === src0)
    assert(kept.filter(col("source") === "src2").count() === 0L)
    assert(kept.filter(!col("source").isin("src0", "src1")).count() === 0L)
    // decision is a pure function of doc_id: two runs agree row-for-row
    val a = kept.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = CorpusOps.sourceMix(docs, rates)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("shardWrite bounds every output file and loses no rows") {
    val cap = 7
    val m = CorpusOps.shardWrite(spark, sfDir, nShards = 4,
      maxRecordsPerFile = cap).collect()
    val total = Tables.load(spark, sfDir, "documents").count()
    assert(m.map(_.getLong(1)).sum === total, "manifest loses rows")
    for (r <- m) {
      val (docs, files) = (r.getLong(1), r.getLong(2))
      assert(files === (docs + cap - 1) / cap,
        s"shard ${r.getLong(0)}: $files files for $docs docs at cap $cap")
    }
  }

  test("datasetCard accounts every doc once and bounds quality stats") {
    val docs = Tables.load(spark, sfDir, "documents")
    val card = CorpusOps.datasetCard(spark, sfDir).collect()
    // one row per source; doc counts partition the corpus exactly
    assert(card.map(_.getString(0)).distinct.length === card.length)
    assert(card.map(_.getLong(1)).sum === docs.count())
    val langs = docs.select("lang").distinct().count()
    for (r <- card) {
      val (mean, p50) = (r.getDouble(4), r.getDouble(5))
      assert(mean >= 0.0 && mean <= 1.0, s"${r.getString(0)}: mean $mean")
      assert(p50 >= 0.0 && p50 <= 1.0, s"${r.getString(0)}: p50 $p50")
      assert(r.getLong(2) > 0 && r.getLong(3) > 0, "empty volume")
      assert(r.getLong(6) >= 1 && r.getLong(6) <= langs)
    }
  }

  test("chunk covers every token with the declared overlap, tail kept") {
    val (w, s) = (64, 48)
    val docs = Tables.load(spark, sfDir, "documents")
    val chunks = CorpusOps.chunkAudit(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    val nToks = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet === nToks.keySet, "a document lost all chunks")
    for ((doc, rows) <- chunks) {
      val n = nToks(doc)
      val byId = rows.sortBy(_.getLong(2))
      // exactly ceil(n / stride) windows: ids 0..k-1, starts 0,s,2s,…<n
      assert(byId.map(_.getLong(2)).sameElements(
        0L until ((n + s - 1) / s).toLong), s"doc $doc: chunk ids")
      // every chunk holds min(window, n - start) tokens — full
      // coverage with w-s tokens of overlap at each seam, short tail
      // preserved
      for (r <- byId) {
        val start = r.getLong(2).toInt * s
        assert(r.getInt(3) === math.min(w, n - start),
          s"doc $doc chunk ${r.getLong(2)}: size")
      }
    }
  }

  test("versionDiff accounts both versions exactly, and is zero on self") {
    val docs = Tables.load(spark, sfDir, "documents")
    val m = CorpusOps.versionDiffAudit(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // conservation: removed+changed+unchanged = |v1|,
    //               added+changed+unchanged  = |v2|, per source
    val v1 = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, (add, rem, chg, same)) <- m) {
      assert(rem + chg + same === v1(src), s"$src: v1 not conserved")
      val expAdd = docs.filter(col("source") === src &&
        col("doc_id") % 3 === 0).count()
      assert(add === expAdd, s"$src: added $add != clones $expAdd")
    }
    // diffing a corpus against itself is all-unchanged
    val self = CorpusOps.versionDiff(docs, docs).collect()
    for (r <- self) {
      assert(r.getLong(1) === 0 && r.getLong(2) === 0 && r.getLong(3) === 0,
        s"${r.getString(0)}: self-diff not clean")
    }
    assert(self.map(_.getLong(4)).sum === docs.count())
  }

  test("upsample replicates by floor(epochs) plus a coin-gated extra") {
    val docs = Tables.load(spark, sfDir, "documents")
    val epochs = Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 1.5)
    val up = CorpusOps.upsample(docs, epochs)
    val perDoc = up.groupBy("source", "doc_id")
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // integer epochs: exactly that many copies, no coin involved
    val src0 = docs.filter(col("source") === "src0").count()
    assert(perDoc.count(_._1._1 == "src0") === src0)
    assert(perDoc.filter(_._1._1 == "src0").values.forall(_ == 2L))
    // fractional: every doc has floor or floor+1 copies, and the
    // fractional tail is strictly between none and all
    val c2 = perDoc.filter(_._1._1 == "src2").values
    assert(c2.forall(n => n == 1L || n == 2L))
    assert(c2.exists(_ == 2L) && c2.exists(_ == 1L))
    // replicas are dense 0..n-1 per doc (downstream keys stay unique)
    val reps = up.filter(col("source") === "src2")
      .groupBy("doc_id").agg(
        org.apache.spark.sql.functions.sort_array(
          org.apache.spark.sql.functions.collect_list("replica")).as("r"))
      .collect()
    for (r <- reps) {
      val s = r.getSeq[Int](1)
      assert(s === (0 until s.length), s"replicas not dense: $s")
    }
    // unlisted sources are dropped; rerun is identical
    assert(perDoc.keys.map(_._1).toSet === Set("src0", "src1", "src2"))
    val again = CorpusOps.upsample(docs, epochs).groupBy("source", "doc_id")
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again === perDoc)
  }

  test("evalSplit partitions the corpus and decorrelates from the mix coin") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CorpusOps.evalSplit(spark, sfDir).collect()
    // the three splits partition every source exactly
    assert(out.map(_.getLong(2)).sum === docs.count())
    assert(out.map(_.getString(1)).distinct.toSet.subsetOf(
      Set("train", "val", "test")))
    // global fractions near 80/10/10 (coin is uniform; fixture-exact
    // values are pinned by the oracle, this pins the semantics)
    val bySplit = out.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val n = docs.count().toDouble
    assert(math.abs(bySplit("train") / n - 0.8) < 0.1)
    // decorrelation: the docs an 0.8-rate mix keeps must NOT all be
    // train — an unsalted coin would nest the thresholds perfectly
    // and empty val/test after mixing
    val kept = CorpusOps.sourceMix(docs,
      docs.select("source").distinct().collect()
        .map(_.getString(0) -> 0.8).toMap)
    val coin = CorpusOps.hashCoin(
      concat(col("doc_id").cast("string"), lit(":split")))
    val keptSplits = kept
      .select(when(coin < 0.8, "train").when(coin < 0.9, "val")
        .otherwise("test").as("split"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptSplits.getOrElse("val", 0L) > 0 &&
      keptSplits.getOrElse("test", 0L) > 0,
      s"mix-then-split starved an eval split: $keptSplits")
  }

  test("globalShuffle is a bijection with contiguous per-shard positions") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CorpusOps.globalShuffle(spark, sfDir).collect()
    // every doc appears exactly once
    assert(out.map(_.getLong(2)).distinct.length === docs.count())
    // positions within each shard are exactly 1..n (no gap, no dup)
    for ((shard, rows) <- out.groupBy(_.getString(0))) {
      val ps = rows.map(_.getInt(1)).sorted
      assert(ps.sameElements(1 to rows.length),
        s"shard $shard positions not contiguous")
    }
    // pure function of doc_id: a rerun lands every doc at the same slot
    val again = CorpusOps.globalShuffle(spark, sfDir).collect()
      .map(r => r.getLong(2) -> (r.getString(0), r.getInt(1))).toMap
    for (r <- out)
      assert(again(r.getLong(2)) === (r.getString(0), r.getInt(1)))
    // wider sharding (the production knob): still a bijection, shards
    // widen to 2 hex chars, and 1-digit shards are prefixes of 2-digit
    val wide = CorpusOps.globalShuffle(spark, sfDir, hexDigits = 2)
      .collect()
    assert(wide.map(_.getLong(2)).distinct.length === out.length)
    val narrowShard = out.map(r => r.getLong(2) -> r.getString(0)).toMap
    for (r <- wide) {
      assert(r.getString(0).length === 2)
      assert(r.getString(0).startsWith(narrowShard(r.getLong(2))))
    }
  }

  test("adaptiveQualityGate keeps the top quantile of every source") {
    val out = CorpusOps.adaptiveQualityGate(spark, sfDir, p = 0.25).collect()
    val sources = Tables.load(spark, sfDir, "documents")
      .select("source").distinct().count()
    assert(out.length === sources, "a source vanished from the audit")
    for (r <- out) {
      val (thr, total, kept, meanQ) =
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      // p=0.25 keeps ~75%: the exact-percentile floor is ceil(0.75 n),
      // minus a small allowance for docs inside the threshold's
      // round-4 window (rounding the cut up can exclude boundary docs
      // whose q sits within 5e-5 below it)
      assert(kept >= (3 * total + 3) / 4 - 2,
        s"${r.getString(0)}: kept $kept of $total at p25")
      assert(kept <= total)
      // survivors can't average below the bar they cleared
      assert(meanQ >= thr, s"${r.getString(0)}: mean $meanQ < thr $thr")
    }
  }

  test("tokenPack sub-shards a large source by doc_id span") {
    val span = 100L
    val docs = Tables.load(spark, sfDir, "documents")
    val packed = CorpusOps.tokenPack(docs, budget = 128,
      spanSize = Some(span))
    val rows = packed.collect()
    // sub_id is the contiguous doc_id span, and the window is keyed
    // on it: the plan must partition by (source, sub_id), not source
    // alone — that's what unlocks parallelism inside one giant source
    for (r <- rows)
      assert(r.getLong(3) === r.getLong(1) / span,
        s"doc ${r.getLong(1)}: sub ${r.getLong(3)}")
    val p = plan(packed)
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("sub_id")),
      s"window not partitioned by the sub-shard:\n$p")
    // within each (source, span): same contiguous-fill law as the
    // unsharded path — every non-final pack crossed its boundary
    for ((_, g) <- rows.groupBy(r => (r.getString(0), r.getLong(3)))) {
      val byId = g.sortBy(_.getLong(1))
      val cum = byId.map(_.getInt(2).toLong).scanLeft(0L)(_ + _).tail
      byId.map(_.getLong(5)).zip(cum).init.zipWithIndex.foreach {
        case ((pk, c), i) =>
          val nextPk = byId(i + 1).getLong(5)
          if (nextPk != pk)
            assert(c >= (pk + 1) * 128,
              s"pack $pk closed at $c tokens, below ${(pk + 1) * 128}")
      }
    }
  }

  test("tokenPack packs are contiguous and fill to the budget") {
    val budget = 128
    val packs = CorpusOps.tokenPackAudit(spark, sfDir)
      .collect()
      .groupBy(_.getString(0))
    for ((src, rows) <- packs) {
      val byId = rows.map(r => r.getLong(1) -> r.getLong(3)).sortBy(_._1)
      val ids = byId.map(_._1)
      assert(ids.sameElements(ids.indices.map(_.toLong)),
        s"$src: pack ids not contiguous from 0: ${ids.toSeq}")
      // contiguous fill: pack p closes only once cumulative tokens
      // cross (p+1)*budget, so every non-final prefix must have
      // crossed its boundary
      val cum = byId.map(_._2).scanLeft(0L)(_ + _).tail
      cum.init.zipWithIndex.foreach { case (c, p) =>
        assert(c >= (p + 1).toLong * budget,
          s"$src: pack $p closed at $c tokens, below ${(p + 1) * budget}")
      }
    }
  }

  test("temperatureMix: inverse-size epochs, token budget preserved") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val tokIn = docs
      .groupBy(col("source"))
      .agg(sum(size(split(trim(col("text")), "\\s+"))).as("tok_in"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val audit = CorpusOps.temperatureMixAudit(spark, sfDir).collect()
    val epochs = audit.map(r =>
      r.getString(0) -> r.getAs[Double]("epochs")).toMap
    // α=0.5 flattening: epochs strictly anti-monotone in source token
    // mass (smaller sources repeat more), sqrt-exactly e ∝ 1/sqrt(n)
    for (a <- epochs.keys; b <- epochs.keys if tokIn(a) < tokIn(b))
      assert(epochs(a) >= epochs(b) - 1e-9,
        s"$a (${tokIn(a)} tok) got epochs ${epochs(a)} < " +
          s"$b (${tokIn(b)} tok) at ${epochs(b)}")
    // Σ e_s·n_s = Σ n_s (temperature reshapes the mix, not the budget);
    // 6-dp epoch rounding bounds the identity's slack
    val n = tokIn.values.sum.toDouble
    val expected = epochs.map { case (s, e) => e * tokIn(s) }.sum
    assert(math.abs(expected - n) / n < 1e-5,
      s"expected token budget $expected drifted from corpus total $n")
    // realized replication is a per-doc coin around the expectation —
    // loose band, exactness is the oracle's job
    val tokOut = audit.map(_.getAs[Long]("tok_out")).sum.toDouble
    assert(math.abs(tokOut - n) / n < 0.25,
      s"realized tokens $tokOut far from budget $n")
  }
}
