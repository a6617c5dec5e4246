package graft

import graft.sources.{BigFormat, SSTableComponents}
import org.scalatest.funsuite.AnyFunSuite

/** Per-range sampled key estimates (`NoTTLReader.estimatedKeysForRanges`
  * / `getSampleIndexesForRanges`, `NoTTLReader.java:1289-1366`) and
  * in-place summary downsampling — both off Summary.db alone. */
class RangeEstimateSpec extends AnyFunSuite {

  // 1000 keys in token (ring) order — what a real generation's index
  // and summary are sorted by
  private val ring: Vector[Array[Byte]] =
    (0 until 1000).map(i => s"k$i".getBytes("UTF-8")).toVector
      .sortBy(k => BigFormat.murmur3Token(k))
  private def tok(rank: Int): Long = BigFormat.murmur3Token(ring(rank))

  private val indexBytes = SSTableComponents.writeIndex(
    ring.zipWithIndex.map { case (k, i) =>
      (k, i.toLong, Array.emptyByteArray) })

  private def rebuilt(interval: Int): SSTableComponents.Summary =
    SSTableComponents.rebuildSummary(indexBytes, oldEra = false,
      "spec", interval)

  test("range estimates: exact on mark-aligned ranges, within ±interval " +
    "on arbitrary ones, ≥ 1 always") {
    val s = rebuilt(8)
    assert(s.sampled.size === 125)
    // full ring: Cassandra's (x, x] means EVERYTHING
    assert(SSTableComponents.estimatedKeysForRanges(
      s, Seq((tok(500), tok(500)))) === 1000L)
    // an interior span [rank 100, rank 299] — 200 keys; the mark
    // count × 8 estimate must land within one interval of it
    val est = SSTableComponents.estimatedKeysForRanges(
      s, Seq((tok(99), tok(299)))) // start-exclusive: > t99, <= t299
    assert(math.abs(est - 200L) <= 8L, s"est=$est")
    // start-exclusivity pinned at mark resolution: (t100, t101]
    // holds one key but at most the one mark
    val tiny = SSTableComponents.estimatedKeysForRanges(
      s, Seq((tok(100), tok(101))))
    assert(tiny === (if (101 % 8 == 0) 8L else 1L))
    // the reference's floor: a mark-free range still estimates 1
    assert(SSTableComponents.estimatedKeysForRanges(
      s, Seq((tok(104), tok(105) - 1))) === 1L)
  }

  test("wrap-around ranges unwrap into both ring tails") {
    val s = rebuilt(8)
    // (t900, t99]: ranks 901..999 and 0..99 — 199 keys
    val marks = (901 to 999).count(_ % 8 == 0) + (0 to 99).count(_ % 8 == 0)
    assert(SSTableComponents.estimatedKeysForRanges(
      s, Seq((tok(900), tok(99)))) === marks * 8L)
    // tiling: a range and its wrap complement cover every mark once
    val a = SSTableComponents.sampleIndexesForRanges(
      s, Seq((tok(300), tok(700))))
    val b = SSTableComponents.sampleIndexesForRanges(
      s, Seq((tok(700), tok(300))))
    val covered = (a ++ b).flatMap { case (l, r) => l to r }
    assert(covered.sorted === (0 until s.sampled.size).toVector)
    // getKeySamples: the mark keys themselves, exactly those whose
    // ring position lies inside the (start-exclusive) range
    val samples = SSTableComponents.keySamples(
      s, Seq((tok(300), tok(700)))).toSeq
    val expected = s.sampled.map(_._1).filter { k =>
      val t = BigFormat.murmur3Token(k)
      t > tok(300) && t <= tok(700)
    }
    assert(samples.size === expected.size)
    samples.zip(expected).foreach { case (g, e) =>
      assert(java.util.Arrays.equals(g, e)) }
  }

  test("resampleSummary takes the reference's decision tree: coarser " +
    "in place (index NEVER opened), finer via streamed rebuild, " +
    "equal refused") {
    val fine = rebuilt(8)
    // coarser: the by-name index thunk must never be forced
    val down = SSTableComponents.resampleSummary(fine, 32,
      sys.error("the downsample branch must not open the index"),
      oldEra = false, "spec")
    assert(down.minIndexInterval === 32)
    assert(down.sampled.size === rebuilt(32).sampled.size)
    // finer (and off-ladder): rebuilds from the stream
    val finer = SSTableComponents.resampleSummary(rebuilt(32), 8,
      new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(indexBytes)),
      oldEra = false, "spec")
    assert(finer.sampled.size === fine.sampled.size)
    // equal: the reference's AssertionError posture
    intercept[IllegalArgumentException] {
      SSTableComponents.resampleSummary(fine, 8,
        sys.error("unused"), oldEra = false, "spec")
    }
  }

  test("redistributeSummaries coarsens the coldest first, respects " +
    "the ladder cap, and stops when the budget holds") {
    import SSTableComponents.redistributeSummaries
    val files = Seq(("a", 16, 2.0), ("b", 16, 3.0),
      ("c", 16, 1.0), ("d", 16, 2.0))
    // roomy budget: nobody coarsens
    assert(redistributeSummaries(files, 64).values.forall(_ == 1))
    // half budget: the traced greedy — c (coldest) to the cap, then
    // the rate-2 pair by size-then-name, b (hottest) untouched
    assert(redistributeSummaries(files, 32) ===
      Map("a" -> 4, "b" -> 1, "c" -> 8, "d" -> 2))
    // impossible budget: everything lands on the cap, loop terminates
    assert(redistributeSummaries(files, 1).values.forall(_ == 8))
    // a larger cold file coarsens before a smaller equally-cold one
    val skewed = Seq(("big", 64, 1.0), ("small", 8, 1.0))
    val f = redistributeSummaries(skewed, 40)
    assert(f("big") === 2 && f("small") === 1)
  }

  test("positionsForRanges: byte spans decode to exactly the member " +
    "partitions — mid ranges, a to-EOF tail, empty and wrap forms") {
    val header = BigFormat.Header(1L, 1, 0, BigFormat.Utf8Type,
      Seq(BigFormat.Utf8Type), Nil, Seq("v" -> BigFormat.Utf8Type))
    val parts = (0 until 200).map(i => BigFormat.PartitionData(
      s"k$i", None, Seq(BigFormat.RowAtom(Seq(Some("c")),
        Some(1000000L), None, None, None,
        Seq(BigFormat.CellAtom("v", 1000000L, None, None,
          Some(s"val$i"), deleted = false))))))
    val (bytes, index) = BigFormat.writeDataFileIndexed(parts, header)
    val keys = index.map(_._1) // ring order, encoded
    def tokAt(i: Int) = BigFormat.murmur3Token(keys(i))
    def spansOf(rs: Seq[(Long, Long)]) =
      SSTableComponents.positionsForRanges(
        index.iterator.map(e => (e._1, e._2)), rs, bytes.length.toLong)
    def decode(span: (Long, Long)): Seq[String] =
      BigFormat.partitions(header, new java.io.ByteArrayInputStream(
        bytes, span._1.toInt, (span._2 - span._1).toInt), "spec")
        .map(_.key).toSeq
    // one interior range and one running to EOF (the
    // uncompressedLength arm) — each span decodes to EXACTLY the
    // member partitions, start-exclusive at the left edge
    val spans = spansOf(Seq((tokAt(20), tokAt(60)),
      (tokAt(150), Long.MaxValue)))
    assert(spans.size === 2)
    assert(spans(1)._2 === bytes.length.toLong)
    assert(decode(spans(0)) ===
      (21 to 60).map(i => new String(keys(i), "UTF-8")))
    assert(decode(spans(1)) ===
      (151 until 200).map(i => new String(keys(i), "UTF-8")))
    // a memberless range contributes nothing (the left==right skip)
    assert(spansOf(Seq((tokAt(10), tokAt(11) - 1))).isEmpty)
    // wrap-around unwraps into head + tail spans that together hold
    // every partition outside the interior complement
    val wrap = spansOf(Seq((tokAt(150), tokAt(20))))
    assert(wrap.size === 2)
    // spans come back in BYTE order: the ring's head tail first
    assert(wrap.flatMap(decode) ===
      ((0 to 20) ++ (151 until 200)).map(i =>
        new String(keys(i), "UTF-8")))
    // overlapping un-normalized input refuses loudly
    intercept[IllegalArgumentException] {
      spansOf(Seq((tokAt(10), tokAt(50)), (tokAt(40), tokAt(60))))
    }
  }

  test("firstKeyBeyond: summary-guided bounded index probe, " +
    "strictly-beyond semantics, None past the last key") {
    val s = rebuilt(8)
    def openAt(off: Long) = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(indexBytes, off.toInt,
        indexBytes.length - off.toInt))
    def probe(t: Long): Option[Seq[Byte]] =
      SSTableComponents.firstKeyBeyond(s, t, oldEra = false,
        "spec", openAt).map(_.toSeq)
    for (k <- Seq(0, 7, 8, 500, 998))
      assert(probe(tok(k)) === Some(ring(k + 1).toSeq), s"rank $k")
    // a bound BETWEEN two ring positions: strictly-beyond returns
    // the upper neighbor
    assert(probe(tok(42) - 1) === Some(ring(42).toSeq))
    assert(probe(tok(999)) === None)
    assert(probe(Long.MinValue) === Some(ring(0).toSeq))
  }

  test("in-place downsampling equals a full rebuild at the coarser " +
    "interval — marks, positions, size and round-trip, no index IO") {
    val fine = rebuilt(8)
    val down = SSTableComponents.downsampleSummary(fine, 4)
    val coarse = rebuilt(32)
    assert(down.minIndexInterval === 32)
    assert(down.sampled.size === coarse.sampled.size)
    down.sampled.zip(coarse.sampled).foreach { case ((dk, dp), (ck, cp)) =>
      assert(java.util.Arrays.equals(dk, ck))
      assert(dp === cp, "Index.db positions survive the downsample")
    }
    assert(down.sizeAtFullSampling === coarse.sizeAtFullSampling)
    assert(java.util.Arrays.equals(down.firstKey, coarse.firstKey))
    assert(java.util.Arrays.equals(down.lastKey, coarse.lastKey))
    // identity at factor 1; serialized round-trip keeps serving
    assert(SSTableComponents.downsampleSummary(fine, 1) eq fine)
    val rt = SSTableComponents.readSummary(SSTableComponents.writeSummary(
      down.sampled, down.sizeAtFullSampling.toLong * down.minIndexInterval,
      down.firstKey, down.lastKey, down.minIndexInterval))
    assert(rt.sampled.size === down.sampled.size)
    assert(rt.minIndexInterval === 32)
    // estimates off the downsampled summary widen by exactly the factor
    val est = SSTableComponents.estimatedKeysForRanges(
      rt, Seq((tok(99), tok(299))))
    assert(math.abs(est - 200L) <= 32L, s"est=$est")
  }
}
