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
