package graft

import com.clearspring.analytics.hash.MurmurHash
import graft.sources.{BigFormat, KeyCardinality, OldFormat,
  SSTableBinaryV2, SSTableMetadata}
import org.scalatest.funsuite.AnyFunSuite

/** The COMPACTION-component HLL++ key-count sketch: hash fidelity,
  * sparse-regime exactness at fixture scales, component framing on
  * both eras, and the reference's estimate/merge/gain/fallback
  * semantics (`NoTTLReader.java:152-264`). */
class KeyCardinalitySpec extends AnyFunSuite {

  private def keys(n: Int, salt: String = ""): Seq[Array[Byte]] =
    (0 until n).map(i => s"$salt$i".getBytes("UTF-8"))

  test("hash2_64 core matches the clearspring MurmurHash64A wherever " +
    "the two published variants agree by construction") {
    // same Appleby algorithm, cross-checked against the INDEPENDENT
    // stream-lib implementation. The ONE deliberate divergence is the
    // tail: Cassandra's MurmurHash SIGN-EXTENDS trailing bytes (the
    // bug-compatible tail Cassandra keeps, same style CASSANDRA-5064
    // documents for its Murmur3) while stream-lib masks with 0xff —
    // identical whenever tail bytes are < 0x80 or the length is a
    // lane multiple, so the cross-check runs there: it validates the
    // lanes, seed mixing and finalizer, leaving only the documented
    // quirk uncovered.
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { i =>
      val fullLanes = i % 2 == 0
      val n = if (fullLanes) rnd.nextInt(6) * 8 else rnd.nextInt(41)
      val b =
        if (fullLanes) Array.fill[Byte](n)(rnd.nextInt().toByte)
        else Array.fill[Byte](n)((rnd.nextInt() & 0x7f).toByte)
      val seed = rnd.nextInt()
      assert(KeyCardinality.hash2_64(b, 0, n, seed.toLong) ===
        MurmurHash.hash64(b, n, seed), s"n=$n seed=$seed full=$fullLanes")
    }
    // the quirk itself, pinned: a high-bit tail byte sign-extends
    // into the xor (what a real Cassandra writes for binary keys)
    val hi = Array[Byte](-1, -2, -3)
    assert(KeyCardinality.hash2_64(hi, 0, 3, 1L) !==
      MurmurHash.hash64(hi, 3, 1))
  }

  test("hash2_64 is offset-correct and deterministic at seed 0") {
    val b = "0123456789abcdef".getBytes("UTF-8")
    val sub = java.util.Arrays.copyOfRange(b, 3, 3 + 9)
    assert(KeyCardinality.hash2_64(b, 3, 9, 0L) ===
      KeyCardinality.hash2_64(sub, 0, 9, 0L))
  }

  test("the (13,25) sketch stays sparse — and therefore EXACT — at " +
    "fixture cardinalities, on both component framings") {
    for (n <- Seq(1, 125, 1250, 5000)) {
      val s = KeyCardinality.sketchOf(keys(n))
      assert(s.cardinality() === n.toLong, s"sparse estimate at n=$n")
      val modern = KeyCardinality.readComponent(
        KeyCardinality.writeComponent(s), oldEra = false)
      val old = KeyCardinality.readComponent(
        KeyCardinality.writeComponent2x(s, ancestors = Seq(1, 2)),
        oldEra = true)
      assert(modern.map(_.cardinality()) === Some(n.toLong))
      assert(old.map(_.cardinality()) === Some(n.toLong))
    }
  }

  test("the 2.x ancestor lineage reads back beside the sketch — " +
    "empty is a real value, corrupt framing degrades to None") {
    val s = KeyCardinality.sketchOf(keys(20))
    assert(KeyCardinality.readAncestors(
      KeyCardinality.writeComponent2x(s, ancestors = Seq(4, 5, 9)))
      === Some(Seq(4, 5, 9)))
    assert(KeyCardinality.readAncestors(
      KeyCardinality.writeComponent2x(s)) === Some(Nil))
    assert(KeyCardinality.readAncestors(Array[Byte](0, 0)).isEmpty)
    // a declared count far past the body flags, never allocates
    assert(KeyCardinality.readAncestors(
      Array[Byte](0x7f, -1, -1, -1, 0, 0, 0, 0)).isEmpty)
  }

  test("estimates stay inside the HLL++ error bound far past the " +
    "sparse regime") {
    val n = 200000
    val est = KeyCardinality.sketchOf(keys(n)).cardinality()
    // 4×rsd for p=13 — the same gate the inventory's audit mode holds
    assert(math.abs(est - n) <= 4 * 0.0115 * n, s"est=$est")
  }

  test("corrupt component bytes degrade to None, never throw") {
    val good = KeyCardinality.writeComponent(
      KeyCardinality.sketchOf(keys(10)))
    assert(KeyCardinality.readComponent(
      good.take(3), oldEra = false).isEmpty)
    val lying = good.clone()
    lying(0) = 0x7f.toByte // declared length far past the body
    assert(KeyCardinality.readComponent(lying, oldEra = false).isEmpty)
    assert(KeyCardinality.readComponent(
      Array.fill[Byte](16)(-1), oldEra = true).isEmpty)
  }

  test("approximateKeyCount merges when every file has a sketch, " +
    "falls back to summary sums (seeded -1, the reference's quirk) " +
    "when any lacks one") {
    val a = KeyCardinality.sketchOf(keys(100))
    val b = KeyCardinality.sketchOf(keys(100)) // identical key set
    val c = KeyCardinality.sketchOf(keys(50, salt = "x"))
    // all sketched: merged distinct count — duplicates collapse
    assert(KeyCardinality.approximateKeyCount(
      Seq((Some(a), 128L), (Some(b), 128L), (Some(c), 128L))) === 150L)
    // one sketchless file demotes the WHOLE answer to summary sums,
    // seeded from -1 exactly as NoTTLReader.java:154,211-214 does
    assert(KeyCardinality.approximateKeyCount(
      Seq((Some(a), 128L), (None, 128L), (Some(c), 128L))) === 383L)
    assert(KeyCardinality.approximateKeyCount(Nil) === -1L)
  }

  test("compactionGain: identical sets keep half; disjoint sets keep " +
    "all; empty contributes 1.0") {
    val a = KeyCardinality.sketchOf(keys(100))
    val b = KeyCardinality.sketchOf(keys(100))
    val c = KeyCardinality.sketchOf(keys(100, salt = "y"))
    assert(KeyCardinality.compactionGain(Seq(a, b)) === 0.5)
    assert(KeyCardinality.compactionGain(Seq(a, c)) === 1.0)
    assert(KeyCardinality.compactionGain(Nil) === 1.0)
  }

  test("both Statistics.db containers round-trip the COMPACTION " +
    "component next to their other components") {
    val sketch = KeyCardinality.sketchOf(keys(77))
    val comp3 = KeyCardinality.writeComponent(sketch)
    val header = BigFormat.Header(1L, 2, 3, BigFormat.Utf8Type,
      Seq(BigFormat.Utf8Type), Nil, Seq("v" -> BigFormat.Utf8Type))
    for (version <- Seq("nb", "me")) {
      val checksummed = BigFormat.versionHasMetadataChecksum(version)
      val bytes = BigFormat.writeStats(header, version,
        compaction = Some(comp3))
      // the header component is untouched by the added sibling
      assert(BigFormat.readStats(bytes, checksummed).minTimestampUs === 1L)
      val got = BigFormat.readCompaction(bytes, checksummed)
        .flatMap(KeyCardinality.readComponent(_, oldEra = false))
      assert(got.map(_.cardinality()) === Some(77L))
      // a sketchless file reads None, not a throw
      assert(BigFormat.readCompaction(
        BigFormat.writeStats(header, version), checksummed).isEmpty)
    }
    val s2x = OldFormat.Stats2x(1L, 2L, 3, 0, 0L)
    val bytes2x = OldFormat.writeStats2x(s2x, 10L,
      compaction = Some(KeyCardinality.writeComponent2x(sketch)))
    assert(OldFormat.readStats2x(bytes2x, "t").minTimestampUs === 1L)
    val got2x = OldFormat.readCompaction2x(bytes2x, "t")
      .flatMap(KeyCardinality.readComponent(_, oldEra = true))
    assert(got2x.map(_.cardinality()) === Some(77L))
    assert(OldFormat.readCompaction2x(
      OldFormat.writeStats2x(s2x, 10L), "t").isEmpty)
  }
}

/** The sketch through the LAKE: inventory rows keep serving key-count
  * estimates after Index.db is gone. */
class KeyCardinalityLakeSpec extends SparkSpec {

  test("with every Index.db deleted, est_keys_hll is the count left " +
    "standing — and it equals the exact count the index would have " +
    "given (sparse regime)") {
    val in = SSTableBinaryV2.binaryFixtureShared(spark, sfDir)
    val frame = SSTableBinaryV2.readBinary(spark, in)
    val out = graft.Scratch.dir("graft-hll-lost-")
    try {
      SSTableBinaryV2.writeSSTables(frame, out.toString,
        "graft", "documents")
      val dir = out.resolve("graft").resolve("documents")
      val before = SSTableMetadata
        .describe(spark, dir.toString).collect()
      assert(before.forall(r => !r.isNullAt(r.fieldIndex("est_keys_hll"))))
      val exactByFile = before.map(r =>
        r.getString(r.fieldIndex("sstable")) ->
          r.getLong(r.fieldIndex("n_partitions"))).toMap
      val ls = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala
          .filter(_.getFileName.toString.endsWith("-Index.db"))
          .toSeq.foreach { f =>
            java.nio.file.Files.delete(f)
            java.nio.file.Files.deleteIfExists(
              f.getParent.resolve("." + f.getFileName + ".crc"))
          }
      } finally ls.close()
      val after = SSTableMetadata.describe(spark, dir.toString).collect()
      after.foreach { r =>
        assert(r.isNullAt(r.fieldIndex("n_partitions")),
          "no Index.db, no exact count")
        val est = r.getLong(r.fieldIndex("est_keys_hll"))
        assert(est === exactByFile(r.getString(r.fieldIndex("sstable"))),
          "the sketch serves what the index would have counted")
      }
      // the next rung down the degradation ladder: strip the
      // COMPACTION component too (the CASSANDRA-10676 file shape) —
      // est_keys_hll goes honestly NULL while the summary bound keeps
      // serving; nothing throws
      val ls2 = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        ls2.iterator().asScala
          .filter(_.getFileName.toString.endsWith("-Statistics.db"))
          .toSeq.foreach { f =>
            val header = graft.sources.BigFormat.readStats(
              java.nio.file.Files.readAllBytes(f))
            java.nio.file.Files.write(f,
              graft.sources.BigFormat.writeStats(header))
            java.nio.file.Files.deleteIfExists(
              f.getParent.resolve("." + f.getFileName + ".crc"))
          }
      } finally ls2.close()
      val bare = SSTableMetadata.describe(spark, dir.toString).collect()
      bare.foreach { r =>
        assert(r.isNullAt(r.fieldIndex("est_keys_hll")),
          "no COMPACTION component, no sketch estimate")
        assert(!r.isNullAt(r.fieldIndex("est_keys_max")),
          "the summary bound is the count of last resort")
      }
    } finally graft.Scratch.delete(out)
  }
}
