package graft

import graft.sources.{SSTableBinaryV2, SSTableComponents, SSTableMetadata}
import org.apache.spark.sql.functions._

/** The pre-3.0 Summary.db in its LITERAL form — the read the
  * reference performs at open (`NoTTLReader.loadSummary`,
  * `NoTTLReader.java:766-814`; written back by `saveSummary`,
  * `:886-911`): layout roundtrip, equivalence with the Index.db
  * rebuild, the corrupted-summary degrade, and the payoff — a 2.x
  * generation now serves summary economics (token-span elision)
  * without its Index.db. */
class Summary2xSpec extends SparkSpec {

  private def keys(n: Int): Seq[(Array[Byte], Long)] =
    (0 until n).map(i => (f"key$i%04d".getBytes("UTF-8"), i * 100L))

  test("2.x summary layout roundtrips: marks, positions, bounds, " +
    "full-sampling size; downsampled levels and mmap bounds parse; " +
    "the missing pre-10357 magic is tolerated") {
    val sampled = keys(2000).zipWithIndex.collect {
      case (e, i) if i % 128 == 0 => e
    }
    val first = keys(1).head._1
    val last = f"key${1999}%04d".getBytes("UTF-8")
    val bytes = SSTableComponents.writeSummary2x(
      sampled, 2000L, first, last)
    val s = SSTableComponents.readSummary2x(bytes)
    assert(s.minIndexInterval === 128)
    assert(s.sizeAtFullSampling === 16) // ceil(2000/128)
    assert(s.sampled.map(_._2) === sampled.map(_._2))
    assert(s.sampled.map(e => new String(e._1, "UTF-8")) ===
      sampled.map(e => new String(e._1, "UTF-8")))
    assert(new String(s.firstKey, "UTF-8") === "key0000")
    assert(new String(s.lastKey, "UTF-8") === "key1999")
    // a downsampled summary (samplingLevel < 128) parses — the marks
    // stand on their own
    val down = SSTableComponents.readSummary2x(
      SSTableComponents.writeSummary2x(sampled.take(8), 2000L,
        first, last, samplingLevel = 64))
    assert(down.sampled.size === 8)
    // truncate the trailing magic: pre-CASSANDRA-10357 files lack it
    assert(SSTableComponents.readSummary2x(
      bytes.dropRight(4)).sampled.size === s.sampled.size)
    // an mmap-mode builder appends boundary arrays after the mode
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(bytes.dropRight(4 + 2 * ("standard".length + 2)))
    out.writeUTF("mmap"); out.writeInt(2)
    out.writeLong(0L); out.writeLong(4096L)
    out.writeUTF("standard")
    out.flush()
    assert(SSTableComponents.readSummary2x(bos.toByteArray)
      .sampled.size === s.sampled.size)
    // garbage refuses (and the caller's fallback is the rebuild)
    assertThrows[Exception](SSTableComponents.readSummary2x(
      Array.fill[Byte](24)(0x7f)))
  }

  test("the fixture's written 2.x summary equals the Index.db " +
    "rebuild mark-for-mark") {
    val ka = SSTableBinaryV2.writeOldFixture(spark, sfDir)
    try {
      import scala.jdk.CollectionConverters._
      val dir = ka.resolve("documents")
      val gens = java.nio.file.Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith("-Summary.db")).toSeq.sorted
      assert(gens.size === 4)
      gens.foreach { sName =>
        val base = sName.stripSuffix("-Summary.db")
        val parsed = SSTableComponents.readSummary2x(
          java.nio.file.Files.readAllBytes(dir.resolve(sName)))
        val rebuilt = SSTableComponents.rebuildSummary(
          java.nio.file.Files.readAllBytes(
            dir.resolve(base + "-Index.db")),
          oldEra = true, base)
        assert(parsed.sampled.map(_._2) === rebuilt.sampled.map(_._2),
          s"$base: mark positions diverge")
        assert(parsed.sampled.map(e => new String(e._1, "UTF-8")) ===
          rebuilt.sampled.map(e => new String(e._1, "UTF-8")),
          s"$base: mark keys diverge")
        assert(java.util.Arrays.equals(parsed.firstKey, rebuilt.firstKey))
        assert(java.util.Arrays.equals(parsed.lastKey, rebuilt.lastKey))
        assert(parsed.sizeAtFullSampling === rebuilt.sizeAtFullSampling)
      }
    } finally Scratch.delete(ka)
  }

  test("a 2.x generation with a summary but NO Index.db still " +
    "elides by token span — the parsed summary, not a rebuild, " +
    "serves the gate") {
    val ka = SSTableBinaryV2.writeOldFixture(spark, sfDir)
    try {
      import scala.jdk.CollectionConverters._
      val dir = ka.resolve("documents")
      // deleting every Index.db makes a rebuild IMPOSSIBLE: any
      // remaining summary economics must come from the literal parse
      java.nio.file.Files.list(dir).iterator().asScala.toSeq
        .filter(f => f.getFileName.toString.endsWith("-Index.db") ||
          f.getFileName.toString.contains("-Index.db.crc"))
        .foreach(java.nio.file.Files.delete)
      // the fixture's four generations interleave tokens (doc_id % 4
      // grouping), so their spans overlap — the provable elision
      // claim is a range OUTSIDE every span: the ring minimum's
      // neighborhood, which no real Murmur3 key of the fixture
      // occupies (spans were read from the PARSED summaries; with
      // Index.db gone there is nothing to rebuild from)
      def metricsOf(df: org.apache.spark.sql.DataFrame)
          : Map[String, Long] = {
        df.collect()
        df.queryExecution.executedPlan.collectLeaves().collect {
          case s: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec =>
            s.metrics.view.mapValues(_.value).toMap
        }.head.map { case (k, v) => k -> v.toString.toLong }
      }
      val spans = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(dir).iterator().asScala
          .filter(_.getFileName.toString.endsWith("-Summary.db"))
          .map(f => SSTableComponents.readSummary2x(
            java.nio.file.Files.readAllBytes(f)))
          .map(s => (
            graft.sources.BigFormat.murmur3Token(s.firstKey),
            graft.sources.BigFormat.murmur3Token(s.lastKey)))
          .toSeq
      }
      assert(spans.size === 4)
      val below = spans.map(_._1).min - 1
      require(below > Long.MinValue, "degenerate fixture span")
      val empty = metricsOf(spark.read.format("sstable-big")
        .option("cql", SSTableBinaryV2.Cql2x)
        .option("tokenLo", Long.MinValue.toString)
        .option("tokenHi", below.toString)
        .load(dir.toString))
      assert(empty("filesSkippedTokenSpan") === 4, empty.toString)
      assert(empty("partitionsServed") === 0, empty.toString)
      // and a real probe still serves its rows — elision is exact,
      // not over-aggressive, still with zero Index.db available
      val all = SSTableBinaryV2
        .readBinary(spark, dir.toString, Some(SSTableBinaryV2.Cql2x))
        .select("partition_key").distinct().as[String](
          org.apache.spark.sql.Encoders.STRING).collect()
      val probe = all.head
      val tok = graft.sources.BigFormat.murmur3Token(
        graft.sources.BigFormat.encodeValue(
          graft.sources.BigFormat.Utf8Type, probe))
      val served = spark.read.format("sstable-big")
        .option("cql", SSTableBinaryV2.Cql2x)
        .option("tokenLo", tok.toString)
        .option("tokenHi", tok.toString)
        .load(dir.toString)
        .select("partition_key").distinct()
        .as[String](org.apache.spark.sql.Encoders.STRING).collect()
      assert(served.contains(probe), s"probe $probe lost to elision")
    } finally Scratch.delete(ka)
  }

  test("the inventory serves 2.x summary facts (audit-gated against " +
    "the streamed index) and a corrupt 2.x summary degrades to NULLs") {
    val ka = SSTableBinaryV2.writeOldFixture(spark, sfDir)
    try {
      val dir = ka.resolve("documents")
      // audit mode cross-checks the parsed summary's first/last keys
      // and est_keys_max bound against the streamed Index.db
      val inv = SSTableMetadata.describe(spark, dir.toString,
        audit = true).localCheckpoint()
      assert(inv.count() === 4)
      assert(inv.filter(col("est_keys_max").isNotNull).count() === 4)
      // corrupt one summary: its row degrades, others keep facts
      import scala.jdk.CollectionConverters._
      val one = java.nio.file.Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith("-Summary.db")).toSeq.sorted.head
      java.nio.file.Files.write(dir.resolve(one),
        Array.fill[Byte](16)(0x7f))
      java.nio.file.Files.deleteIfExists(dir.resolve(s".$one.crc"))
      val inv2 = SSTableMetadata.describe(spark, dir.toString)
        .localCheckpoint()
      assert(inv2.filter(col("est_keys_max").isNull).count() === 1)
      assert(inv2.filter(col("est_keys_max").isNotNull).count() === 3)
    } finally Scratch.delete(ka)
  }

  test("describeRange serves per-range SAMPLED key estimates off the " +
    "literal 2.x summary — Index.db deleted, bounds gated against " +
    "exact ranged counts, wrap-around included (era parity with the " +
    "modern-path gates in src_sstable_token_range)") {
    val ka = SSTableBinaryV2.writeOldFixture(spark, sfDir)
    try {
      import scala.jdk.CollectionConverters._
      val dir = ka.resolve("documents")
      // ground truth BEFORE deleting the index: every partition key
      // per generation, token-hashed driver-side
      val byGen = SSTableBinaryV2.readBinary(spark, dir.toString,
        Some(SSTableBinaryV2.Cql2x))
        .select(col("sstable"), col("partition_key")).distinct()
        .collect().map(r => (r.getString(0), r.getString(1)))
        .groupBy(_._1).map { case (g, ks) => g -> ks.map(_._2).toSeq }
      assert(byGen.size === 4)
      def tok(k: String): Long = graft.sources.BigFormat.murmur3Token(
        graft.sources.BigFormat.encodeValue(
          graft.sources.BigFormat.Utf8Type, k))
      val toks = byGen.values.flatten.map(tok).toSeq.sorted
      val (lo, hi) = (toks(toks.size / 4), toks(3 * toks.size / 4))
      // the 2.x summaries must carry the estimate ALONE
      java.nio.file.Files.list(dir).iterator().asScala.toSeq
        .filter(_.getFileName.toString.contains("-Index.db"))
        .foreach(java.nio.file.Files.delete)
      def gate(l: Long, h: Long): Unit = {
        val ests = SSTableMetadata
          .describeRange(spark, dir.toString, l, h)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // a wrap-around range unwraps into TWO mark windows; each
        // window overshoots by at most one interval
        val slack = 128L * (if (l <= h) 1 else 2)
        byGen.foreach { case (g, ks) =>
          val e = ks.count { k =>
            val t = tok(k)
            if (l <= h) t >= l && t <= h else t >= l || t <= h
          }
          val est = ests.getOrElse(g,
            fail(s"$g missing from describeRange: ${ests.keys}"))
          assert(est <= e + slack && est + slack > e && est >= 1,
            s"$g: 2.x per-range estimate $est outside ±$slack of " +
              s"exact $e")
        }
      }
      gate(lo, hi)
      gate(hi + 1, lo - 1) // wrap-around unwrap
    } finally Scratch.delete(ka)
  }
}
