package graft

import graft.sources.{BigFormat, CompressedData, OldFormat,
  SSTableBinaryV2, SSTableMetadata}
import org.apache.spark.sql.functions._

/** The modern-era (3.x/4.x) Statistics.db STATS component — the
  * figures the reference serves off every opened file
  * (`NoTTLReader.getSSTableMetadata`, `NoTTLReader.java:1982`;
  * per-field getters at `:1912-1945,1963,1851,1932`): framing
  * roundtrip on both eras, the total-exact EstimatedHistogram
  * encoding, checksum enforcement, MetadataCollector semantics out
  * of the REAL sink, and sidecar-only serving. */
class StatsMetadataSpec extends SparkSpec {

  private def sampleStats(ratio: Double = -1.0) = BigFormat.StatsModern(
    nPartitions = 10L,
    partitionSizeTotal = 1003L, // deliberately not divisible by 10
    columnCountTotal = 7L,      // fewer cells than partitions
    minTimestampUs = 1609459200000000L,
    maxTimestampUs = 1609459260000000L,
    minLdtS = 1609459300,
    maxLdtS = Int.MaxValue,
    minTtlS = 0,
    maxTtlS = 98,
    compressionRatio = ratio,
    tombstoneDropTime = OldFormat.TombstoneHistogram.of(
      Seq(1609459300.0, 1609459300.0, 1609459350.0)),
    sstableLevel = 2,
    repairedAt = 1700000000000L,
    totalColumnsSet = 7L,
    totalRows = 9L)

  private val header = BigFormat.Header(
    1609459200000000L, 1609459300, 0, BigFormat.Utf8Type,
    Nil, Nil, Seq("v" -> BigFormat.Utf8Type))

  test("STATS component roundtrips on both era framings, exact " +
    "histogram totals included") {
    for (version <- Seq("nb", "me")) {
      val s = sampleStats()
      val bytes = BigFormat.writeStats(header, version,
        stats = Some(s))
      val back = BigFormat.readStatsModern(bytes, version)
        .getOrElse(fail(s"STATS absent (version=$version)"))
      assert(back === s, s"version=$version")
      // the container's other components still parse around it
      assert(BigFormat.readStats(bytes,
        BigFormat.versionHasMetadataChecksum(version)) === header)
    }
  }

  test("histogram encoding reconstructs total AND count exactly for " +
    "every remainder shape") {
    for ((total, count) <- Seq((0L, 0L), (0L, 5L), (5L, 5L),
      (1003L, 10L), (3L, 7L), (1L, 1L), (999999999L, 1234L))) {
      val s = sampleStats().copy(
        nPartitions = count, partitionSizeTotal = total,
        columnCountTotal = total)
      val back = BigFormat.readStatsModern(
        BigFormat.writeStats(header, stats = Some(s)), "nb").get
      assert(back.nPartitions === count, s"($total, $count)")
      assert(back.partitionSizeTotal === total, s"($total, $count)")
      assert(back.columnCountTotal === total, s"($total, $count)")
    }
  }

  test("a Statistics.db without a STATS component reads as None — " +
    "and one WITH it still serves the HLL sketch beside it") {
    val plain = BigFormat.writeStats(header)
    assert(BigFormat.readStatsModern(plain, "nb").isEmpty)
    val sketch = graft.sources.KeyCardinality.sketchOf(
      (0 until 50).map(i => s"k$i".getBytes("UTF-8")))
    val full = BigFormat.writeStats(header,
      compaction =
        Some(graft.sources.KeyCardinality.writeComponent(sketch)),
      stats = Some(sampleStats()))
    assert(BigFormat.readStatsModern(full, "nb").isDefined)
    val comp = BigFormat.readCompaction(full, checksummed = true)
      .getOrElse(fail("COMPACTION component lost beside STATS"))
    assert(graft.sources.KeyCardinality
      .readComponent(comp, oldEra = false).get.cardinality() === 50L)
    assert(BigFormat.readStats(full, checksummed = true) === header)
  }

  test("VALIDATION roundtrips beside the other components and the " +
    "reader refuses a declared foreign partitioner at open") {
    import spark.implicits._
    for (version <- Seq("nb", "me")) {
      val checksummed = BigFormat.versionHasMetadataChecksum(version)
      val bytes = BigFormat.writeStats(header, version,
        stats = Some(sampleStats()),
        validation = Some((BigFormat.Murmur3PartitionerClass, 0.01)))
      assert(BigFormat.readValidation(bytes, checksummed) ===
        Some((BigFormat.Murmur3PartitionerClass, 0.01)))
      assert(BigFormat.readStats(bytes, checksummed) === header)
      assert(BigFormat.readStatsModern(bytes, version).isDefined)
      // absent component → None, not a throw
      assert(BigFormat.readValidation(
        BigFormat.writeStats(header, version), checksummed).isEmpty)
    }
    val wt = 1609459200000000L
    val rows = Seq(("p0", Seq("c"), "ROW", Some("v"),
      Some(("a", wt, None: Option[Int], None: Option[Long])),
      None: Option[Long], "t/nb-1-big-Data.db"))
      .toDF("partition_key", "clustering", "row_kind", "name",
        "cell_t", "deletion_us", "sstable")
      .withColumn("cell", struct(
        col("cell_t._1").as("value"), col("cell_t._2").as("writetime_us"),
        col("cell_t._3").as("ttl_s"), col("cell_t._4").as("expire_us")))
      .drop("cell_t")
    val out = Scratch.dir("graft-valspec-")
    try {
      SSTableBinaryV2.writeSSTables(rows, out.toString, "graft", "t")
      val dir = out.resolve("graft").resolve("t")
      val statsP = dir.resolve("nb-1-big-Statistics.db")
      // a generation written under Murmur3 serves fine
      assert(SSTableBinaryV2.readBinary(spark, dir.toString)
        .count() === 1L)
      // redeclare a foreign ring: the open must refuse, loudly
      val h = BigFormat.readStats(
        java.nio.file.Files.readAllBytes(statsP))
      java.nio.file.Files.write(statsP, BigFormat.writeStats(h,
        validation =
          Some(("org.apache.cassandra.dht.RandomPartitioner", 0.01))))
      java.nio.file.Files.deleteIfExists(
        dir.resolve(".nb-1-big-Statistics.db.crc"))
      val e = intercept[Exception](
        SSTableBinaryV2.readBinary(spark, dir.toString).collect())
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(e).exists(m =>
        m != null && m.contains("RandomPartitioner")), chain(e).toString)
    } finally Scratch.delete(out)
  }

  test("the byte-surgical patch changes ONLY the two fields and the " +
    "component CRC; a truncated VALIDATION degrades instead of " +
    "killing the read; a foreign-ring 2.x file refuses like a " +
    "modern one") {
    import spark.implicits._
    // bit-exactness: every differing byte of the patched container
    // must lie in the level int, the repairedAt long, or the STATS
    // CRC word — anything else would mean the surgery rewrites
    // fields it does not understand
    val orig = BigFormat.writeStats(header,
      compaction = Some(graft.sources.KeyCardinality.writeComponent(
        graft.sources.KeyCardinality.sketchOf(
          (0 until 30).map(i => s"k$i".getBytes("UTF-8"))))),
      stats = Some(sampleStats()),
      validation = Some((BigFormat.Murmur3PartitionerClass, 0.01)))
    val patched = BigFormat.patchStatsFields(orig, checksummed = true,
      Some(7), Some(999L))
    val p = BigFormat.readStatsModern(patched, "nb").get
    assert(p.sstableLevel === 7 && p.repairedAt === 999L)
    assert(p.copy(sstableLevel = 2, repairedAt = 1700000000000L) ===
      sampleStats())
    val diffs = orig.indices.filter(i => orig(i) != patched(i))
    assert(diffs.size <= 4 + 8 + 4, s"stray patched bytes: $diffs")
    // diff bytes form at most three contiguous runs (level,
    // repairedAt, CRC)
    val runs = diffs.foldLeft(List.empty[(Int, Int)]) {
      case ((s0, e0) :: t, i) if i == e0 + 1 => (s0, i) :: t
      case (acc, i) => (i, i) :: acc
    }
    assert(runs.size <= 3, s"diff runs: $runs")
    // a truncated VALIDATION component degrades to None/NULL —
    // never a killed inventory or scan
    val valOff = {
      val bb = java.nio.ByteBuffer.wrap(orig)
      (0 until bb.getInt(0)).map(i =>
        (bb.getInt(8 + 8 * i), bb.getInt(12 + 8 * i)))
        .collectFirst { case (0, off) => off }.get
    }
    val truncated = java.util.Arrays.copyOfRange(orig, 0, valOff + 3)
    assert(scala.util.Try(BigFormat.readValidation(truncated,
      checksummed = true)).toOption.flatten.isEmpty)
    // 2.x open refuses a declared foreign ring exactly like modern
    val ka = Scratch.dir("graft-ka-ring-")
    try {
      val dir = ka.resolve("documents")
      java.nio.file.Files.createDirectories(dir)
      val parts = Seq(graft.sources.OldFormat.Partition2("p0", None,
        Seq(graft.sources.OldFormat.Cell2(Seq("c"), "len",
          1609459200000000L, None, None, Some("x"), deleted = false,
          counter = false))))
      val schema = graft.sources.OldFormat.schemaOfCql(
        graft.model.CqlSchema.parse(SSTableBinaryV2.Cql2x)
          .fold(e => fail(e), identity))
      val (data, index) =
        graft.sources.OldFormat.writeDataFileIndexed(parts, schema)
      def put(n: String, b: Array[Byte]): Unit =
        java.nio.file.Files.write(
          dir.resolve(s"graft-documents-ka-1-$n"), b)
      put("Data.db", data)
      put("Index.db", graft.sources.SSTableComponents.writeIndex2x(index))
      put("Statistics.db", graft.sources.OldFormat.writeStats2x(
        graft.sources.OldFormat.Stats2x(1609459200000000L,
          1609459200000000L, Int.MaxValue, 0, 0L), 1L,
        partitioner = "org.apache.cassandra.dht.RandomPartitioner"))
      val e = intercept[Exception](SSTableBinaryV2.readBinary(spark,
        dir.toString, Some(SSTableBinaryV2.Cql2x)).collect())
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(e).exists(m =>
        m != null && m.contains("RandomPartitioner")), chain(e).toString)
    } finally Scratch.delete(ka)
  }

  test("metadata surgery refuses a root spanning several table " +
    "directories — flat copies of same-named generations must never " +
    "clobber") {
    import spark.implicits._
    val wt = 1609459200000000L
    def frame(tbl: String) = Seq((s"p-$tbl", Seq("c"), "ROW", Some("v"),
      Some(("a", wt, None: Option[Int], None: Option[Long])),
      None: Option[Long], s"$tbl/nb-1-big-Data.db"))
      .toDF("partition_key", "clustering", "row_kind", "name",
        "cell_t", "deletion_us", "sstable")
      .withColumn("cell", struct(
        col("cell_t._1").as("value"), col("cell_t._2").as("writetime_us"),
        col("cell_t._3").as("ttl_s"), col("cell_t._4").as("expire_us")))
      .drop("cell_t")
    val src = Scratch.dir("graft-surgery-multi-")
    val dst = Scratch.dir("graft-surgery-multi-out-")
    try {
      SSTableBinaryV2.writeSSTables(frame("t1"), src.toString,
        "graft", "t1")
      SSTableBinaryV2.writeSSTables(frame("t2"), src.toString,
        "graft", "t2")
      val e = intercept[IllegalArgumentException](
        SSTableMetadata.rewriteMetadata(spark,
          src.resolve("graft").toString, dst.toString, Some(1), None))
      assert(e.getMessage.contains("ONE table directory"), e.getMessage)
    } finally { Scratch.delete(src); Scratch.delete(dst) }
  }

  test("n-series checksum catches a corrupted STATS body") {
    val bytes = BigFormat.writeStats(header,
      stats = Some(sampleStats()))
    // locate the STATS component via the TOC (count, countCRC, then
    // (ordinal, offset) int pairs)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt(0)
    val statsOffset = (0 until n).map(i =>
      (bb.getInt(8 + 8 * i), bb.getInt(12 + 8 * i)))
      .collectFirst { case (ord, off)
        if ord == BigFormat.StatsComponentOrdinal => off }
      .getOrElse(fail("no STATS entry in TOC"))
    val corrupted = bytes.clone()
    corrupted(statsOffset + 40) = (corrupted(statsOffset + 40) ^ 0x5a).toByte
    assertThrows[Exception](
      BigFormat.readStatsModern(corrupted, "nb"))
  }

  test("the STATS tail is version-gated: ma ends at totalRows, mb/mc " +
    "add the commit-log bounds, me/nb carry originatingHostId, na+ " +
    "the pendingRepair session — and a marker of 1 skips the 16-byte " +
    "UUID (CASSANDRA-16619 / the BigVersion feature flags)") {
    val repairSession = new java.util.UUID(0x1122334455667788L, 0x99aabbccddeeff00L)
    val hostId = new java.util.UUID(0xdeadbeefcafef00dL, 0x0123456789abcdefL)
    // each version roundtrips ITS OWN tail subset
    for (version <- Seq("ma", "mb", "mc", "md", "me", "na", "nb")) {
      val s = sampleStats().copy(
        pendingRepair =
          if (BigFormat.versionHasPendingRepair(version))
            Some(repairSession) else None,
        isTransient = BigFormat.versionHasPendingRepair(version),
        originatingHostId =
          if (BigFormat.versionHasOriginatingHostId(version))
            Some(hostId) else None)
      val bytes = BigFormat.writeStats(header, version, stats = Some(s))
      val back = BigFormat.readStatsModern(bytes, version)
        .getOrElse(fail(s"STATS absent (version=$version)"))
      assert(back === s, s"version=$version")
    }
    // the gates themselves, pinned to Cassandra's matrix
    assert(!BigFormat.versionHasCommitLogLowerBound("ma"))
    assert(BigFormat.versionHasCommitLogLowerBound("mb"))
    assert(!BigFormat.versionHasCommitLogIntervals("mb"))
    assert(BigFormat.versionHasCommitLogIntervals("mc"))
    assert(!BigFormat.versionHasPendingRepair("me"))
    assert(BigFormat.versionHasPendingRepair("na"))
    assert(!BigFormat.versionHasOriginatingHostId("md"))
    assert(BigFormat.versionHasOriginatingHostId("me"))
    assert(!BigFormat.versionHasOriginatingHostId("na"))
    assert(BigFormat.versionHasOriginatingHostId("nb"))
    // byte-level: an ma body is strictly shorter than an mc body is
    // strictly shorter than an nb body for the same stats
    def bodyLen(v: String) =
      BigFormat.writeStatsModern(sampleStats(), v).length
    assert(bodyLen("ma") < bodyLen("mb"))
    assert(bodyLen("mb") < bodyLen("mc"))
    assert(bodyLen("mc") < bodyLen("me"))
    assert(bodyLen("me") < bodyLen("nb"))
    // nb with a live pendingRepair session: exactly 16 bytes longer
    assert(BigFormat.writeStatsModern(sampleStats().copy(
      pendingRepair = Some(repairSession)), "nb").length ===
      bodyLen("nb") + 16)
    // a REAL cluster file's commit-log state round-trips: nonzero
    // upper/lower bounds and a non-empty interval set (the fields an
    // offline writer leaves NONE/empty) — version-gated like the rest
    // of the tail, and preserved bit-exact by the byte-surgical patch
    val clStats = sampleStats().copy(
      commitLogUpper = (77L, 4096),
      commitLogLower = (3L, 128),
      commitLogIntervals = Seq(((3L, 128), (5L, 900)),
        ((9L, 0), (77L, 4096))))
    for (version <- Seq("mc", "me", "nb")) {
      val back = BigFormat.readStatsModern(
        BigFormat.writeStats(header, version, stats = Some(clStats)),
        version).get
      assert(back === clStats, s"version=$version")
    }
    // "mb" carries the bounds but not the intervals; "ma" neither
    val mb = BigFormat.readStatsModern(
      BigFormat.writeStats(header, "mb", stats = Some(clStats)), "mb").get
    assert(mb.commitLogLower === ((3L, 128)))
    assert(mb.commitLogIntervals.isEmpty)
    val ma = BigFormat.readStatsModern(
      BigFormat.writeStats(header, "ma", stats = Some(clStats)), "ma").get
    assert(ma.commitLogUpper === ((77L, 4096)))
    assert(ma.commitLogLower === ((-1L, 0)))
    val clBytes = BigFormat.writeStats(header, "nb",
      stats = Some(clStats))
    val clPatched = BigFormat.patchStatsFields(clBytes,
      checksummed = true, Some(5), None)
    val pBack = BigFormat.readStatsModern(clPatched, "nb").get
    assert(pBack.sstableLevel === 5)
    assert(pBack.copy(sstableLevel = clStats.sstableLevel) === clStats,
      "surgery must preserve commit-log intervals bit-exact")
    // the n-series component CRC covers the new tail: flip the
    // originatingHostId presence byte and the checksum must catch it
    val full = BigFormat.writeStats(header, "nb", stats =
      Some(sampleStats().copy(originatingHostId = Some(hostId))))
    assert(BigFormat.readStatsModern(full, "nb").get
      .originatingHostId === Some(hostId))
    val bb = java.nio.ByteBuffer.wrap(full)
    val statsOff = (0 until bb.getInt(0)).map(i =>
      (bb.getInt(8 + 8 * i), bb.getInt(12 + 8 * i)))
      .collectFirst { case (ord, off)
        if ord == BigFormat.StatsComponentOrdinal => off }
      .getOrElse(fail("no STATS entry in TOC"))
    val tailEnd = statsOff + BigFormat.writeStatsModern(
      sampleStats().copy(originatingHostId = Some(hostId)), "nb").length
    val corrupted = full.clone()
    // last byte of the originatingHostId UUID — inside the new tail
    corrupted(tailEnd - 1) = (corrupted(tailEnd - 1) ^ 0x1).toByte
    assertThrows[Exception](BigFormat.readStatsModern(corrupted, "nb"))
  }

  test("the real sink's MetadataCollector pass: live cells pin " +
    "max_deletion at NO_DELETION_TIME, non-expiring cells pin " +
    "min_ttl at 0, and deletions of every granularity count as " +
    "droppable") {
    import spark.implicits._
    val wt = 1609459200L * 1000000L
    // 6 partitions: 2 live rows (one cell each), 1 expiring row
    // (ttl 60, ldt wt/1e6+60), 1 row deletion, 1 partition deletion,
    // 1 pk-liveness-only row
    val rows = Seq(
      ("p0", Seq("c"), "ROW", Some("v"),
        Some(("a", wt, None: Option[Int], None: Option[Long])), None),
      ("p1", Seq("c"), "ROW", Some("v"),
        Some(("b", wt + 1000000L, None: Option[Int],
          None: Option[Long])), None),
      ("p2", Seq("c"), "ROW", Some("v"),
        Some(("c", wt + 2000000L, Some(60),
          Some(wt + 2000000L + 60000000L))), None),
      ("p3", Seq("c"), "ROW_DELETION", None, None, Some(wt + 3000000L)),
      ("p4", Seq.empty[String], "PARTITION_DELETION", None, None,
        Some(wt + 4000000L)),
      ("p5", Seq("c"), "PK_LIVENESS", None,
        Some((null: String, wt + 5000000L, None: Option[Int],
          None: Option[Long])), None))
      .toDF("partition_key", "clustering_s", "row_kind", "name",
        "cell_t", "deletion_us")
      .withColumn("clustering",
        when(col("row_kind") === "PARTITION_DELETION",
          lit(null).cast("array<string>")).otherwise(col("clustering_s")))
      .withColumn("cell", when(col("cell_t").isNotNull, struct(
        col("cell_t._1").as("value"),
        col("cell_t._2").as("writetime_us"),
        col("cell_t._3").as("ttl_s"),
        col("cell_t._4").as("expire_us"))))
      .withColumn("sstable", lit("t/nb-1-big-Data.db"))
      .drop("cell_t", "clustering_s")
    val outPlain = Scratch.dir("graft-statspec-")
    val outLz4 = Scratch.dir("graft-statspeclz4-")
    try {
      SSTableBinaryV2.writeSSTables(rows, outPlain.toString, "graft", "t")
      SSTableBinaryV2.writeSSTables(rows, outLz4.toString, "graft", "t",
        compression = Some(CompressedData.Lz4))
      def statsOf(root: java.nio.file.Path): BigFormat.StatsModern = {
        val p = root.resolve("graft").resolve("t")
          .resolve("nb-1-big-Statistics.db")
        BigFormat.readStatsModern(
          java.nio.file.Files.readAllBytes(p), "nb")
          .getOrElse(fail(s"no STATS in $p"))
      }
      val s = statsOf(outPlain)
      assert(s.nPartitions === 6L)
      assert(s.totalRows === 5L)       // the partition deletion has none
      assert(s.totalColumnsSet === 3L) // three cells
      assert(s.minTimestampUs === wt)
      assert(s.maxTimestampUs === wt + 5000000L)
      assert(s.minTtlS === 0)          // live cells exist
      assert(s.maxTtlS === 60)
      assert(s.maxLdtS === Int.MaxValue) // live cells exist
      // finite deletion times: row del (wt+3s), partition del
      // (wt+4s), expiring cell (wt+2s+60)
      assert(s.minLdtS === (wt / 1000000L + 3).toInt)
      assert(s.tombstoneDropTime.total === 3L)
      assert(s.compressionRatio === -1.0)
      assert(s.sstableLevel === 0 && s.repairedAt === 0L)
      // uncompressed Data.db length IS the partition-size total
      val dataLen = java.nio.file.Files.size(
        outPlain.resolve("graft").resolve("t")
          .resolve("nb-1-big-Data.db"))
      assert(s.partitionSizeTotal === dataLen)
      // the lz4 twin: identical row facts, real compression ratio
      val z = statsOf(outLz4)
      assert(z.copy(compressionRatio = -1.0) === s)
      val zLen = java.nio.file.Files.size(
        outLz4.resolve("graft").resolve("t")
          .resolve("nb-1-big-Data.db"))
      assert(z.compressionRatio === zLen.toDouble / s.partitionSizeTotal)
    } finally {
      Scratch.delete(outPlain); Scratch.delete(outLz4)
    }
  }

  test("metadata surgery: level/repairedAt replaced, everything else " +
    "preserved byte-meaningfully, originals untouched; CLI parse " +
    "rules hold") {
    import spark.implicits._
    // parse rules: both dirs required, transform flags contradict,
    // malformed values refuse with usage errors
    def p(a: String*) = RemoverCli.parse(a.toArray)
    assert(p("--set-level", "2", "--in", "/a").isLeft)
    assert(p("--set-level", "2", "--in", "/a", "--out", "/a").isLeft)
    assert(p("--set-level", "x", "--in", "/a", "--out", "/b").isLeft)
    assert(p("--set-level", "-1", "--in", "/a", "--out", "/b").isLeft)
    assert(p("--set-repaired-at", "soon", "--in", "/a", "--out", "/b")
      .isLeft)
    assert(p("--set-level", "2", "--in", "/a", "--out", "/b",
      "--merge", "lww").isLeft)
    val ok = p("--set-level", "3", "--set-repaired-at", "17",
      "--in", "/a", "--out", "/b")
    assert(ok.exists(a => a.setLevel.contains(3) &&
      a.setRepairedAt.contains(17L)))
    // end-to-end on one generation
    val wt = 1609459200000000L
    val rows = Seq(("p0", Seq("c"), "ROW", Some("v"),
      Some(("a", wt, Some(60), Some(wt + 60000000L))),
      None: Option[Long], "t/nb-1-big-Data.db"))
      .toDF("partition_key", "clustering", "row_kind", "name",
        "cell_t", "deletion_us", "sstable")
      .withColumn("cell", struct(
        col("cell_t._1").as("value"), col("cell_t._2").as("writetime_us"),
        col("cell_t._3").as("ttl_s"), col("cell_t._4").as("expire_us")))
      .drop("cell_t")
    val src = Scratch.dir("graft-surgery-src-")
    val dst = Scratch.dir("graft-surgery-dst-")
    try {
      SSTableBinaryV2.writeSSTables(rows, src.toString, "graft", "t")
      val srcDir = src.resolve("graft").resolve("t")
      val before = java.nio.file.Files.readAllBytes(
        srcDir.resolve("nb-1-big-Statistics.db"))
      val n = SSTableMetadata.rewriteMetadata(spark, srcDir.toString,
        dst.toString, level = Some(4), repairedAt = Some(42L))
      assert(n === 1L)
      // original bytes untouched
      assert(java.util.Arrays.equals(before,
        java.nio.file.Files.readAllBytes(
          srcDir.resolve("nb-1-big-Statistics.db"))))
      val a = BigFormat.readStatsModern(before, "nb").get
      val b = BigFormat.readStatsModern(java.nio.file.Files.readAllBytes(
        dst.resolve("nb-1-big-Statistics.db")), "nb").get
      assert(b.sstableLevel === 4 && b.repairedAt === 42L)
      assert(b.copy(sstableLevel = 0, repairedAt = 0L) === a)
      // header, sketch and validation survive; rows still decode
      assert(SSTableBinaryV2.readBinary(spark, dst.toString)
        .count() === 1L)
      // a generation without a STATS component refuses loudly —
      // silently copying unchanged would lie about the level
      val h = BigFormat.readStats(before)
      java.nio.file.Files.write(
        srcDir.resolve("nb-1-big-Statistics.db"),
        BigFormat.writeStats(h))
      java.nio.file.Files.deleteIfExists(
        srcDir.resolve(".nb-1-big-Statistics.db.crc"))
      assertThrows[Exception](SSTableMetadata.rewriteMetadata(spark,
        srcDir.toString, dst.toString, Some(1), None))
    } finally { Scratch.delete(src); Scratch.delete(dst) }
  }

  test("describeStats serves sidecar-only — Data.db junked — and " +
    "skips generations whose Statistics.db predates the component") {
    import spark.implicits._
    val wt = 1609459200L * 1000000L
    val rows = Seq(
      ("p0", Seq("c"), "ROW", Some("v"),
        Some(("a", wt, None: Option[Int], None: Option[Long])),
        None: Option[Long], "t/nb-1-big-Data.db"),
      ("p1", Seq("c"), "ROW", Some("v"),
        Some(("b", wt, Some(30), Some(wt + 30000000L))),
        None: Option[Long], "t/nb-2-big-Data.db"))
      .toDF("partition_key", "clustering", "row_kind", "name",
        "cell_t", "deletion_us", "sstable")
      .withColumn("cell", struct(
        col("cell_t._1").as("value"),
        col("cell_t._2").as("writetime_us"),
        col("cell_t._3").as("ttl_s"),
        col("cell_t._4").as("expire_us")))
      .drop("cell_t")
    val out = Scratch.dir("graft-statsside-")
    try {
      SSTableBinaryV2.writeSSTables(rows, out.toString, "graft", "t")
      val dir = out.resolve("graft").resolve("t")
      // gen 1: strip the STATS component by rewriting Statistics.db
      // header-only (the pre-round-13 layout); gen 2: junk Data.db
      val oldStats = BigFormat.writeStats(
        BigFormat.readStats(java.nio.file.Files.readAllBytes(
          dir.resolve("nb-1-big-Statistics.db"))),
        "nb")
      java.nio.file.Files.write(
        dir.resolve("nb-1-big-Statistics.db"), oldStats)
      java.nio.file.Files.write(dir.resolve("nb-2-big-Data.db"),
        Array.fill[Byte](8)(0x33))
      // the sink wrote through Hadoop's checksummed local FS — drop
      // the .crc siblings of the files rewritten behind its back
      Seq("nb-1-big-Statistics.db", "nb-2-big-Data.db").foreach(f =>
        java.nio.file.Files.deleteIfExists(dir.resolve(s".$f.crc")))
      val served = SSTableMetadata
        .describeStats(spark, dir.toString).collect()
      assert(served.length === 1) // gen 1 skipped, not thrown
      val r = served.head
      assert(r.getAs[String]("sstable") === "t/nb-2-big-Data.db")
      assert(r.getAs[Int]("min_ttl_s") === 30)
      assert(r.getAs[Int]("max_ttl_s") === 30)
      assert(r.getAs[Long]("total_rows") === 1L)
      assert(r.getAs[Long]("droppable_total") === 1L)
      assert(r.getAs[Int]("max_deletion_s") === (wt / 1000000L + 30).toInt)
    } finally Scratch.delete(out)
  }

  test("min/max clustering-value bounds: non-empty lists round-trip " +
    "the wire on every era, survive the byte-surgical patch, and the " +
    "sink collects them under the TYPED comparator (signed numeric, " +
    "not byte-lexicographic), markers included") {
    import spark.implicits._
    // wire round-trip with designed non-empty lists
    val bounds = sampleStats().copy(
      minClusteringValues = Seq(Seq[Byte](0, 1), Seq[Byte](9)),
      maxClusteringValues = Seq(Seq[Byte](0, 2)))
    for (version <- Seq("ma", "mc", "nb")) {
      val back = BigFormat.readStatsModern(
        BigFormat.writeStats(header, version, stats = Some(bounds)),
        version).getOrElse(fail(s"STATS absent (version=$version)"))
      assert(back === bounds, s"version=$version")
    }
    // the byte-surgical level patch preserves them bit-exact
    val patched = BigFormat.patchStatsFields(
      BigFormat.writeStats(header, "nb", stats = Some(bounds)),
      checksummed = true, Some(7), None)
    val pb = BigFormat.readStatsModern(patched, "nb").get
    assert(pb.sstableLevel === 7)
    assert(pb.copy(sstableLevel = bounds.sstableLevel) === bounds)
    // the sink fold under a declared `ck bigint`: values {3, -5} on
    // rows and a marker pair at {-9, 2} — the signed comparator puts
    // min at -9 and max at 3, while a byte-lexicographic fold would
    // rank -5/-9 (0xFF-leading) ABOVE the positives
    val wt = 1609459200000000L
    val rows = Seq(
      ("p0", Seq("3"), "ROW", Some("v"),
        Some(("a", wt, None: Option[Int], None: Option[Long])),
        None: Option[Long]),
      ("p0", Seq("-5"), "ROW", Some("v"),
        Some(("b", wt + 1L, None: Option[Int], None: Option[Long])),
        None: Option[Long]),
      ("p0", Seq("-9"), "RANGE_TOMBSTONE_BOUND",
        Some("start:inclusive"), None, Some(wt + 2L)),
      ("p0", Seq("2"), "RANGE_TOMBSTONE_BOUND",
        Some("end:inclusive"), None, Some(wt + 2L)))
      .toDF("partition_key", "clustering", "row_kind", "name",
        "cell_t", "deletion_us")
      .withColumn("cell", when(col("cell_t").isNotNull, struct(
        col("cell_t._1").as("value"),
        col("cell_t._2").as("writetime_us"),
        col("cell_t._3").as("ttl_s"),
        col("cell_t._4").as("expire_us"))))
      .withColumn("sstable", lit("t/nb-1-big-Data.db"))
      .drop("cell_t")
    val schema = graft.model.CqlSchema.parse(
      "CREATE TABLE graft.t (pk text, ck bigint, v text, " +
        "PRIMARY KEY (pk, ck))").toOption
    val out = Scratch.dir("graft-clbounds-")
    try {
      SSTableBinaryV2.writeSSTables(rows, out.toString, "graft", "t",
        schema)
      val dir = out.resolve("graft").resolve("t")
      val s = BigFormat.readStatsModern(java.nio.file.Files
        .readAllBytes(dir.resolve("nb-1-big-Statistics.db")), "nb").get
      def long8(v: Long): Seq[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8).putLong(v)
        bb.array().toIndexedSeq
      }
      assert(s.minClusteringValues === Seq(long8(-9L)))
      assert(s.maxClusteringValues === Seq(long8(3L)))
      // the panel renders them under the header's declared type
      val panel = SSTableMetadata.describeStats(spark, dir.toString)
        .collect()
      assert(panel.length === 1)
      assert(panel.head.getAs[String]("min_clustering") === "-9")
      assert(panel.head.getAs[String]("max_clustering") === "3")
    } finally Scratch.delete(out)
  }
}
