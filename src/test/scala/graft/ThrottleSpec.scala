package graft

import graft.sources.{ReadThrottle, SSTableBinaryV2}
import org.apache.spark.sql.functions._

/** S11 in its literal form — the scanner's RateLimiter
  * (`NoTTLReader.getScanner(RateLimiter)` / `openDataReader(limiter)`,
  * `NoTTLReader.java:1791-1794,1987-1991`): pay-forward bucket
  * arithmetic on a virtual clock, byte-exact accounting through the
  * stream wrapper, and the DSv2 option end-to-end with UI metrics. */
class ThrottleSpec extends SparkSpec {

  test("pay-forward bucket: an acquire never waits for its own " +
    "permits, only for debt left by earlier acquires") {
    var clock = 0L
    val waits = Seq.newBuilder[Long]
    val rl = new ReadThrottle.ByteRateLimiter(1000.0, // 1000 B/s
      nanoTime = () => clock,
      sleep = n => { waits += n; clock += n })
    assert(rl.acquire(500) === 0L)        // bucket starts clean
    assert(rl.acquire(500) === 500000000L) // 500 B of debt at 1000 B/s
    assert(rl.acquire(250) === 500000000L) // previous 500 B again
    assert(clock === 1000000000L)
    // after the waits, 250 B of debt remain: an idle period larger
    // than it clears the bucket
    clock += 2000000000L
    assert(rl.acquire(100) === 0L)
    assert(rl.totalAcquiredBytes === 1350L)
    assert(waits.result() === Seq(500000000L, 500000000L))
  }

  test("zero-byte acquires are free and a non-positive rate refuses") {
    val rl = new ReadThrottle.ByteRateLimiter(1e9)
    assert(rl.acquire(0) === 0L)
    assert(rl.totalAcquiredBytes === 0L)
    assertThrows[IllegalArgumentException](
      new ReadThrottle.ByteRateLimiter(0.0))
    assertThrows[IllegalArgumentException](
      new ReadThrottle.ByteRateLimiter(-1.0))
  }

  test("the stream wrapper meters exactly the bytes consumed, " +
    "sequential and positioned, and seeks move no permits") {
    // a real local file through the Hadoop FS — the exact stream
    // shape the reader wraps
    val dir = Scratch.dir("graft-throttle-")
    try {
      val p = dir.resolve("data.bin")
      val payload = Array.tabulate[Byte](10000)(i => (i % 251).toByte)
      java.nio.file.Files.write(p, payload)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        dir.toUri, spark.sessionState.newHadoopConf())
      var clock = 0L
      val rl = new ReadThrottle.ByteRateLimiter(1e12,
        nanoTime = () => clock, sleep = n => clock += n)
      val account = new ReadThrottle.Account
      val in = new org.apache.hadoop.fs.FSDataInputStream(
        new ReadThrottle.ThrottledSeekableStream(
          fs.open(new org.apache.hadoop.fs.Path(p.toString)), rl, account))
      try {
        val buf = new Array[Byte](1024)
        var total = 0L
        var n = in.read(buf)
        while (n >= 0) { total += n; n = in.read(buf) }
        assert(total === payload.length.toLong)
        assert(account.bytes === payload.length.toLong)
        // seek back and re-read a slice: permits only for bytes moved
        in.seek(5000L)
        assert(in.getPos === 5000L)
        val before = account.bytes
        in.readFully(6000L, buf, 0, 100)
        assert(account.bytes === before + 100)
        assert(rl.totalAcquiredBytes === account.bytes)
      } finally in.close()
    } finally Scratch.delete(dir)
  }

  test("maxBytesPerSec end-to-end: identical rows, throttled bytes " +
    "and waits surfaced as DSv2 metrics, sidecars unmetered") {
    import spark.implicits._
    ReadThrottle.resetForTest()
    val out = Scratch.dir("graft-throttle-e2e-")
    try {
      val wt = 1609459200000000L
      val frame = (0 until 200).map { i =>
        (i.toString, Seq(f"c$i%04d"), "ROW", Some("v"),
          Some((s"value-$i-" + "x" * 64, wt + i,
            None: Option[Int], None: Option[Long])),
          None: Option[Long], s"t/nb-${i % 2 + 1}-big-Data.db")
      }.toDF("partition_key", "clustering", "row_kind", "name",
        "cell_t", "deletion_us", "sstable")
        .withColumn("cell", struct(
          col("cell_t._1").as("value"),
          col("cell_t._2").as("writetime_us"),
          col("cell_t._3").as("ttl_s"), col("cell_t._4").as("expire_us")))
        .drop("cell_t")
      SSTableBinaryV2.writeSSTables(frame, out.toString, "graft", "t")
      val dir = s"$out/graft/t"
      def run(reader: org.apache.spark.sql.DataFrame)
          : (Long, Map[String, Long]) = {
        val n = reader.collect().length.toLong
        val m = reader.queryExecution.executedPlan.collectLeaves()
          .collect {
            case s: org.apache.spark.sql.execution.datasources.v2
              .BatchScanExec =>
              s.metrics.view.mapValues(_.value).toMap
          }.head.map { case (k, v) => k -> v.toString.toLong }
        (n, m)
      }
      val (plainRows, plainM) = run(SSTableBinaryV2.readBinary(spark, dir))
      // un-throttled read: the metric family exists but stays at zero
      assert(plainM("throttledBytes") === 0L, plainM.toString)
      assert(plainM("throttleWaitNanos") === 0L, plainM.toString)
      val dataBytes = {
        val d = java.nio.file.Files.list(
          out.resolve("graft").resolve("t"))
        try {
          import scala.jdk.CollectionConverters._
          d.iterator().asScala
            .filter(_.getFileName.toString.endsWith("-Data.db"))
            .map(java.nio.file.Files.size).sum
        } finally d.close()
      }
      // throttled at 1x the file set per second: ~1s of pay-forward
      // debt accumulates across the shared bucket, so waits register
      // even under adversarial task scheduling (a higher rate would
      // make the >0 assertion a scheduling-density bet)
      val (rows, m) = run(spark.read.format("sstable-big")
        .option("maxBytesPerSec", dataBytes.toString)
        .load(dir))
      assert(rows === plainRows)
      // every Data.db byte passed the bucket — sidecar reads did not
      assert(m("throttledBytes") === dataBytes, m.toString)
      assert(m("throttleWaitNanos") > 0L, m.toString)
      // the option is plan-visible (the tuning surface)
      val desc = spark.read.format("sstable-big")
        .option("maxBytesPerSec", "1000000")
        .load(dir).queryExecution.executedPlan.toString()
      assert(desc.contains("maxBytesPerSec=1000000"), desc)
    } finally {
      Scratch.delete(out)
      ReadThrottle.resetForTest()
    }
  }
}
