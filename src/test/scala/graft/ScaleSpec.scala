package graft

import graft.ops.{AnalyticsOps, DedupOps, ScanAggOps}

/** Plan-SHAPE stability across scale factors: the central claim of the
  * threshold-driven-broadcast policy is that plans adapt SAFELY as
  * data grows — the properties that must hold (dimension broadcasts,
  * no nested loops, pushdown) hold at every available SF, not just the
  * one the other specs pin. Planning only (no query executes): file
  * statistics are what drive the decisions, so building the physical
  * plan per SF is the whole test.
  */
class ScaleSpec extends SparkSpec {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(s => s"/root/testdata/$s")
    .filter(d => new java.io.File(d).exists())

  private def joinOn(p: String, node: String, key: String): Boolean =
    p.linesIterator.exists(l => l.contains(node) && l.contains(key))

  test("testdata provides multiple scale factors") {
    assert(sfDirs.size >= 2, s"need ≥2 SFs to witness stability: $sfDirs")
  }

  test("dimension joins stay broadcast at every SF (threshold, not hint)") {
    for (dir <- sfDirs) {
      val p5 = plan(AnalyticsOps.q5MultiJoin(spark, dir))
      for (k <- Seq("s_suppkey", "c_custkey", "n_nationkey", "r_regionkey"))
        assert(joinOn(p5, "BroadcastHashJoin", k),
          s"$dir: q5 join on $k lost its broadcast:\n$p5")
      val p3 = plan(AnalyticsOps.q3Shipping(spark, dir))
      assert(joinOn(p3, "BroadcastHashJoin", "c_custkey"),
        s"$dir: q3 customer join lost its broadcast:\n$p3")
    }
  }

  test("range join never degrades to a nested loop at any SF") {
    for (dir <- sfDirs) {
      val p = plan(AnalyticsOps.rangeJoin(spark, dir))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("Cartesian"),
        s"$dir: range join degraded to a nested loop:\n$p")
    }
  }

  test("decontamination keeps the broadcast-probe shape at every SF") {
    for (dir <- sfDirs) {
      val p = plan(DedupOps.decontaminate(spark, dir))
      assert(p.contains("BroadcastHashJoin"),
        s"$dir: expected broadcast probe:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("Cartesian"),
        s"$dir: corpus-sized join appeared in decontamination:\n$p")
    }
  }

  test("q6 pushdown and pruning hold at every SF") {
    for (dir <- sfDirs) {
      val p = plan(ScanAggOps.q6FilterPushdown(spark, dir))
      assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
        s"$dir: filters not pushed:\n$p")
      val readSchema =
        p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!readSchema.contains("l_returnflag"),
        s"$dir: scan reads unneeded columns: $readSchema")
    }
  }

  test("global shuffle never plans a single-partition window at any SF") {
    for (dir <- sfDirs) {
      val p = plan(graft.ops.CorpusOps.globalShuffle(spark, dir))
      assert(!p.contains("SinglePartition"),
        s"$dir: global window serializes through one task:\n$p")
    }
  }

  test("adaptive gate keeps the broadcast-threshold shape at every SF") {
    for (dir <- sfDirs) {
      val p = plan(graft.ops.CorpusOps.adaptiveQualityGate(spark, dir))
      assert(p.contains("BroadcastHashJoin"),
        s"$dir: threshold join not broadcast:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("Cartesian"),
        s"$dir: corpus-sized join for the threshold table:\n$p")
    }
  }

  test("an oversized Data.db splits under the DEFAULT " +
    "spark.sql.files.maxPartitionBytes dial — no splitBytes option " +
    "anywhere (the straggler killer at a cluster's real config)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = graft.Scratch.dir("graft-scale-split-")
    try {
      val n = 600
      val frame = (0 until n).map { i =>
        (f"p$i%04d", Seq("c"), "ROW", Some("v"),
          Some(("x" * 256, 1609459200000000L + i, None: Option[Int],
            None: Option[Long])),
          None: Option[Long], "t/nb-1-big-Data.db")
      }
        .toDF("partition_key", "clustering", "row_kind", "name",
          "cell_t", "deletion_us", "sstable")
        .withColumn("cell", struct(
          col("cell_t._1").as("value"),
          col("cell_t._2").as("writetime_us"),
          col("cell_t._3").as("ttl_s"),
          col("cell_t._4").as("expire_us")))
        .drop("cell_t")
      graft.sources.SSTableBinaryV2.writeSSTables(frame, out.toString,
        "graft", "t")
      val dir = s"$out/graft/t"
      val dataLen = java.nio.file.Files.size(java.nio.file.Paths
        .get(dir, "nb-1-big-Data.db"))
      assert(dataLen > 64 * 1024,
        s"fixture too small to witness splitting ($dataLen bytes)")
      // at the session default (128 MiB) this small file is ONE task
      val whole = spark.read.format("sstable-big").load(dir)
      assert(whole.rdd.getNumPartitions === 1)
      // shrink the SESSION dial — the same knob that sizes parquet
      // splits — and the scan must divide with no connector option
      val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes",
          (32 * 1024).toString)
        val split = spark.read.format("sstable-big").load(dir)
        assert(split.rdd.getNumPartitions > 1,
          s"$dataLen-byte Data.db stayed one task at a 32 KiB dial")
        assert(split.count() === n.toLong,
          "default-dial splitting lost or duplicated partitions")
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes",
        before)
    } finally graft.Scratch.delete(out)
  }
}
