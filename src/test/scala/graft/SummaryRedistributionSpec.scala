package graft

import graft.sources.{SSTableBinaryV2, SSTableComponents, SSTableMetadata}
import org.apache.spark.sql.functions._

/** The offline lake form of `IndexSummaryManager`'s redistribution
  * (`redistributeLake` + CLI `--summary-budget`): coldest summaries
  * coarsen until the pool fits the mark budget, everything else
  * copies verbatim, originals are kept, and activity-table rates
  * (the persisted RestorableMeter output) drive the hotness order. */
class SummaryRedistributionSpec extends SparkSpec {

  private def frame(nPerGen: Int) = {
    import spark.implicits._
    (1 to 2).flatMap { gen =>
      (0 until nPerGen).map { i =>
        (f"g$gen%d-p$i%04d", Seq("c"), "ROW", Some("v"),
          Some(("x", 1609459200000000L + i, None: Option[Int],
            None: Option[Long])),
          None: Option[Long], s"t/nb-$gen-big-Data.db")
      }
    }.toDF("partition_key", "clustering", "row_kind", "name",
      "cell_t", "deletion_us", "sstable")
      .withColumn("cell", struct(
        col("cell_t._1").as("value"), col("cell_t._2").as("writetime_us"),
        col("cell_t._3").as("ttl_s"), col("cell_t._4").as("expire_us")))
      .drop("cell_t")
  }

  test("CLI parse rules: budget must be positive, in/out required " +
    "and distinct, transform flags contradict, --activity is " +
    "budget-only") {
    def p(a: String*) = RemoverCli.parse(a.toArray)
    assert(p("--summary-budget", "100").isLeft)
    assert(p("--summary-budget", "0", "--in", "/a", "--out", "/b").isLeft)
    assert(p("--summary-budget", "x", "--in", "/a", "--out", "/b").isLeft)
    assert(p("--summary-budget", "9", "--in", "/a", "--out", "/a").isLeft)
    assert(p("--summary-budget", "9", "--in", "/a", "--out", "/b",
      "--merge", "lww").isLeft)
    assert(p("--activity", "/act", "--in", "/a", "--out", "/b").isLeft)
    val ok = p("--summary-budget", "64", "--in", "/a", "--out", "/b",
      "--activity", "/act", "--cpus", "4")
    assert(ok.exists(a => a.summaryBudget.contains(64L) &&
      a.activity.contains("/act") && a.cpus == 4))
  }

  test("redistributeLake coarsens the COLDEST generation to the cap, " +
    "copies the hot one verbatim, meets the budget, and the output " +
    "still decodes; originals untouched; refusals are loud") {
    val src = Scratch.dir("graft-redis-src-")
    val out = Scratch.dir("graft-redis-out-")
    val act = Scratch.dir("graft-redis-act-")
    try {
      SSTableBinaryV2.writeSSTables(frame(600), src.toString,
        "graft", "t")
      val srcDir = src.resolve("graft").resolve("t")
      // 600 partitions / interval 128 → 5 marks per generation
      def marksOf(p: java.nio.file.Path): Int =
        SSTableComponents.readSummary(
          java.nio.file.Files.readAllBytes(p)).sampled.size
      assert(marksOf(srcDir.resolve("nb-1-big-Summary.db")) === 5)
      // activity: gen 1 cold (no row at all — meterless files rank
      // coldest), gen 2 hot
      import spark.implicits._
      Seq(("t/nb-2-big-Data.db", 5.0))
        .toDF("sstable", "rate_15m")
        .write.mode("overwrite").parquet(act.toString)
      val before = java.nio.file.Files.readAllBytes(
        srcDir.resolve("nb-1-big-Summary.db"))
      // budget 6 of 10 marks: greedy must take gen 1 to the cap
      // (5→3→2→1) and leave gen 2 alone (5 + 1 = 6 ≤ 6)
      val plan = SSTableMetadata.redistributeLake(spark,
        srcDir.toString, out.toString, budgetMarks = 6,
        activity = Some(act.toString)).collect()
        .map(r => r.getAs[String]("sstable") ->
          (r.getAs[Int]("factor"), r.getAs[Long]("marks_after"))).toMap
      assert(plan("t/nb-1-big-Data.db") === ((8, 1L)))
      assert(plan("t/nb-2-big-Data.db") === ((1, 5L)))
      // the coarsened summary really changed sampling; the hot one is
      // byte-verbatim
      val cold = SSTableComponents.readSummary(
        java.nio.file.Files.readAllBytes(
          out.resolve("nb-1-big-Summary.db")))
      assert(cold.minIndexInterval === 128 * 8)
      assert(cold.sampled.size === 1)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(
          out.resolve("nb-2-big-Summary.db")),
        java.nio.file.Files.readAllBytes(
          srcDir.resolve("nb-2-big-Summary.db"))))
      // originals untouched
      assert(java.util.Arrays.equals(before,
        java.nio.file.Files.readAllBytes(
          srcDir.resolve("nb-1-big-Summary.db"))))
      // the redistributed lake still serves: full decode AND a point
      // read through the coarsened summary
      val back = SSTableBinaryV2.readBinary(spark, out.toString)
      assert(back.count() === 1200L)
      assert(back.filter(col("partition_key") === "g1-p0123").count()
        === 1L)
      // CLI drives the same path (fresh --out)
      val out2 = Scratch.dir("graft-redis-out2-")
      try {
        val n = RemoverCli.run(spark, RemoverCli.parse(Array(
          "--summary-budget", "6", "--in", srcDir.toString,
          "--out", out2.toString, "--activity", act.toString))
          .fold(e => fail(e), identity))
        assert(n === 2L)
        assert(SSTableComponents.readSummary(
          java.nio.file.Files.readAllBytes(
            out2.resolve("nb-1-big-Summary.db"))).sampled.size === 1)
      } finally Scratch.delete(out2)
      // a summaryless generation refuses loudly
      java.nio.file.Files.delete(srcDir.resolve("nb-1-big-Summary.db"))
      java.nio.file.Files.deleteIfExists(
        srcDir.resolve(".nb-1-big-Summary.db.crc"))
      assertThrows[Exception](SSTableMetadata.redistributeLake(spark,
        srcDir.toString, out.toString, 6, None))
    } finally {
      Scratch.delete(src); Scratch.delete(out); Scratch.delete(act)
    }
  }

  test("a 2.x summary coarsens by SAMPLING LEVEL in the literal " +
    "Downsampling-pattern order — interval untouched, levels nest, " +
    "the level word round-trips the wire") {
    import graft.sources.SSTableComponents
    // the canonical base-128 pattern's head, pinned: the literal
    // odds-first recursion (pattern(2) = [1,0], pattern(4) =
    // [3,1,2,0]) — slot 127 is removed first, slot 0 last
    assert(SSTableComponents.samplingPattern2x(4) === Seq(3, 1, 2, 0))
    assert(SSTableComponents.samplingPattern2x(128).take(9) ===
      Seq(127, 63, 95, 31, 111, 47, 79, 15, 119))
    // every slot appears exactly once (a permutation of 0..127)
    assert(SSTableComponents.samplingPattern2x(128).sorted ===
      (0 until 128))
    val sampled = (0 until 256).map(i =>
      (Array[Byte](i.toByte, (i >> 8).toByte), i.toLong))
    val s = SSTableComponents.Summary(128, sampled, 256,
      sampled.head._1, sampled.last._1)
    // factor 2: level 128 → 64 removes the ODD slots (the pattern's
    // first half), so the survivors are the EVEN-indexed marks — the
    // one halving where the literal pattern and an interval ladder
    // agree; intermediate levels diverge (spread-out removals)
    val (d2, l2) = SSTableComponents.downsampleSummary2x(s, 128, 2)
    assert(l2 === 64 && d2.sampled.size === 128)
    assert(d2.sampled.map(_._2) ===
      (0 until 256).filter(_ % 2 == 0).map(_.toLong))
    assert(d2.minIndexInterval === 128 && d2.sizeAtFullSampling === 256)
    // factor 4: full-block arithmetic (256 marks → 64 at level 32)
    val (d4, l4) = SSTableComponents.downsampleSummary2x(s, 128, 4)
    assert(l4 === 32 && d4.sampled.size === 64)
    // levels NEST: 128→64→32 lands on exactly 128→32
    val (d2then2, l22) = SSTableComponents.downsampleSummary2x(d2, 64, 2)
    assert(l22 === 32)
    assert(d2then2.sampled.map(_._2) === d4.sampled.map(_._2))
    // the level word survives the 2.x wire form
    val bytes = SSTableComponents.writeSummary2x(d4.sampled,
      256L * 128, s.firstKey, s.lastKey, 128, l4)
    assert(SSTableComponents.readSummaryLevel2x(bytes) === 32)
    val back = SSTableComponents.readSummary2x(bytes)
    assert(back.sampled.size === 64 &&
      back.sizeAtFullSampling === 256)
    // a level already at the floor can't coarsen — verbatim, level 1
    val (floor, lf) = SSTableComponents.downsampleSummary2x(s, 1, 8)
    assert(lf === 1 && floor.sampled.size === 256)
  }
}
