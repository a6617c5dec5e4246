package graft

import graft.sources.{ActivityRegistry, RestorableMeter, SSTableBinaryV2,
  SSTableMetadata}
import org.apache.spark.sql.functions._

/** The tracked read path (`activityEpoch`/`activityClockNanos`
  * options): marks land through the REAL Data.db-open choke point —
  * the reference reader's `readMeter.mark()` on actual access
  * (`NoTTLReader.java:126`) — so bloom-skipped files never meter,
  * full scans meter every served file once per task, epochs isolate
  * runs, and [[SSTableMetadata.writeActivity]] persists the summed
  * table `redistributeLake` consumes. */
class ActivityTrackingSpec extends SparkSpec {
  private val tick = RestorableMeter.TickIntervalNanos

  /** Two tiny designed generations: keys a,b in gen 1; c,d in gen 2. */
  private lazy val genSet: String = {
    import spark.implicits._
    val rows = Seq(
      ("a", 1), ("b", 1), ("c", 2), ("d", 2)).map { case (k, g) =>
      (k, Seq("c0"), "ROW", Some("v"),
        Some(("x", 1609459200000000L, None: Option[Int],
          None: Option[Long])),
        None: Option[Long], s"t/nb-$g-big-Data.db")
    }
    val frame = rows
      .toDF("partition_key", "clustering", "row_kind", "name",
        "cell_t", "deletion_us", "sstable")
      .withColumn("cell", struct(
        col("cell_t._1").as("value"), col("cell_t._2").as("writetime_us"),
        col("cell_t._3").as("ttl_s"), col("cell_t._4").as("expire_us")))
      .drop("cell_t")
    val out = graft.Scratch.dir("graft-actspec-")
    SSTableBinaryV2.writeSSTables(frame, out.toString, "graft", "docs")
    s"$out/graft/docs"
  }

  private def tracked(epoch: String, clock: Long) =
    spark.read.format("sstable-big")
      .option("activityEpoch", epoch)
      .option("activityClockNanos", clock.toString)
      .load(genSet)

  test("a tracked point read marks ONLY the generation it touched — " +
    "bloom-skipped files never meter") {
    val e = java.util.UUID.randomUUID().toString
    assert(tracked(e, 1L).filter(col("partition_key") === "a")
      .count() === 1L)
    val snap = ActivityRegistry.snapshot(e, 1L)
    assert(snap.map(_._1) === Seq("docs/nb-1-big-Data.db"))
    assert(snap.head._2 === 1L)
    ActivityRegistry.drop(e)
  }

  test("a tracked full scan marks every served generation once; an " +
    "untracked scan marks nothing; epochs isolate") {
    val e1 = java.util.UUID.randomUUID().toString
    val e2 = java.util.UUID.randomUUID().toString
    assert(tracked(e1, 1L).count() === 4L)
    // untracked: no option, no marks anywhere
    assert(spark.read.format("sstable-big").load(genSet).count() === 4L)
    assert(tracked(e2, 1L).count() === 4L)
    assert(tracked(e2, 1L).count() === 4L) // second scan, same epoch
    val s1 = ActivityRegistry.snapshot(e1, 1L)
    val s2 = ActivityRegistry.snapshot(e2, 1L)
    assert(s1.map(t => (t._1, t._2)) === Seq(
      ("docs/nb-1-big-Data.db", 1L), ("docs/nb-2-big-Data.db", 1L)))
    assert(s2.map(t => (t._1, t._2)) === Seq(
      ("docs/nb-1-big-Data.db", 2L), ("docs/nb-2-big-Data.db", 2L)))
    ActivityRegistry.drop(e1)
    // e2 survives e1's drop, then its own drop empties it
    assert(ActivityRegistry.snapshot(e1, 1L).isEmpty)
    assert(ActivityRegistry.snapshot(e2, 1L).nonEmpty)
    ActivityRegistry.drop(e2)
    assert(ActivityRegistry.snapshot(e2, 1L).isEmpty)
  }

  test("writeActivity persists the harvested meters at the supplied " +
    "clock — rates on the EWMA closed form") {
    val e = java.util.UUID.randomUUID().toString
    // 3 reads of gen 1 at 1ns: three scans, one mark each
    (1 to 3).foreach { _ =>
      assert(tracked(e, 1L).filter(col("partition_key") === "b")
        .count() === 1L)
    }
    val act = graft.Scratch.dir("graft-actspec-table-")
    val df = SSTableMetadata.writeActivity(spark, e, 2 * tick + 1,
      act.toString)
    ActivityRegistry.drop(e)
    val rows = df.collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[String]("sstable") === "docs/nb-1-big-Data.db")
    assert(r.getAs[Long]("reads") === 3L)
    // one burst tick (3/5s) + one silent decay
    val want15 = 3 / 5.0 * math.exp(-5.0 / 900.0)
    assert(math.abs(r.getAs[Double]("rate_15m") - want15) < 1e-9)
    // the persisted parquet round-trips
    val back = spark.read.parquet(act.toString).collect()
    assert(back.length === 1 &&
      back.head.getAs[Long]("reads") === 3L)
    graft.Scratch.delete(act)
  }

  test("CLI --track-activity: parse rules, then the one-shot metered " +
    "scan persists the table --summary-budget consumes") {
    def p(a: String*) = RemoverCli.parse(a.toArray)
    assert(p("--track-activity", "/t.parquet").isLeft) // --in required
    assert(p("--track-activity", "/t.parquet", "--in", "/a",
      "--out", "/b").isLeft) // read-only: no --out
    assert(p("--track-activity", "/t.parquet", "--in", "/a",
      "--merge", "lww").isLeft)
    assert(p("--track-activity", "/t.parquet", "--in", "/a",
      "--cpus", "x").isLeft)
    val dest = graft.Scratch.dir("graft-actspec-cli-")
      .resolve("activity.parquet").toString
    val ok = p("--track-activity", dest, "--in", genSet)
    assert(ok.exists(_.trackActivityOut.contains(dest)))
    val n = RemoverCli.run(spark, ok.toOption.get)
    assert(n === 2L)
    val back = spark.read.parquet(dest).collect()
    assert(back.map(_.getAs[String]("sstable")).sorted ===
      Array("docs/nb-1-big-Data.db", "docs/nb-2-big-Data.db"))
    // one scan = one read per generation; the future-dated persist
    // clock puts the burst in the rates (a sub-5s scan lands exactly
    // one tick, but a paused host may decay it — sign-only assert)
    assert(back.forall(_.getAs[Long]("reads") === 1L))
    assert(back.forall(_.getAs[Double]("rate_15m") > 0.0))
  }

  test("redistributeLake survives an activity table whose rates are " +
    "all NULL for a file — meterless-coldest, not an NPE") {
    import spark.implicits._
    val act = graft.Scratch.dir("graft-actspec-null-")
    val out = graft.Scratch.dir("graft-actspec-nullout-")
    Seq(
      ("docs/nb-1-big-Data.db", None: Option[Double]),
      ("docs/nb-1-big-Data.db", None: Option[Double]),
      ("docs/nb-2-big-Data.db", Some(4.0)))
      .toDF("sstable", "rate_15m")
      .write.mode("overwrite").parquet(act.toString)
    val plan = SSTableMetadata.redistributeLake(spark, genSet,
      out.toString, budgetMarks = 1, activity = Some(act.toString))
      .collect().map(r => r.getAs[String]("sstable") ->
        r.getAs[Double]("rate")).toMap
    // the all-NULL file ranks coldest (0.0), the rated one keeps 4.0
    assert(plan("docs/nb-1-big-Data.db") === 0.0)
    assert(plan("docs/nb-2-big-Data.db") === 4.0)
    graft.Scratch.delete(act)
    graft.Scratch.delete(out)
  }
}
