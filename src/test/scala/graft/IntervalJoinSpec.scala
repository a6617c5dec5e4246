package graft

import graft.plans.{GraftExtensions, IntervalJoins}
import org.apache.spark.sql.functions._

/** The custom IntervalJoin node + rewrite rule: declared WHAT (pairs
  * within a time window), planned HOW (bin-bucketed equi-join — never
  * a nested loop). Unlike the LSH similarity join, this rewrite is
  * EXACT: the binned plan must reproduce the naive inequality join
  * bit-for-bit, so the spec checks full set equality against the
  * cross-join formulation at fixture scale.
  */
class IntervalJoinSpec extends SparkSpec {

  private val winNs = 2L * 3600L * 1000000000L

  private def sides = {
    val ev = Tables.load(spark, sfDir, "events")
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val build = ev.select(col("event_id").as("e_id"), col("ts").as("e_ts"))
    (probes, build)
  }

  test("intervalJoin rewrites to a binned equi-join, no nested loop") {
    GraftExtensions.enable(spark)
    val (probes, build) = sides
    val joined = IntervalJoins.intervalJoin(
      probes, build, "p_ts", "e_ts", -winNs, 0L)
    val p = joined.queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"interval join planned as all-pairs:\n$p")
  }

  test("intervalJoin equals the naive inequality join exactly") {
    GraftExtensions.enable(spark)
    val (probes, build) = sides
    val got = IntervalJoins.intervalJoin(
        probes, build, "p_ts", "e_ts", -winNs, 0L)
      .select(col("p_id"), col("e_id"))
    val naive = probes.crossJoin(build)
      .filter(col("e_ts") >= col("p_ts") - winNs &&
        col("e_ts") < col("p_ts"))
      .select(col("p_id"), col("e_id"))
    assert(got.count() > 0, "empty result — window too narrow for fixture")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("intervalJoin equals naive join on generated data, negative ts included") {
    // the bin-start key claims floor semantics at any sign — generated
    // timestamps straddle zero and the window shapes cover
    // strictly-past, strictly-future, zero-crossing, and tiny widths
    GraftExtensions.enable(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val a = (1 to 150).map(i => (i.toLong, rnd.between(-100000L, 100000L)))
      .toDF("a_id", "a_ts")
    val b = (1 to 150).map(i => (i.toLong, rnd.between(-100000L, 100000L)))
      .toDF("b_id", "b_ts")
    for ((lo, hi) <- Seq((-50000L, 0L), (0L, 30000L), (-25000L, 25000L),
        (-13L, 19L))) {
      val got = IntervalJoins.intervalJoin(a, b, "a_ts", "b_ts", lo, hi)
        .select(col("a_id"), col("b_id"))
      val naive = a.crossJoin(b)
        .filter(col("b_ts") >= col("a_ts") + lo &&
          col("b_ts") < col("a_ts") + hi)
        .select(col("a_id"), col("b_id"))
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"mismatch for window [$lo, $hi)")
    }
  }

  test("intervalJoin validates inputs") {
    val (probes, build) = sides
    intercept[IllegalArgumentException] {
      IntervalJoins.intervalJoin(probes, build, "p_ts", "e_ts", 0L, 0L)
    }
    intercept[IllegalArgumentException] {
      // overlapping column names must be rejected
      IntervalJoins.intervalJoin(probes, probes, "p_ts", "p_ts", -1L, 0L)
    }
  }

  test("the rewrite rule itself rejects ambiguous names (not just the API)") {
    // an IntervalJoin NODE constructed directly — bypassing the
    // IntervalJoins wrapper — with colliding output names must fail
    // loudly at rewrite time, not silently rebind every duplicate to
    // one source column (the by-name output resolution's failure mode)
    GraftExtensions.enable(spark)
    import org.apache.spark.sql.graftbridge.GraftColumns
    val (probes, build) = sides
    val lp = GraftColumns.analyzedPlan(probes)
    val rp = GraftColumns.analyzedPlan(
      build.withColumnRenamed("e_id", "p_id")) // collides with the left
    val node = graft.plans.IntervalJoin(
      lp, rp, "p_ts", "e_ts", -winNs, 0L, lp.output ++ rp.output)
    val ex = intercept[Exception] {
      GraftColumns.ofRows(spark, node).collect()
    }
    val msg = ex.toString + Option(ex.getCause).map(_.toString).getOrElse("")
    assert(msg.contains("ambiguous") || msg.contains("p_id"),
      s"expected a loud ambiguity failure, got: $ex")
  }
}
