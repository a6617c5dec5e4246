package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Results are materialized through the `noop` sink, not `.count()` —
  * count() lets Catalyst prune the whole projection (a TTL-strip query
  * would degenerate to a parquet row count), noop forces every operator
  * to actually execute while writing nothing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorb one-time JVM costs (Janino codegen compiler
    // init, parquet footer reads, shuffle infrastructure) so they don't
    // all land on whichever query happens to run first.
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Min of N passes per query (SPARK_GRAFT_BENCH_RUNS, default 2): the
    // per-query floor is the real plan cost; the first pass often carries
    // one-off JIT/codegen compilation and (on a shared host) scheduler
    // noise that isn't the query's. Success is tracked PER RUN so a
    // transient first-run failure doesn't discard a valid second-run
    // timing; a query is failed only when every run fails.
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // Optional name filter (regex, full-match) for iterating on a subset;
    // the driver never sets it, so the recorded artifact is always the
    // full surface.
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.forall(_.matches(n)) }
      .map { case (name, fn) =>
      val times = (1 to nRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      // A failed query (all runs failed) records null in the queries map
      // and is excluded from the total: its fast-fail wall time would
      // otherwise read as a fast query, and a -1 sentinel could be
      // misread downstream as a (negative) duration.
      val dt = times.reduceOption(_ min _)
      System.err.println(f"[bench] $name%-24s ${dt.getOrElse(-1.0)}%8.2fs  (${
        times.size}/$nRuns runs ok: ${
        times.map(t => f"$t%.2f").mkString(", ")})")
      name -> dt
    }
    // Emit per-query entries CHEAPEST FIRST: the recorded artifact has
    // repeatedly kept only the TAIL of this line, and a cost-ascending
    // order means whatever tail survives carries the expensive queries
    // that matter for a perf read (failures sort last for the same
    // reason). JSON object order is semantically irrelevant, so full
    // parses are unaffected.
    val qs = results
      .sortBy { case (_, v) => v.getOrElse(Double.MaxValue) }
      .map { case (k, v) => "\"" + k + "\":" + v.map(_.toString).getOrElse("null") }
      .mkString("{", ",", "}")
    val failedNames = results.collect { case (k, None) => "\"" + k + "\"" }
    val total = results.flatMap(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":${
      failedNames.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    println(line)
    // Defensive artifact copy: the harness captures stdout, but with
    // 100+ per-query entries the one-line JSON has repeatedly survived
    // only as a truncated tail in the recorded artifact. A file copy
    // makes the full record recoverable regardless of capture limits.
    try {
      val p = java.nio.file.Paths.get("target", "bench_last.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, line + "\n")
    } catch { case _: java.io.IOException => () }
    spark.stop()
  }
}
