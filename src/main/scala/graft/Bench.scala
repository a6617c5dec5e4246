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
    // Min of two passes per query: the per-query floor is the real plan
    // cost; the first pass often carries one-off JIT/codegen compilation
    // and (on a shared host) scheduler noise that isn't the query's.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var failed = false
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // A failed query records -1 and is excluded from the total: its
      // fast-fail wall time would otherwise read as a fast query.
      val dt = if (failed) -1.0 else times.min
      System.err.println(f"[bench] $name%-24s $dt%8.2fs  (runs: ${
        times.map(t => f"$t%.2f").mkString(", ")})")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedNames = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":${
      failedNames.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
