package graft

import java.nio.file.Files

import graft.sources.LakeDiscovery
import org.apache.spark.sql.functions._

/** Lake schema discovery: the directory walk must parse exactly the
  * two-level `<ks>/<table>` layout (the reference's data-dir contract,
  * `Cassandra2TTLRemover.java:48,58,65`), skip non-directory strays at
  * both levels, and report footer-true schemas and row counts.
  */
class LakeDiscoverySpec extends SparkSpec {

  test("discovery reports the fixture catalog with footer-true schemas") {
    val out = LakeDiscovery.writeLakeFixture(spark, sfDir)
    try {
      val cat = LakeDiscovery.discover(spark, out.toString)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getInt(2), r.getString(3), r.getLong(4)))
      // 4 keyspaces × up to 3 tables, every present pair discovered
      assert(cat.map(_._1).distinct.sorted.toSeq ===
        Seq("ks0", "ks1", "ks2", "ks3"))
      cat.foreach { case (ks, t, nCols, colList, nRows) =>
        val ti = t.stripPrefix("t").toInt
        assert(nCols === ti + 2, s"$ks/$t column count")
        assert(colList.startsWith("doc_id:bigint,n_chars:bigint"),
          s"$ks/$t schema prefix: $colList")
        assert(nRows > 0, s"$ks/$t empty")
      }
      // row counts reconcile with the source derivation
      val expected = Tables.load(spark, sfDir, "documents")
        .groupBy(
          concat(lit("ks"), (substring(col("source"), 4, 10).cast("int")
            % 4).cast("string")).as("ks"),
          (col("doc_id") % 3).cast("int").as("t"))
        .count().collect()
        .map(r => (r.getString(0), s"t${r.getInt(1)}") -> r.getLong(2))
        .toMap
      assert(cat.map(c => (c._1, c._2) -> c._5).toMap === expected)
    } finally Scratch.delete(out)
  }

  test("footer reads run as one distributed task per table") {
    val out = LakeDiscovery.writeLakeFixture(spark, sfDir)
    val taskCounts = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Int]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        taskCounts.add(s.stageInfo.numTasks)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val nTables = LakeDiscovery.discover(spark, out.toString).count()
      // listener delivery is async; poll briefly for the footer stage
      val deadline = System.nanoTime() + 10000000000L
      while (!taskCounts.contains(nTables.toInt) &&
        System.nanoTime() < deadline) Thread.sleep(50)
      // the footer job parallelizes one task per table (≤32): a stage
      // with exactly tables-many tasks must have run — the serial
      // driver loop this replaced would show no such stage
      assert(taskCounts.contains(nTables.toInt),
        s"no $nTables-task footer stage ran (saw $taskCounts)")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      Scratch.delete(out)
    }
  }

  test("discovery skips non-directory strays at both levels") {
    val out = LakeDiscovery.writeLakeFixture(spark, sfDir)
    try {
      val baseline = LakeDiscovery.discover(spark, out.toString).count()
      // stray files: a manifest at the lake root, a leftover at ks level
      Files.writeString(out.resolve("MANIFEST.txt"), "not a keyspace")
      Files.writeString(out.resolve("ks0").resolve("backup.tar"),
        "not a table")
      assert(LakeDiscovery.discover(spark, out.toString).count()
        === baseline)
    } finally Scratch.delete(out)
  }
}
