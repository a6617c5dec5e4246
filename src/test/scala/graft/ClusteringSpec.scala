package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

/** Range-clustered layout → min/max data skipping, the write-side twin
  * of the bloom-filter point skip (BloomFilterSpec). The reference
  * keeps SSTables sorted by token so its index can binary-search to a
  * key range (`NoTTLReader`'s index-paced iteration, SURVEY §2.1
  * S5/O3); the Spark/Parquet mapping is `repartitionByRange` +
  * `sortWithinPartitions` on the clustering key at write time, which
  * makes every row group's [min,max] span a narrow, near-disjoint key
  * slice. A later range/point predicate then prunes row groups from
  * the footer stats alone — the layout decision that turns a 100 TB
  * full scan into a handful of row-group reads. This spec is the
  * executable witness: the clustered layout leaves most row groups
  * skippable for a point key, the round-robin layout leaves none.
  */
class ClusteringSpec extends SparkSpec {

  /** For each parquet row group under `dir`: does [min,max] of user_id
    * contain `key`? Returns (containing, total). */
  private def rowGroupsContaining(dir: String, key: Long): (Int, Int) = {
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet"))
    var containing = 0; var total = 0
    for (f <- files) {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(f.getAbsolutePath), new Configuration()))
      try {
        for (block <- reader.getRowGroups.asScala) {
          val colMeta = block.getColumns.asScala
            .find(_.getPath.toDotString == "user_id")
            .getOrElse(fail("user_id column chunk missing"))
          val stats = colMeta.getStatistics
          assert(stats != null && !stats.isEmpty, "no column statistics")
          val lo = stats.genericGetMin.asInstanceOf[Number].longValue()
          val hi = stats.genericGetMax.asInstanceOf[Number].longValue()
          total += 1
          if (key >= lo && key <= hi) containing += 1
        }
      } finally reader.close()
    }
    (containing, total)
  }

  test("range-clustered write makes row groups skippable by min/max stats") {
    val base = graft.Scratch.dir("graft-cluster-").toString
    val ev = Tables.load(spark, sfDir, "events")

    // clustered: contiguous key slices per file, sorted within
    ev.repartitionByRange(4, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.parquet(s"$base/clustered")
    // round-robin: every file spans (nearly) the whole key range
    ev.repartition(4).write.parquet(s"$base/scattered")

    val probe = ev.agg(min("user_id")).head().getLong(0)
    val (cHit, cTotal) = rowGroupsContaining(s"$base/clustered", probe)
    val (sHit, sTotal) = rowGroupsContaining(s"$base/scattered", probe)
    assert(cTotal >= 4 && sTotal >= 4, "expected ≥4 row groups per layout")
    // clustered: the minimum key lives in exactly the first range slice;
    // every other row group's [min,max] excludes it → skippable
    assert(cHit <= cTotal / 2,
      s"clustered layout not skippable: $cHit of $cTotal row groups contain key")
    // scattered: round-robin makes (nearly) every row group span the
    // key range — allow one straggler group to miss the global-min
    // probe (a small tail row group under different fixture sizes or
    // parquet row-group sizing legitimately may); the property being
    // pinned is DOMINANCE: clustering leaves most groups skippable,
    // round-robin leaves (almost) none
    assert(sHit >= sTotal - 1,
      s"expected ~no skipping in round-robin layout: $sHit of $sTotal")
    assert(cHit < sHit, "clustering did not reduce candidate row groups")

    // Spark consumes the same stats: the point lookup pushes the
    // predicate to the scan and answers identically on both layouts
    val clustered = spark.read.parquet(s"$base/clustered")
      .filter(col("user_id") === probe)
    assert(plan(clustered).contains("EqualTo(user_id"),
      s"point predicate not pushed:\n${plan(clustered)}")
    val expect = ev.filter(col("user_id") === probe).count()
    assert(clustered.count() === expect)
    assert(spark.read.parquet(s"$base/scattered")
      .filter(col("user_id") === probe).count() === expect)
  }
}
