package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

/** Parquet bloom-filter point-skip — the Spark/Parquet mapping of the
  * C2 fork's bloom-filter key skip (`cassandra-2/.../NoTTLReader.java:
  * 1519-1529`: a partition key absent from the SSTable's bloom filter
  * is never read). SURVEY §2.11 maps this to
  * `parquet.bloom.filter.enabled#<col>`; this spec is the executable
  * witness: the filter is really written per row group, an absent key
  * tests negative (the row group is skippable without reading it), a
  * present key tests positive, and the Spark point lookup pushes the
  * equality predicate to the scan.
  */
class BloomFilterSpec extends SparkSpec {

  test("bloom-filtered write enables point-lookup row-group skipping") {
    val out = graft.Scratch.dir("graft-bloom-").toString + "/orders"
    val orders = Tables.load(spark, sfDir, "orders")
    // spread keys over several files so the point key lives in only
    // some row groups — the skip has something to skip
    orders.repartition(4, col("o_orderkey")).write
      .option("parquet.bloom.filter.enabled#o_orderkey", "true")
      .option("parquet.bloom.filter.expected.ndv#o_orderkey", "2000")
      .parquet(out)

    val presentKey = orders.agg(min("o_orderkey")).head().getLong(0)
    val absentKey = -424242L // keys are positive; never present
    val files = new java.io.File(out).listFiles
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length >= 2, "expected multiple parquet files")

    var groups = 0; var presentHits = 0; var absentHits = 0
    for (f <- files) {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(f.getAbsolutePath), new Configuration()))
      try {
        for (block <- reader.getRowGroups.asScala) {
          val colMeta = block.getColumns.asScala
            .find(_.getPath.toDotString == "o_orderkey")
            .getOrElse(fail("o_orderkey column chunk missing"))
          val bloom = reader.getBloomFilterDataReader(block)
            .readBloomFilter(colMeta)
          assert(bloom != null, s"no bloom filter in ${f.getName}")
          groups += 1
          if (bloom.findHash(bloom.hash(presentKey))) presentHits += 1
          if (bloom.findHash(bloom.hash(absentKey))) absentHits += 1
        }
      } finally reader.close()
    }
    assert(groups >= 2)
    // the real key's row group answers "maybe present" (no false negatives)
    assert(presentHits >= 1, "present key tested negative somewhere")
    // the absent key tests negative in (at least) most row groups:
    // those groups are skippable for this point lookup without reading
    // a single row. Not === 0 — a bloom filter's false-positive rate is
    // probabilistic per fixture, so pinning zero would couple the suite
    // to one corpus's filter bits; "most groups skippable" is the
    // behavior the point-skip exists for (expected FP rate here ~1%).
    assert(absentHits <= groups / 2,
      s"absent key hit $absentHits of $groups bloom filters")

    // Spark-side: the equality predicate reaches the scan (bloom-aware
    // vectorized reader consumes it) and the lookups answer correctly
    val lookup = spark.read.parquet(out)
      .filter(col("o_orderkey") === absentKey)
    assert(plan(lookup).contains("PushedFilters"))
    assert(plan(lookup).contains("EqualTo(o_orderkey"),
      s"point predicate not pushed:\n${plan(lookup)}")
    assert(lookup.count() === 0)
    assert(spark.read.parquet(out)
      .filter(col("o_orderkey") === presentKey).count() === 1)
  }

  test("runtime bloom-filter join injection fires on a selective shuffle join") {
    // the OTHER bloom tier: beyond parquet's storage-side filters,
    // Catalyst can inject a runtime bloom filter built from a
    // selective join side into the big side's scan — at 100 TB this
    // prunes most fact rows BEFORE the shuffle, the sibling of
    // dynamic partition pruning (DppSpec). The fixture is tiny, so
    // size thresholds drop to zero and broadcast is disabled to
    // force the shuffle-join shape the rewrite targets.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val li = Tables.load(s2, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.load(s2, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .agg(sum(col("l_quantity")).as("q"))
    assert(j.collect().nonEmpty)
    val p = j.queryExecution.executedPlan.toString.toLowerCase
    assert(p.contains("might_contain"),
      s"runtime bloom filter not injected into the fact scan:\n$p")
  }
}
