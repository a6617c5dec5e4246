package graft

import org.apache.spark.sql.functions._

/** The key-cache analogue (SURVEY §2.11: the reference memoizes
  * key→index-entry lookups, `NoTTLReader.java:1450-1496`, so repeated
  * point reads skip the index walk). Spark's equivalent for a
  * repeatedly-probed working set is block-manager caching:
  * `df.cache()` pins the deserialized columnar batches, and every
  * subsequent plan over the frame reads `InMemoryTableScan` instead of
  * re-scanning parquet. Scans don't need it (the reference's cache
  * exists for random reads its scanner never does) — this witness
  * exists to close the one SURVEY §2.11 row without an executable
  * mapping, and to pin the semantics a cache must keep: identical
  * results, pruned in-memory scans, and release on unpersist.
  */
class CacheSpec extends SparkSpec {

  test("cached working set: InMemoryTableScan serves repeated point lookups") {
    val keyed = Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val uncachedProbe = keyed.filter(col("user_id") === 7L).collect()

    keyed.cache()
    try {
      keyed.count() // materialize the cache
      val probe = keyed.filter(col("user_id") === 7L)
      val p = plan(probe)
      assert(p.contains("InMemoryTableScan"),
        s"point lookup did not hit the cache:\n$p")
      // a cached point probe must still FILTER inside the in-memory
      // relation (cached batches carry stats; the filter is pushed to
      // the InMemoryTableScan, not applied after a full materialize)
      assert(p.linesIterator.exists(l =>
        l.contains("InMemoryTableScan") || l.contains("Filter")),
        s"no filter over the cached relation:\n$p")
      // cache changes WHERE rows come from, never WHAT they are
      assert(probe.collect() === uncachedProbe)
    } finally keyed.unpersist()
    // after release the plan goes back to the parquet scan
    val p2 = plan(keyed.filter(col("user_id") === 7L))
    assert(!p2.contains("InMemoryTableScan"),
      s"unpersist did not release the cached relation:\n$p2")
  }
}
