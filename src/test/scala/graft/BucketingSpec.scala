package graft

import org.apache.spark.sql.functions._

/** Bucketing = pre-paid shuffle: both fact tables written bucketed on
  * the join key join with ZERO exchanges — at 100 TB this converts the
  * recurring lineitem⋈orders shuffle into a one-time layout cost, the
  * co-location strategy the prompt-level scale design calls for.
  * Broadcast is disabled for the assertion so the small fixture can't
  * dodge the bucketed sort-merge path.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with zero exchanges") {
    Tables.load(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bkt")
    Tables.load(spark, sfDir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_bkt")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderpriority"))
      val p = joined.queryExecution.executedPlan.toString()
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      // and it returns the same rows as the unbucketed join
      val expected = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderpriority"))
      assert(joined.exceptAll(expected).isEmpty &&
        expected.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("bucket pruning: a point predicate on the bucket key reads one bucket") {
    // the read-side payoff of the same layout: an equality predicate on
    // the bucket column hashes to ONE bucket, and the scan opens only
    // that bucket's files — the hash-layout analogue of the reference's
    // token-index point skip. (orders_bkt persists from the join test or
    // is created here; idempotent either way.)
    if (!spark.catalog.tableExists("orders_bkt"))
      Tables.load(spark, sfDir, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_bkt")
    val key = Tables.load(spark, sfDir, "orders")
      .agg(min("o_orderkey")).head().getLong(0)
    // autoBucketedScan drops the bucketed layout when no operator
    // needs its distribution — which also forfeits bucket PRUNING;
    // disable it so the point lookup keeps the bucketed scan
    val prev = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val q = spark.table("orders_bkt").filter(col("o_orderkey") === key)
      val p = q.queryExecution.executedPlan.toString()
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning did not engage:\n$p")
      assert(q.count() === 1)
    } finally spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }
}
