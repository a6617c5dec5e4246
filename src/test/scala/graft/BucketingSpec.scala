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
}
