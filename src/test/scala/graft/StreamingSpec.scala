package graft

import graft.ops.AnalyticsOps
import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame

/** Streaming-vs-batch equivalence: with AvailableNow over a static
  * directory, each streaming op must produce exactly its batch
  * analogue's result — the property that makes the streaming layer a
  * drop-in incremental path for the same pipelines.
  */
class StreamingSpec extends SparkSpec {

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val cols = a.columns.sorted.map(org.apache.spark.sql.functions.col _)
    val (an, bn) = (a.select(cols: _*), b.select(cols: _*))
    assert(an.count() == bn.count(), "row counts differ")
    assert(an.exceptAll(bn).isEmpty && bn.exceptAll(an).isEmpty,
      "row sets differ")
  }

  test("streaming window agg equals batch tumbling-window aggregation") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.windowAgg(spark, sfDir)
    val batch = Tables.load(spark, sfDir, "events")
      .withColumn("us", expr("ts div 1000"))
      .groupBy((expr("us div 3600000000") * 3600000000L)
        .as("window_start_us"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_value"))
    assertSameRows(streamed, batch)
  }

  test("append-mode window agg emits exactly the watermark-closed windows") {
    import org.apache.spark.sql.functions._
    val appended = StreamingOps.windowAggAppend(spark, sfDir)
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("us", expr("ts div 1000"))
    // end-of-stream watermark = max event time − 1 h delay; a window is
    // finalized (emitted + state evicted) iff window_end <= watermark
    val watermarkUs = ev.agg(max("us")).head().getLong(0) - 3600000000L
    val closed = ev
      .groupBy((expr("us div 3600000000") * 3600000000L)
        .as("window_start_us"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_value"))
      .filter(col("window_start_us") + 3600000000L <= watermarkUs)
    assertSameRows(appended, closed)
    // and it must emit strictly fewer windows than Complete mode does
    // (the trailing, still-open windows stay in state)
    assert(appended.count() < StreamingOps.windowAgg(spark, sfDir).count())
  }

  test("flatMapGroupsWithState sessionize equals batch window sessionize") {
    val streamed = StreamingOps.sessionize(spark, sfDir)
    val batch = AnalyticsOps.sessionize(spark, sfDir)
    assertSameRows(streamed, batch)
  }
}
