package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Uniform access to the driver-generated parquet corpus (TESTDATA.md).
  *
  * Reference analogue: SSTable file discovery + open
  * (`impl/src/main/java/com/instaclustr/cassandra/ttl/cli/TTLRemoverCLI.java:147-163`,
  * SURVEY §2.1 S1/S3). In Spark a directory read IS the parallel scan:
  * one task per parquet row-group split, vectorized reader, footer
  * min/max pruning — everything the reference's NoTTLReader hand-rolls.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is nanosecond-precision; Spark's parquet reader rejects
    * INT64(TIMESTAMP_NANOS) unless it is read as a raw long. We keep it
    * as epoch-nanos (full precision, orderable, arithmetic-friendly) and
    * derive epoch-micros columns where outputs need them. Set here (not
    * only in our mains) so the driver's own SparkSession works too.
    *
    * CONTRACT NOTE: load() mutates two session confs on the caller's
    * SparkSession — `nanosAsLong` and `session.timeZone=UTC`. This is
    * deliberate (the driver harness builds its own session and never
    * touches our mains, so the only place we can pin them is here), but
    * it means a host application embedding this library shares those
    * settings session-wide. Embedders who need their own settings have
    * an escape hatch: set `spark.graft.pins=false` on the session and
    * load() leaves both confs alone (then nanosAsLong must be handled
    * by the embedder before reading the events table, and timestamp
    * semantics follow the host timezone) — or run graft ops in a
    * dedicated session (`spark.newSession()`).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (spark.conf.get("spark.graft.pins", "true") != "false") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Pin the session timezone too: timestamp-literal filters
      // (q1/q3/q6) and the datetime scalar surface must agree with the
      // UTC-pinned DuckDB oracle even when the host session defaults
      // elsewhere.
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** Normalize `events.ts` to the library-wide contract: epoch-NANOS
    * BIGINT. The corpus has shipped `ts` under two parquet encodings —
    * INT64(TIMESTAMP_NANOS) (which the `nanosAsLong` pin above already
    * surfaces as a raw nanos long) and TIMESTAMP(MICROS) NTZ (which
    * arrives as TIMESTAMP_NTZ). Converting at the read boundary keeps
    * every downstream operator (cell model writetimes, tombstone
    * pairing, sessionization) encoding-independent, and agrees exactly
    * with the DuckDB oracle's `epoch_ns(ts)`: both interpret the naive
    * micros timestamp as UTC (the session is UTC-pinned) and widen
    * ×1000 to nanos.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        // NTZ → TIMESTAMP cast is wall-clock-preserving under the UTC
        // session pin, so unix_micros is the exact naive-UTC reading.
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }

  /** Load with a parallelism floor for CPU-heavy per-row transforms
    * (shingling, embedding math). The local test corpus is one small
    * parquet file per table → one input split → one task, serializing
    * work that is embarrassingly parallel; at production scale the
    * table has thousands of splits and the repartition collapses to a
    * cheap round-robin of already-parallel data. Only round-robin when
    * the scan would otherwise under-use the cluster.
    */
  def loadBalanced(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = load(spark, sfDir, name)
    val target = spark.sparkContext.defaultParallelism
    // File count from the relation's file index — NOT df.rdd
    // .getNumPartitions, which builds the whole RDD lineage eagerly on
    // every call. The file count is a conservative lower bound on scan
    // splits (large files split further), which errs toward skipping
    // the repartition — correct: at scale there are plenty of splits.
    if (df.inputFiles.length < target / 2) df.repartition(target) else df
  }
}
