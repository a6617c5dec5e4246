package graft

import graft.model.CellModel
import graft.model.CellModel.TableMeta
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's whole `executeRemoval` lifecycle as ONE library
  * call — what a user of the original tool invokes to "switch": read
  * the table, strip TTL/liveness from every cell of every column
  * (schema-generic), and write the result partition-grouped, sorted
  * and laid out under `out/<ks>/<table>/`
  * (`Cassandra3TTLRemover.executeRemoval`,
  * `Cassandra3TTLRemover.java:43-143`; CLI shell `TTLRemoverCLI.java:
  * 72-105`). The reference's per-file loop, key pre-count and writer
  * sizing all dissolve into the engine: file discovery is the
  * parquet read, writer sizing is unnecessary, and the single
  * `repartition(pk)` is the one shuffle the sorted, partition-grouped
  * sink fundamentally requires.
  *
  * Non-destructive by construction (`SSTableRewriter
  * .constructKeepingOriginals`, `Cassandra3TTLRemover.java:97`): the
  * default `errorifexists` save mode refuses to clobber, and writes
  * always go to `outDir`, never back into the input.
  */
object Pipeline {

  /** Strip + sort + partitioned write for a DataFrame already carrying
    * cell-modeled columns. Returns the written row count, collected
    * WRITE-SIDE via `observe()`: the metric piggybacks on the rows as
    * they flow into the writer, so the job never re-reads its own
    * output for the smoke number (at 100 TB a read-back would double
    * the job's IO). The reference likewise sizes and checks its writer
    * from the forward pass, never from the written SSTables
    * (`Cassandra3TTLRemover.java:91,149-165`). */
  def removeTtl(df: DataFrame, meta: TableMeta, outDir: String,
      saveMode: String = "errorifexists"): Long = {
    val keys = (meta.partitionKeys ++ meta.clusteringKeys).map(col)
    val stripped = CellModel.stripAll(df, meta)
    val written = Observation()
    stripped
      .withColumn("keyspace", lit(meta.keyspace))
      .withColumn("table_name", lit(meta.table))
      .repartition(meta.partitionKeys.map(col): _*)
      .sortWithinPartitions(keys: _*)
      // observed ABOVE the sort: CollectMetrics is a per-partition
      // pass-through, so the sorted-within-partitions write order and
      // the partitionBy layout are unaffected
      .observe(written, count(lit(1)).as("rows"))
      .write
      .partitionBy("keyspace", "table_name")
      .mode(saveMode)
      .parquet(outDir)
    written.get("rows").asInstanceOf[Long]
  }

  /** Directory-level entry: load `<inDir>/<table>.parquet`, remove TTLs,
    * write under `outDir`. The events-shaped convenience the driver
    * corpus uses; arbitrary tables go through [[removeTtl]] directly. */
  def removeTtlFromDir(spark: SparkSession, inDir: String, outDir: String,
      meta: TableMeta): Long = {
    val df = CellModel.cellify(Tables.load(spark, inDir, meta.table))
    removeTtl(df, meta, outDir)
  }
}
