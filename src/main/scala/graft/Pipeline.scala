package graft

import graft.model.CellModel
import graft.model.CellModel.TableMeta
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * cell-modeled columns. Returns the written row count. */
  def removeTtl(df: DataFrame, meta: TableMeta, outDir: String,
      saveMode: String = "errorifexists"): Long = {
    val keys = (meta.partitionKeys ++ meta.clusteringKeys).map(col)
    val stripped = CellModel.stripAll(df, meta)
    stripped
      .withColumn("keyspace", lit(meta.keyspace))
      .withColumn("table_name", lit(meta.table))
      .repartition(meta.partitionKeys.map(col): _*)
      .sortWithinPartitions(keys: _*)
      .write
      .partitionBy("keyspace", "table_name")
      .mode(saveMode)
      .parquet(outDir)
    // count from the written files — the pipeline's own smoke check,
    // mirroring the reference's post-load row assertion (SURVEY §5)
    df.sparkSession.read.parquet(outDir).count()
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
