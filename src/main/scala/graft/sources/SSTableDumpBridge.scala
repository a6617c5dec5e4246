package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion bridge from `sstabledump` JSON to the engine's cell-model
  * parquet — the documented path for pointing this library at a REAL
  * Cassandra data directory without a native SSTable reader.
  *
  * The reference consumes binary SSTables directly
  * (`Cassandra3TTLRemover.java:86,103` opening `*-Data.db` via the
  * bundled Cassandra internals); a Spark library can't link those
  * internals, but every Cassandra install ships `sstabledump`, which
  * emits one JSON document per SSTable: an array of partitions, each
  * with a key, rows (clustering + liveness_info + cells), and
  * deletion markers. This bridge maps that public, stable format onto
  * the same cell structs [[graft.model.CellModel]] defines, so the
  * whole operator surface (TTL strip, liveness filters, sorted sink,
  * partitioned layout) runs unchanged on converted real data:
  *
  *   sstabledump x-Data.db > dump.json      (per SSTable, outside Spark)
  *   SSTableDumpBridge.convert(spark, dumps, out)
  *   TtlOps / CellModel.stripAll over spark.read.parquet(out)
  *
  * Liveness mapping (sstabledump field → cell field):
  *   - row `liveness_info.tstamp` (ISO-8601) → writetime_us; a cell's
  *     own `tstamp` overrides its row's (exactly Cassandra's rule:
  *     cells carry timestamps, the row-level info is the shared
  *     default).
  *   - `ttl` seconds (row-level default, cell-level override) → ttl_s;
  *     absent = NO_TTL (null).
  *   - expire_us derives as writetime + ttl (the `expires_at` field is
  *     redundant with them and ignored).
  *   - a row with `deletion_info` instead of `liveness_info` is a row
  *     tombstone: kind=ROW_DELETION, deletion_us from
  *     `marked_deleted`, no cells required — preserved as a row, same
  *     contract as [[graft.ops.TtlOps.deletionPreserve]].
  *
  * Values are kept as STRINGS (the JSON rendering): the reference
  * itself never interprets values (type-generic ByteBuffer copy,
  * `Cassandra3TTLRemover.java:185,189`), and the strip/liveness
  * operators only touch the liveness fields, so a lossless string
  * carry is the honest analogue. Scale shape: one JSON file per
  * SSTable → one task per file; everything after `spark.read.json` is
  * a projection + two explodes (partitions → rows → cells), no
  * shuffle at all until a downstream operator asks for one.
  */
object SSTableDumpBridge {

  /** sstabledump's document schema, declared explicitly: schema
    * inference over a directory of dumps would both cost a pass and
    * drift with whichever optional fields happen to appear; unknown
    * extra fields are ignored by Spark's JSON reader, absent ones
    * read as null — exactly the tolerance a bridge needs. */
  val dumpSchema: StructType = StructType.fromDDL(
    """partition struct<key:array<string>,position:bigint,
      |  deletion_info:struct<marked_deleted:string,local_delete_time:string>>,
      |rows array<struct<
      |  type:string,position:bigint,clustering:array<string>,
      |  liveness_info:struct<tstamp:string,ttl:int,expires_at:string,
      |    expired:boolean>,
      |  deletion_info:struct<marked_deleted:string,local_delete_time:string>,
      |  cells:array<struct<name:string,value:string,tstamp:string,ttl:int,
      |    expires_at:string>>>>""".stripMargin)

  private def isoToMicros(c: org.apache.spark.sql.Column) =
    unix_micros(to_timestamp(c))

  /** One cell-model row per cell (plus one per row tombstone):
    * (partition_key, clustering, row_kind, name, cell) with `cell` the
    * canonical `struct<value, writetime_us, ttl_s, expire_us>` every
    * graft operator consumes, and deletion_us carried for tombstones.
    */
  def read(spark: SparkSession, dumpPath: String): DataFrame = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = spark.read.schema(dumpSchema)
      .option("multiLine", "true").json(dumpPath)
    val rows = raw
      .select(
        concat_ws(":", col("partition.key")).as("partition_key"),
        explode(col("rows")).as("r"))
      .filter(col("r.type") === "row")
    val live = rows.filter(col("r.deletion_info").isNull)
      .select(
        col("partition_key"),
        col("r.clustering").as("clustering"),
        lit("ROW").as("row_kind"),
        explode(col("r.cells")).as("c"),
        isoToMicros(col("r.liveness_info.tstamp")).as("row_wt_us"),
        col("r.liveness_info.ttl").as("row_ttl_s"))
      .select(
        col("partition_key"), col("clustering"), col("row_kind"),
        col("c.name").as("name"),
        struct(
          col("c.value").as("value"),
          // cell-level liveness overrides the row-level default
          coalesce(isoToMicros(col("c.tstamp")), col("row_wt_us"))
            .as("writetime_us"),
          coalesce(col("c.ttl"), col("row_ttl_s")).as("ttl_s"),
          (coalesce(isoToMicros(col("c.tstamp")), col("row_wt_us")) +
            coalesce(col("c.ttl"), col("row_ttl_s")).cast("long") * 1000000L)
            .as("expire_us")).as("cell"),
        lit(null).cast("long").as("deletion_us"))
    val tombstones = rows.filter(col("r.deletion_info").isNotNull)
      .select(
        col("partition_key"),
        col("r.clustering").as("clustering"),
        lit("ROW_DELETION").as("row_kind"),
        lit(null).cast("string").as("name"),
        lit(null).cast(
          "struct<value:string,writetime_us:bigint,ttl_s:int,expire_us:bigint>")
          .as("cell"),
        isoToMicros(col("r.deletion_info.marked_deleted")).as("deletion_us"))
    live.unionByName(tombstones)
  }

  /** Convert a dump (file or directory of dumps) to cell-model
    * parquet under `outDir` — the bridge's batch entry point. */
  def convert(spark: SparkSession, dumpPath: String, outDir: String): Unit =
    read(spark, dumpPath).write.mode("overwrite").parquet(outDir)

  /** The reference's core pipeline over bridge rows: strip TTL
    * metadata from every live cell (value + writetime survive,
    * ttl/expiration nulled), keep tombstones verbatim — then the S8
    * sorted-sink shape on the partition key. A tombstone's NULL cell
    * must stay NULL (an unconditional struct rewrite would turn it
    * into a struct of nulls), hence the isNotNull guard. */
  def stripTtl(cells: DataFrame): DataFrame =
    cells
      .select(
        col("partition_key"), col("clustering"), col("row_kind"),
        col("name"),
        when(col("cell").isNotNull,
          graft.model.CellModel.stripCell(col("cell")))
          .otherwise(col("cell")).as("cell"),
        col("deletion_us"))
      .repartition(col("partition_key"))
      .sortWithinPartitions(col("partition_key"), col("clustering"),
        col("name"))

  /** [[stripTtl]] over a CONVERTED parquet directory. */
  def removeTtl(spark: SparkSession, cellParquetDir: String): DataFrame =
    stripTtl(spark.read.parquet(cellParquetDir))

  /** Whole lifecycle from raw sstabledump JSON: read → strip →
    * sorted, `out/<ks>/<table>/`-laid-out parquet write. Returns the
    * written row count (write-side `observe`, same no-read-back
    * discipline as [[graft.Pipeline.removeTtl]]) — the CLI's
    * `--format sstabledump` entry point. */
  def removeTtlToDir(spark: SparkSession, dumpPath: String, outDir: String,
      keyspace: String, table: String,
      saveMode: String = "errorifexists"): Long = {
    val written = org.apache.spark.sql.Observation()
    stripTtl(read(spark, dumpPath))
      .withColumn("keyspace", lit(keyspace))
      .withColumn("table_name", lit(table))
      .observe(written, count(lit(1)).as("rows"))
      .write.partitionBy("keyspace", "table_name")
      .mode(saveMode).parquet(outDir)
    written.get("rows").asInstanceOf[Long]
  }
}
