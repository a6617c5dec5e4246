package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cassandra-style cell/liveness modeling on DataFrames.
  *
  * The reference's unit of data is a partition of rows of cells, where
  * each cell carries `(value, writetime, ttl, localExpirationTime)`
  * (SURVEY §1.1; `Cassandra3TTLRemover.java:167-196`). We model a cell as
  * a struct column `struct<value, writetime_us, ttl_s, expire_us>` with a
  * nullable `ttl_s` standing in for `NO_TTL`.
  *
  * TTL metadata is synthesized *deterministically* from the events table
  * so a SQL oracle can reproduce it:
  *   - writetime_us = epoch micros of `ts`
  *   - every third event (event_id % 3 == 0) carries a TTL of
  *     (event_id % 7 + 1) days; others have no TTL
  *   - expire_us = writetime_us + ttl_s * 1e6
  */
object CellModel {

  /** Table identity + key structure, the Spark stand-in for the
    * reference's CFMetaData/TableMetadata parsed from CQL
    * (`Cassandra3TTLRemover.java:63-75`, SURVEY §1.3).
    */
  final case class TableMeta(
      keyspace: String,
      table: String,
      partitionKeys: Seq[String],
      clusteringKeys: Seq[String])

  /** Fixed "now" used for expiry checks so results are reproducible:
    * 2024-01-15T00:00:00Z in epoch micros (mid-range of events.ts).
    * Reference analogue: `expireBefore = System.currentTimeMillis()/1000`
    * (`NoTTLSSTableIdentityIterator.java:55`) — we pin it for determinism.
    */
  val NowMicros: Long = 1705276800000000L

  val eventsMeta: TableMeta =
    TableMeta("graft", "events", Seq("user_id"), Seq("ts", "event_id"))

  /** Deterministic TTL seconds for an event row; null = NO_TTL. */
  def ttlSeconds(eventId: Column): Column =
    when(eventId % 3 === 0, ((eventId % 7) + 1).cast("int") * 86400)
      .otherwise(lit(null).cast("int"))

  /** Attach liveness metadata and wrap `value` into a cell struct.
    * Output adds: writetime_us, ttl_s, expire_us, cell.
    * `ts` arrives as epoch-nanos long (Tables.load); writetime is its
    * micros truncation — same as the oracle's `epoch_us(ts)`. */
  def cellify(events: DataFrame): DataFrame =
    events
      .withColumn("writetime_us", expr("ts div 1000"))
      .withColumn("ttl_s", ttlSeconds(col("event_id")))
      .withColumn(
        "expire_us",
        col("writetime_us") + col("ttl_s").cast("long") * 1000000L)
      .withColumn(
        "cell",
        struct(
          col("value").as("value"),
          col("writetime_us").as("writetime_us"),
          col("ttl_s").as("ttl_s"),
          col("expire_us").as("expire_us")))

  /** A cell is live at `nowUs` iff it has no TTL or has not yet expired.
    * Mirrors the `localExpirationTime < expireBefore` check on the C2
    * read path (`NoTTLColumnSerializer.java:33-40`). */
  def isLive(cell: Column, nowUs: Long): Column =
    cell.getField("ttl_s").isNull || cell.getField("expire_us") > nowUs

  /** P1: the core TTL-strip projection — keep value + writetime, drop
    * ttl/expiration (`Cassandra3TTLRemover.serializeRow`,
    * `Cassandra3TTLRemover.java:167-196`). Pure struct rewrite; stays
    * inside whole-stage codegen (no UDF). */
  def stripCell(cell: Column): Column =
    struct(
      cell.getField("value").as("value"),
      cell.getField("writetime_us").as("writetime_us"),
      lit(null).cast("int").as("ttl_s"),
      lit(null).cast("long").as("expire_us"))
}
