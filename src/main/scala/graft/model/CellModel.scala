package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

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

  val ordersMeta: TableMeta =
    TableMeta("graft", "orders", Seq("o_orderkey"), Seq.empty)

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
    * inside whole-stage codegen (no UDF). Works on any cell-struct
    * Column, including `transform`/`transform_values` lambda variables,
    * so one definition serves simple, map and array cells. */
  def stripCell(cell: Column): Column =
    struct(
      cell.getField("value").as("value"),
      cell.getField("writetime_us").as("writetime_us"),
      lit(null).cast("int").as("ttl_s"),
      lit(null).cast("long").as("expire_us"))

  /** The bridge-frame strip: P2's cell-kind dispatch on a nullable
    * cell column — EXPIRING cells (ttl_s set) are stripped to their
    * NO_TTL form; deletion markers (NULL cell) and deleted cells
    * (CELL_DELETION rows whose cell carries the tombstone's
    * `writetime_us`/`expire_us` but no TTL) pass through UNTOUCHED,
    * exactly the reference's expiring→plain / deleted→passthrough
    * dispatch (`Cassandra2TTLRemover.java:131-143`). An unconditional
    * strip here would null a cell tombstone's local deletion time and
    * resurrect deleted data on a later generation merge. Cells with no
    * TTL are left alone too (the strip is a no-op on them by
    * construction: `expire_us` is only ever set alongside `ttl_s`). */
  def stripCellKeepDeletion(cell: Column): Column =
    when(cell.isNotNull && cell.getField("ttl_s").isNotNull,
      stripCell(cell)).otherwise(cell)

  /** The canonical cell field names. A column "is a cell" iff its
    * struct carries exactly these fields — the value type is free,
    * matching the reference's type-generic ByteBuffer copy
    * (`Cassandra3TTLRemover.java:185,189`: values are never inspected).
    */
  val CellFieldNames: Set[String] =
    Set("value", "writetime_us", "ttl_s", "expire_us")

  /** Structural cell-type test, the schema-driven stand-in for the
    * reference's runtime CQL parse deciding which columns carry
    * liveness (`Cassandra3TTLRemover.java:63-75`). */
  def isCellStruct(dt: DataType): Boolean = dt match {
    case s: StructType => s.fieldNames.toSet == CellFieldNames
    case _ => false
  }

  /** Wrap a scalar column into a cell struct with deterministic
    * liveness: writetime from `writetimeUs`, TTL synthesized from
    * `ttlKey` via [[ttlSeconds]] (null = NO_TTL). The generic
    * cellifier for any table — [[cellify]] is its events-shaped
    * instance. */
  def mkCell(value: Column, writetimeUs: Column, ttlKey: Column): Column = {
    val ttl = ttlSeconds(ttlKey)
    struct(
      value.as("value"),
      writetimeUs.as("writetime_us"),
      ttl.as("ttl_s"),
      (writetimeUs + ttl.cast("long") * 1000000L).as("expire_us"))
  }

  /** Case-insensitive schema field lookup, matching Spark's default
    * (caseSensitive=false) column resolution so a declared name that
    * resolves in a query never misses here on case alone. */
  private def fieldOf(df: DataFrame, colName: String) =
    df.schema.find(_.name.equalsIgnoreCase(colName))

  /** Epoch-micros writetime from an arbitrary source column: timestamp
    * flavors convert exactly; a LONG column is taken as epoch micros
    * as-is. An INT column is rejected: Int.MaxValue micros is ~36 min
    * after 1970, so a 32-bit "writetime" is almost certainly
    * epoch-seconds or an id being misread — the caller must cast
    * explicitly to state the unit. The CLI's writetime resolution
    * rule — documented on the `--writetime` flag. */
  def writetimeMicros(df: DataFrame, colName: String): Column = {
    import org.apache.spark.sql.types._
    fieldOf(df, colName).map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) | Some(DateType) =>
        unix_micros(col(colName).cast("timestamp"))
      case Some(LongType) => col(colName).cast("long")
      case Some(IntegerType) => throw new IllegalArgumentException(
        s"--writetime column '$colName' is a 32-bit INT: epoch-MICROS " +
          "cannot fit in 32 bits, so this is probably epoch-seconds or " +
          "an id. Cast it to a timestamp or a long of epoch micros first.")
      case Some(dt) => throw new IllegalArgumentException(
        s"--writetime column '$colName' must be a timestamp/date or " +
          s"long epoch-micros column, got ${dt.simpleString}")
      case None => throw new IllegalArgumentException(
        s"--writetime column '$colName' missing from schema " +
          df.schema.simpleString)
    }
  }

  /** Declared cell model for an ARBITRARY table: wrap each named
    * column into a cell struct (writetime from `writetime`, synthetic
    * deterministic TTL keyed by `ttlKey` — the corpus-wide TTL
    * convention), leaving every other column untouched. This is the
    * CLI's `--cells`/`--writetime`/`--ttl-key` surface, the Spark
    * analogue of handing the reference CLI a CREATE TABLE to parse
    * (`TTLRemoverCLI.java:166-170` → `Cassandra3TTLRemover.java:63-75`):
    * the caller declares which columns carry liveness, the engine does
    * the rest schema-generically. Columns that are ALREADY cell-typed
    * (e.g. re-processing a previous graft write) need no wrapping —
    * [[stripAll]] picks them up structurally.
    *
    * A declared map/array column is cellified PER ELEMENT — each map
    * value / array element becomes its own cell struct, the reference's
    * CellPath model where every element of a non-frozen collection
    * carries independent liveness (`Cassandra3TTLRemover.java:180-186`
    * dispatches on `cdef.isComplex()`/`cell.path()`). [[stripAll]] then
    * strips those per-element cells through its `map<k, cell>` /
    * `array<cell>` branches.
    */
  def cellifySpec(df: DataFrame, cells: Seq[String], writetime: String,
      ttlKey: String): DataFrame = {
    import org.apache.spark.sql.types._
    // resolve every declared name case-insensitively (the fieldOf
    // contract: a name that resolves in a query never misses here)
    def resolve(flag: String)(c: String): String =
      fieldOf(df, c).map(_.name).getOrElse(throw new IllegalArgumentException(
        s"$flag column '$c' missing from schema ${df.schema.simpleString}"))
    val cellNames = cells.map(resolve("--cells")).toSet
    val ttlKeyName = resolve("--ttl-key")(ttlKey)
    // the TTL synthesis keys on an integral column; anything else would
    // cast to all-null TTLs and turn the strip into a silent no-op
    df.schema(ttlKeyName).dataType match {
      case LongType | IntegerType | ShortType | ByteType => ()
      case dt => throw new IllegalArgumentException(
        s"--ttl-key column '$ttlKey' must be an integral column (the " +
          s"deterministic TTL synthesis keys on it), got ${dt.simpleString}")
    }
    def alreadyCell(dt: DataType): Boolean = dt match {
      case MapType(_, v, _) => isCellStruct(v)
      case ArrayType(v, _) => isCellStruct(v)
      case other => isCellStruct(other)
    }
    cellNames.foreach { c =>
      require(!alreadyCell(df.schema(c).dataType),
        s"--cells column '$c' is already cell-typed; stripAll handles it")
    }
    val wt = writetimeMicros(df, writetime)
    val tk = col(ttlKeyName).cast("long")
    val cols = df.schema.fields.map { f =>
      if (!cellNames.contains(f.name)) col(f.name)
      else f.dataType match {
        // per-element TTL key offset by element identity (array index /
        // map-key length): distinct elements of one collection get
        // independent liveness, like distinct CellPaths in one complex
        // column — deterministic and reproducible by the SQL oracle
        case MapType(_, _, _) =>
          transform_values(col(f.name),
            (k, v) => mkCell(v, wt, tk + length(k.cast("string")))).as(f.name)
        case ArrayType(_, _) =>
          transform(col(f.name), (v, i) => mkCell(v, wt, tk + i)).as(f.name)
        case _ => mkCell(col(f.name), wt, tk).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Schema-generic TTL strip: rewrite EVERY cell-typed column of an
    * arbitrary DataFrame — simple `struct<cell>`, `map<k, cell>`
    * (map-key CellPath) and `array<cell>` (list-index / set-element
    * CellPath) — to its NO_TTL form, leaving key and non-cell columns
    * untouched. This is the reference's CQL-generic core
    * (`Cassandra3TTLRemover.java:63-75` parses any CREATE TABLE at run
    * time; `:167-196` rewrites whatever columns it declared, with
    * `:180-186` dispatching on `cdef.isComplex()`/`cell.path()`)
    * re-expressed as a StructType walk: the DataFrame's own schema IS
    * the parsed DDL. Column order, names and row count are preserved;
    * everything stays a declarative projection (codegen-friendly
    * `transform`/`transform_values`, no UDF), so Catalyst still prunes
    * and pushes filters below the strip.
    *
    * `meta` contributes validation: its partition/clustering keys must
    * exist in the schema and must not themselves be cell-typed (the
    * reference's primary keys never carry liveness — only regular
    * cells do).
    */
  def stripAll(df: DataFrame, meta: TableMeta): DataFrame = {
    (meta.partitionKeys ++ meta.clusteringKeys).foreach { k =>
      // case-insensitive like Spark's own resolver (fieldOf contract)
      val f = fieldOf(df, k).getOrElse(
        throw new IllegalArgumentException(
          s"key column '$k' of ${meta.keyspace}.${meta.table} missing " +
            s"from schema ${df.schema.simpleString}"))
      require(!isCellStruct(f.dataType),
        s"key column '$k' must not be cell-typed")
    }
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case dt if isCellStruct(dt) =>
          stripCell(col(f.name)).as(f.name)
        case MapType(_, v, _) if isCellStruct(v) =>
          transform_values(col(f.name), (_, c) => stripCell(c)).as(f.name)
        case ArrayType(v, _) if isCellStruct(v) =>
          transform(col(f.name), c => stripCell(c)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
