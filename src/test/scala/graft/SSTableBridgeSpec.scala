package graft

import java.nio.file.Files

import graft.sources.SSTableDumpBridge
import org.apache.spark.sql.functions._

/** Round-trip of the sstabledump-JSON ingestion bridge: a fixture in
  * the exact shape `sstabledump` emits (array of partitions → rows →
  * cells, ISO-8601 liveness timestamps, optional per-cell overrides,
  * row tombstones) converts to cell-model parquet, and the TTL-removal
  * pipeline runs over the converted directory preserving every row.
  */
class SSTableBridgeSpec extends SparkSpec {

  private val dump =
    """[
      |  {
      |    "partition" : { "key" : [ "alice" ], "position" : 0 },
      |    "rows" : [
      |      {
      |        "type" : "row",
      |        "position" : 30,
      |        "clustering" : [ "c1" ],
      |        "liveness_info" : { "tstamp" : "2021-01-01T00:00:00.000001Z",
      |                            "ttl" : 300,
      |                            "expires_at" : "2021-01-01T00:05:00Z",
      |                            "expired" : true },
      |        "cells" : [
      |          { "name" : "score", "value" : "42" },
      |          { "name" : "note", "value" : "hi",
      |            "tstamp" : "2021-01-02T00:00:00Z" }
      |        ]
      |      },
      |      {
      |        "type" : "row",
      |        "position" : 60,
      |        "clustering" : [ "c2" ],
      |        "deletion_info" : { "marked_deleted" : "2021-01-03T00:00:00Z",
      |                            "local_delete_time" : "2021-01-03T00:00:01Z" }
      |      }
      |    ]
      |  },
      |  {
      |    "partition" : { "key" : [ "bob" ], "position" : 100 },
      |    "rows" : [
      |      {
      |        "type" : "row",
      |        "position" : 130,
      |        "clustering" : [],
      |        "liveness_info" : { "tstamp" : "2021-02-01T00:00:00Z" },
      |        "cells" : [ { "name" : "score", "value" : "7", "ttl" : 60 } ]
      |      }
      |    ]
      |  }
      |]""".stripMargin

  private def writeDump(): String = {
    val dir = graft.Scratch.dir("graft-sstable-")
    Files.writeString(dir.resolve("mc-1-big-Data.json"), dump)
    dir.toString
  }

  test("dump parses to cell-model rows with Cassandra's liveness rules") {
    val df = SSTableDumpBridge.read(spark, writeDump())
    assert(df.count() === 4) // 3 live cells + 1 row tombstone

    val aliceScore = df.filter(col("partition_key") === "alice" &&
      col("name") === "score").head()
    val cell = aliceScore.getStruct(aliceScore.fieldIndex("cell"))
    assert(cell.getAs[String]("value") === "42")
    // row-level liveness is the cells' default
    assert(cell.getAs[Long]("writetime_us") === 1609459200000001L)
    assert(cell.getAs[Int]("ttl_s") === 300)
    assert(cell.getAs[Long]("expire_us") ===
      1609459200000001L + 300L * 1000000L)

    // a cell's own tstamp overrides the row default
    val note = df.filter(col("name") === "note").head()
    assert(note.getStruct(note.fieldIndex("cell"))
      .getAs[Long]("writetime_us") === 1609545600000000L)

    // per-cell ttl override, row without one
    val bob = df.filter(col("partition_key") === "bob").head()
    assert(bob.getStruct(bob.fieldIndex("cell")).getAs[Int]("ttl_s") === 60)

    // row tombstone preserved as a first-class row
    val ts = df.filter(col("row_kind") === "ROW_DELETION").head()
    assert(ts.getAs[Long]("deletion_us") === 1609632000000000L)
    assert(ts.isNullAt(ts.fieldIndex("cell")))
  }

  test("convert → removeTtl preserves rows and strips only liveness") {
    val out = graft.Scratch.dir("graft-sstable-out-").toString
    SSTableDumpBridge.convert(spark, writeDump(), out)

    val stripped = SSTableDumpBridge.removeTtl(spark, out)
    assert(stripped.count() === 4, "rows lost in the strip pipeline")
    // every live cell: value + writetime intact, ttl/expiration gone
    val live = stripped.filter(col("row_kind") === "ROW")
    assert(live.count() === 3)
    assert(live.filter(col("cell.ttl_s").isNotNull ||
      col("cell.expire_us").isNotNull).count() === 0,
      "TTL metadata survived the strip")
    val before = SSTableDumpBridge.read(spark, writeDump())
      .filter(col("row_kind") === "ROW")
      .select(col("partition_key"), col("name"),
        col("cell.value"), col("cell.writetime_us"))
    val after = live.select(col("partition_key"), col("name"),
      col("cell.value"), col("cell.writetime_us"))
    assert(before.exceptAll(after).isEmpty && after.exceptAll(before).isEmpty,
      "values or writetimes changed across the bridge strip")
    // tombstones ride through verbatim
    assert(stripped.filter(col("row_kind") === "ROW_DELETION")
      .head().getAs[Long]("deletion_us") === 1609632000000000L)
  }

  test("RemoverCli --format sstabledump runs the whole lifecycle over a dump") {
    val in = writeDump()
    val out = graft.Scratch.dir("graft-sstable-cli-").toString + "/o"
    val parsed = RemoverCli.parse(Array(
      "--in", in, "--out", out, "--table", "tbl",
      "--keyspace", "realks", "--format", "sstabledump"))
    val args = parsed.fold(e => fail(s"parse failed: $e"), identity)
    assert(RemoverCli.run(spark, args) === 4L)
    val back = spark.read.parquet(out)
    assert(back.count() === 4)
    // layout on disk + no liveness metadata left on live cells
    assert(back.select(org.apache.spark.sql.functions
      .col("_metadata.file_path")).collect()
      .forall(_.getString(0).contains("/keyspace=realks/table_name=tbl/")))
    assert(back.filter(col("row_kind") === "ROW" &&
      (col("cell.ttl_s").isNotNull || col("cell.expire_us").isNotNull))
      .count() === 0)
    // a cell-model spec alongside the dump format is rejected
    assert(RemoverCli.parse(Array(
      "--in", in, "--out", out, "--table", "tbl",
      "--format", "sstabledump", "--cells", "x")).isLeft)
    assert(RemoverCli.parse(Array(
      "--in", in, "--out", out, "--table", "tbl",
      "--format", "avro")).isLeft)
  }
}
