package graft

import java.nio.file.Files

import graft.model.CellModel
import org.apache.spark.sql.functions._

/** End-to-end round trip of the one-call removal pipeline — the
  * translated shape of the reference's own integration test (SURVEY
  * §5: write through the tool, read back, assert rows survive and
  * expiry is gone).
  */
class PipelineSpec extends SparkSpec {

  test("removeTtl: one call strips, sorts, lays out, and keeps originals") {
    val out = Files.createTempDirectory("graft-pipe-").toString + "/out"
    val written = Pipeline.removeTtlFromDir(
      spark, sfDir, out, CellModel.eventsMeta)
    val ev = Tables.load(spark, sfDir, "events")
    assert(written === ev.count())

    val back = spark.read.parquet(out)
    // layout: out/<ks>/<table>/ dirs really exist on disk
    val layout = back.select(col("_metadata.file_path")).limit(1)
      .head().getString(0)
    assert(layout.contains("/keyspace=graft/table_name=events/"), layout)
    // no TTL survives anywhere in the written data
    assert(back.filter(col("cell.ttl_s").isNotNull).count() === 0)
    // ...while the scalar (non-cell) ttl_s metadata column passes
    // through untouched: only cell-typed columns are rewritten
    val expectedScalarTtlRows =
      CellModel.cellify(ev).filter(col("ttl_s").isNotNull).count()
    assert(back.filter(col("ttl_s").isNotNull).count() ===
      expectedScalarTtlRows)
    assert(expectedScalarTtlRows > 0)
    // values + writetimes byte-identical to the input
    val before = CellModel.cellify(ev)
      .select(col("event_id"), col("cell.value"), col("cell.writetime_us"))
    val after = back
      .select(col("event_id"), col("cell.value"), col("cell.writetime_us"))
    assert(before.exceptAll(after).count() === 0)
    assert(after.exceptAll(before).count() === 0)

    // non-destructive: a second run refuses to clobber the output
    intercept[Exception] {
      Pipeline.removeTtlFromDir(spark, sfDir, out, CellModel.eventsMeta)
    }
  }

  test("RemoverCli.parse validates flags like the reference CLI") {
    // happy path with defaults
    val ok = RemoverCli.parse(Array(
      "--in", "/a", "--out", "/b", "--table", "events"))
    assert(ok === Right(RemoverCli.CliArgs("/a", "/b", "events")))
    // overrides
    val full = RemoverCli.parse(Array(
      "--in", "/a", "--out", "/b", "--table", "events",
      "--keyspace", "ks1", "--cpus", "4"))
    assert(full === Right(RemoverCli.CliArgs("/a", "/b", "events", "ks1", 4)))
    // the reference's validation rules, carried over
    assert(RemoverCli.parse(Array("--out", "/b", "--table", "t")).isLeft)
    assert(RemoverCli.parse(Array("--in", "/a", "--table", "t")).isLeft)
    assert(RemoverCli.parse(Array("--in", "/a", "--out", "/b")).isLeft)
    assert(RemoverCli.parse(Array(
      "--in", "/a", "--out", "/a", "--table", "t")).isLeft) // in == out
    assert(RemoverCli.parse(Array(
      "--in", "/a", "--out", "/b", "--table", "t", "--bogus", "x")).isLeft)
    assert(RemoverCli.parse(Array(
      "--in", "/a", "--in", "/c", "--out", "/b", "--table", "t")).isLeft)
    assert(RemoverCli.parse(Array(
      "--in", "/a", "--out", "/b", "--table", "t", "--cpus", "zero")).isLeft)
  }
}
