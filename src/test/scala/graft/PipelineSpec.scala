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

  test("CLI path strips an arbitrary table (orders) end-to-end") {
    // parity with the reference CLI's --cql: the user declares keys +
    // cell columns on the command line and ANY table goes through the
    // same strip→sort→layout pipeline (TTLRemoverCLI.java:166-170)
    val out = Files.createTempDirectory("graft-cli-").toString + "/out"
    val argv = Array(
      "--in", sfDir, "--out", out, "--table", "orders",
      "--keyspace", "shop", "--pk", "o_orderkey",
      "--cells", "o_totalprice,o_orderstatus", "--writetime", "o_orderdate")
    val args = RemoverCli.parse(argv)
      .fold(e => fail(s"parse failed: $e"), identity)
    val written = RemoverCli.run(spark, args)
    val orders = Tables.load(spark, sfDir, "orders")
    assert(written === orders.count())

    val back = spark.read.parquet(out)
    val layout = back.select(col("_metadata.file_path")).limit(1)
      .head().getString(0)
    assert(layout.contains("/keyspace=shop/table_name=orders/"), layout)
    // both declared cell columns were wrapped and stripped
    assert(back.filter(col("o_totalprice.ttl_s").isNotNull).count() === 0)
    assert(back.filter(col("o_orderstatus.ttl_s").isNotNull).count() === 0)
    // values + writetimes byte-identical to the input
    val wt = unix_micros(col("o_orderdate").cast("timestamp"))
    val before = orders.select(
      col("o_orderkey"), col("o_totalprice").as("v"), wt.as("w"))
    val after = back.select(col("o_orderkey"),
      col("o_totalprice.value").as("v"),
      col("o_totalprice.writetime_us").as("w"))
    assert(before.exceptAll(after).count() === 0)
    assert(after.exceptAll(before).count() === 0)
    // the synthetic TTL model really put TTLs on the input side (the
    // strip had something to remove)
    val cellified = graft.model.CellModel.cellifySpec(
      orders, Seq("o_totalprice"), "o_orderdate", "o_orderkey")
    assert(cellified.filter(col("o_totalprice.ttl_s").isNotNull).count() > 0)
    // non-cell columns pass through untouched
    assert(back.select("o_custkey", "o_orderpriority")
      .exceptAll(orders.select("o_custkey", "o_orderpriority")).count() === 0)
  }

  test("CLI cell-spec validation") {
    def p(a: String*) = RemoverCli.parse(a.toArray)
    // a non-events table without a declared cell model is rejected at
    // parse time (the engine is generic; the CLI must be told which
    // columns carry liveness — reference: --cql is mandatory)
    assert(p("--in", "/a", "--out", "/b", "--table", "orders").isLeft)
    // --cells requires --pk and --writetime
    assert(p("--in", "/a", "--out", "/b", "--table", "orders",
      "--cells", "x").isLeft)
    assert(p("--in", "/a", "--out", "/b", "--table", "orders",
      "--cells", "x", "--pk", "k").isLeft)
    // keys never carry liveness
    assert(p("--in", "/a", "--out", "/b", "--table", "orders",
      "--cells", "k", "--pk", "k", "--writetime", "w").isLeft)
    // full spec parses, csv lists split
    val ok = p("--in", "/a", "--out", "/b", "--table", "orders",
      "--pk", "o_orderkey", "--cells", "o_totalprice, o_orderstatus",
      "--writetime", "o_orderdate", "--ttl-key", "o_custkey")
    assert(ok.map(a => (a.pk, a.cells, a.ttlKey)) ===
      Right((Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"),
        Some("o_custkey"))))
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
