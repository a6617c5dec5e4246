package graft

import graft.model.CellModel
import graft.ops.TtlOps
import org.apache.spark.sql.functions._

/** Catalog-registration path — the `saveAsTable`/metastore analogue of
  * C2 loading its schema from the data directory's own system tables
  * (`Cassandra2TTLRemover.java:48`): once a table is registered, a
  * query names it through the catalog and the engine resolves schema
  * and location itself, no path or footer in caller hands.
  */
class CatalogSpec extends SparkSpec {

  test("registered query runs identically against a catalog table") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graftcat")
    val src = Tables.load(spark, sfDir, "events")
    src.write.mode("overwrite").saveAsTable("graftcat.events")
    val cat = spark.table("graftcat.events")
    // schema round-trips through the catalog (names + types)
    assert(cat.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // the p1 strip — a registered query body — over the catalog table
    // is row-identical to the parquet-path run
    val fromPath = TtlOps.ttlStrip(spark, sfDir)
    val fromCatalog = TtlOps.ttlStripOf(cat)
    assert(fromCatalog.count() === fromPath.count())
    assert(fromPath.exceptAll(fromCatalog).count() === 0)
    assert(fromCatalog.exceptAll(fromPath).count() === 0)
  }

  test("stripped output round-trips cell structs through the catalog") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graftcat")
    val stripped = CellModel.stripAll(
      CellModel.cellify(Tables.load(spark, sfDir, "events")),
      CellModel.eventsMeta)
    stripped.write.mode("overwrite").saveAsTable("graftcat.events_nottl")
    val back = spark.table("graftcat.events_nottl")
    // the nested cell struct survives the metastore round trip intact,
    // and the written data is TTL-free
    assert(back.schema("cell").dataType === stripped.schema("cell").dataType)
    assert(back.filter(col("cell.ttl_s").isNotNull).count() === 0)
    assert(back.count() === stripped.count())
  }
}
