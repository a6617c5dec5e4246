package graft

/** Contract of [[Tables.load]]'s session-conf pinning: pins apply by
  * default (the driver harness depends on them) and the
  * `spark.graft.pins=false` escape hatch leaves an embedder's own
  * session settings untouched.
  */
class TablesSpec extends SparkSpec {

  test("spark.graft.pins=false respects an embedder's pre-set timezone") {
    val s = spark.newSession()
    s.conf.set("spark.graft.pins", "false")
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    // documents is nanos-free, so the load works without the parquet pin
    assert(Tables.load(s, sfDir, "documents").count() > 0)
    assert(s.conf.get("spark.sql.session.timeZone") === "America/New_York")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
      !== "true")
  }

  test("default load() pins UTC + nanosAsLong on the session") {
    val s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    assert(Tables.load(s, sfDir, "documents").count() > 0)
    assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "true")
  }
}
