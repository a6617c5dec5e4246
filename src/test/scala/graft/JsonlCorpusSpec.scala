package graft

import graft.sources.JsonlCorpus
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** JSONL ingestion + PII scrub witnesses beyond the value oracle:
  * the corrupt-accounting arithmetic closes, damaged lines never
  * poison clean rows, and the scrubber leaves no live pattern behind
  * (redaction completeness is a guarantee about ANY text, so it is
  * pinned here rather than only value-matched on one fixture).
  */
class JsonlCorpusSpec extends SparkSpec {

  test("corrupt accounting: categories are disjoint and exhaustive") {
    val row = JsonlCorpus.corruptAccounting(spark, sfDir).collect()(0)
    val (lines, parseFail, schemaMiss, good) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(parseFail === 3L, "three syntactically broken lines injected")
    assert(schemaMiss === 1L, "one well-formed schema-miss line injected")
    assert(lines === parseFail + schemaMiss + good,
      "every line lands in exactly one category")
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(good === nDocs, "all clean rows survive the damage")
  }

  test("roundtrip digest set proves field-level survival") {
    val row = JsonlCorpus.roundtrip(spark, sfDir).collect()(0)
    val nDocs = row.getAs[Long]("n_docs")
    val nDistinct = row.getAs[Long]("n_distinct_rows")
    val base = Tables.load(spark, sfDir, "documents")
    assert(nDocs === base.count())
    // full-row digests from the JSONL read-back must equal the
    // digest count computed straight off parquet — any serialization
    // mangling (precision, encoding, null handling) breaks this
    val want = base.agg(countDistinct(md5(concat_ws(":",
      col("doc_id").cast("string"), col("text"), col("lang"),
      col("source")))).as("n")).collect()(0).getLong(0)
    assert(nDistinct === want)
  }

  test("streaming ingest accounting equals the batch accounting") {
    val st = graft.streaming.StreamingOps.jsonlIngest(spark, sfDir)
    val b = JsonlCorpus.corruptAccounting(spark, sfDir)
    assert(st.schema === b.schema)
    assert(st.collect()(0) === b.collect()(0),
      "Complete-mode final emission must equal the batch aggregate")
  }

  test("scrubPii leaves no live pattern and preserves PII-free text") {
    import spark.implicits._
    val cases = Seq(
      "mail me at a.b+c@sub.example.org today",
      "twice: x@y.io and z@w.co",
      "call 555-123-4567 now",
      "host 192.168.0.1 responded",
      "mixed bob@corp.net 10.0.0.7 555-000-1111",
      "no pii here at all, just text. 1.2 not-an-ip 3.4",
      "")
    val scrubbed = cases.toDF("text")
      .select(TextOps.scrubPii(col("text")).as("s")).as[String].collect()
    val patterns = Seq(TextOps.emailRe, TextOps.phoneRe, TextOps.ipv4Re)
    for (s <- scrubbed; p <- patterns)
      assert(!p.r.findFirstIn(s).isDefined, s"live PII left in: $s")
    assert(scrubbed(0) === "mail me at <EMAIL> today")
    assert(scrubbed(1) === "twice: <EMAIL> and <EMAIL>")
    assert(scrubbed(2) === "call <PHONE> now")
    assert(scrubbed(3) === "host <IP> responded")
    assert(scrubbed(4) === "mixed <EMAIL> <IP> <PHONE>")
    assert(scrubbed(5) === cases(5), "PII-free text must pass unchanged")
    assert(scrubbed(6) === "")
  }
}
