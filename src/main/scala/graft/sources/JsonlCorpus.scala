package graft.sources

import graft.{Scratch, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) corpus ingestion — the wire format
  * large text corpora actually arrive in (Common-Crawl-style dumps,
  * vendor drops), complementing the parquet-native path in
  * [[graft.Tables]] and the Cassandra bridge in [[SSTableDumpBridge]].
  *
  * Reference analogue: SURVEY §2.1 S1/S3 (directory discovery + full
  * scan) applied to a line-delimited text source instead of SSTables
  * (`TTLRemoverCLI.java:147-163` walks a data directory the same way).
  *
  * Scale shape, deliberately:
  *  - `multiLine` stays false, so every file is SPLITTABLE: Spark
  *    assigns line-aligned byte ranges of one big .jsonl file to
  *    different tasks. A 100 TB dump of a few thousand large files
  *    parallelizes to full cluster width without a repack step.
  *  - The schema is DECLARED, never inferred: inference is a full
  *    extra pass over the corpus (2× the dominant cost at scale) and
  *    drifts with whichever optional fields happen to appear first.
  *  - Malformed lines are ACCOUNTED, not fatal and not silently
  *    dropped: at corpus scale some records are always broken
  *    (truncated uploads, encoding damage), and a reader that either
  *    dies on the first bad line or hides the loss is unusable.
  *    PERMISSIVE mode routes each bad line to `_corrupt_record`;
  *    [[corruptAccounting]] surfaces the three classes (parse
  *    failure / schema miss / good) as first-class counts, mirroring
  *    the corrupt-SSTable skip-and-count contract
  *    (`TTLRemoverCLI.java:169-175`, SURVEY §2.1 S10).
  */
object JsonlCorpus {

  /** The documents-table schema, declared for the JSONL rendering. */
  val docSchema: StructType = StructType.fromDDL(
    "doc_id bigint, text string, lang string, source string, n_chars bigint")

  /** Read a JSONL directory with corrupt-line accounting: the declared
    * schema plus `_corrupt_record` holding the raw text of every line
    * that failed to parse (null for clean rows).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(docSchema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Round-trip witness: serialize the documents table to scratch
    * JSONL, read it back through [[read]]'s declared schema, and prove
    * content survival with order-independent aggregates — row count,
    * char sums, and a distinct-count over a full-row md5 (any field
    * mangled in transit changes the digest set). The aggregate is
    * checkpointed so the scratch dir can be deleted eagerly.
    */
  def roundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val out = Scratch.dir("graft-jsonl-")
    Tables.load(spark, sfDir, "documents")
      .write.mode("overwrite").json(out.toString)
    val back = spark.read.schema(docSchema).json(out.toString)
    val agg = back.agg(
      count(lit(1)).as("n_docs"),
      sum("n_chars").as("total_chars"),
      countDistinct("lang").as("n_langs"),
      sum(length(col("text"))).as("total_text_len"),
      countDistinct(md5(concat_ws(":",
        col("doc_id").cast("string"), col("text"), col("lang"),
        col("source")))).as("n_distinct_rows"))
      .localCheckpoint()
    Scratch.delete(out)
    agg
  }

  /** Deterministic damage fixture: three syntactically broken lines
    * (parse failures) and one well-formed object matching none of the
    * schema's fields (schema miss — parses, but contributes an
    * all-null row). Exercises both ways a line can be bad.
    */
  private val corruptLines = Seq(
    "this line is not json",
    "{\"doc_id\": 17, \"text\": \"unterminated",
    "{\"doc_id\":",
    "{\"unknown_field\": 1}")

  /** Serialize the documents table plus [[corruptLines]] into a
    * scratch JSONL dir — the damage fixture shared by the batch
    * accounting query and the streaming-ingest variant. Caller owns
    * the returned dir's deletion.
    */
  def writeDamagedFixture(spark: SparkSession,
      sfDir: String): java.nio.file.Path = {
    import spark.implicits._
    val out = writeCleanFixture(spark, sfDir)
    corruptLines.toDF("value")
      .coalesce(1).write.mode("append").text(out.toString)
    out
  }

  /** Serialize the documents table to a scratch JSONL dir, undamaged —
    * the landing-zone stand-in for streaming ingestion of a clean
    * vendor drop. Caller owns the returned dir's deletion.
    */
  def writeCleanFixture(spark: SparkSession,
      sfDir: String): java.nio.file.Path = {
    val out = Scratch.dir("graft-jsonl-c-")
    Tables.load(spark, sfDir, "documents")
      .write.mode("overwrite").json(out.toString)
    out
  }

  /** The accounting aggregate columns, shared verbatim by the batch
    * and streaming forms so both compare against the same oracle:
    * total lines, parse failures, schema misses, good rows, and the
    * good-side char sum (proves damaged lines poison nothing).
    */
  val accountingCols: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_lines"),
    count(col("_corrupt_record")).as("n_parse_fail"),
    sum(when(col("_corrupt_record").isNull && col("doc_id").isNull, 1L)
      .otherwise(0L)).as("n_schema_miss"),
    count(col("doc_id")).as("n_good"),
    sum(when(col("_corrupt_record").isNull, col("n_chars")))
      .as("good_chars"))

  /** Corrupt-line accounting over the damage fixture (batch form). */
  def corruptAccounting(spark: SparkSession, sfDir: String): DataFrame = {
    val out = writeDamagedFixture(spark, sfDir)
    val agg = read(spark, out.toString)
      .agg(accountingCols.head, accountingCols.tail: _*)
      .localCheckpoint()
    Scratch.delete(out)
    agg
  }
}
