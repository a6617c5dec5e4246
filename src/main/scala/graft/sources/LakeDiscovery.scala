package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Live schema discovery over an on-disk lake — the engine-side
  * analogue of the reference's boot-time schema load: Cassandra 2's
  * remover calls `Schema.instance.loadFromDisk`
  * (`cassandra-2/.../Cassandra2TTLRemover.java:48`) to reconstruct
  * every keyspace/table definition from the data directory itself,
  * then validates each input file's keyspace against that discovered
  * catalog (`:58`) and derives its (ks, cf) identity from the on-disk
  * path (`:65`, `Descriptor.fromFilename`). Here the same contract
  * over a parquet lake laid out `root/<keyspace>/<table>/` (the s9
  * output layout): walk the two directory levels, read each table's
  * schema from parquet FOOTERS (metadata-only — no data pages), and
  * emit one catalog row per table with its column inventory and row
  * count.
  *
  * Scale shape: discovery is a metadata operation, exactly as in the
  * reference — the directory walk and footer reads touch O(tables)
  * filesystem entries, never data; the per-table row counts come from
  * parquet row-group metadata (Spark's parquet count() reads no
  * column pages). The catalog result is tables-sized, the one frame
  * in this engine that is legitimately driver-built.
  */
object LakeDiscovery {

  /** Walk `root/<ks>/<table>/` and build the catalog. Non-directory
    * entries at either level are skipped (the reference skips
    * non-sstable files in its data dirs); a table directory with no
    * readable parquet footer fails loudly — a half-written table is
    * a lake corruption the catalog must not paper over.
    *
    * The two-level directory walk stays on the driver (O(tables)
    * listings, unavoidable to even know the work list); the footer
    * and row-group reads — the part that is O(tables × files) and
    * used to loop serially on the driver — DISTRIBUTE: one task per
    * table opens its own footers executor-side, so a 10⁵-table lake
    * catalogs at cluster parallelism while the RESULT stays
    * tables-sized on the driver (the one legitimately driver-built
    * frame here). Schemas come from each table's first footer through
    * Spark's own parquet→Catalyst converter fed with the session's
    * Hadoop conf, so the rendered types match what `spark.read` would
    * resolve. */
  def discover(spark: SparkSession, root: String): DataFrame = {
    val h = spark.sessionState.newHadoopConf()
    // the parquet→Catalyst converter's Configuration constructor reads
    // these SQL entries (Spark's own scans inject them the same way in
    // ParquetFileFormat); the session RUNTIME conf supplies the
    // effective value, defaults included
    Seq("spark.sql.parquet.binaryAsString",
      "spark.sql.parquet.int96AsTimestamp",
      "spark.sql.caseSensitive",
      "spark.sql.parquet.inferTimestampNTZ.enabled",
      "spark.sql.legacy.parquet.nanosAsLong",
      "spark.sql.parquet.fieldId.read.enabled")
      .foreach(k => h.set(k, spark.conf.get(k)))
    val hconf = new org.apache.spark.util.SerializableConfiguration(h)
    val fs = FileSystem.get(java.net.URI.create(root), hconf.value)
    val tables = (for {
      ks <- fs.listStatus(new Path(root)).toSeq if ks.isDirectory
      t <- fs.listStatus(ks.getPath).toSeq if t.isDirectory
    } yield (ks.getPath.getName, t.getPath.getName, t.getPath.toString))
      .sortBy(t => (t._1, t._2))
    val rows = spark.sparkContext
      .parallelize(tables, math.max(1, math.min(tables.size, 32)))
      .map { case (ks, table, path) =>
        val tfs = FileSystem.get(java.net.URI.create(path), hconf.value)
        val files = tfs.listStatus(new Path(path)).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName)
        require(files.nonEmpty, s"$ks/$table: no parquet footers")
        var schema: Option[org.apache.parquet.schema.MessageType] = None
        val nRows = files.map { f =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(f.getPath, hconf.value))
          try {
            if (schema.isEmpty)
              schema = Some(r.getFooter.getFileMetaData.getSchema)
            r.getRecordCount
          } finally r.close()
        }.sum
        val cols = new org.apache.spark.sql.execution.datasources.parquet
          .ParquetToSparkSchemaConverter(hconf.value)
          .convert(schema.get).fields
          .map(f => s"${f.name}:${f.dataType.simpleString}")
        Row(ks, table, cols.length, cols.mkString(","), nRows)
      }
      .collect()
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("keyspace", StringType, nullable = false),
        StructField("table_name", StringType, nullable = false),
        StructField("n_cols", IntegerType, nullable = false),
        StructField("col_list", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false))))
  }

  /** Deterministic lake fixture derived from the documents table:
    * keyspace = `ks<numeric source suffix mod 4>` (4 keyspaces —
    * catalog-sized, not source-sized), tables t0/t1/t2 split by
    * doc_id % 3, each table index with its own (pinned, widening)
    * schema — so the discovered catalog is arithmetically replayable
    * by the oracle.
    * Written as one partitioned job per table shape (schemas differ
    * per table, so one union write would smear every column into
    * every footer), then the hive-style `keyspace=<v>` partition dirs
    * move under plain `<ks>/<table>/` names — the reference's raw
    * directory layout, which is the thing [[discover]] must parse. */
  def writeLakeFixture(spark: SparkSession,
      sfDir: String): java.nio.file.Path = {
    val out = graft.Scratch.dir("graft-lake-")
    val d = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        concat(lit("ks"), (substring(col("source"), 4, 10).cast("int")
          % 4).cast("string")).as("source"),
        col("n_chars").cast("long").as("n_chars"),
        length(col("text")).cast("int").as("text_len"),
        (col("doc_id") % 2 === 0).as("is_even"),
        (col("doc_id") % 3).cast("int").as("t"))
    val shapes: Seq[(Int, Seq[String])] = Seq(
      0 -> Seq("doc_id", "n_chars"),
      1 -> Seq("doc_id", "n_chars", "text_len"),
      2 -> Seq("doc_id", "n_chars", "text_len", "is_even"))
    val fsRoot = java.nio.file.Paths.get(out.toString)
    shapes.foreach { case (ti, cols) =>
      val tmp = out.resolve(s"_tmp_t$ti")
      d.filter(col("t") === ti)
        .select((col("source").as("keyspace") +: cols.map(col)): _*)
        .repartition(1)
        .write.partitionBy("keyspace").mode("overwrite")
        .parquet(tmp.toString)
      val files = java.nio.file.Files.list(tmp)
      try files.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("keyspace=")) {
          val ks = name.stripPrefix("keyspace=")
          val dest = fsRoot.resolve(ks).resolve(s"t$ti")
          java.nio.file.Files.createDirectories(dest.getParent)
          java.nio.file.Files.move(p, dest)
        }
      } finally files.close()
      graft.Scratch.delete(tmp)
    }
    out
  }

  /** Registered schema-evolution audit (`src_schema_evolution`) — the
    * lake fact discovery alone can't witness: a TABLE's schema widens
    * over time, and readers must serve old and new files together. The
    * fixture writes two file generations into ONE table directory
    * (gen 1: even doc_ids, `(doc_id, n_chars)`; gen 2: odd doc_ids,
    * plus a `text_len` column), reads them back through
    * `mergeSchema` — Spark's footer-union schema resolution — and
    * audits per generation: row counts, value sums, and the NULL mass
    * the missing column back-fills. A reader that dropped pre-widening
    * files, or back-filled anything but null, shifts an aggregate.
    * Scale shape: schema union is footer metadata (the lake's
    * O(files) boot cost, amortized by catalog caching); the scan
    * itself stays one pass, no shuffle until the audit groupBy. */
  def schemaEvolutionAudit(spark: SparkSession,
      sfDir: String): DataFrame = {
    val out = graft.Scratch.dir("graft-evo-")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("n_chars"))
      .write.mode("overwrite").parquet(out.toString)
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("n_chars"),
        length(col("text")).cast("long").as("text_len"))
      .write.mode("append").parquet(out.toString)
    val audit = spark.read.option("mergeSchema", "true")
      .parquet(out.toString)
      .groupBy(col("text_len").isNotNull.as("has_text_len"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("n_chars")).cast("long").as("sum_n_chars"),
        sum(col("text_len")).cast("long").as("sum_text_len"))
      .localCheckpoint()
    graft.Scratch.delete(out)
    audit
  }

  /** Registered discovery audit: build the lake fixture, discover it
    * back, return the catalog (checkpointed so the scratch lake can
    * be deleted eagerly). The oracle replays keyspaces, table split,
    * schemas, and row counts arithmetically from documents. */
  def discoveryAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val out = writeLakeFixture(spark, sfDir)
    val catalog = discover(spark, out.toString).localCheckpoint()
    graft.Scratch.delete(out)
    catalog
  }
}
