package graft

import graft.model.CellModel
import org.apache.spark.sql.SparkSession

/** Command-line shell over [[Pipeline]] — the analogue of the
  * reference's `TTLRemoverCLI` (`impl/.../cli/TTLRemoverCLI.java:
  * 25-105`): parse and validate flags, resolve the implementation,
  * run the removal, report. The reference's validation rules carry
  * over where they still mean something (`TTLRemoverCLI.java:
  * 165-197`): input and output are required, output must differ from
  * input (non-destructive), exactly one table per run. Schema/DDL
  * flags have no analogue — the parquet schema IS the DDL
  * (SURVEY §1.3).
  *
  * Usage:
  *   graft.RemoverCli --in <dir> --out <dir> --table <name>
  *     [--keyspace <ks>] [--cpus <n>]
  */
object RemoverCli {

  final case class CliArgs(
      in: String, out: String, table: String,
      keyspace: String = "graft", cpus: Int = 8)

  /** Pure, testable flag parsing + validation. Left = error message. */
  def parse(argv: Array[String]): Either[String, CliArgs] = {
    def loop(rest: List[String], acc: Map[String, String])
        : Either[String, Map[String, String]] = rest match {
      case Nil => Right(acc)
      case flag :: value :: tail if flag.startsWith("--") =>
        val key = flag.drop(2)
        if (!Set("in", "out", "table", "keyspace", "cpus").contains(key))
          Left(s"unknown flag --$key")
        else if (acc.contains(key)) Left(s"duplicate flag --$key")
        else loop(tail, acc + (key -> value))
      case other :: _ => Left(s"unexpected argument '$other'")
    }
    loop(argv.toList, Map.empty).flatMap { m =>
      (m.get("in"), m.get("out"), m.get("table")) match {
        case (None, _, _) => Left("--in <dir> is required")
        case (_, None, _) => Left("--out <dir> is required")
        case (_, _, None) => Left("--table <name> is required")
        case (Some(i), Some(o), Some(t)) =>
          if (java.nio.file.Paths.get(o).toAbsolutePath ==
            java.nio.file.Paths.get(i).toAbsolutePath)
            Left("--out must differ from --in (originals are kept)")
          else {
            val cpus = m.getOrElse("cpus", "8")
            cpus.toIntOption.filter(_ > 0) match {
              case None => Left(s"--cpus must be a positive int, got '$cpus'")
              case Some(c) =>
                Right(CliArgs(i, o, t, m.getOrElse("keyspace", "graft"), c))
            }
          }
      }
    }
  }

  def main(argv: Array[String]): Unit = parse(argv) match {
    case Left(err) =>
      System.err.println(s"error: $err")
      System.err.println(
        "usage: graft.RemoverCli --in <dir> --out <dir> --table <name>" +
          " [--keyspace <ks>] [--cpus <n>]")
      sys.exit(2)
    case Right(args) =>
      // The CLI convenience path covers the events-modeled corpus; an
      // arbitrary table needs its cell model declared by the caller —
      // the library form `Pipeline.removeTtl(df, TableMeta(...), out)`
      // is the analogue of handing the reference CLI a CQL schema
      // (--cql, `TTLRemoverCLI.java:166-170`): the engine is generic,
      // the entry point needs to be told which columns are cells.
      if (args.table != "events") {
        System.err.println(
          s"error: no cell model shipped for table '${args.table}'; " +
            "use Pipeline.removeTtl(df, TableMeta(...), out) with a " +
            "cell-modeled DataFrame")
        sys.exit(2)
      }
      val spark = SparkSession.builder()
        .master(s"local[${args.cpus}]")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val meta = CellModel.eventsMeta.copy(keyspace = args.keyspace)
        val rows = Pipeline.removeTtlFromDir(spark, args.in, args.out, meta)
        println(s"wrote $rows rows to ${args.out}/" +
          s"keyspace=${meta.keyspace}/table_name=${meta.table}/")
      } finally spark.stop()
  }
}
