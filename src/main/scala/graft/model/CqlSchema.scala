package graft.model

/** CQL `CREATE TABLE` schema declaration — the reference CLI's way of
  * telling the engine an arbitrary table's shape (`--cql`, handed to
  * Cassandra's `CreateTableStatement.parse`:
  * `TTLRemoverCLI.java:166-170`, `Cassandra4TTLRemover.java:63`).
  * Here the same statement derives the cell-model key/column split
  * the parquet path otherwise takes as `--pk/--ck/--cells` flags —
  * one schema language for users coming from the reference.
  *
  * Supported subset (everything the key/column split needs):
  * unquoted identifiers (case-insensitive, lowered, as CQL defines
  * them), parameterized types (`map<text, int>` — commas inside
  * `<>`/`()` don't split columns), inline single-column
  * `PRIMARY KEY`, and the trailing `PRIMARY KEY ((pk1, pk2), ck1,
  * ck2)` form with composite partition keys. `WITH ...` options are
  * accepted and ignored (they configure storage, not shape) —
  * except `COMPACT STORAGE`, surfaced as [[Parsed.compactStorage]]
  * because it DOES change the 2.x on-disk cell-name framing. Quoted
  * identifiers and anything else outside the subset fail LOUDLY with
  * the offending text — a schema half-understood is worse than one
  * rejected. */
object CqlSchema {

  final case class Parsed(
      keyspace: Option[String],
      table: String,
      partitionKey: Seq[String],
      clustering: Seq[String],
      columns: Seq[(String, String)],
      /** `WITH COMPACT STORAGE` — the one WITH option that changes
        * SHAPE, not storage tuning: a 2.x compact table frames
        * clusteringless cell names as bare bytes where a CQL3
        * non-compact table composite-frames them. */
      compactStorage: Boolean = false)

  /** Split on top-level commas: depth counts both () and <>. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case c @ ('(' | '<') => depth += 1; cur += c
      case c @ (')' | '>') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val Ident = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  private def ident(s: String): Either[String, String] = {
    val t = s.trim
    if (t.startsWith("\""))
      Left(s"quoted identifiers are outside the CQL subset: $t")
    else if (Ident.matches(t)) Right(t.toLowerCase)
    else Left(s"not a CQL identifier: '$t'")
  }

  private def sequence[A](xs: Seq[Either[String, A]])
      : Either[String, Seq[A]] =
    xs.foldLeft(Right(Vector.empty[A]): Either[String, Vector[A]]) {
      (acc, e) => acc.flatMap(v => e.map(v :+ _))
    }

  /** Parse the `PRIMARY KEY (...)` inner spec: first element is the
    * partition key (possibly a composite `(a, b)`), the rest cluster. */
  private def parseKeySpec(inner: String)
      : Either[String, (Seq[String], Seq[String])] = {
    val parts = splitTop(inner)
    if (parts.isEmpty) Left("empty PRIMARY KEY")
    else {
      val pkE =
        if (parts.head.startsWith("(")) {
          val comp = parts.head.trim.stripPrefix("(").stripSuffix(")")
          sequence(splitTop(comp).map(ident))
        } else ident(parts.head).map(Seq(_))
      pkE.flatMap(pk =>
        sequence(parts.tail.map(ident)).map(ck => (pk, ck)))
    }
  }

  def parse(cql: String): Either[String, Parsed] = {
    val norm = cql.trim.stripSuffix(";").trim
    val head = "(?is)^create\\s+table\\s+(?:if\\s+not\\s+exists\\s+)?".r
    head.findFirstIn(norm)
      .toRight(s"expected CREATE TABLE ..., got: '${norm.take(40)}'")
      .flatMap { matched =>
        val rest = norm.drop(matched.length).trim
        val open = rest.indexOf('(')
        if (open < 0) Left("CREATE TABLE without a column list")
        else {
          // outermost paren group; anything after (WITH ...) is ignored
          var depth = 0
          var close = -1
          var i = open
          while (close < 0 && i < rest.length) {
            rest.charAt(i) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = i
              case _ =>
            }
            i += 1
          }
          if (close < 0) Left("unbalanced parentheses in CREATE TABLE")
          else {
            val nameE: Either[String, (Option[String], String)] =
              rest.take(open).trim.split('.') match {
                case Array(t) => ident(t).map(n => (None, n))
                case Array(ks, t) =>
                  ident(ks).flatMap(k => ident(t).map(n => (Some(k), n)))
                case _ => Left(
                  s"expected [keyspace.]table, got '${rest.take(open).trim}'")
              }
            nameE.flatMap { case (ks, table) =>
              val entries = splitTop(rest.substring(open + 1, close))
              val pkClause = "(?is)^primary\\s+key\\s*\\((.*)\\)$".r
              val inlinePk = "(?is)^(\\S+)\\s+(.+?)\\s+primary\\s+key$".r
              var pk = Seq.empty[String]
              var ck = Seq.empty[String]
              val colsE = sequence(entries.flatMap {
                case pkClause(inner) =>
                  parseKeySpec(inner) match {
                    case Right((p, c)) => pk = p; ck = c; Nil
                    case Left(e) => Seq(Left(e))
                  }
                case inlinePk(name, tpe) =>
                  Seq(ident(name).map { n => pk = Seq(n); (n, tpe.trim) })
                case coldef =>
                  val sp = coldef.split("\\s+", 2)
                  if (sp.length != 2)
                    Seq(Left(s"column needs a type: '$coldef'"))
                  else Seq(ident(sp(0)).map(n => (n, sp(1).trim)))
              })
              colsE.flatMap { cols =>
                val names = cols.map(_._1)
                if (pk.isEmpty)
                  Left("no PRIMARY KEY declared (inline or trailing)")
                else if (names.distinct.size != names.size)
                  Left(s"duplicate column in: ${names.mkString(", ")}")
                else (pk ++ ck).find(!names.contains(_)) match {
                  case Some(missing) =>
                    Left(s"key column '$missing' is not declared")
                  case None =>
                    // WITH options tune storage and are ignored —
                    // EXCEPT COMPACT STORAGE, which changes the 2.x
                    // on-disk cell-name shape
                    val compact = "(?i)compact\\s+storage".r
                      .findFirstIn(rest.substring(close + 1)).isDefined
                    Right(Parsed(ks, table, pk, ck, cols,
                      compactStorage = compact))
                }
              }
            }
          }
        }
      }
  }
}
