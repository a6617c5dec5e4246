package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftColumns

/** Declared time-interval join, planned as a bin-bucketed equi-join —
  * the second whole-operator extension after [[CosineSimilarityJoin]].
  *
  * The user declares WHAT: all pairs (a, b) with
  * `b.tsCol ∈ [a.tsCol + lowerOffset, a.tsCol + upperOffset)` (epoch
  * longs, any unit as long as both sides and the offsets agree). The
  * rule decides HOW: an inequality-only join has no equi-key, so
  * Catalyst would plan a broadcast-nested-loop / cartesian — O(n·m)
  * pair evaluations. [[RewriteIntervalJoin]] buckets both sides into
  * interval-width time bins (the probe's window spans at most 2 bins,
  * so it explodes to exactly those; each build row maps to 1), joins
  * on the bin key like any hash join, and applies the original range
  * predicate as a residual filter. Same rewrite as the hand-built
  * `AnalyticsOps.rangeJoin`, packaged as engine machinery: node +
  * Rule, registrable via `SparkSessionExtensions` (builder time) or
  * `GraftExtensions.enable` (runtime).
  *
  * The join key is the bin START (`x - pmod(x, w)`), not a bin index:
  * epoch-nanos exceed 2^53, so an index computed through double
  * division (Column `/` is double division) could round to the
  * neighboring bin — the bin start needs only subtraction and a
  * non-negative pmod, both exact in long arithmetic at any magnitude
  * or sign. (Truncating integral `div`, as the hand-built
  * `AnalyticsOps.rangeJoin` uses, is ALSO pair-complete at all signs —
  * `trunc(e/w) ∈ {trunc(p/w)-1, trunc(p/w)}` holds for `e ∈ [p-w, p)`
  * under truncation too, with the residual filter discarding the extra
  * candidates — the bin-start form is simply exact by construction
  * rather than by a case analysis, and IntervalJoinSpec pins the
  * negative-timestamp behavior.)
  */
case class IntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftTsCol: String,
    rightTsCol: String,
    lowerOffset: Long,
    upperOffset: Long,
    output: Seq[Attribute])
  extends BinaryNode {

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Expands [[IntervalJoin]] into the binned equi-join. Output
  * attributes keep the node's exprIds so references above the node
  * stay valid.
  */
case class RewriteIntervalJoin(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j: IntervalJoin =>
      val w = j.upperOffset - j.lowerOffset
      def binStart(c: Column): Column = c - pmod(c, lit(w))
      val a = GraftColumns.ofRows(spark, j.left)
      val b = GraftColumns.ofRows(spark, j.right)
      val lTs = col(j.leftTsCol).cast("long")
      val rTs = col(j.rightTsCol).cast("long")
      // the window's first bin and its successor always cover a
      // width-w window
      val s0 = binStart(lTs + j.lowerOffset)
      val aB = a.withColumn("__bin", explode(array(s0, s0 + w)))
      val bB = b.withColumn("__bin", binStart(rTs))
      val joined = aB.join(bB, Seq("__bin"))
        .filter(rTs >= lTs + j.lowerOffset && rTs < lTs + j.upperOffset)
      val expanded = GraftColumns.analyzedPlan(joined)
      // Re-validate HERE, not only in the IntervalJoins API wrapper:
      // output attributes are rebound by NAME over the expanded plan,
      // so a node constructed directly (or by a future caller) with
      // duplicate names — or a user column shadowing the synthetic
      // __bin key — would silently rebind every duplicate to one
      // source column. Misuse must fail loudly at rewrite time.
      require(!j.output.exists(_.name == "__bin"),
        "IntervalJoin: column name __bin is reserved by the bin rewrite")
      val grouped = expanded.output.groupBy(_.name)
      val dups = grouped.collect {
        case (n, as) if n != "__bin" && as.size > 1 => n
      }
      require(dups.isEmpty,
        s"IntervalJoin: ambiguous output columns after bin expansion: $dups")
      val byName = grouped.map { case (n, as) => n -> as.head }
      val outExprs: Seq[NamedExpression] = j.output.map { attr =>
        val src = byName.getOrElse(attr.name,
          throw new IllegalStateException(s"missing column ${attr.name}"))
        Alias(src, attr.name)(exprId = attr.exprId)
      }
      Project(outExprs, expanded)
  }
}

/** User-facing API for the declared interval join. */
object IntervalJoins {

  /** All pairs (a, b) with
    * `b(tsB) ∈ [a(tsA) + lowerOffset, a(tsA) + upperOffset)`. Column
    * names of the two sides must be disjoint. Requires the rule to be
    * registered (`GraftExtensions`).
    */
  def intervalJoin(
      a: DataFrame, b: DataFrame,
      tsA: String, tsB: String,
      lowerOffset: Long, upperOffset: Long): DataFrame = {
    require(upperOffset > lowerOffset,
      s"empty interval: [$lowerOffset, $upperOffset)")
    val spark = a.sparkSession
    val lp = GraftColumns.analyzedPlan(a)
    val rp = GraftColumns.analyzedPlan(b)
    // the rewrite resolves output attributes by NAME over the expanded
    // plan: a user column named like the synthetic bin key would be
    // silently replaced, and within-side duplicates would all rebind
    // to one source — reject both up front
    for ((side, names) <- Seq("left" -> lp.output.map(_.name),
        "right" -> rp.output.map(_.name))) {
      require(!names.contains("__bin"),
        s"$side side: column name __bin is reserved by intervalJoin")
      val dups = names.groupBy(identity).collect { case (n, v) if v.size > 1 => n }
      require(dups.isEmpty, s"$side side has duplicate column names: $dups")
    }
    val overlap = lp.output.map(_.name).toSet
      .intersect(rp.output.map(_.name).toSet)
    require(overlap.isEmpty, s"column names must be disjoint: $overlap")
    GraftColumns.ofRows(spark,
      IntervalJoin(lp, rp, tsA, tsB, lowerOffset, upperOffset,
        lp.output ++ rp.output))
  }
}
