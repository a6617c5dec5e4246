package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Automatic clustering-slice pushdown for the `sstable-big`
  * connector: a `Filter` whose conjuncts bound the LEADING clustering
  * component (`clustering[0]`, optionally cast to an integral type)
  * with literals gets its bounds copied into the scan as
  * `sliceLo`/`sliceHi`, so the reader seeks WITHIN wide partitions via
  * their promoted index blocks (the reference's names-iterator path,
  * `NoTTLSSTableNamesIterator.java:156-225`) with no hand-threaded
  * options. The Filter itself is left in place — the slice is pure IO
  * pruning and the predicate stays RESIDUAL, so a rule misfire can
  * cost performance but never correctness.
  *
  * Runs from `experimental.extraOptimizations` — AFTER
  * V2ScanRelationPushDown, so it rewrites the built scan (via
  * [[graft.sources.SSTableBinaryV2.scanWithSlice]]) rather than the
  * pre-pushdown relation. Spark's DSv2 filter pushdown can never
  * deliver these predicates itself: `clustering` is an array column
  * and element access has no `sources.Filter` translation.
  *
  * Safety rails:
  *   - bounds are derived only from top-level conjuncts comparing the
  *     leading element with a foldable literal — `>=`/`>` set lo,
  *     `<=`/`<` set hi (strict bounds widen to inclusive:
  *     conservative), `=` sets both;
  *   - the comparison SPACE ("long" for integral casts, "string" for
  *     bare string compares) rides along, and the reader engages
  *     pruning only when the declared clustering type's comparator
  *     orders identically — a numeric predicate over a text
  *     clustering never prunes;
  *   - mixed spaces across conjuncts abstain entirely;
  *   - a scan already carrying bounds is left alone (fixed point). */
case class PushClusteringSlice(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  /** Is `e` the leading clustering element of `rel`'s output? Returns
    * the comparison space implied by the (optional) cast around it. */
  private def leadingCk(e: Expression,
      rel: DataSourceV2ScanRelation): Option[String] = {
    def isClusteringAttr(a: Expression): Boolean = a match {
      case attr: AttributeReference =>
        attr.name == "clustering" &&
          rel.output.exists(_.exprId == attr.exprId)
      case _ => false
    }
    def bare(x: Expression): Boolean = x match {
      case GetArrayItem(a, Literal(0, IntegerType), _) =>
        isClusteringAttr(a)
      case ea: ElementAt => isClusteringAttr(ea.left) &&
        (ea.right match {
          case Literal(1, IntegerType) => true
          case Literal(1L, LongType) => true
          case _ => false
        })
      case _ => false
    }
    e match {
      case Cast(child, dt, _, _) if bare(child) => dt match {
        case LongType | IntegerType | ShortType | ByteType => Some("long")
        case StringType => Some("string")
        case _ => None // date/timestamp/decimal orders are not pinned
      }
      case x if bare(x) => Some("string")
      case _ => None
    }
  }

  private def render(l: Literal): Option[String] = l.value match {
    case null => None
    case u: UTF8String => Some(u.toString)
    case v: java.lang.Number => Some(v.toString)
    case _ => None
  }

  /** (space, value, isLo) per usable conjunct. */
  private def boundsOf(cond: Expression,
      rel: DataSourceV2ScanRelation): Seq[(String, String, Boolean)] =
    splitConjunctivePredicates(cond).flatMap {
      case GreaterThanOrEqual(ck, l: Literal) =>
        leadingCk(ck, rel).flatMap(s => render(l).map((s, _, true)))
      case GreaterThan(ck, l: Literal) =>
        leadingCk(ck, rel).flatMap(s => render(l).map((s, _, true)))
      case LessThanOrEqual(ck, l: Literal) =>
        leadingCk(ck, rel).flatMap(s => render(l).map((s, _, false)))
      case LessThan(ck, l: Literal) =>
        leadingCk(ck, rel).flatMap(s => render(l).map((s, _, false)))
      case GreaterThanOrEqual(l: Literal, ck) =>
        leadingCk(ck, rel).flatMap(s => render(l).map((s, _, false)))
      case GreaterThan(l: Literal, ck) =>
        leadingCk(ck, rel).flatMap(s => render(l).map((s, _, false)))
      case LessThanOrEqual(l: Literal, ck) =>
        leadingCk(ck, rel).flatMap(s => render(l).map((s, _, true)))
      case LessThan(l: Literal, ck) =>
        leadingCk(ck, rel).flatMap(s => render(l).map((s, _, true)))
      case EqualTo(ck, l: Literal) =>
        leadingCk(ck, rel).flatMap(s =>
          render(l).map(v => (s, v, true))).toSeq ++
          leadingCk(ck, rel).flatMap(s =>
            render(l).map(v => (s, v, false)))
      case EqualTo(l: Literal, ck) =>
        leadingCk(ck, rel).flatMap(s =>
          render(l).map(v => (s, v, true))).toSeq ++
          leadingCk(ck, rel).flatMap(s =>
            render(l).map(v => (s, v, false)))
      case _ => Nil
    }

  /** Murmur3 token bounds from conjuncts comparing
    * `murmur3_token(partition_key)` or
    * `murmur3_token_typed(partition_key, <type>)` with long
    * literals. Each derived bound carries its token SPACE
    * ([[graft.sources.SSTableBinaryV2.RenderedTokenSpace]] for the
    * plain form, the marshal key type for the typed form) — the
    * reader engages the range only on files whose declared key type
    * matches, so a predicate in the wrong space can never prune
    * (it stays residual). Returns (lo, hi, space), bounds
    * inclusive; strict bounds widen (conservative). Only
    * non-wrapping ranges are derivable from AND-conjuncts; bounds
    * in DIFFERENT spaces abstain entirely (comparing them would be
    * meaningless). */
  private def tokenBoundsOf(cond: Expression,
      rel: DataSourceV2ScanRelation)
      : (Option[Long], Option[Long], Option[String]) = {
    def spaceOfPk(e: Expression): Option[String] = e match {
      case graft.functions.Murmur3Token(a: AttributeReference)
        if a.name == "partition_key" &&
          rel.output.exists(_.exprId == a.exprId) =>
        Some(graft.sources.SSTableBinaryV2.RenderedTokenSpace)
      case graft.functions.Murmur3TokenTyped(a: AttributeReference, kt)
        if a.name == "partition_key" &&
          rel.output.exists(_.exprId == a.exprId) =>
        Some(kt)
      case _ => None
    }
    def longOf(l: Literal): Option[Long] = l.value match {
      case v: java.lang.Long => Some(v)
      case v: java.lang.Integer => Some(v.toLong)
      case _ => None
    }
    def bound(t: Expression, l: Literal, isLo: Boolean)
        : Seq[(Long, Boolean, String)] =
      (spaceOfPk(t), longOf(l)) match {
        case (Some(s), Some(v)) => Seq((v, isLo, s))
        case _ => Nil
      }
    val bounds = splitConjunctivePredicates(cond).flatMap {
      case GreaterThanOrEqual(t, l: Literal) => bound(t, l, isLo = true)
      case GreaterThan(t, l: Literal) => bound(t, l, isLo = true)
      case LessThanOrEqual(t, l: Literal) => bound(t, l, isLo = false)
      case LessThan(t, l: Literal) => bound(t, l, isLo = false)
      case GreaterThanOrEqual(l: Literal, t) => bound(t, l, isLo = false)
      case GreaterThan(l: Literal, t) => bound(t, l, isLo = false)
      case LessThanOrEqual(l: Literal, t) => bound(t, l, isLo = true)
      case LessThan(l: Literal, t) => bound(t, l, isLo = true)
      case _ => Nil
    }
    val spaces = bounds.map(_._3).distinct
    if (bounds.isEmpty || spaces.size != 1) (None, None, None)
    else (bounds.collectFirst { case (v, true, _) => v },
      bounds.collectFirst { case (v, false, _) => v },
      Some(spaces.head))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: DataSourceV2ScanRelation) =>
      val bounds = boundsOf(cond, rel)
      val spaces = bounds.map(_._1).distinct
      // a ':' inside a string bound would collide with the manual
      // multi-component carry — the reader treats planner bounds as
      // one verbatim component, but abstain anyway for clarity
      val clean = bounds.filterNot(_._2.contains(":"))
      val afterSlice =
        if (clean.isEmpty || spaces.size != 1) rel
        else {
          val lo = clean.collectFirst { case (_, v, true) => v }
          val hi = clean.collectFirst { case (_, v, false) => v }
          graft.sources.SSTableBinaryV2
            .scanWithSlice(rel.scan, lo, hi, spaces.head) match {
            case Some(sliced) => rel.copy(scan = sliced)
            case None => rel
          }
        }
      val afterToken = tokenBoundsOf(cond, rel) match {
        // the reader's range is inclusive on both ends; a one-sided
        // predicate completes with the ring's own end (no wrap)
        case (Some(lo), hi, space) =>
          graft.sources.SSTableBinaryV2.scanWithTokenRange(
            afterSlice.scan, lo, hi.getOrElse(Long.MaxValue), space)
            .map(sc => afterSlice.copy(scan = sc))
            .getOrElse(afterSlice)
        case (None, Some(hi), space) =>
          graft.sources.SSTableBinaryV2.scanWithTokenRange(
            afterSlice.scan, Long.MinValue, hi, space)
            .map(sc => afterSlice.copy(scan = sc))
            .getOrElse(afterSlice)
        case _ => afterSlice
      }
      if (afterToken eq rel) f else f.copy(child = afterToken)
  }
}
