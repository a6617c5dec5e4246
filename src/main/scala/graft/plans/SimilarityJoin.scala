package graft.plans

import graft.functions.GraftFunctions
import graft.ops.SimilarityOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftColumns
import org.apache.spark.sql.types.DoubleType

/** Whole-operator extension (SURVEY §4.1's flagged stretch: "a rule
  * rewriting a similarity-join above a threshold into an LSH-bucketed
  * join"): a custom logical node for a cosine-similarity join plus the
  * Catalyst rule that expands it into the scalable bucketed plan.
  *
  * The user declares WHAT (`SimilarityJoins.cosineJoin(a, b, ...)`);
  * the rule decides HOW: both sides are hashed to random-hyperplane
  * sign buckets and only same-bucket pairs are compared — an equi-join
  * Catalyst can shuffle/broadcast, instead of the O(|A|·|B|) cartesian
  * a naive formulation would execute. Exactly the built-in-operator
  * composition of `SimilarityOps.annLsh`, but packaged as engine
  * machinery: node + Rule, registrable via `SparkSessionExtensions`
  * (builder time) or `GraftExtensions.enable` (runtime, works on a
  * session the host application built).
  */
case class CosineSimilarityJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftVecCol: String,
    rightVecCol: String,
    threshold: Double,
    dim: Int,
    nBits: Int,
    output: Seq[Attribute])
  extends BinaryNode {

  // attrs in output that no child provides (cos_sim) are produced here —
  // without this, CheckAnalysis flags them as missing inputs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      output.filterNot(a =>
        left.outputSet.contains(a) || right.outputSet.contains(a)))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): CosineSimilarityJoin =
    copy(left = newLeft, right = newRight)
}

/** Expands [[CosineSimilarityJoin]] into the LSH-bucketed equi-join.
  * Output attributes keep the node's exprIds so references above the
  * node stay valid.
  */
case class RewriteCosineSimilarityJoin(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j: CosineSimilarityJoin =>
      val a = GraftColumns.ofRows(spark, j.left)
      val b = GraftColumns.ofRows(spark, j.right)
      val planes = SimilarityOps.hyperplanes(j.dim, j.nBits)
      def withBucketNorm(df: DataFrame, vec: String, tag: String) = {
        val e = col(vec).cast("array<double>")
        df.withColumn(s"__e_$tag", e)
          .withColumn(s"__nrm_$tag",
            sqrt(GraftFunctions.array_dot(col(s"__e_$tag"), col(s"__e_$tag"))))
          .withColumn("__bucket",
            SimilarityOps.lshBucket(col(s"__e_$tag"), planes))
      }
      val aB = withBucketNorm(a, j.leftVecCol, "a")
      val bB = withBucketNorm(b, j.rightVecCol, "b")
      val cos: Column =
        GraftFunctions.array_dot(col("__e_a"), col("__e_b")) /
          (col("__nrm_a") * col("__nrm_b"))
      val joined = aB.join(bB, Seq("__bucket"))
        .withColumn("__cos_sim", cos)
        .filter(col("__cos_sim") > j.threshold)
      val expanded = GraftColumns.analyzedPlan(joined)
      // rebind the node's output attrs (same names, same exprIds) onto
      // the expanded plan's columns
      val byName = expanded.output.map(attr => attr.name -> attr).toMap
      val outExprs: Seq[NamedExpression] = j.output.map { attr =>
        val src = byName.getOrElse(
          if (attr.name == "cos_sim") "__cos_sim" else attr.name,
          throw new IllegalStateException(s"missing column ${attr.name}"))
        Alias(src, attr.name)(exprId = attr.exprId)
      }
      Project(outExprs, expanded)
  }
}

/** Registration surface for graft's planner extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(spark => RewriteCosineSimilarityJoin(spark))
    e.injectOptimizerRule(spark => RewriteIntervalJoin(spark))
    e.injectOptimizerRule(spark => PushClusteringSlice(spark))
  }
}

object GraftExtensions {
  /** Runtime enablement on an existing session (idempotent) — for
    * hosts that build the SparkSession themselves. */
  def enable(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    val missing = Seq(
      RewriteCosineSimilarityJoin(spark), RewriteIntervalJoin(spark),
      PushClusteringSlice(spark))
      .filterNot(r => existing.exists(_.getClass == r.getClass))
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = existing ++ missing
  }
}

/** User-facing API for the similarity-join operator. */
object SimilarityJoins {

  /** Cosine-similarity join: all pairs (a, b) with
    * cos(a.vecA, b.vecB) > threshold, planned as an LSH-bucketed
    * equi-join by [[RewriteCosineSimilarityJoin]]. Column names of the
    * two sides must be disjoint; the result appends `cos_sim`.
    * Requires the rule to be registered (`GraftExtensions`).
    */
  def cosineJoin(
      a: DataFrame, b: DataFrame,
      vecA: String, vecB: String,
      threshold: Double, dim: Int = 64, nBits: Int = 8): DataFrame = {
    val spark = a.sparkSession
    val lp = GraftColumns.analyzedPlan(a)
    val rp = GraftColumns.analyzedPlan(b)
    val overlap = lp.output.map(_.name).toSet
      .intersect(rp.output.map(_.name).toSet)
    require(overlap.isEmpty, s"column names must be disjoint: $overlap")
    val out = lp.output ++ rp.output :+
      AttributeReference("cos_sim", DoubleType, nullable = true)()
    GraftColumns.ofRows(spark,
      CosineSimilarityJoin(lp, rp, vecA, vecB, threshold, dim, nBits, out))
  }
}
