package graft

import graft.functions.GraftFunctions
import graft.plans.{GraftExtensions, SimilarityJoins}
import org.apache.spark.sql.functions._

/** The custom CosineSimilarityJoin node + rewrite rule: declared WHAT
  * (similarity join above a threshold), planned HOW (LSH-bucketed
  * equi-join — never a cartesian product). Result correctness is
  * checked against the brute-force join restricted to same-bucket
  * pairs (the rewrite's contract: exactly the bucket-colocated subset
  * of the true result, the standard ANN recall trade).
  */
class SimilarityJoinSpec extends SparkSpec {

  private def sides = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val a = emb.filter(col("vec_id") < 40)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
    val b = emb.filter(col("vec_id") >= 40)
      .select(col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    (a, b)
  }

  test("cosineJoin rewrites to a bucketed equi-join, no cartesian product") {
    GraftExtensions.enable(spark)
    val (a, b) = sides
    val joined = SimilarityJoins.cosineJoin(a, b, "a_vec", "b_vec", 0.1)
    val p = joined.queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"similarity join planned as all-pairs:\n$p")
    assert(p.contains("array_dot"), s"native dot product missing:\n$p")
  }

  test("cosineJoin matches brute force restricted to shared buckets") {
    GraftExtensions.enable(spark)
    val (a, b) = sides
    val got = SimilarityJoins.cosineJoin(a, b, "a_vec", "b_vec", 0.1)
      .select(col("a_id"), col("b_id"), round(col("cos_sim"), 6).as("cs"))

    val planes = graft.ops.SimilarityOps.hyperplanes(64, 8)
    def prep(df: org.apache.spark.sql.DataFrame, vec: String, tag: String) = {
      val e = col(vec).cast("array<double>")
      df.withColumn(s"e_$tag", e)
        .withColumn(s"n_$tag", sqrt(GraftFunctions.array_dot(e, e)))
        .withColumn(s"bk_$tag", graft.ops.SimilarityOps.lshBucket(e, planes))
    }
    val brute = prep(a, "a_vec", "a")
      .crossJoin(prep(b, "b_vec", "b"))
      .filter(col("bk_a") === col("bk_b"))
      .withColumn("cs", round(
        GraftFunctions.array_dot(col("e_a"), col("e_b")) /
          (col("n_a") * col("n_b")), 6))
      .filter(col("cs") > 0.1)
      .select(col("a_id"), col("b_id"), col("cs"))

    assert(got.count() > 0, "empty result — threshold too high for fixture")
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }
}
