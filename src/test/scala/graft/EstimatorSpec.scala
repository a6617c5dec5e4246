package graft

import graft.ops.{DedupOps, ScanAggOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Bounds/consistency checks for the estimator-based operators that
  * have no SQL oracle (engine-internal sketches differ across engines;
  * SURVEY §2.4 A2, dedup/ANN extensions). All inputs are deterministic,
  * so these assertions are stable, not flaky.
  */
class EstimatorSpec extends SparkSpec {

  test("A2: approx_count_distinct within its rsd bound") {
    val row = ScanAggOps.hllKeyCount(spark, sfDir).head()
    val est = row.getAs[Long]("est_keys")
    val exact = row.getAs[Long]("exact_keys")
    val relErr = math.abs(est - exact).toDouble / exact
    // rsd=0.02 requested; allow 5 sigma — deterministic for fixed input
    assert(relErr < 0.10, s"est=$est exact=$exact relErr=$relErr")
  }

  test("A2: merged per-bucket HLL sketches estimate the global distinct count") {
    val row = ScanAggOps.sketchMerge(spark, sfDir).head()
    val est = row.getAs[Long]("merged_est")
    val exact = Tables.load(spark, sfDir, "orders")
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(row.getAs[Long]("n_buckets") === 8L)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"est=$est exact=$exact")
  }

  test("A4: deterministic md5-sample estimate lands near the true count") {
    val row = ScanAggOps.sampledKeyCount(spark, sfDir).head()
    val est = row.getAs[Long]("est_rows")
    val actual = Tables.load(spark, sfDir, "orders").count()
    assert(math.abs(est - actual).toDouble / actual < 0.15,
      s"est=$est actual=$actual")
  }

  test("simhash is deterministic and defined for every document") {
    val a = DedupOps.simhash(spark, sfDir)
    val b = DedupOps.simhash(spark, sfDir)
    assert(a.exceptAll(b).count() === 0)
    assert(a.count() === Tables.load(spark, sfDir, "documents").count())
  }

  test("minhash-LSH candidates contain every exact-Jaccard>=0.8 pair") {
    val lsh = DedupOps.minhashLsh(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val exact = DedupOps.ngramJaccard(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val missed = exact.exceptAll(lsh).count()
    assert(missed === 0,
      s"$missed high-similarity pairs missed by LSH banding")
  }

  test("LSH-ANN results are a subset of brute-force candidates with sane cosines") {
    val ann = SimilarityOps.annLsh(spark, sfDir)
    assert(ann.filter(col("cos_sim") > 1.000001 || col("cos_sim") < -1.000001)
      .count() === 0)
    // within-bucket top-k can never beat brute-force top-k cosine
    val brute = SimilarityOps.cosineTopK(spark, sfDir)
      .groupBy("q_vec_id").agg(max("cos_sim").as("best"))
    val joined = ann.filter(col("rk") === 1)
      .join(brute, "q_vec_id")
      .filter(col("cos_sim") > col("best") + 1e-9)
    assert(joined.count() === 0)
  }

  test("IVF-ANN: nonempty, sane cosines, never beats brute-force best") {
    val ann = SimilarityOps.annIvf(spark, sfDir)
    assert(ann.count() > 0)
    assert(ann.filter(col("cos_sim") > 1.000001 || col("cos_sim") < -1.000001)
      .count() === 0)
    val brute = SimilarityOps.cosineTopK(spark, sfDir)
      .groupBy("q_vec_id").agg(max("cos_sim").as("best"))
    assert(ann.filter(col("rk") === 1)
      .join(brute, "q_vec_id")
      .filter(col("cos_sim") > col("best") + 1e-9)
      .count() === 0)
  }
}
