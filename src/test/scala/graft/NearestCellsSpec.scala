package graft

import graft.functions.NearestCells
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftColumns

/** The native IVF cell-assignment loop must be bit-equivalent to the
  * higher-order-function form it replaced: same ascending-left-fold
  * dot, same driver-folded half squared norms, same descending
  * (score, cell) order with ties to the HIGHER cell id. */
class NearestCellsSpec extends SparkSpec {

  private def nearest(e: org.apache.spark.sql.Column,
      cs: Array[Array[Double]], l2: Boolean, p: Int) =
    GraftColumns.column(NearestCells(GraftColumns.expression(e),
      cs.map(_.toIndexedSeq).toIndexedSeq, l2, p))

  /** The replaced formulation, verbatim: packed (centroid, ‖c‖²/2,
    * cell) literal structs scored via transform, ranked by
    * array_sort's lexicographic (score, cell) struct order. */
  private def hofCells(e: org.apache.spark.sql.Column,
      cs: Array[Array[Double]], l2: Boolean, p: Int) = {
    val packed = array(cs.zipWithIndex.map { case (c, i) =>
      struct(
        array(c.toIndexedSeq.map(lit(_)): _*).as("c"),
        lit(c.map(x => x * x).sum / 2).as("h"),
        lit(i).as("cell"))
    }.toIndexedSeq: _*)
    val scored = transform(packed, s => struct(
      (if (l2) graft.functions.GraftFunctions.array_dot(e, s.getField("c"))
          - s.getField("h")
       else graft.functions.GraftFunctions.array_dot(e, s.getField("c")))
        .as("score"),
      s.getField("cell").as("cell")))
    transform(slice(reverse(array_sort(scored)), 1, p), _.getField("cell"))
  }

  test("native nearest_cells equals the HOF form on real embeddings") {
    val vn = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val dim = 64
    val k = 16
    // the production centroid shapes: seeded-random init constants and
    // a second, shifted set (stands in for trained centroids)
    def mk(seed: Int): Array[Array[Double]] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(k)(Array.fill(dim)(rnd.nextGaussian()))
    }
    for (cs <- Seq(mk(7), mk(42)); l2 <- Seq(false, true);
         p <- Seq(1, 2, 4)) {
      val diff = vn
        .select(nearest(col("e"), cs, l2, p).as("a"),
          hofCells(col("e"), cs, l2, p).as("b"))
        .filter(not(col("a") === col("b")))
        .count()
      assert(diff === 0L, s"l2=$l2 p=$p: native diverged from HOF form")
    }
  }

  test("equal scores tie to the higher cell id") {
    import spark.implicits._
    val c = Array.fill(64)(0.5)
    // cells 1 and 3 identical ⇒ identical scores; the winner must be
    // cell 3 (array_max over (score, cell) structs picked the higher
    // cell, and the oracle orders score DESC, cell DESC)
    val cs = Array(Array.fill(64)(-1.0), c, Array.fill(64)(0.1), c)
    val df = Seq(Tuple1(Seq.fill(64)(1.0))).toDF("e")
    val got = df.select(nearest(col("e"), cs, l2 = false, p = 4).as("cells"))
      .head().getSeq[Int](0)
    assert(got === Seq(3, 1, 2, 0))
  }
}
