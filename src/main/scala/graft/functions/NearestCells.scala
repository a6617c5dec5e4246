package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The `p` nearest coarse-quantizer cells of an embedding, descending
  * (score, cell) — score = e·c (cosine mode) or e·c − ‖c‖²/2 (the L2
  * argmin identity). This is the IVF cell-assignment inner loop: it
  * runs per corpus vector in every IVF/PQ index build and per query
  * at serve time.
  *
  * It replaces the `transform(packedCentroidStructs, …)` +
  * `array_max`/`array_sort` formulation for two measured reasons:
  *
  *  - higher-order functions never participate in whole-stage codegen
  *    (the lambda evaluates interpreted and allocates a k-element
  *    struct array per row); this expression is a primitive loop with
  *    one small int-array allocation per row (guide §4);
  *  - the lambda carried the embedding column as a free attribute
  *    inside its body, and constraint propagation across the
  *    corpus/query cell equi-join mis-scoped that reference — an
  *    isolated first-query `sim_ann_ivf_t` / `sim_ann_tier_matrix`
  *    run failed with INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND (reproduced
  *    on the round-start commit). A plain unary expression has
  *    ordinary, correctly-computed references.
  *
  * Bit-compatibility with the HOF form (and the SQL oracle's
  * `ORDER BY score DESC, cell DESC`): the dot is the same ascending
  * left fold as [[ArrayDot]] bounded by the shorter array; the half
  * squared norm is folded on the DRIVER with the same `map(x*x).sum/2`
  * the literal carried; double comparisons use Spark's SQL total
  * order ([[SQLOrderingUtil.compareDoubles]] — exactly what
  * `array_max`/`array_sort` used on the score field), ties break to
  * the HIGHER cell id. Centroids ride `Seq`s so plan equality and
  * canonicalization behave (an `Array` parameter compares by
  * reference).
  */
case class NearestCells(
    child: Expression,
    centroids: Seq[Seq[Double]],
    l2: Boolean,
    p: Int)
    extends UnaryExpression {

  require(p >= 1 && p <= centroids.size,
    s"nearest_cells: p=$p outside 1..${centroids.size}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got " +
        other.simpleString)
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "nearest_cells"

  // flat centroid matrix + driver-folded half squared norms (same
  // fold order as the literal the HOF form embedded)
  @transient private lazy val k = centroids.size
  @transient private lazy val dim =
    if (centroids.isEmpty) 0 else centroids.head.size
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var i = 0
    while (i < k) {
      val c = centroids(i)
      var j = 0
      while (j < dim) { a(i * dim + j) = c(j); j += 1 }
      i += 1
    }
    a
  }
  @transient private lazy val half: Array[Double] =
    centroids.map(c => if (l2) c.map(x => x * x).sum / 2 else 0.0).toArray

  /** Top-`p` cells of one embedding, shared by eval and codegen. */
  def topCells(e: ArrayData): ArrayData = {
    val n = e.numElements()
    val scores = new Array[Double](p)
    val cells = new Array[Int](p)
    var filled = 0
    var i = 0
    while (i < k) {
      val bound = math.min(n, dim)
      var s = 0.0
      var j = 0
      while (j < bound) { s += e.getDouble(j) * flat(i * dim + j); j += 1 }
      s -= half(i)
      // descending (score, cell): find the insert slot — cells scan in
      // ascending id order, so on an equal score the LATER (higher)
      // cell must land in front of the earlier one
      var pos = filled
      while (pos > 0 && {
        val c = SQLOrderingUtil.compareDoubles(s, scores(pos - 1))
        c > 0 || (c == 0 && i > cells(pos - 1))
      }) pos -= 1
      if (pos < p) {
        val last = math.min(filled, p - 1)
        var m = last
        while (m > pos) { scores(m) = scores(m - 1); cells(m) = cells(m - 1); m -= 1 }
        scores(pos) = s
        cells(pos) = i
        if (filled < p) filled += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(cells, filled))
  }

  override protected def nullSafeEval(a: Any): Any =
    topCells(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("nearestCells", this,
        classOf[NearestCells].getName)
      s"${ev.value} = $ref.topCells($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCells = copy(child = newChild)
}
