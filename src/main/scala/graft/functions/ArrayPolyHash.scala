package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Polynomial rolling hash of an `array<long>`:
  * `h_i = (h_{i-1} * 31 + x_i) mod 1e9+7`, `h_0 = 0`.
  *
  * The document-fingerprinting primitive (order-sensitive, unlike a
  * set hash: token transpositions change the fingerprint). A left
  * fold, so per-row and embarrassingly parallel — no shuffle at any
  * scale. Codegen'd; element nulls are not expected (token hashes).
  * The SQL-oracle equivalent is a `list_reduce` with the same fold.
  */
case class ArrayPolyHash(child: Expression) extends UnaryExpression {

  private val Mod = 1000000007L
  private val Mult = 31L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "array_poly_hash"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * Mult + arr.getLong(i)) % Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $a.numElements();
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * ${Mult}L + $a.getLong($i)) % ${Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayPolyHash =
    copy(child = newChild)
}
