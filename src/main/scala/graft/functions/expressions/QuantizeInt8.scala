package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Per-vector symmetric int8 quantization in one codegen'd pass:
  * `q_i = round(x_i · 127 / max|x|)` — bit-identical to the builtin chain
  * `transform(v, x -> round(x·(127.0/array_max(transform(v, abs))), 0))`
  * (double arithmetic, round-half-away-from-zero, which is both Spark's
  * `round` HALF_UP on doubles and DuckDB's `round` — so the DuckDB twin is
  * untouched), but without the chain's three interpreted higher-order-
  * function passes per vector (abs-transform, array_max, round-transform),
  * which were the hot loop of the quantized-kNN scan.
  *
  * Output stays `array<float>`: quantized values are small integers, exact
  * in float AND in the oracle's doubles — the point that keeps the whole
  * approximate pipeline hash-verifiable.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = true)
  override def prettyName: String = "quantize_int8"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    QuantizeInt8.quantize(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.QuantizeInt8.quantize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8 {

  /** round-half-away-from-zero, matching Spark's `round(_, 0)` exactly:
    * Spark rounds the DECIMAL value of the double (BigDecimal HALF_UP), so
    * e.g. 0.49999999999999994 rounds to 0 even though `x + 0.5` rounds to
    * 1.0 in binary. floor(x+0.5) diverges on exactly those boundary doubles;
    * BigDecimal.valueOf mirrors the builtin (and DuckDB) bit-for-bit.
    */
  private def rnd(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def quantize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var maxAbs = 0.0d
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = Math.abs(a.getFloat(i).toDouble)
        // array_max orders NaN greater than every number, so one NaN
        // element makes the builtin chain's scale (and every output) NaN
        // — `v > maxAbs` alone would silently SKIP the NaN and diverge
        if (java.lang.Double.isNaN(v)) maxAbs = Double.NaN
        else if (v > maxAbs) maxAbs = v
      }
      i += 1
    }
    val scale = 127.0d / maxAbs // maxAbs=0 → Inf → NaN, as the builtin chain
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) null
        else rnd(a.getFloat(i).toDouble * scale).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
}
