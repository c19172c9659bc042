package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared shape for single-pass float-vector folds (SURVEY §7.5): widen each
  * element to double, accumulate left-to-right — bit-identical to the builtin
  * `zip_with`+`aggregate` composition AND to the DuckDB oracle's
  * `list_dot_product`/`list_distance` over `DOUBLE[]` casts. */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // mismatched-length inputs yield null (the zip_with+aggregate builtin
  // chain this fold claims identity with null-pads and propagates), so
  // ragged/corrupt embedding rows surface as null, never a silent
  // truncated score
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // nullability-agnostic: parquet/SQL arrays carry containsNull=true,
    // encoder-derived Array[Float] carries false — both are valid inputs
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }
}

/** Σ aᵢ·bᵢ as a fused codegen loop. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // null element →
      // null score (builtin/oracle parity; 0.0 would be silently wrong)
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val bad = ctx.freshName("bad")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** √ Σ (aᵢ−bᵢ)² as a fused codegen loop. */
case class EuclideanDistance(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "euclidean_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val dd = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += dd * dd; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val dd = ctx.freshName("dd")
      val bad = ctx.freshName("bad")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $dd = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $s += $dd * $dd;
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else { ${ev.value} = java.lang.Math.sqrt($s); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
