package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** SURVEY §7.5 — native Catalyst expression for cosine similarity over
  * `array<float>` with whole-stage codegen (`doGenCode` emits a single fused
  * loop: dot product + both norms in one pass, no intermediate arrays).
  *
  * Semantically identical to the builtin composition in
  * [[graft.functions.VectorFunctions.cosineSimilarity]] (floats widened to
  * double, sequential left-to-right accumulation — so the DuckDB oracle and
  * the two implementations agree bit-for-bit); this form exists because the
  * builtin `zip_with`/`aggregate` HOFs evaluate interpreted per row, which is
  * the hot path of a billion-vector kNN (VectorSpec asserts parity; bench in
  * SCALE.md).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  // mismatched-length inputs yield null, matching the builtin chain
  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // nullability-agnostic — see VectorFoldExpression
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  /** Do the inputs guarantee non-null elements? When both array types say
    * `containsNull = false` the per-element null scan is dead code and the
    * kernel runs straight off primitive `float[]`s. */
  private lazy val elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    if (elementsNullable) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null // parity with
        // zip_with+aggregate and the DuckDB twin: a null element nulls the
        // score — reading it as 0.0 would rank corrupt rows silently
        i += 1
      }
    }
    // hoist both arrays to primitives ONCE per row (one copy each), then a
    // tight FMA loop — per-element ArrayData.getFloat virtual calls were
    // the dominant cost of the billion-vector scan (SCALE.md, r10)
    val xs = x.toFloatArray()
    val ys = y.toFloatArray()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = xs(i).toDouble
      val yi = ys(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val bad = ctx.freshName("bad")
      // null scan only when the schema admits null elements; the math loop
      // runs on hoisted float[]s either way (JIT unrolls + vectorizes a
      // primitive-array loop; it cannot through ArrayData's virtual calls)
      val nullScan = if (elementsNullable)
        s"""for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
           |}""".stripMargin
      else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  boolean $bad = false;
         |  $nullScan
         |  if ($bad) { ${ev.isNull} = true; }
         |  else {
         |    float[] $xs = $a.toFloatArray();
         |    float[] $ys = $b.toFloatArray();
         |    double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $x = (double) $xs[$i];
         |      double $y = (double) $ys[$i];
         |      $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |    }
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
