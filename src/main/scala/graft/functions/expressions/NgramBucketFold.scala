package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, StringType}
import org.apache.spark.sql.types.Decimal

/** The exact decimal(38,6) sum `Σ_g ratio6[ h(g) mod W ]` over a token
  * array's word n-grams, in ONE codegen'd pass — the x19 (DSIR) per-doc
  * importance weight with no materialized gram array, no explode, no
  * scoring join: `h(g)` is [[NgramHash64]]'s 60-bit md5 (bit-identical to
  * the DuckDB twins' `md5(tk[i] || ' ' || …)` convention), and `ratio6`
  * is the ≤W-entry bucket profile as UNSCALED decimal(38,6) longs
  * (i.e. `round(ratio, 6) · 10⁶`, rounded by Spark's own `Round` in the
  * profile pass — this expression adds exactness, never rounding).
  *
  * Exactness: decimal(38,6) addition is exact integer addition on the
  * unscaled values, so a plain long accumulator is bit-identical to
  * `sum(dec6(round(ratio, 6)))` over the exploded gram stream under ANY
  * evaluation order. Overflow is structurally impossible for this use:
  * each addend is ≤ 10⁶ (the smoothed target/raw ratio is ≤ 1 because
  * the target slice is a subset of the corpus) and a document's gram
  * count is bounded by its token count, so the sum stays ≤ 10⁶·|toks| —
  * 20+ orders of magnitude inside Long range.
  *
  * [[NgramHash64]]'s concat_ws semantics carry over unchanged (null
  * tokens skipped without doubling the separator; fewer than n tokens →
  * zero grams → sum 0). */
case class NgramBucketFold(child: Expression, n: Int, ratios6: Seq[Long])
    extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  require(ratios6.nonEmpty, "bucket profile must be non-empty")
  // the profile is Seq (value equality), not Array (reference equality):
  // case-class equals/semanticEquals must match two identical folds or
  // subexpression elimination and exchange reuse silently miss (r14
  // advisor find); compute/codegen use this materialized array
  @transient private lazy val ratiosArr: Array[Long] = ratios6.toArray
  override def dataType: DataType = DecimalType(38, 6)
  override def prettyName: String = s"ngram_bucket_fold_$n"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string> of tokens, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    NgramBucketFold.compute(v.asInstanceOf[ArrayData], n, ratiosArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the profile is a per-plan constant: ship it once as a reference
    // object, not per-row
    val profRef = ctx.addReferenceObj("ratios6", ratiosArr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.NgramBucketFold.compute($c, $n, $profRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramBucketFold {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val SP = Array[Byte](' ')

  def compute(toks: ArrayData, n: Int, ratios6: Array[Long]): Decimal = {
    val sz = toks.numElements()
    val out = math.max(sz - n + 1, 0)
    val w = ratios6.length
    var acc = 0L
    if (out > 0) {
      val d = md.get()
      val bytes = new Array[Array[Byte]](sz)
      var i = 0
      while (i < sz) {
        bytes(i) =
          if (toks.isNullAt(i)) null
          else toks.getUTF8String(i).getBytes
        i += 1
      }
      var g = 0
      while (g < out) {
        var first = true
        var j = g
        while (j < g + n) {
          val b = bytes(j)
          if (b != null) { // concat_ws skips nulls, no doubled separator
            if (!first) d.update(SP, 0, 1)
            d.update(b, 0, b.length)
            first = false
          }
          j += 1
        }
        val dig = d.digest() // resets for reuse
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (dig(k) & 0xFFL); k += 1 }
        // h >>> 4 is the 60-bit hash: non-negative, so % == pmod
        acc += ratios6(((h >>> 4) % w).toInt)
        g += 1
      }
    }
    // per-document (not per-gram) allocation; the exact unscaled-long sum
    // becomes the decimal(38,6) value acc·10⁻⁶
    Decimal(new java.math.BigDecimal(java.math.BigInteger.valueOf(acc), 6), 38, 6)
  }
}
