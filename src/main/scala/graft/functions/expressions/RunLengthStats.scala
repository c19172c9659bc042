package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bigram-repetition statistics straight from the TOKEN array in ONE
  * codegen'd pass: struct(n_bigrams, maxrun, dup) where
  *  - `n_bigrams` = max(tokens − 1, 0),
  *  - `maxrun`    = the count of the most frequent bigram,
  *  - `dup`       = the number of bigrams lying in runs of length ≥ 2.
  *
  * Replaces the previous builtin formulation
  * `aggregate(array_sort(shingles(tokens, 2)), …)` (TextQueries.x12) —
  * three interpreted higher-order passes that materialized every bigram as
  * a concatenated string and rebuilt a struct per element; the suite's
  * second-hottest loop at ~1.9 s. Here bigrams are never materialized:
  * an index array is sorted comparing adjacent token PAIRS (equivalent to
  * sorting the joined strings — the space join is injective because tokens
  * are split on spaces), then run-length folded. Only adjacency of equal
  * pairs matters, so any total order works. Shuffle-free by construction —
  * x12's per-document property stays map-only at 100 TB.
  */
case class RunLengthStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("maxrun", IntegerType, nullable = false),
    StructField("dup", IntegerType, nullable = false)))
  override def prettyName: String = "run_length_stats"

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
    RunLengthStats.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.RunLengthStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RunLengthStats {
  def compute(toks: ArrayData): InternalRow = {
    val nTok = toks.numElements()
    val n = math.max(nTok - 1, 0) // bigram count
    val t = new Array[UTF8String](nTok)
    var i = 0
    while (i < nTok) {
      // token arrays carry no nulls (split output); map a null defensively
      // to empty so comparisons stay total
      t(i) = if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8
        else toks.getUTF8String(i)
      i += 1
    }
    // sort bigram START indices by (t(i), t(i+1)) — never materialize the
    // joined strings
    val idx = new Array[Integer](n)
    i = 0
    while (i < n) { idx(i) = i; i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c1 = t(a).compareTo(t(b))
        if (c1 != 0) c1 else t(a + 1).compareTo(t(b + 1))
      }
    })
    var maxrun = 0
    var dup = 0
    var run = 0
    var prev = -1
    i = 0
    while (i < n) {
      val cur = idx(i)
      val same = prev >= 0 && t(cur) == t(prev) && t(cur + 1) == t(prev + 1)
      run = if (same) run + 1 else 1
      if (run == 2) dup += 2 else if (run > 2) dup += 1
      if (run > maxrun) maxrun = run
      prev = cur
      i += 1
    }
    new GenericInternalRow(Array[Any](n, maxrun, dup))
  }
}
