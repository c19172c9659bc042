package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's shared 60-bit token hash, computed directly: the first 60
  * bits of `md5(s)` as a non-negative BIGINT — bit-identical to
  * `conv(substring(md5(s), 1, 15), 16, 10)` (Spark) and
  * `('0x' || substr(md5(s), 1, 15))::BIGINT` (DuckDB), which is what makes
  * the sketch queries (d3/d4, x6/x8 conventions) oracle-verifiable.
  *
  * The builtin chain materializes a 32-char hex UTF8String per value, then
  * substrings and re-parses it through `conv` — three allocations and a
  * base-16 parse per token. At corpus scale the token hash runs once per
  * TOKEN (d4) or per shingle component (d3), so that overhead is the hot
  * loop. This expression digests the UTF-8 bytes straight into a long
  * (thread-local MessageDigest, zero intermediate strings) and stays inside
  * whole-stage codegen.
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    Md5Prefix64.hash(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.Md5Prefix64.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix64 {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 = digest bytes 0..6 plus the high nibble of
    * byte 7 = the big-endian 64-bit read of bytes 0..7, shifted right 4. */
  def hash(data: Array[Byte]): Long = {
    val d = md.get()
    val dig = d.digest(data) // digest() resets the instance for reuse
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xFFL); i += 1 }
    h >>> 4
  }
}
