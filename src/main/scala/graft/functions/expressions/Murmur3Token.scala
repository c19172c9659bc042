package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cassandra-compatible ring token (SURVEY §2.2 P3 fidelity option):
  * MurmurHash3 x64_128 of the key's serialized bytes, first 64-bit half,
  * `Long.MinValue` normalized to `Long.MaxValue` — the Murmur3Partitioner
  * contract [U dht/Murmur3Partitioner.java, unverifiable per SURVEY §0;
  * algorithm is Austin Appleby's public-domain MurmurHash3].
  *
  * Keys serialize as Cassandra does: bigint → 8-byte big-endian, text →
  * UTF-8 bytes. Cross-validated against Guava's murmur3_128 in
  * Murmur3TokenSpec. No DuckDB twin (engine-defined hash) — the oracle-able
  * token is [[graft.operators.CassandraModel.tokenOf]].
  */
case class Murmur3Token(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "murmur3_token"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName supports bigint or string keys, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => Murmur3Token.tokenOfLong(v.asInstanceOf[Long])
    case StringType =>
      Murmur3Token.tokenOfBytes(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = "graft.functions.expressions.Murmur3Token"
    child.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$m.tokenOfLong($c)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$m.tokenOfBytes($c.getBytes())")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Murmur3Token {

  /** bigint key → 8-byte big-endian (Cassandra LongType serialization). */
  def tokenOfLong(v: Long): Long = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    tokenOfBytes(b)
  }

  def tokenOfBytes(data: Array[Byte]): Long = {
    val h = hash128x64(data)
    if (h == Long.MinValue) Long.MaxValue else h
  }

  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  private def fmix(kIn: Long): Long = {
    var k = kIn
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** MurmurHash3 x64_128, seed 0, returning the first 64-bit half. */
  def hash128x64(data: Array[Byte]): Long = {
    val len = data.length
    val nblocks = len / 16
    var h1 = 0L
    var h2 = 0L

    def getLong(off: Int): Long = {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (data(off + i) & 0xffL); i -= 1 }
      v
    }

    var b = 0
    while (b < nblocks) {
      var k1 = getLong(b * 16)
      var k2 = getLong(b * 16 + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }

    val tail = nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem >= 9) {
      var i = rem - 1
      while (i >= 8) { k2 ^= (data(tail + i) & 0xffL) << ((i - 8) * 8); i -= 1 }
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var i = math.min(rem, 8) - 1
      while (i >= 0) { k1 ^= (data(tail + i) & 0xffL) << (i * 8); i -= 1 }
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }

    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2 // h2 += h1 — not needed for the first half
    h1
  }
}
