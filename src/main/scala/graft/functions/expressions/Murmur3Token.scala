package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
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
      case LongType | IntegerType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName supports bigint, int or string keys, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => Murmur3Token.tokenOfLong(v.asInstanceOf[Long])
    case IntegerType => Murmur3Token.tokenOfInt(v.asInstanceOf[Int])
    case StringType =>
      Murmur3Token.tokenOfBytes(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = "graft.functions.expressions.Murmur3Token"
    child.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$m.tokenOfLong($c)")
      case IntegerType =>
        defineCodeGen(ctx, ev, c => s"$m.tokenOfInt($c)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$m.tokenOfBytes($c.getBytes())")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Composite-partition-key ring token: the components serialize in
  * Cassandra's CompositeType layout — per component a 2-byte big-endian
  * length, the component bytes, and a 0x00 end-of-component byte — and the
  * whole sequence hashes like a single key [U db/marshal/CompositeType.java,
  * dht/Murmur3Partitioner.java; layout is public knowledge]. Null in any
  * component → null (a partition key component cannot be null upstream).
  * Interpreted eval (CodegenFallback): token() on a composite key is a
  * planning/paging construct, never a per-row hot loop here. */
case class Murmur3CompositeToken(children: Seq[Expression]) extends Expression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "murmur3_token"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.size < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName composite form needs at least 2 key components")
    else children.map(_.dataType).collectFirst {
      case other if !Seq(LongType, IntegerType, StringType).contains(other) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName supports bigint, int or string components, got ${other.sql}")
    }.getOrElse(
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess)

  override def eval(input: InternalRow): Any = {
    val parts = new Array[Array[Byte]](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      parts(i) = Murmur3Token.serialize(children(i).dataType, v)
      i += 1
    }
    Murmur3Token.tokenOfComposite(parts)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object Murmur3Token {

  /** Cassandra per-type key serialization (bigint/int → big-endian,
    * text → UTF-8). */
  def serialize(dt: DataType, v: Any): Array[Byte] = dt match {
    case LongType =>
      val l = v.asInstanceOf[Long]
      val b = new Array[Byte](8)
      var i = 0
      while (i < 8) { b(i) = (l >>> (56 - 8 * i)).toByte; i += 1 }
      b
    case IntegerType =>
      val n = v.asInstanceOf[Int]
      Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte,
        (n >>> 8).toByte, n.toByte)
    case StringType => v.asInstanceOf[UTF8String].getBytes
    case other => throw new IllegalArgumentException(s"unsupported key type $other")
  }

  /** CompositeType layout: <2-byte len><bytes><0x00> per component.
    * Components over 64 KiB are rejected as upstream rejects oversized
    * partition keys (FBUtilities.MAX_UNSIGNED_SHORT) — truncating the
    * 2-byte length silently re-parses as a different key. */
  def tokenOfComposite(parts: Array[Array[Byte]]): Long = {
    var total = 0L
    parts.foreach { p =>
      if (p.length > 0xffff) throw new IllegalArgumentException(
        s"composite key component of ${p.length} bytes exceeds the 65535-byte limit")
      total += p.length + 3L
    }
    if (total > Int.MaxValue - 16) throw new IllegalArgumentException(
      s"composite key of $total bytes overflows the buffer limit")
    val b = new Array[Byte](total.toInt)
    var o = 0
    parts.foreach { p =>
      b(o) = ((p.length >> 8) & 0xff).toByte
      b(o + 1) = (p.length & 0xff).toByte
      o += 2
      System.arraycopy(p, 0, b, o, p.length)
      o += p.length
      b(o) = 0
      o += 1
    }
    tokenOfBytes(b)
  }

  /** int key → 4-byte big-endian (Cassandra Int32Type serialization). */
  def tokenOfInt(v: Int): Long =
    tokenOfBytes(Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte))

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
    // TAIL bytes SIGN-EXTEND, deliberately diverging from canonical
    // MurmurHash3/Guava: Cassandra's MurmurHash.hash3_x64_128 XORs
    // `(long) key.get(i) << shift` with no 0xff mask [U utils/
    // MurmurHash.java — a known, kept quirk of the partitioner], so a
    // negative bigint key or non-ASCII text tail hashes differently than
    // the canonical algorithm. Ring compatibility means replicating the
    // quirk, not the paper.
    if (rem >= 9) {
      var i = rem - 1
      while (i >= 8) { k2 ^= data(tail + i).toLong << ((i - 8) * 8); i -= 1 }
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var i = math.min(rem, 8) - 1
      while (i >= 0) { k1 ^= data(tail + i).toLong << (i * 8); i -= 1 }
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }

    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2 // h2 += h1 — not needed for the first half
    h1
  }
}
