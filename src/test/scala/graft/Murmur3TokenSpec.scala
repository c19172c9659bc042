package graft

import graft.functions.expressions.Murmur3Token
import com.google.common.hash.Hashing
import java.nio.charset.StandardCharsets

/** Cross-validates our MurmurHash3 x64_128 against Guava's independent
  * implementation (same Appleby algorithm Cassandra's partitioner uses),
  * plus the partitioner's MIN→MAX normalization contract. */
class Murmur3TokenSpec extends SparkSpec {

  private def guavaFirstHalf(bytes: Array[Byte]): Long =
    Hashing.murmur3_128().hashBytes(bytes).asLong() // asLong = first 8 bytes LE

  test("hash matches Guava murmur3_128 where the two agree: ASCII tails " +
    "and full-block keys of any bytes") {
    // Cassandra's hash3_x64_128 SIGN-EXTENDS tail bytes where canonical
    // murmur3 (Guava) masks them — the implementations agree exactly when
    // every tail byte is < 0x80, and on full-block lengths regardless
    for (len <- 0 to 40) {
      val ascii = Array.tabulate[Byte](len)(i => ((i * 31 + len * 7) % 128).toByte)
      assert(Murmur3Token.hash128x64(ascii) === guavaFirstHalf(ascii),
        s"mismatch at len=$len")
    }
    for (len <- Seq(0, 16, 32)) {
      val hi = Array.tabulate[Byte](len)(i => ((i * 31 + 201) % 251).toByte)
      assert(Murmur3Token.hash128x64(hi) === guavaFirstHalf(hi),
        s"full-block mismatch at len=$len")
    }
  }

  /** Independent reimplementation of UPSTREAM's hash3_x64_128 (the
    * sign-extending variant, re-derived from public knowledge of
    * `utils/MurmurHash.java`) — the negative-key/high-byte reference
    * Guava cannot provide. */
  private def upstreamFirstHalf(data: Array[Byte]): Long = {
    val C1 = 0x87c37b91114253d5L; val C2 = 0x4cf5ad432745937fL
    def rotl(x: Long, r: Int) = java.lang.Long.rotateLeft(x, r)
    def fmix(k0: Long) = {
      var k = k0
      k ^= k >>> 33; k *= 0xff51afd7ed558ccdL; k ^= k >>> 33
      k *= 0xc4ceb9fe1a85ec53L; k ^= k >>> 33; k
    }
    val len = data.length; val nblocks = len / 16
    var h1 = 0L; var h2 = 0L
    def block(off: Int): Long = {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (data(off + i) & 0xffL); i -= 1 }
      v
    }
    var b = 0
    while (b < nblocks) {
      var k1 = block(b * 16); var k2 = block(b * 16 + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }
    val tail = nblocks * 16; val rem = len & 15
    var k1 = 0L; var k2 = 0L
    var i = rem - 1
    while (i >= 8) { k2 ^= data(tail + i).toLong << ((i - 8) * 8); i -= 1 }
    if (rem >= 9) { k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2 }
    i = math.min(rem, 8) - 1
    while (i >= 0) { k1 ^= data(tail + i).toLong << (i * 8); i -= 1 }
    if (rem > 0) { k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1 }
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    fmix(h1) + fmix(h2)
  }

  test("hash matches upstream's sign-extending variant on negative and " +
    "high-byte keys (where Guava diverges)") {
    for (v <- Seq(-1L, Long.MinValue, Long.MaxValue, -42L, -123456789L)) {
      val b = java.nio.ByteBuffer.allocate(8).putLong(v).array()
      assert(Murmur3Token.hash128x64(b) === upstreamFirstHalf(b),
        s"mismatch for bigint $v")
      // and Guava genuinely disagrees here — proves the quirk is real
      if (b.exists(_ < 0))
        assert(upstreamFirstHalf(b) !== guavaFirstHalf(b))
    }
    for (s0 <- Seq("på", "日本", "naïve")) {
      val b = s0.getBytes(StandardCharsets.UTF_8)
      assert(Murmur3Token.hash128x64(b) === upstreamFirstHalf(b),
        s"mismatch for text '$s0'")
    }
  }

  test("hash matches Guava on string keys") {
    for (s <- Seq("", "a", "cassandra", "partition-key-123",
        "the quick brown fox jumps over the lazy dog")) {
      val b = s.getBytes(StandardCharsets.UTF_8)
      assert(Murmur3Token.hash128x64(b) === guavaFirstHalf(b), s"mismatch: '$s'")
    }
  }

  test("tokenOfLong normalizes the upstream hash for every key sign") {
    for (v <- Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)) {
      val b = java.nio.ByteBuffer.allocate(8).putLong(v).array()
      assert(Murmur3Token.tokenOfLong(v) === normalize(upstreamFirstHalf(b)),
        s"mismatch for $v")
    }
  }

  private def normalize(t: Long): Long =
    if (t == Long.MinValue) Long.MaxValue else t

  test("expression evaluates distributed and matches the local function") {
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.functions._
    val tok = GraftShim.column(Murmur3Token(GraftShim.expression(col("o_orderkey"))))
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderkey"), tok.as("t"))
      .limit(50).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === Murmur3Token.tokenOfLong(r.getLong(0)))
    }
    assert(rows.nonEmpty)
  }

  // -- composite partition keys (CompositeType layout) ----------------------

  test("composite token = Guava hash of the CompositeType byte layout") {
    // layout [U db/marshal/CompositeType]: <2-byte BE len><bytes><0x00> each
    def composite(parts: Array[Byte]*): Array[Byte] =
      parts.flatMap(p =>
        Array(((p.length >> 8) & 0xff).toByte, (p.length & 0xff).toByte) ++
          p :+ 0.toByte).toArray
    val long42 = java.nio.ByteBuffer.allocate(8).putLong(42L).array()
    val textKey = "eu-west".getBytes(StandardCharsets.UTF_8)
    val int7 = java.nio.ByteBuffer.allocate(4).putInt(7).array()
    assert(Murmur3Token.tokenOfComposite(Array(long42, textKey)) ===
      normalize(guavaFirstHalf(composite(long42, textKey))))
    assert(Murmur3Token.tokenOfComposite(Array(textKey, int7, long42)) ===
      normalize(guavaFirstHalf(composite(textKey, int7, long42))))
  }

  test("murmur3_token SQL surface: 1-arg single key, n-arg composite, null → null") {
    val r = spark.sql(
      "SELECT murmur3_token(CAST(42 AS BIGINT)) AS single, " +
        "murmur3_token(CAST(42 AS BIGINT), 'eu-west') AS comp, " +
        "murmur3_token(CAST(NULL AS BIGINT), 'x') AS n").head()
    assert(r.getLong(0) === Murmur3Token.tokenOfLong(42L))
    val long42 = java.nio.ByteBuffer.allocate(8).putLong(42L).array()
    assert(r.getLong(1) === Murmur3Token.tokenOfComposite(
      Array(long42, "eu-west".getBytes(StandardCharsets.UTF_8))))
    assert(r.isNullAt(2))
    // single-key int serializes as 4 bytes, ≠ the bigint token of the value
    val ri = spark.sql("SELECT murmur3_token(7) AS t").head()
    assert(ri.getLong(0) === Murmur3Token.tokenOfInt(7))
    assert(Murmur3Token.tokenOfInt(7) !== Murmur3Token.tokenOfLong(7L))
  }
}
