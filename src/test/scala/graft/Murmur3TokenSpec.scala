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

  test("hash matches Guava murmur3_128 on byte keys of every tail length") {
    for (len <- 0 to 40) {
      val bytes = Array.tabulate[Byte](len)(i => ((i * 31 + len * 7) % 251).toByte)
      assert(Murmur3Token.hash128x64(bytes) === guavaFirstHalf(bytes),
        s"mismatch at len=$len")
    }
  }

  test("hash matches Guava on string keys") {
    for (s <- Seq("", "a", "cassandra", "partition-key-123",
        "the quick brown fox jumps over the lazy dog")) {
      val b = s.getBytes(StandardCharsets.UTF_8)
      assert(Murmur3Token.hash128x64(b) === guavaFirstHalf(b), s"mismatch: '$s'")
    }
  }

  test("hash matches Guava on big-endian serialized bigint keys") {
    for (v <- Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)) {
      val b = java.nio.ByteBuffer.allocate(8).putLong(v).array()
      assert(Murmur3Token.tokenOfLong(v) === normalize(guavaFirstHalf(b)),
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
