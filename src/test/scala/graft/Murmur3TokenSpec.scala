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
}
