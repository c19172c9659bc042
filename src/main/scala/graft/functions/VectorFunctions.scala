package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY §2.8 F7 — vector similarity as pure builtin Column compositions
  * (Cassandra 5.0 `similarity_cosine/euclidean/dot_product`, upstream
  * `cql3/functions/VectorFcts.java` [U]; unverifiable per SURVEY §0).
  *
  * All three stay inside whole-stage codegen (`zip_with`/`aggregate` are
  * codegen'd higher-order functions) — no UDF, no serialization breaks.
  * Elements are cast to double BEFORE multiplying so Spark and the DuckDB
  * oracle perform the identical float64 sequential fold.
  */
object VectorFunctions {
  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  /** Σ aᵢ·bᵢ, left-to-right double fold. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** cosine(a,b) = a·b / (|a|·|b|) — builtin HOF composition (reference
    * implementation; bit-identical to [[cosineFast]]). */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (norm(a) * norm(b))

  /** Codegen'd single-pass cosine over `array<float>` — the hot-path form
    * (custom Catalyst expression, SURVEY §7.5; ~80× the HOF composition on a
    * 4M-pair cross join at sf0.1, bit-identical results — SCALE.md). */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(expressions.CosineSimilarity(
      GraftShim.expression(a), GraftShim.expression(b)))
  }

  /** Codegen'd one-pass per-vector int8 quantization (see
    * [[expressions.QuantizeInt8]]); replaces three interpreted HOF passes. */
  def quantizeInt8(v: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(expressions.QuantizeInt8(GraftShim.expression(v)))
  }

  /** Codegen'd single-pass dot product over `array<float>`. */
  def dotFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(expressions.DotProduct(
      GraftShim.expression(a), GraftShim.expression(b)))
  }

  /** Codegen'd single-pass euclidean distance over `array<float>`. */
  def euclideanFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(expressions.EuclideanDistance(
      GraftShim.expression(a), GraftShim.expression(b)))
  }

  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Coarse bucket id for LSH/IVF-style ANN (SURVEY §7.4 scale path): sign
    * bits of the first `nBits` components — 2^nBits buckets. Deterministic,
    * SQL-expressible, shuffle key for the per-bucket top-k. */
  def signBucket(v: Column, nBits: Int = SignBucketBits): Column =
    (0 until nBits).map { i =>
      when(element_at(v, i + 1) >= 0f, 1 << i).otherwise(0)
    }.reduce(_ + _)

  /** Hyperplane-bit width of [[signBucket]]'s default — the single source
    * for bucket counts and multiprobe bounds (HybridAnn derives from it;
    * a second hand-written 16 had already drifted once in review). */
  val SignBucketBits: Int = 4
}
