package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY §2.13 L2/L4 — text fingerprinting / sketching primitives, all as
  * codegen-friendly builtin compositions (no UDFs). Seeded hashing uses
  * `xxhash64` (Spark-native, 64-bit, deterministic across runs/executors).
  */
object TextFunctions {
  /** Whitespace tokenizer (the fixture corpus is space-separated words). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Order-insensitive content fingerprint: md5 of the sorted distinct token
    * set — the classic "fingerprint dedup" normalization. SQL-twin-able. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** 60-bit md5-prefix hash — bit-identical to
    * `conv(substring(md5(s),1,15),16,10)` / DuckDB
    * `('0x'||substr(md5(s),1,15))::BIGINT`, via the codegen'd
    * [[graft.functions.expressions.Md5Prefix64]] (no hex-string
    * materialization — the builtin chain is the sketch queries' hot loop). */
  def md5Hash60(c: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(expressions.Md5Prefix64(GraftShim.expression(c)))
  }

  /** The train/eval hash-split convention shared bit-for-bit with the
    * DuckDB twins: first 8 md5 hex chars of the key's string form →
    * BIGINT, mod `m`. One definition — five queries split on it; drift
    * between copies would silently split train/eval differently. */
  def hashMod(key: Column, m: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % m

  /** Word n-gram shingles: ["a b c","b c d",…] for n=3. Documents with
    * fewer than n tokens yield an EMPTY array — a bare
    * sequence(0, size-n) descends for them and slice(…, 0, …) throws on
    * the first short document in the corpus. The guard is BRANCH-FREE
    * (slice of an over-generated index range): a when() here puts the
    * transform inside a conditional branch, which defeats Spark's
    * subexpression elimination and re-evaluates the whole pipeline per
    * reference (measured 6× on x12). */
  def shingles(toks: Column, n: Int): Column =
    transform(
      slice(sequence(lit(0), size(toks)), lit(1),
        greatest(size(toks) - n + lit(1), lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))

  /** 60-bit md5 hashes of the word n-grams, straight from the token array
    * in one codegen'd pass (see [[expressions.NgramHash64]]) —
    * bit-identical to `transform(shingles(toks, n), md5Hash60)` without
    * the three interpreted HOFs or the per-gram strings (x26's 17×
    * honest-forcing gap vs its DuckDB twin was this chain). */
  def ngramHash64(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(expressions.NgramHash64(GraftShim.expression(toks), n))
  }

  /** Bigram repetition stats struct(n_bigrams, maxrun, dup) straight from
    * the TOKEN array in one codegen'd pass (see
    * [[expressions.RunLengthStats]] — replaces the interpreted
    * shingle-concat + `aggregate(array_sort(…), …)` HOF chain that was the
    * x12 hot loop; bigrams are never materialized as strings). */
  def runLengthStats(toks: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(expressions.RunLengthStats(GraftShim.expression(toks)))
  }

  /** Exact decimal(38,6) sum of per-n-gram bucket weights in one codegen'd
    * pass — x19's per-doc DSIR weight with no gram array, no explode, no
    * scoring join (see [[expressions.NgramBucketFold]]). `ratios6` =
    * bucket → unscaled decimal(38,6) weight. */
  def ngramBucketFold(toks: Column, n: Int, ratios6: Array[Long]): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(
      expressions.NgramBucketFold(GraftShim.expression(toks), n,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(ratios6)))
  }

  /** One MinHash signature component: min over shingles of a seeded 64-bit
    * hash. A full signature is an array of these with distinct seeds. */
  def minhashComponent(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, sh => xxhash64(sh, lit(seed))))

  /** k-component MinHash signature (array<bigint>). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map(minhashComponent(shingleCol, _)): _*)

  /** LSH bands over a signature: array of (bandIdx, bandHash) structs; docs
    * sharing any band hash are near-dup candidates (shuffle key at scale). */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",", transform(
          slice(sig, b * rowsPerBand + 1, rowsPerBand),
          x => x.cast("string"))), lit(b)).as("bh"))
    }: _*)

  /** 64-bit SimHash over tokens: per bit j, count tokens whose xxhash64 has
    * bit j set; bit j of the simhash is 1 iff that count exceeds half the
    * token count. Pure aggregate/zip_with fold — one pass over tokens. */
  def simhash(toks: Column): Column = {
    // hash each token ONCE before the bit fold: the inner lambda
    // previously recomputed xxhash64(t) per bit position — interpreted
    // higher-order functions do no CSE across lambda calls, so that was
    // 64x the hashing for an identical result
    val hashes = transform(toks, t => xxhash64(t))
    val counts = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          j => call_function("shiftright", h, j.cast("int"))
            .bitwiseAND(1L)),
        (a, b) => a + b))
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, j) => when(c * 2 > size(toks),
          call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
