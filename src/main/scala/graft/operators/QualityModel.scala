package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.md5Hash60

/** The persisted MODEL behind the x29/x30 quality gate — the hashed linear
  * classifier shape of fastText-style document scorers (the filter behind
  * DCLM / CCNet-lineage pipelines [P: published corpus-curation work;
  * the hashing trick is Weinberger et al. 2009]). "Model as data": the
  * bucket→weight table is written ONCE as a parquet artifact with an
  * underscore-prefixed `_graft_model` sidecar (the repo's artifact-metadata
  * convention — invisible to the FileIndex, read driver-side), and scoring
  * BROADCASTS the weights into a map-side fold instead of recomputing the
  * weight formula inline — the shape a real pipeline ships, where weights
  * come from training, not from a formula.
  *
  * The learned weights themselves are a deterministic stub (exactly like
  * the multimodal codec stubs): `w(bucket) = md5_60(bucket) % 2001 − 1000`,
  * uniform in [−1000, 1000] at integer resolution (interpreted as
  * [−1, 1] / [[WeightScale]]). Every number that reaches a hashed gate is
  * an exact INTEGER — per-token weight, per-doc weight sum, per-source
  * aggregates — so no double→decimal re-rounding exists anywhere in the
  * hash path (the r13 x29 flake: `dec6(sum(dec6(double)))` rounds an
  * ulp-adjacent double differently across engines; integers cannot).
  *
  * Scale shape: the artifact is K rows (K = [[NumBuckets]]) regardless of
  * corpus size; serving cost is one driver-side bounded model read per
  * session + a literal array in the fold's codegen. At 100 TB the score is
  * still a map-side higher-order fold per document — no explode, no doc_id
  * shuffle, no join against the weight table. */
object QualityModel {
  /** Feature-hash bucket count (prime, like hashing-trick practice). */
  val NumBuckets = 2001
  /** Integer weights encode [−1, 1] at 3 decimals: w = w_num / 1000. */
  val WeightScale = 1000L
  /** The stub's calibrated decision threshold: keep ⟺ Σ w_num > 0. */
  val Threshold = 0L

  val SidecarName = "_graft_model"

  private lazy val artifactRoot = graft.Tables.tempRoot("graft-qmodel")

  /** bucket(token): the feature-hash index, shared bit-for-bit with the
    * DuckDB twins (`('0x'||substr(md5(tok),1,15))::BIGINT % 2001`). */
  def bucket(tok: Column): Column = md5Hash60(tok) % NumBuckets.toLong

  /** The stub weight formula — used ONLY by the one-time artifact build
    * (and by the lifecycle spec to verify the artifact content). */
  private def weightFormula(bucketCol: Column): Column =
    md5Hash60(bucketCol.cast("string")) % (2 * WeightScale + 1) - WeightScale

  /** Build the weights artifact if absent: parquet `(bucket, w_num)` +
    * `_graft_model` sidecar. Idempotent per session; the model is
    * corpus-independent, so the cache keys on nothing but the session's
    * temp root. Returns the artifact directory. */
  def ensureArtifact(s: SparkSession): String = synchronized {
    val dir = s"$artifactRoot/hashed-linear-$NumBuckets"
    val done = new java.io.File(dir, SidecarName)
    if (!done.isFile) {
      s.range(NumBuckets.toLong)
        .select(col("id").as("bucket"), weightFormula(col("id")).as("w_num"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val meta =
        s"""{"family":"hashed-linear","num_buckets":$NumBuckets,""" +
          s""""weight_scale":$WeightScale,"threshold":$Threshold}"""
      java.nio.file.Files.write(done.toPath,
        meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
    dir
  }

  /** Parse the sidecar back (lifecycle spec + any consumer that must know
    * the bucket count before touching the parquet). */
  def readSidecar(dir: String): Map[String, Long] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, SidecarName)),
      java.nio.charset.StandardCharsets.UTF_8)
    "\"(\\w+)\":(-?\\d+)".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  // weights load once per artifact dir — a bounded MODEL read (K rows),
  // the same driver-side dictionary-read convention as the ANN query
  // vectors; never re-read per query
  private val weightsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  /** The dense bucket→w_num table, loaded from the artifact. */
  def weights(s: SparkSession): Array[Long] = {
    val dir = ensureArtifact(s)
    weightsCache.computeIfAbsent(dir, { _ =>
      val arr = new Array[Long](NumBuckets)
      s.read.parquet(dir).select("bucket", "w_num").collect().foreach { r =>
        arr(r.getLong(0).toInt) = r.getLong(1)
      }
      arr
    })
  }

  /** The weight table as a broadcast LITERAL array column (element_at is
    * codegen'd; the fold stays inside whole-stage codegen). */
  def weightsLit(s: SparkSession): Column =
    typedlit(weights(s).toSeq)

  /** w_num(token) served FROM THE ARTIFACT: array lookup on the hashed
    * bucket (element_at is 1-based). */
  def tokenWeight(s: SparkSession, tok: Column): Column =
    element_at(weightsLit(s), bucket(tok).cast("int") + 1)

  /** Per-document integer score numerator Σ w_num(token) — one map-side
    * higher-order fold, no explode. score = w_num / (1000 · n_tokens);
    * keep ⟺ w_num > 0 (n_tokens > 0 always — split("", " ") = [""]). */
  def docWeightSum(s: SparkSession, toks: Column): Column = {
    val w = weightsLit(s)
    aggregate(toks, lit(0L),
      (acc, t) => acc + element_at(w, (md5Hash60(t) % NumBuckets.toLong)
        .cast("int") + 1))
  }
}
