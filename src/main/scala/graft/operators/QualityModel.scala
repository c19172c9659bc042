package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  /** The version x29/x30 PIN — FROZEN serving (r15): building a newer
    * artifact generation never changes what a pinned consumer scores
    * with; swapping generations is an explicit repin, gated by
    * [[driftDial]]'s measurement, exactly like the ANN codebook
    * rebuild dial (v22). */
  val ServingVersion = 1

  val SidecarName = "_graft_model"

  private lazy val artifactRoot = graft.Tables.tempRoot("graft-qmodel")

  /** bucket(token): the feature-hash index, shared bit-for-bit with the
    * DuckDB twins (`('0x'||substr(md5(tok),1,15))::BIGINT % 2001`). */
  def bucket(tok: Column): Column = md5Hash60(tok) % NumBuckets.toLong

  /** The stub "training" formula, salted per version — v1 is the r14
    * formula bit-unchanged (every green gate row stays green); v ≥ 2
    * stands in for a RETRAIN (different weights, same family/shape).
    * Used ONLY by the one-time artifact build (and the lifecycle spec). */
  private def weightFormula(bucketCol: Column, version: Int): Column = {
    val key =
      if (version == 1) bucketCol.cast("string")
      else concat(bucketCol.cast("string"), lit(s":v$version"))
    md5Hash60(key) % (2 * WeightScale + 1) - WeightScale
  }

  /** Build the version-`v` weights artifact if absent: parquet
    * `(bucket, w_num)` + `_graft_model` sidecar carrying the model
    * IDENTITY (family, bucket count, scale, threshold, version).
    * Idempotent per session and per version; generations live side by
    * side (frozen serving — a v1 consumer is untouched by a v2 build).
    * Returns the artifact directory. */
  def ensureArtifact(s: SparkSession, version: Int = ServingVersion): String =
    synchronized {
      require(version >= 1, s"model version must be >= 1, got $version")
      val dir = s"$artifactRoot/hashed-linear-$NumBuckets-v$version"
      val done = new java.io.File(dir, SidecarName)
      if (!done.isFile) {
        s.range(NumBuckets.toLong)
          .select(col("id").as("bucket"),
            weightFormula(col("id"), version).as("w_num"))
          .coalesce(1).write.mode("overwrite").parquet(dir)
        val meta =
          s"""{"family":"hashed-linear","num_buckets":$NumBuckets,""" +
            s""""weight_scale":$WeightScale,"threshold":$Threshold,""" +
            s""""version":$version}"""
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

  /** The dense bucket→w_num table, loaded from the version-`v` artifact.
    * REFUSES loudly when the artifact's sidecar declares a different
    * version than the caller pinned (a corrupted or hand-swapped
    * directory must never serve silently — the ANN mixed-metric rule
    * applied to the classifier family). */
  def weights(s: SparkSession, version: Int = ServingVersion): Array[Long] = {
    val dir = ensureArtifact(s, version)
    val declared = readSidecar(dir).getOrElse("version", -1L)
    require(declared == version.toLong,
      s"classifier artifact at $dir declares version $declared but the " +
        s"caller pinned v$version — refusing to serve; rebuild the " +
        "artifact or repin the consumer (mixed-version serving is never " +
        "silent)")
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
  def weightsLit(s: SparkSession, version: Int = ServingVersion): Column =
    typedlit(weights(s, version).toSeq)

  /** w_num(token) served FROM THE ARTIFACT: array lookup on the hashed
    * bucket (element_at is 1-based). */
  def tokenWeight(s: SparkSession, tok: Column): Column =
    element_at(weightsLit(s), bucket(tok).cast("int") + 1)

  /** Per-document integer score numerator Σ w_num(token) — one map-side
    * higher-order fold, no explode. score = w_num / (1000 · n_tokens);
    * keep ⟺ w_num > 0 (n_tokens > 0 always — split("", " ") = [""]). */
  def docWeightSum(s: SparkSession, toks: Column,
      version: Int = ServingVersion): Column = {
    val w = weightsLit(s, version)
    aggregate(toks, lit(0L),
      (acc, t) => acc + element_at(w, (md5Hash60(t) % NumBuckets.toLong)
        .cast("int") + 1))
  }

  /** The RETRAIN dial (r15 — v22's codebook-drift shape applied to the
    * classifier): score a bounded probe batch under the serving version
    * and a candidate version and measure the KEEP-flag flip rate — the
    * observable that decides re-gate vs keep. One row out:
    * `(n_probe, n_flips, flip_rate, decision)`; decision = 're-gate'
    * iff flip_rate > flipBudget (the fraction of the curated corpus a
    * swap would re-classify — above budget, the downstream keep-set
    * must be recomputed before the new generation serves). The probe is
    * the first `n` docs by doc_id — deterministic and bounded at any
    * corpus scale. */
  def driftDial(s: SparkSession, d: String, vOld: Int, vNew: Int,
      n: Int = 200, flipBudget: Double = 0.15): DataFrame = {
    import graft.functions.TextFunctions.tokens
    graft.Tables.documents(s, d)
      .orderBy(col("doc_id").asc).limit(n)
      .select(
        (docWeightSum(s, tokens(col("text")), vOld) > Threshold).as("ko"),
        (docWeightSum(s, tokens(col("text")), vNew) > Threshold).as("kn"))
      .agg(count(lit(1)).as("n_probe"),
        sum(when(col("ko") =!= col("kn"), 1L).otherwise(0L)).as("n_flips"))
      .withColumn("flip_rate",
        col("n_flips").cast("double") / col("n_probe"))
      .withColumn("decision",
        when(col("flip_rate") > flipBudget, lit("re-gate"))
          .otherwise(lit("keep")))
  }

  /** Scored outputs may only be COMBINED when produced by the same model
    * generation — the ANN mixed-metric refusal applied to the classifier
    * family. Compares the two artifacts' identity keys and refuses
    * loudly on any mismatch. */
  def requireSameModel(dirA: String, dirB: String): Unit = {
    val (a, b) = (readSidecar(dirA), readSidecar(dirB))
    Seq("version", "num_buckets", "weight_scale", "threshold").foreach { k =>
      require(a.get(k) == b.get(k),
        s"classifier artifacts disagree on $k (${a.get(k)} vs ${b.get(k)}): " +
          "refusing to combine scored outputs across model generations — " +
          "re-score one side on the common version first")
    }
  }
}
