package graft

import graft.operators.QualityModel
import org.apache.spark.sql.functions._

/** The "model as data" lifecycle behind x29/x30: the hashed-linear weight
  * table is a persisted parquet artifact + `_graft_model` sidecar; scoring
  * reads THE ARTIFACT (broadcast literal into a map-side fold), never a
  * formula inline. */
class QualityModelSpec extends SparkSpec {

  test("artifact lifecycle: build once, sidecar round-trips, rebuild is " +
    "idempotent, weights table is the stub formula") {
    val dir1 = QualityModel.ensureArtifact(spark)
    val dir2 = QualityModel.ensureArtifact(spark)
    assert(dir1 === dir2, "ensureArtifact must be idempotent per session")
    val meta = QualityModel.readSidecar(dir1)
    assert(meta("num_buckets") === QualityModel.NumBuckets.toLong)
    assert(meta("weight_scale") === QualityModel.WeightScale)
    assert(meta("threshold") === QualityModel.Threshold)
    // the parquet content IS the model: dense over all buckets, each
    // weight matching an independent recompute of the stub formula
    val rows = spark.read.parquet(dir1)
      .select(col("bucket"),
        col("w_num"),
        (graft.functions.TextFunctions.md5Hash60(
          col("bucket").cast("string")) % 2001L - 1000L).as("expect"))
      .collect()
    assert(rows.length === QualityModel.NumBuckets)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"bucket ${r.getLong(0)}: artifact weight diverges from formula")
      assert(math.abs(r.getLong(1)) <= QualityModel.WeightScale)
    }
  }

  test("scoring is SERVED from the artifact: the fold's per-doc weight sum " +
    "equals an explode + artifact-table join recompute") {
    val d = "/root/testdata/sf0.001"
    import graft.functions.TextFunctions.{tokens, md5Hash60}
    val served = Tables.documents(spark, d)
      .select(col("doc_id"),
        QualityModel.docWeightSum(spark, tokens(col("text"))).as("w_num"))
    // independent path: explode tokens, JOIN the artifact parquet on the
    // hashed bucket, re-aggregate — if the broadcast literal ever drifted
    // from the persisted table, these disagree
    val weightsTable = spark.read.parquet(QualityModel.ensureArtifact(spark))
    val joined = Tables.documents(spark, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("bucket", md5Hash60(col("tok")) % 2001L)
      .join(weightsTable, "bucket")
      .groupBy("doc_id").agg(sum("w_num").as("w_num"))
    val diff = served.as("a").join(joined.as("b"), "doc_id")
      .filter(col("a.w_num") =!= col("b.w_num")).count()
    assert(diff === 0L, "artifact-served fold diverges from the join path")
  }

  test("v1->v2 swap is FROZEN-serving: generations live side by side, " +
    "a v2 build never moves a v1-pinned consumer") {
    val d = "/root/testdata/sf0.001"
    import graft.functions.TextFunctions.tokens
    def scoreWith(v: Int): Array[Long] =
      Tables.documents(spark, d)
        .select(col("doc_id"),
          QualityModel.docWeightSum(spark, tokens(col("text")), v).as("w"))
        .orderBy("doc_id").collect().map(_.getLong(1))
    val v1Before = scoreWith(1)
    val dir2 = QualityModel.ensureArtifact(spark, 2) // the "retrain"
    assert(QualityModel.readSidecar(dir2)("version") === 2L)
    assert(dir2 !== QualityModel.ensureArtifact(spark, 1))
    // retrained weights are a genuinely different generation
    assert(!QualityModel.weights(spark, 1)
      .sameElements(QualityModel.weights(spark, 2)))
    // frozen serving: the pinned-v1 scores are bit-identical after the
    // v2 build, and a v2 pin scores differently
    assert(scoreWith(1).sameElements(v1Before))
    assert(!scoreWith(2).sameElements(v1Before))
  }

  test("drift dial: zero flips keep, cross-version flips measured, " +
    "budget decides re-gate vs keep") {
    val d = "/root/testdata/sf0.001"
    val same = QualityModel.driftDial(spark, d, 1, 1).head()
    assert(same.getAs[Long]("n_flips") === 0L)
    assert(same.getAs[String]("decision") === "keep")
    val cross = QualityModel.driftDial(spark, d, 1, 2).head()
    val flips = cross.getAs[Long]("n_flips")
    val rate = cross.getAs[Double]("flip_rate")
    assert(cross.getAs[Long]("n_probe") > 0L)
    assert(flips > 0L, "stub retrain must actually flip some keep flags")
    assert(cross.getAs[String]("decision") ===
      (if (rate > 0.15) "re-gate" else "keep"))
    // an explicit zero budget forces re-gate whenever anything flipped
    val strict = QualityModel.driftDial(spark, d, 1, 2, flipBudget = 0.0)
      .head()
    assert(strict.getAs[String]("decision") === "re-gate")
  }

  test("mixed-generation refusal: combining scored outputs across " +
    "versions and serving a version-mismatched artifact both refuse " +
    "loudly") {
    val dir1 = QualityModel.ensureArtifact(spark, 1)
    val dir2 = QualityModel.ensureArtifact(spark, 2)
    QualityModel.requireSameModel(dir1, dir1) // same generation: fine
    val e = intercept[IllegalArgumentException](
      QualityModel.requireSameModel(dir1, dir2))
    assert(e.getMessage.contains("version"))
    assert(e.getMessage.contains("refusing to combine"))
    // a tampered sidecar (artifact claims a different version than the
    // consumer pinned) must never serve silently
    val dir3 = QualityModel.ensureArtifact(spark, 3)
    val sc = java.nio.file.Paths.get(dir3, QualityModel.SidecarName)
    val orig = new String(java.nio.file.Files.readAllBytes(sc), "UTF-8")
    try {
      java.nio.file.Files.write(sc,
        orig.replace("\"version\":3", "\"version\":999").getBytes("UTF-8"))
      val e2 = intercept[IllegalArgumentException](
        QualityModel.weights(spark, 3))
      assert(e2.getMessage.contains("refusing to serve"))
    } finally { java.nio.file.Files.write(sc, orig.getBytes("UTF-8")); () }
  }

  test("keep rule is integer-exact: keep <=> sum w_num > 0, independent " +
    "of any floating-point boundary") {
    val d = "/root/testdata/sf0.001"
    import graft.functions.TextFunctions.tokens
    val scored = Tables.documents(spark, d)
      .select(QualityModel.docWeightSum(spark, tokens(col("text")))
        .as("w_num"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
    // n_tok > 0 always (split("", " ") = [""]), so sign(score) = sign(w_num)
    assert(scored.filter(col("n_tok") <= 0L).count() === 0L)
    val bad = scored.filter(
      (col("w_num") > 0L) =!=
        (col("w_num").cast("double") / (lit(1000L) * col("n_tok")) > 0.0))
      .count()
    assert(bad === 0L)
  }
}
