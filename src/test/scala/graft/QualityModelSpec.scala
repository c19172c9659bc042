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
