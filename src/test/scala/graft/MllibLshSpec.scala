package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** SURVEY §2.13 L2 — the MLlib MinHashLSH path, cross-validating the custom
  * sketch in DedupQueries: both pipelines must recover every injected
  * exact-duplicate pair on the same corpus. */
class MllibLshSpec extends SparkSpec {

  test("MLlib MinHashLSH recovers the injected duplicates the custom LSH finds") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
      .select(col("doc_id"), split(lower(col("text")), " ").as("words"))

    val tf = new HashingTF().setInputCol("words").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(corpus)

    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = mh.fit(feat)

    val pairs = model.approxSimilarityJoin(feat, feat, 0.05, "dist")
      .select(col("datasetA.doc_id").as("id_a"),
        col("datasetB.doc_id").as("id_b"))
      .filter(col("id_a") < col("id_b"))

    val expected = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id_a"),
        (col("doc_id") + 100000L).as("id_b"))

    assert(expected.exceptAll(pairs).count() === 0,
      "every exact duplicate is at Jaccard distance 0 → must survive any threshold")
  }
}
