package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession, Dataset}
import org.apache.spark.sql.functions._

/** One media row: opaque binary payload + typed metadata (SURVEY §2.13 L5). */
case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
  n_bytes: Int)

/** Extracted feature record produced by the (stubbed) decoder. */
case class MediaFeature(doc_id: Long, mime: String, n_bytes: Int,
  feature: Long)

/** SURVEY §2.13 — multimodal columns: image/audio/video as opaque `binary`
  * with typed metadata, processed per-partition in batches (the Scala
  * analogue of `mapInPandas` — `Dataset.mapPartitions` with case-class
  * encoders, so each task decodes a batch without per-row driver round-trips).
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libs in this container): feature = first-8-hex-chars of the payload's md5,
  * as an int. The Spark-side plumbing — binary column, schema, partitioning,
  * batch iteration shape — is real and tested (MultimodalSpec).
  */
object MultimodalQueries {

  /** Synthesize a deterministic binary payload per document (stand-in for
    * real image bytes): payload = md5(text) raw 16 bytes. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        unhex(md5(col("text"))).as("payload"),
        concat(lit("image/fake-"), col("lang")).as("mime"))
      .withColumn("n_bytes", length(col("payload")))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake of "decode image → feature vector".
    * Real deployments replace the body with an image library call; the
    * per-partition batch shape (one decoder init per task, streamed rows)
    * is the part that carries to 100 TB. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one (stub) decoder instance per partition/task:
      val decode: Array[Byte] => Long =
        bytes => bytes.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      rows.map(r => MediaFeature(r.doc_id, r.mime, r.n_bytes, decode(r.payload)))
    }
  }

  /** M1: multimodal pipeline — binary payload synthesis, metadata, stub
    * feature extraction — expressed as columnar ops so DuckDB can twin it
    * (the typed mapPartitions variant is spec-verified equal). */
  def m1_features(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat(lit("image/fake-"), col("lang")).as("mime"),
        length(unhex(md5(col("text")))).as("n_bytes"),
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long").as("feature"))
      .filter(col("doc_id") < 300)
      .orderBy("doc_id")

  /** M2: per-mime feature profile over the extracted features. */
  def m2_mime_profile(s: SparkSession, d: String): DataFrame =
    m1_features(s, d)
      .groupBy(col("mime"))
      .agg(count(lit(1)).as("n"), sum(col("feature")).as("sum_feature"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy("mime")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_features" -> (m1_features _),
    "m2_mime_profile" -> (m2_mime_profile _),
  )

  val oracle: Map[String, String] = Map(
    "m1_features" ->
      """SELECT doc_id, 'image/fake-' || lang AS mime,
        |  cast(octet_length(unhex(md5(text))) AS int) AS n_bytes,
        |  ('0x' || substr(md5(text), 1, 8))::BIGINT AS feature
        |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin,
    "m2_mime_profile" ->
      """SELECT mime, count(*) AS n, cast(sum(feature) AS bigint) AS sum_feature,
        |  cast(max(n_bytes) AS int) AS max_bytes
        |FROM (SELECT 'image/fake-' || lang AS mime,
        |        cast(octet_length(unhex(md5(text))) AS int) AS n_bytes,
        |        ('0x' || substr(md5(text), 1, 8))::BIGINT AS feature
        |      FROM documents WHERE doc_id < 300)
        |GROUP BY mime ORDER BY mime""".stripMargin,
  )
}
