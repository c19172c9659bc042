package graft

import graft.operators.MultimodalQueries
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("typed mapPartitions decode pipeline equals the columnar twin") {
    val typed = MultimodalQueries.decodeFeatures(
        MultimodalQueries.mediaTable(spark, sf))
      .filter(col("doc_id") < 300)
      .select("doc_id", "mime", "n_bytes", "feature")
    val columnar = MultimodalQueries.m1_features(spark, sf)
      .select("doc_id", "mime", "n_bytes", "feature")
    assert(typed.exceptAll(columnar).count() === 0)
    assert(columnar.exceptAll(typed).count() === 0)
  }

  test("payloads are 16-byte binaries with per-language mime metadata") {
    val rows = MultimodalQueries.mediaTable(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.payload.length === 16))
    assert(rows.forall(_.mime.startsWith("image/fake-")))
  }

  test("typed frame sampler equals the columnar m3 twin") {
    import spark.implicits._
    val typed = MultimodalQueries.sampleFrames(
        MultimodalQueries.mediaTable(spark, sf), stride = 2)
      .filter(col("doc_id") < 50)
      .map(f => (f.doc_id, f.frame_idx,
        f.frame.foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))))
      .toDF("doc_id", "frame_idx", "frame_value")
    val columnar = MultimodalQueries.m3_frame_sample(spark, sf)
    assert(typed.exceptAll(columnar).count() === 0)
    assert(columnar.exceptAll(typed).count() === 0)
    // 16-byte payload, 4-byte frames, stride 2 → exactly frames {0, 2}
    val idx = typed.select("frame_idx").distinct().as[Int].collect().sorted
    assert(idx.toSeq === Seq(0, 2))
  }

  test("real PNG round-trip: decoded pixels equal the generated image") {
    import graft.operators.MultimodalQueries
    val rows = MultimodalQueries.pngTable(spark, sf)
      .filter(_.doc_id == 37L).collect()
    assert(rows.length === 1)
    val png = rows.head.png
    // PNG magic: the payload is a genuine PNG file, not a fake
    assert(png.take(4).map(_ & 0xff).toSeq === Seq(0x89, 0x50, 0x4e, 0x47))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 16 + (37 % 16) && img.getHeight === 8 + (37 % 8))
    // left-half / right-half colors exactly as generated (lossless codec)
    assert(((img.getRGB(0, 0) >> 16) & 0xff) === 37 % 256)
    assert(((img.getRGB(img.getWidth - 1, 0) >> 16) & 0xff) === (37 * 3) % 256)
    assert(((img.getRGB(0, 0) >> 8) & 0xff) === (37 * 7) % 256)
    assert((img.getRGB(0, 0) & 0xff) === (37 * 13) % 256)
  }

  test("real WAV round-trip: container magic and exact PCM recovery") {
    import graft.operators.MultimodalQueries
    val row = MultimodalQueries.m7_audio_decode(spark, sf)
      .filter(col("doc_id") === 37L).head()
    assert(row.getInt(1) === 400 + 37 % 100)
    val (k, n) = (37 % 31 + 1, 400 + 37 % 100)
    assert(row.getLong(2) === k.toLong * n * (n - 1) / 2 - 32768L * n)
  }

  test("real GIF frame sampling: 4 frames written, stride-2 decoded") {
    import graft.operators.MultimodalQueries
    val rows = MultimodalQueries.m8_gif_frames(spark, sf)
      .filter(col("doc_id") === 11L).collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 2))
    rows.foreach { r =>
      assert(r.getInt(2) === ((11 * 5 + r.getInt(1) * 40) % 256))
      assert(r.getInt(3) === 8)
    }
  }

  test("resize preserves schema and truncates payloads") {
    val resized = MultimodalQueries.resizePayload(
      MultimodalQueries.mediaTable(spark, sf), n = 8)
    val rows = resized.collect()
    assert(rows.forall(r => r.payload.length === 8 && r.n_bytes === 8))
    // same columns and types (encoder tightens primitive nullability)
    assert(resized.schema.map(f => (f.name, f.dataType)) ===
      MultimodalQueries.mediaTable(spark, sf).schema.map(f => (f.name, f.dataType)))
  }
}
