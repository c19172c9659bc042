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
}
