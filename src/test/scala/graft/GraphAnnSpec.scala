package graft

import graft.operators.{GraphAnn, VectorQueries}
import org.apache.spark.sql.functions._

/** Partitioned NSW graph ANN (SAI/jvector analogue): recall against the
  * exact scan, determinism, and stability across partition layouts — the
  * properties that make the exact oracle on `v7_knn_graph` safe. */
class GraphAnnSpec extends SparkSpec {

  private def exactTop10: Seq[Long] =
    VectorQueries.v1_knn_exact(spark, sf).collect().map(_.getLong(0)).toSeq

  private def graphTop10(parts: Int): Seq[Long] = {
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    GraphAnn.partitionedGraphKnn(
      Tables.embeddings(spark, sf).repartition(parts), q, 10)
      .collect().map(_.getLong(0)).toSeq
  }

  test("graph search recall is 1.0 on the fixture regardless of partitioning") {
    val exact = exactTop10
    for (parts <- Seq(1, 3, 8)) {
      assert(graphTop10(parts) === exact,
        s"graph top-10 must match exact top-10 at $parts partitions")
    }
  }

  test("persisted graph index: served results equal online build and exact") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gidx-spec").toString
    GraphAnn.buildGraphIndex(Tables.embeddings(spark, sf), dir)
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    val served = GraphAnn.serveGraphIndex(spark, dir, q, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(served === exactTop10)
    // the artifact is complete: every vector has a row, adjacency is
    // within-shard local ids
    val idx = spark.read.parquet(dir)
    assert(idx.count() === Tables.embeddings(spark, sf).count())
    // the serving plan reads the ARTIFACT, not the corpus (no online build)
    val plan = GraphAnn.serveGraphIndex(spark, dir, q, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains(dir.split("/").last) ||
      plan.toLowerCase.contains("parquet"))
    // and the declared v16 query agrees with v7's online answer
    assert(GraphAnn.v16_graph_index(spark, sf)
      .collect().map(_.getLong(0)).toSeq ===
      GraphAnn.v7_knn_graph(spark, sf)
        .collect().map(_.getLong(0)).toSeq)
  }

  test("declared v7 query is deterministic across runs") {
    val a = GraphAnn.v7_knn_graph(spark, sf).collect().toSeq
    val b = GraphAnn.v7_knn_graph(spark, sf).collect().toSeq
    assert(a === b)
  }

  test("graph path plans a top-k merge, not a global sort or collect") {
    val plan = GraphAnn.v7_knn_graph(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"query vector must broadcast, not collect:\n$plan")
  }

  test("beam budget trades recall: tiny ef still returns k valid neighbors") {
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    val out = GraphAnn.partitionedGraphKnn(
      Tables.embeddings(spark, sf), q, 10, m = 4, ef = 12).collect()
    assert(out.length === 10)
    // sims are valid cosines in descending order
    val sims = out.map(_.getDouble(1)).toSeq
    assert(sims === sims.sortBy(-_))
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
  }
}
