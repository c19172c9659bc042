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

  test("masked serve survives a shard whose entire top-k is deleted") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gmask-spec").toString
    GraphAnn.buildGraphIndex(Tables.embeddings(spark, sf), dir)
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    // delete the UNMASKED top-10 wholesale: the per-shard beams must emit
    // enough (ef, not k) candidates that live survivors below the deleted
    // head can still fill the global top-k after the broadcast anti-join
    val unmaskedTop = GraphAnn.serveGraphIndex(spark, dir, q, 10)
      .collect().map(_.getLong(0)).toSeq
    val deleted = spark.createDataFrame(
      unmaskedTop.map(Tuple1(_))).toDF("vec_id")
    val masked = GraphAnn.serveGraphIndexMasked(
        spark, Seq(dir), q, k = 10, ef = 96, Some(deleted))
      .collect().map(_.getLong(0)).toSeq
    assert(masked.size === 10, "mask must not starve the top-k")
    assert(masked.toSet.intersect(unmaskedTop.toSet).isEmpty,
      "no deleted id may surface")
    // ground truth: exact top-10 over the live vectors only
    val live = Tables.embeddings(spark, sf)
      .filter(!col("vec_id").isin(unmaskedTop: _*))
    val exactLive = VectorQueries.knnExactOver(
        live, q.select(col("qvec")), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(masked === exactLive)
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

  test("layered HNSW: recall >= flat NSW at equal ef, with fewer " +
    "search distance evaluations") {
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    // augment to graph-scale deterministically: 8 generations of the
    // fixture, each dim perturbed by a generation/id-seeded offset —
    // layers only pay once the graph dwarfs the beam, so the probe needs
    // more nodes than the 500-vector fixture
    val vecs = (0 until 8).flatMap { g =>
      base.map { case (id, v) =>
        val nid = g * 1000L + id
        (nid, v.zipWithIndex.map { case (x, i) =>
          x + (((nid * 31 + i * 7) % 97).toFloat / 97f - 0.5f) * 0.05f })
      }
    }
    val exactFor: Array[Float] => Seq[Long] = { q =>
      val qn = math.sqrt(q.map(x => x.toDouble * x).sum)
      vecs.map { case (id, v) =>
        val dot = v.zip(q).map { case (a, b) => a.toDouble * b }.sum
        val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
        (id, BigDecimal(dot / (vn * qn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (id, s0) => (-s0, id) }.take(10).map(_._1)
    }
    val queries = Seq(0L, 7L, 23L, 101L, 2042L, 5303L).map(qid =>
      vecs.find(_._1 == qid).get._2)
    val exact = queries.map(exactFor)
    def recall(got: Seq[Seq[Long]]): Double =
      got.zip(exact).map { case (g, e) =>
        g.toSet.intersect(e.toSet).size.toDouble / e.size }.sum / exact.size
    // claim 1 — equal ef: layered recall >= flat recall (the upper-layer
    // entry descent starts the beam where the answers are)
    val (hTop, hEvals, fTop, fEvals) =
      GraphAnn.probeLayered(vecs, queries, 10, efLayered = 64, efFlat = 64)
    val (hr, fr) = (recall(hTop), recall(fTop))
    info(s"equal ef=64: layered recall=$hr evals=$hEvals; " +
      s"flat recall=$fr evals=$fEvals")
    assert(hr >= fr, s"layered recall $hr < flat recall $fr")
    assert(hr >= 0.9, s"layered recall too low: $hr")
    // claim 2 — equal RECALL: the flat graph needs a far larger beam (and
    // far more distance evaluations) to reach the layered graph's recall;
    // distance evals are the cost layers exist to cut
    val flatCost = Iterator(128, 256, 512, 1024, 2048).map { ef =>
      val (_, _, ft, fe) =
        GraphAnn.probeLayered(vecs, queries, 10, efLayered = 64, efFlat = ef)
      (ef, recall(ft), fe)
    }.find(_._2 >= hr)
    info(s"flat cost to reach layered recall: $flatCost")
    assert(flatCost.forall { case (_, _, fe) => fe > hEvals },
      s"flat graph reached recall $hr cheaper than layered: " +
        s"$flatCost vs layered $hEvals")
  }

  test("v19 segment append: serve over base + segment equals exact over " +
    "the union corpus; base artifact untouched by the append") {
    val exact = {
      val e = Tables.embeddings(spark, sf)
      val union = e.select(col("vec_id"), col("embedding"))
        .unionByName(e.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
      val q = e.filter(col("vec_id") === 0L)
        .select(col("embedding").as("qvec"))
      VectorQueries.knnExactOver(union, q, 10)
        .collect().map(_.getLong(0)).toSeq
    }
    val got = GraphAnn.v19_graph_append(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(got === exact)
    // vec 0's cross-generation duplicate (100000) must surface at sim 1.0
    assert(got.contains(100000L))
    // deterministic across runs (cached artifacts serve both)
    assert(GraphAnn.v19_graph_append(spark, sf)
      .collect().map(_.getLong(0)).toSeq === got)
  }

  test("declared similarity_function drives the library serve path: a " +
    "euclidean-built index serves euclidean end-to-end, and mixed-metric " +
    "generations refuse") {
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    val eDir = java.nio.file.Files
      .createTempDirectory("graft-gidx-euclid").toString
    GraphAnn.buildGraphIndex(Tables.embeddings(spark, sf), eDir,
      metric = "euclidean")
    // no metric flag on serve: the artifact is self-describing
    val served = GraphAnn.serveGraphIndex(spark, eDir, q, 10)
      .collect().map(_.getLong(0)).toSeq
    // exact euclidean oracle over the same vectors
    val exact = Tables.embeddings(spark, sf)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(
        graft.functions.VectorFunctions.euclideanDistance(
          col("embedding"), col("qvec")), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10).collect().map(_.getLong(0)).toSeq
    assert(served === exact, "euclidean index must rank nearest-first")
    // the fixture embeddings are unit-norm (cosine and euclidean agree
    // there by algebra), so the dial's LIVENESS needs unnormalized
    // vectors: cql31's three — [10,0] is cosine-closest to [1,0] but
    // euclidean-farthest; [1,0.1] the reverse
    import spark.implicits._
    val tiny = Seq(
      (1L, Array(10f, 0f)), (2L, Array(0.5f, 0.5f)), (3L, Array(1f, 0.1f)))
      .toDF("vec_id", "embedding")
    val qTiny = Seq(Tuple1(Array(1f, 0f))).toDF("qvec")
    val tinyE = java.nio.file.Files
      .createTempDirectory("graft-gidx-tiny-e").toString
    val tinyC = java.nio.file.Files
      .createTempDirectory("graft-gidx-tiny-c").toString
    GraphAnn.buildGraphIndex(tiny, tinyE, shards = 1, metric = "euclidean")
    GraphAnn.buildGraphIndex(tiny, tinyC, shards = 1)
    val eRank = GraphAnn.serveGraphIndex(spark, tinyE, qTiny, 3)
      .collect().map(_.getLong(0)).toSeq
    val cRank = GraphAnn.serveGraphIndex(spark, tinyC, qTiny, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(eRank === Seq(3L, 2L, 1L), s"euclidean nearest-first: $eRank")
    assert(cRank === Seq(1L, 3L, 2L), s"cosine most-similar-first: $cRank")
    // a cosine segment cannot merge into a euclidean base: the scores
    // are incomparable — the multi-generation serve refuses
    val e = intercept[IllegalArgumentException] {
      GraphAnn.serveGraphIndex(spark, Seq(tinyE, tinyC), qTiny, 3).collect()
    }
    assert(e.getMessage.contains("disagree"), e.getMessage)
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
