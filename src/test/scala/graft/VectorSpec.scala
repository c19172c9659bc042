package graft

import graft.functions.VectorFunctions._
import graft.operators.VectorQueries
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  // the shared session's cacheManager substitutes this InMemoryRelation
  // into ANY later plan over the same scan — other suites' plan-shape
  // assertions (ScalePlanSpec's ReusedExchange pin) must see the
  // uncached shape, so drop it when this suite finishes
  override def afterAll(): Unit = { emb.unpersist(true); super.afterAll() }

  test("cosine similarity of a vector with itself is 1") {
    val sims = emb.select(round(cosineSimilarity(col("embedding"),
      col("embedding")), 9).as("s")).distinct().collect().map(_.getDouble(0))
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("cosine similarity is symmetric") {
    val a = emb.filter(col("vec_id") === 1).select(col("embedding").as("va"))
    val b = emb.filter(col("vec_id") === 2).select(col("embedding").as("vb"))
    val Array(ab, ba) = a.crossJoin(b).select(
      cosineSimilarity(col("va"), col("vb")),
      cosineSimilarity(col("vb"), col("va"))).head().toSeq.toArray
    assert(ab === ba)
  }

  test("exact kNN: query vector ranks itself first with sim 1") {
    val top = VectorQueries.v1_knn_exact(spark, sf).head()
    assert(top.getLong(0) === 0L) // vec_id 0 is the query
    assert(math.abs(top.getDouble(2) - 1.0) < 1e-6)
  }

  test("bucketed ANN results are a subset of the full corpus ranked identically") {
    val exactAll = VectorQueries.v1_knn_exact(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val bucketed = VectorQueries.v2_knn_bucketed(spark, sf)
      .select("vec_id").collect().map(_.getLong(0))
    assert(bucketed.nonEmpty && bucketed.head === 0L)
    assert(bucketed.toSet.subsetOf(
      emb.select("vec_id").collect().map(_.getLong(0)).toSet))
  }

  test("codegen expressions are bit-identical to the builtin HOF compositions") {
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    val mismatches = pairs.select(
        cosineSimilarity(col("va"), col("vb")).as("ch"),
        cosineFast(col("va"), col("vb")).as("cf"),
        dotProduct(col("va"), col("vb")).as("dh"),
        dotFast(col("va"), col("vb")).as("df"),
        euclideanDistance(col("va"), col("vb")).as("eh"),
        euclideanFast(col("va"), col("vb")).as("ef"))
      .filter(col("ch") =!= col("cf") || col("dh") =!= col("df") ||
        col("eh") =!= col("ef"))
      .count()
    assert(mismatches === 0)
  }

  test("IVF ANN: probes at most 2 cells, finds the query first, returns k") {
    val out = VectorQueries.v6_knn_ivf(spark, sf).collect()
    assert(out.length === 10)
    assert(out.head.getLong(0) === 0L) // the query vector itself
    assert(math.abs(out.head.getDouble(2) - 1.0) < 1e-6)
    assert(out.map(_.getInt(1)).distinct.length <= 2) // nprobe = 2
  }

  test("IVF nprobe dial: probing every cell degrades gracefully to exact kNN") {
    val nCells = Tables.embeddings(spark, sf)
      .select("label").distinct().count().toInt
    val full = VectorQueries.knnIvf(spark, sf, queryId = 0L, k = 10,
        nprobe = nCells)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val exact = VectorQueries.v1_knn_exact(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(full.toSeq === exact.toSeq,
      "nprobe = numCells must reproduce the exact top-k, ids and sims")
  }

  test("IVF serves the declared similarity_function: euclidean at full " +
    "probe equals the exact euclidean top-k, dot stays descending") {
    val nCells = Tables.embeddings(spark, sf)
      .select("label").distinct().count().toInt
    val eucl = VectorQueries.knnIvf(spark, sf, queryId = 0L, k = 10,
        nprobe = nCells, metric = "euclidean")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    val exact = Tables.embeddings(spark, sf).crossJoin(broadcast(q))
      .select(col("vec_id"), round(
        graft.functions.VectorFunctions.euclideanFast(
          col("embedding"), col("qvec")), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(eucl.toSeq === exact.toSeq,
      "full-probe euclidean IVF must equal the exact euclidean top-k")
    val dots = VectorQueries.knnIvf(spark, sf, queryId = 0L, k = 10,
        nprobe = nCells, metric = "dot_product")
      .collect().map(_.getDouble(2)).toSeq
    assert(dots === dots.sorted.reverse, "dot ranks most-similar-first")
  }

  test("PQ index serves by its persisted metric: a euclidean-built " +
    "artifact ranks ascending ADC distance with the query nearest") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pq-eucl").toString
    VectorQueries.buildPqIndex(spark, sf, dir, metric = "euclidean")
    val served = VectorQueries.servePqIndex(spark, sf, dir).collect()
    assert(served.length === 10)
    val dists = served.map(_.getDouble(1)).toSeq
    assert(dists === dists.sorted, "euclidean ADC ranks nearest-first")
    assert(served.head.schema.fieldNames.contains("adc_dist2"))
    // the real pin: serve picked the metric up from the ARTIFACT — it
    // must equal the online euclidean scoring of the same codes (a
    // cosine default would rank descending dot under another column)
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    val online = VectorQueries.pqScore(
      spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/codebook").drop("metric"),
      q, 10, "euclidean")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served.map(r => (r.getLong(0), r.getDouble(1))).toSeq === online)
    // no flag on serve: the metric came from the artifact itself; the
    // cosine/dot artifact keeps its historical descending contract
    val cdir = java.nio.file.Files
      .createTempDirectory("graft-pq-cos2").toString
    VectorQueries.buildPqIndex(spark, sf, cdir)
    val cos = VectorQueries.servePqIndex(spark, sf, cdir).collect()
      .map(_.getDouble(1)).toSeq
    assert(cos === cos.sorted.reverse)
  }

  test("int8 index serves by its persisted metric: a euclidean-built " +
    "artifact prunes on DEQUANTIZED codes and reranks exact L2; a " +
    "pre-metric artifact reads as cosine") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-i8-eucl").toString
    VectorQueries.buildInt8Index(spark, sf, dir, metric = "euclidean")
    val served = VectorQueries.serveInt8Rerank(spark, sf, dir).collect()
    assert(served.length === 10)
    assert(served.head.schema.fieldNames.toSeq === Seq("vec_id", "dist"))
    val dists = served.map(_.getDouble(1)).toSeq
    assert(dists === dists.sorted, "euclidean rerank ranks nearest-first")
    // the 4x overfetch + matched prune/final metric recovers the exact
    // euclidean top-10 at this scale — rerank's whole point
    import graft.functions.VectorFunctions._
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    val exact = Tables.embeddings(spark, sf)
      .crossJoin(org.apache.spark.sql.functions.broadcast(q))
      .select(col("vec_id"),
        org.apache.spark.sql.functions.round(
          euclideanFast(col("embedding"), col("qvec")), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(served.map(_.getLong(0)).toSeq === exact,
      "euclidean int8 prune+rerank must recover the exact L2 top-10")
    // a cosine-built artifact keeps v13's historical contract
    val cdir = java.nio.file.Files
      .createTempDirectory("graft-i8-cos").toString
    VectorQueries.buildInt8Index(spark, sf, cdir)
    val cos = VectorQueries.serveInt8Rerank(spark, sf, cdir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val v13 = VectorQueries.v13_knn_rerank(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(cos === v13,
      "cosine int8 artifact must serve v13's online result")
    // PRE-METRIC artifact (no meta table): reads as cosine, the
    // historical scoring — the back-compat rule of every index family
    val pdir = java.nio.file.Files
      .createTempDirectory("graft-i8-pre").toString
    VectorQueries.buildInt8Index(spark, sf, pdir)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$pdir/meta"))
    val pre = VectorQueries.serveInt8Rerank(spark, sf, pdir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pre === v13, "a pre-metric artifact must score cosine")
  }

  test("int8 lifecycle: base ∪ segment serves EXACTLY like one " +
    "whole-corpus artifact (codes are self-contained), the mask excludes " +
    "deleted ids, and mixed-metric generations refuse") {
    import org.apache.spark.sql.functions.col
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val whole = tmp("graft-i8-whole")
    VectorQueries.buildInt8Index(spark, sf, whole, metric = "euclidean")
    val base = tmp("graft-i8-b"); val seg = tmp("graft-i8-g")
    VectorQueries.buildInt8IndexOver(
      Tables.embeddings(spark, sf).filter(col("vec_id") % 7 =!= 0),
      base, metric = "euclidean")
    VectorQueries.buildInt8IndexOver(
      Tables.embeddings(spark, sf).filter(col("vec_id") % 7 === 0),
      seg, metric = "euclidean")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows(VectorQueries.serveInt8Rerank(spark, sf, Seq(base, seg),
        None, 0L, 10, 40)) ===
      rows(VectorQueries.serveInt8Rerank(spark, sf, whole)),
      "base ∪ segment must equal the whole-corpus artifact bit for bit")
    // the tombstone consult: masked ids never appear
    val deleted = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    val masked = rows(VectorQueries.serveInt8Rerank(spark, sf,
      Seq(base, seg), Some(deleted), 0L, 10, 40))
    assert(masked.size === 10)
    assert(masked.forall(_._1 % 3 != 0), s"deleted ids served: $masked")
    // generations must score the same declared way
    val cosSeg = tmp("graft-i8-cos2")
    VectorQueries.buildInt8IndexOver(
      Tables.embeddings(spark, sf).filter(col("vec_id") % 7 === 0),
      cosSeg) // cosine default
    val e = intercept[IllegalArgumentException] {
      VectorQueries.serveInt8Rerank(spark, sf, Seq(base, cosSeg),
        None, 0L, 10, 40)
    }
    assert(e.getMessage.contains("disagree"), e.getMessage)
  }

  test("int8-quantized kNN preserves most of the exact top-10 (recall >= 0.8)") {
    val exact = VectorQueries.v1_knn_exact(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val quant = VectorQueries.v8_knn_int8(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(quant.size === 10)
    assert((exact & quant).size >= 8,
      s"int8 quantization lost too much: exact=$exact quant=$quant")
  }

  test("persisted PQ index serves identical results to the online pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    VectorQueries.buildPqIndex(spark, sf, dir)
    val served = VectorQueries.servePqIndex(spark, sf, dir)
    assert(served.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      VectorQueries.v12_pq_adc(spark, sf)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // the serving plan reads codes + codebook, never the corpus vectors
    // AQE's toString repeats the tree under "== Initial Plan ==" — count
    // scans in the final plan only
    val scans = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(scans.contains("codes") && scans.contains("codebook"))
    // corpus vectors appear ONLY as the single pushed-down query-row scan
    assert("embeddings\\.parquet".r.findAllIn(scans).length <= 1,
      s"serving must not rescan raw corpus vectors:\n$scans")
  }

  test("v18 incremental index: the segment participates and base vectors " +
    "are never rescanned") {
    val out = VectorQueries.v18_incremental_index(spark, sf)
    val rows = out.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length === 10)
    // vec 0's re-ingested copy (id 100000) scores identically to vec 0,
    // so the incoming SEGMENT must show up in the served top-k
    assert(rows.exists(_._1 >= 100000L),
      s"segment rows missing from ${rows.mkString(",")}")
    val base = rows.toMap
    assert(base(0L) === base(100000L)) // identical codes → identical ADC
    // serving plan: codes (both generations) + codebook + one query-row
    // scan — the base corpus vectors are not re-encoded
    val scans = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(scans.contains("codes") && scans.contains("codes_seg1") &&
      scans.contains("codebook"))
    assert("embeddings\\.parquet".r.findAllIn(scans).length <= 1,
      s"incremental serving must not rescan base vectors:\n$scans")
  }

  test("rerank recovers the exact top-10 that int8-only scoring loses") {
    val exact = VectorQueries.v1_knn_exact(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val rerank = VectorQueries.v13_knn_rerank(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(rerank.size === 10)
    assert((exact & rerank).size >= 9,
      s"40-candidate prune + exact rerank should be near-exact: " +
        s"exact=$exact rerank=$rerank")
  }

  test("euclidean distance to self is 0 and to others positive") {
    val d0 = VectorQueries.v5_euclidean_dot(spark, sf).head()
    assert(d0.getLong(0) === 0L)
    assert(d0.getDouble(1) === 0.0)
  }

  test("quantizeInt8 is bit-identical to the builtin HOF quantization chain") {
    import graft.functions.VectorFunctions.quantizeInt8
    def hofQuant(v: org.apache.spark.sql.Column) = {
      val scale = lit(127.0) / array_max(transform(v, x => abs(x.cast("double"))))
      transform(v, x => round(x.cast("double") * scale, 0).cast("float"))
    }
    val diff = Tables.embeddings(spark, sf)
      .select(col("vec_id"), quantizeInt8(col("embedding")).as("fast"),
        hofQuant(col("embedding")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() === 0)
    // round-half-away ties and null elements, pinned explicitly
    import spark.implicits._
    val edge = Seq(Seq(Some(63.5f), Some(-63.5f), None, Some(127.0f)))
      .toDF("v").select(quantizeInt8(col("v").cast("array<float>")))
      .head().getSeq[Any](0)
    assert(edge === Seq(64.0f, -64.0f, null, 127.0f))
  }

  test("r8 review: a null array element NULLS the codegen'd scores " +
    "(builtin/oracle parity, never a silent 0.0)") {
    import graft.functions.VectorFunctions._
    val df = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS b")
    val r = df.select(cosineFast(col("a"), col("b")).as("c"),
      dotFast(col("a"), col("b")).as("d"),
      euclideanFast(col("a"), col("b")).as("e")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // the builtin (non-codegen) chain agrees
    val rb = df.select(cosineSimilarity(col("a"), col("b")).as("c")).head()
    assert(rb.isNullAt(0))
  }
}
