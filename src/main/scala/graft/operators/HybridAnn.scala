package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.6 O5 (hybrid) — ANN top-k UNDER a scalar predicate, with the
  * pre-/post-filter cost decision a vector index planner makes
  * [U `index/sai/plan/Plan.java`, unverifiable per SURVEY §0 — re-derived
  * from the public SAI design docs]:
  *
  *   - **pre-filter** (selective predicate): evaluate the predicate first —
  *     a pushed-down parquet filter — and exact-score only the survivors.
  *     Cost ~ n·sel scored rows; the plan is scan(pred) →
  *     TakeOrderedAndProject, fully distributed, no index recall loss.
  *   - **post-filter** (permissive predicate): generate ANN candidates
  *     first (sign-bucket LSH prune, as `v2_knn_bucketed`), then apply the
  *     predicate to the candidates. Cost ~ n/buckets scanned + ~k/sel
  *     candidates consumed before k survivors; wins when sel is high
  *     because it never scores the full corpus.
  *
  * The crossover is data-dependent, so the decision consumes statistics:
  * corpus size from a column-less parquet count, predicate selectivity from
  * a key-range probe (`vec_id < probeN` — pushed down, so at 100 TB it
  * prunes to the first row groups; production would read catalog/column
  * stats instead, same decision function). Both stats jobs are O(probe),
  * not O(n) in bytes read. The decision itself ([[decide]]) is a pure
  * function, unit-testable without Spark.
  *
  * Both paths are declared queries with DuckDB twins (the bucket prune is
  * mirrored in SQL exactly as v2's), so the planner's BOTH arms stay
  * hash-verified, approximation included.
  */
object HybridAnn {

  /** Sign-bucket count, derived from [[graft.functions.VectorFunctions
    * .signBucket]]'s hyperplane-bit width — one shared constant, so the
    * cost model's rows/buckets term and the actual candidate volume
    * cannot drift. */
  private val Buckets = 1 << graft.functions.VectorFunctions.SignBucketBits

  /** Statistics feeding the cost decision. */
  case class AnnStats(rows: Long, selectivity: Double)

  /** The planner's pure cost comparison: prefilter scores `n·sel` rows;
    * postfilter scans one bucket (`n/buckets`) and consumes ~`k/sel`
    * ANN-ordered candidates before k of them pass the predicate. Returns
    * true when the pre-filter (exact) arm is the cheaper plan. */
  def decide(k: Int, stats: AnnStats, buckets: Int = Buckets): Boolean = {
    val sel = math.max(stats.selectivity, 1e-9)
    val pre = stats.rows * sel
    val post = stats.rows.toDouble / buckets + k / sel
    pre <= post
  }

  /** Selectivity probe over a pushed-down key range — the catalog-stats
    * stand-in (a real deployment reads column NDV/histograms; the fixture
    * tables carry none). One tiny aggregate job: the `vec_id < probeN`
    * predicate reaches the parquet scan, so only leading row groups are
    * read regardless of corpus size. */
  def probeStats(emb: DataFrame, pred: Column, probeN: Long = 100L): AnnStats = {
    val r = emb.filter(col("vec_id") < probeN)
      .agg(count(lit(1)).as("n"),
        count(when(pred, lit(1))).as("m"))
      .head()
    val n = math.max(r.getLong(0), 1L)
    val rows = emb.select(col("vec_id")).count() // column-pruned footer scan
    AnnStats(rows, r.getLong(1).toDouble / n)
  }

  // resolved once per (corpus, mtime) and served as a literal row — the
  // shared cache in VectorQueries (a kNN service does not re-scan the
  // corpus for the query embedding per request)
  private def queryVec(s: SparkSession, d: String): DataFrame =
    VectorQueries.queryVec(s, d, 0L)

  /** The pre-filter arm: predicate → exact top-k (TakeOrderedAndProject). */
  def prefilterKnn(s: SparkSession, d: String, pred: Column, k: Int): DataFrame =
    Tables.embeddings(s, d)
      .filter(pred)
      .crossJoin(broadcast(queryVec(s, d)))
      .select(col("vec_id"), col("label"),
        round(cosineFast(col("embedding"), col("qvec")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)

  /** The post-filter arm: sign-bucket ANN candidates → predicate → top-k.
    * Candidate recall is the bucket's (single-probe; production multi-probes
    * hamming-adjacent buckets when the filtered bucket runs short of k). */
  def postfilterKnn(s: SparkSession, d: String, pred: Column, k: Int): DataFrame = {
    val q = queryVec(s, d).withColumn("qbucket", signBucket(col("qvec")))
    Tables.embeddings(s, d)
      .withColumn("bucket", signBucket(col("embedding")))
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .filter(pred)
      .select(col("vec_id"), col("label"),
        round(cosineFast(col("embedding"), col("qvec")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Multi-probe post-filter arm: also probe the `nProbes − 1`
    * hamming-1-adjacent sign buckets (flip one hyperplane bit) — the
    * standard LSH recall lever when the filtered home bucket runs short of
    * k. Candidate volume grows linearly in probes (nProbes·n/buckets),
    * never quadratically; the probe list is a compile-time broadcast-side
    * literal, so the plan stays one equi-join. */
  def postfilterKnnMultiprobe(s: SparkSession, d: String, pred: Column,
      k: Int, nProbes: Int): DataFrame = {
    // home bucket + one flip per hyperplane bit is the whole 1-bit
    // neighborhood: more probes than bits+1 would XOR past the bucket
    // width and silently probe buckets no row can hash to
    require(nProbes >= 1 &&
      nProbes <= graft.functions.VectorFunctions.SignBucketBits + 1,
      s"nProbes must be in [1, bits+1], got $nProbes")
    val q = queryVec(s, d).withColumn("qbucket", signBucket(col("qvec")))
      .select(col("qvec"), explode(array(
        (0 until nProbes).map {
          case 0 => col("qbucket")
          case i => col("qbucket").bitwiseXOR(lit(1 << (i - 1)))
        }: _*)).as("qbucket"))
    Tables.embeddings(s, d)
      .withColumn("bucket", signBucket(col("embedding")))
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .filter(pred)
      .select(col("vec_id"), col("label"),
        round(cosineFast(col("embedding"), col("qvec")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** End-to-end hybrid ANN: probe stats, decide, run the chosen arm. */
  def knnHybrid(s: SparkSession, d: String, pred: Column, k: Int): DataFrame = {
    val stats = probeStats(Tables.embeddings(s, d), pred)
    if (decide(k, stats)) prefilterKnn(s, d, pred, k)
    else postfilterKnn(s, d, pred, k)
  }

  /** V9: selective predicate (`label = 3`, ~10 %) — declares the
    * PRE-FILTER arm directly so the oracle (exact filtered top-k) holds at
    * any fixture scale; [[knnHybrid]]'s end-to-end routing is asserted by
    * HybridAnnSpec's "knnHybrid routes by decide()" test, because the
    * cost model legitimately flips to post-filter at large n·sel, where the
    * oracle could not follow. */
  def v9_hybrid_prefilter(s: SparkSession, d: String): DataFrame =
    prefilterKnn(s, d, col("label") === 3, 10)

  /** V10: permissive predicate (`label != 3`, ~90 %) — declares the
    * POST-FILTER arm (oracle mirrors the bucket prune); planner choice
    * spec-asserted as above. */
  def v10_hybrid_postfilter(s: SparkSession, d: String): DataFrame =
    postfilterKnn(s, d, col("label") =!= 3, 10)

  /** V11: the multi-probe recall lever, declared — same permissive
    * predicate as v10 but probing the home bucket plus two hamming-1
    * neighbors; the oracle mirrors the exact probe set. */
  def v11_hybrid_multiprobe(s: SparkSession, d: String): DataFrame =
    postfilterKnnMultiprobe(s, d, col("label") =!= 3, 10, nProbes = 3)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v9_hybrid_prefilter" -> (v9_hybrid_prefilter _),
    "v10_hybrid_postfilter" -> (v10_hybrid_postfilter _),
    "v11_hybrid_multiprobe" -> (v11_hybrid_multiprobe _),
  )

  private val cosSql =
    "round(list_dot_product(v, qvec) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qvec, qvec))), 6)"

  val oracle: Map[String, String] = Map(
    "v9_hybrid_prefilter" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qvec FROM e WHERE vec_id = 0)
        |SELECT vec_id, label, $cosSql AS cos_sim
        |FROM e CROSS JOIN q WHERE label = 3
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "v10_hybrid_postfilter" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) +
        |    (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END) +
        |    (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) +
        |    (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
        |  FROM embeddings),
        |q AS (SELECT v AS qvec, bucket AS qbucket FROM e WHERE vec_id = 0)
        |SELECT vec_id, label, $cosSql AS cos_sim
        |FROM e JOIN q ON bucket = qbucket
        |WHERE label != 3
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "v11_hybrid_multiprobe" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) +
        |    (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END) +
        |    (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) +
        |    (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
        |  FROM embeddings),
        |q AS (SELECT v AS qvec, bucket AS qbucket FROM e WHERE vec_id = 0)
        |SELECT vec_id, label, $cosSql AS cos_sim
        |FROM e JOIN q ON (e.bucket = q.qbucket
        |  OR e.bucket = xor(q.qbucket, 1) OR e.bucket = xor(q.qbucket, 2))
        |WHERE label != 3
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin,
  )
}
