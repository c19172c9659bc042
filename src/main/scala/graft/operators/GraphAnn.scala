package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** SURVEY §2.6 O5 (graph ANN) — the engine counterpart of Cassandra 5.0's
  * SAI vector index (jvector/HNSW, [U index/sai/disk/vector/]), done
  * Spark-first as a PARTITIONED small-world graph: each partition builds a
  * navigable-small-world graph over its local vectors and beam-searches it;
  * the global answer is the top-k merge of per-partition candidates
  * (TakeOrderedAndProject — k·P rows to the driver, never the corpus).
  * This is the sharded-graph layout production distributed ANN uses
  * (DiskANN/jvector shards): the graph lives WITH the data partition, the
  * query ships to every shard, only candidates move.
  *
  * Everything is deterministic — insertion order, neighbor selection, beam
  * tie-breaks all key on (similarity, vec_id) — so results are stable across
  * runs/partitionings as long as per-partition recall holds (GraphAnnSpec
  * measures recall 1.0 on the fixture at multiple partition counts, and the
  * declared query `v7_knn_graph` is exact-oracled at verify scale).
  *
  * `mapPartitions` is the right tool here (SURVEY preference (d)): graph
  * construction/search is genuinely imperative per-partition state; the
  * surrounding plan (broadcast query vector in, top-k merge out) stays
  * declarative.
  */
object GraphAnn {

  /** In-memory navigable-small-world graph over cosine similarity.
    * Single layer (HNSW's upper layers only shortcut entry — with a few
    * thousand nodes per partition the flat graph with a fixed entry point
    * searches in the same hop count). */
  private final class Nsw(m: Int, efConstruction: Int) {
    private val vecs = ArrayBuffer[Array[Float]]()
    private val norms = ArrayBuffer[Double]()
    private val adj = ArrayBuffer[ArrayBuffer[Int]]()

    private def sim(a: Int, v: Array[Float], nv: Double): Double = {
      val va = vecs(a)
      var s = 0.0; var i = 0
      while (i < va.length) { s += va(i).toDouble * v(i).toDouble; i += 1 }
      s / (norms(a) * nv)
    }

    /** Greedy beam search: start at node 0, expand the best unexpanded
      * candidate, keep the `ef` best seen (O(log ef) set maintenance).
      * Deterministic: ties break on smaller node id. */
    def search(v: Array[Float], ef: Int): Seq[(Int, Double)] = {
      if (vecs.isEmpty) return Nil
      val nv = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      val visited = new java.util.BitSet(vecs.length)
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int.reverse)
      // max-heap of candidates to expand; bounded sorted set of best seen,
      // first() = worst kept entry (ascending sim, larger id loses ties)
      val cand = scala.collection.mutable.PriorityQueue.empty[(Double, Int)]
      val best = new java.util.TreeSet[(Double, Int)](
        new java.util.Comparator[(Double, Int)] {
          def compare(l: (Double, Int), r: (Double, Int)): Int = {
            val c = java.lang.Double.compare(l._1, r._1)
            if (c != 0) c else Integer.compare(r._2, l._2)
          }
        })
      def offer(id: Int): Unit = if (!visited.get(id)) {
        visited.set(id)
        val s = sim(id, v, nv)
        if (best.size < ef || best.comparator.compare((s, id), best.first) > 0) {
          cand.enqueue((s, id))
          best.add((s, id))
          if (best.size > ef) best.pollFirst()
        }
      }
      offer(0)
      while (cand.nonEmpty) {
        val (s, id) = cand.dequeue()
        // stop expanding once the best open candidate can't improve the set
        if (best.size == ef && ord.compare((s, id), best.first) < 0) cand.clear()
        else adj(id).foreach(offer)
      }
      import scala.jdk.CollectionConverters._
      best.descendingIterator.asScala.map { case (s, id) => (id, s) }.toSeq
    }

    /** Insert connecting to the M nearest existing nodes (bidirectional),
      * pruning any neighbor list that exceeds 2M back to the closest 2M. */
    def insert(v: Array[Float]): Unit = {
      val id = vecs.length
      val nbrs = if (id == 0) Nil else search(v, efConstruction).take(m)
      vecs += v
      norms += math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      adj += ArrayBuffer(nbrs.map(_._1): _*)
      nbrs.foreach { case (n, _) =>
        adj(n) += id
        if (adj(n).length > 2 * m) {
          val nvec = vecs(n); val nn = norms(n)
          val kept = adj(n).map(x => (sim(x, nvec, nn), x))
            .sortBy(e => (-e._1, e._2)).take(2 * m).map(_._2)
          adj(n).clear(); adj(n) ++= kept
        }
      }
    }

    def size: Int = vecs.length

    /** The built adjacency — serialized by [[GraphAnn.buildGraphIndex]]. */
    def adjacency(id: Int): Seq[Int] = adj(id).toSeq
  }

  private object Nsw {
    /** Reconstruct a searchable graph from persisted vectors + adjacency
      * (no inserts — `m`/`efConstruction` are irrelevant on the serve
      * path). */
    def preloaded(vs: Array[Array[Float]],
        neighbors: Array[Array[Int]]): Nsw = {
      val g = new Nsw(0, 0)
      var i = 0
      while (i < vs.length) {
        g.vecs += vs(i)
        g.norms += math.sqrt(
          vs(i).map(x => x.toDouble * x.toDouble).sum)
        g.adj += ArrayBuffer(neighbors(i).toSeq: _*)
        i += 1
      }
      g
    }
  }

  /** Per-partition graph kNN: builds the partition's NSW (insertion in
    * vec_id order), beam-searches the query, emits the partition's top-k
    * exact-rescored candidates. `ef` bounds the beam (recall/latency knob —
    * at 100 TB this is the per-shard search budget). */
  def partitionedGraphKnn(vectors: DataFrame, queryVec: DataFrame, k: Int,
      m: Int = 8, ef: Int = 64): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val joined = vectors
      .select(col("vec_id").cast("long"), col("embedding"))
      .crossJoin(broadcast(queryVec.select(col("qvec"))))
      .as[(Long, Array[Float], Array[Float])]
    joined.mapPartitions { it =>
      // ragged rows (wrong embedding dimension) are skipped, not crashed
      // on or silently truncated — parity with the null-on-mismatch rule
      // every other vector path follows
      val rows = it.toArray.filter(r => r._2.length == r._3.length)
        .sortBy(_._1) // deterministic insertion order
      if (rows.isEmpty) Iterator.empty
      else {
        val qv = rows(0)._3
        val g = new Nsw(m, ef)
        rows.foreach(r => g.insert(r._2))
        takeRounded(g.search(qv, ef)
          .map { case (local, s) => (rows(local)._1, s) }, k).iterator
      }
    }.toDF("vec_id", "sim")
      .orderBy(round(col("sim"), 6).desc, col("vec_id").asc)
      .limit(k)
  }

  /** Top-k by ROUNDED similarity with vec_id tie-break — the oracle ranks
    * on round(sim, 6), so ranking on the unrounded value here could keep
    * a different vector at the k boundary when two sims differ by <5e-7
    * (HybridAnn already rounds before ordering; the graph paths must
    * match). HALF_UP decimal, the same rule Spark's round() applies. */
  private def takeRounded(cands: Seq[(Long, Double)], k: Int)
      : Seq[(Long, Double)] = {
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    cands.sortBy { case (id, s) => (-r6(s), id) }.take(k)
  }

  /** Build the sharded NSW graph ONCE and persist it as a parquet
    * artifact — one row per vector: (shard, local_id, vec_id, embedding,
    * neighbor local-ids). This is the index LIFECYCLE upstream SAI has
    * [U index/sai/disk/vector/ builds per sstable at flush/compaction,
    * serves many queries]: the per-query build of [[v7_knn_graph]] is fine
    * for a one-off scan but would not survive a high-QPS serving path —
    * the graph is built once per corpus version and queries only read it.
    * Scale: the build is one shuffle (shard assignment) + a per-partition
    * graph construction; the artifact carries the corpus once plus ~m
    * ints/vector of adjacency, partitioned by shard for pruned reads. */
  def buildGraphIndex(vectors: DataFrame, dir: String, shards: Int = 8,
      m: Int = 8, efConstruction: Int = 96): Unit = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors
      .select(col("vec_id").cast("long"), col("embedding"))
      .withColumn("shard", pmod(hash(col("vec_id")), lit(shards)))
      .as[(Long, Array[Float], Int)]
      .repartition(shards, col("shard"))
      .mapPartitions { it =>
        val rows = it.toArray
        rows.groupBy(_._3).iterator.flatMap { case (shard, grp) =>
          val sorted = grp.sortBy(_._1) // deterministic insertion order
          val g = new Nsw(m, efConstruction)
          sorted.foreach(r => g.insert(r._2))
          sorted.iterator.zipWithIndex.map { case ((vid, emb, _), local) =>
            (shard, local, vid, emb, g.adjacency(local).toArray)
          }
        }
      }
      .toDF("shard", "local_id", "vec_id", "embedding", "nbrs")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
  }

  /** Serve a kNN query from a persisted graph index: each shard's graph is
    * reconstructed from its adjacency rows (NO insert/build work) and
    * beam-searched; per-shard candidates merge through the usual global
    * top-k. The plan reads ONLY the artifact + the broadcast query. */
  def serveGraphIndex(s: SparkSession, dir: String, queryVec: DataFrame,
      k: Int, ef: Int = 96): DataFrame = {
    import s.implicits._
    s.read.parquet(dir)
      .select(col("shard").cast("int"), col("local_id").cast("int"),
        col("vec_id").cast("long"), col("embedding"), col("nbrs"))
      .crossJoin(broadcast(queryVec.select(col("qvec"))))
      .as[(Int, Int, Long, Array[Float], Array[Int], Array[Float])]
      .repartition(col("shard"))
      .mapPartitions { it =>
        val rows = it.toArray
        rows.groupBy(_._1).iterator.flatMap { case (_, grp) =>
          val sorted = grp.filter(r => r._4.length == r._6.length)
            .sortBy(_._2)
          if (sorted.isEmpty) Iterator.empty
          else {
            val qv = sorted(0)._6
            val g = Nsw.preloaded(sorted.map(_._4), sorted.map(_._5))
            takeRounded(g.search(qv, ef)
              .map { case (local, sim) => (sorted(local)._3, sim) }, k)
          }
        }
      }.toDF("vec_id", "sim")
      .orderBy(round(col("sim"), 6).desc, col("vec_id").asc)
      .limit(k)
  }

  /** Per-(sf dir, JVM) index artifact for the declared serving query — the
    * build runs once (the lifecycle under test IS build-once/serve-many). */
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** V16: kNN served from the PERSISTED graph index — same oracle as
    * [[v7_knn_graph]] (exact top-10; recall 1.0 at fixture scale), but the
    * serving plan never builds a graph: it reads the artifact built once
    * per corpus. GraphAnnSpec pins served ≡ online ≡ exact. */
  def v16_graph_index(s: SparkSession, d: String): DataFrame = {
    // cache key carries the corpus file's mtime: a regenerated fixture
    // (same path, new data) must rebuild, not serve the stale index
    val mtime = try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$d/embeddings.parquet")).toMillis
      catch { case _: Exception => 0L }
    val dir = indexCache.computeIfAbsent(s"$d@$mtime", { _ =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-graph-index").toString
      buildGraphIndex(Tables.embeddings(s, d), out)
      out
    })
    val q = Tables.embeddings(s, d).filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    serveGraphIndex(s, dir, q, 10)
      .select(col("vec_id"), round(col("sim"), 6).as("cos_sim"))
  }

  /** V7: graph-ANN top-10 for the embedding of vec_id 0 — the jvector/HNSW
    * analogue. Oracled against the EXACT top-10: the graph path is
    * deterministic and its fixture recall is 1.0 (GraphAnnSpec also checks
    * it stays 1.0 across partition counts), so the approximate index and
    * the oracle agree at verify scale. */
  def v7_knn_graph(s: SparkSession, d: String): DataFrame = {
    val q = Tables.embeddings(s, d).filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    // Shard the graph build by vec_id hash (deterministic assignment): 8
    // graphs built/searched in parallel, beam ef=96 per shard — the shard
    // count and beam are the recall/latency knobs a 100 TB deployment turns
    // (more shards = smaller graphs = higher per-shard recall AND more
    // build parallelism; candidates moved stay k·shards).
    partitionedGraphKnn(
      Tables.embeddings(s, d).repartition(8, col("vec_id")), q, 10, ef = 96)
      .select(col("vec_id"), round(col("sim"), 6).as("cos_sim"))
  }

  private val exactTop10Sql =
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |  round(list_dot_product(CAST(embedding AS DOUBLE[]), qvec) /
      |        (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
      |         sqrt(list_dot_product(qvec, qvec))), 6) AS cos_sim
      |FROM embeddings CROSS JOIN q
      |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v7_knn_graph" -> (v7_knn_graph _),
    "v16_graph_index" -> (v16_graph_index _))

  val oracle: Map[String, String] = Map(
    "v7_knn_graph" -> exactTop10Sql,
    "v16_graph_index" -> exactTop10Sql)
}
