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

  /** Declared similarity function → internal metric code. The graph
    * structures maximize a SCORE: cosine/dot are their own score;
    * euclidean scores by NEGATED distance (same subtraction-loop formula
    * as the codegen'd [[graft.functions.expressions.EuclideanDistance]],
    * so served distances equal the CQL path's bit for bit), making one
    * descending merge rank nearest-first for every metric — the same
    * convention the CQL ANN path applies per `similarity_function`
    * (cql31). */
  private[operators] val MetricCosine = 0
  private[operators] val MetricDot = 1
  private[operators] val MetricEuclidean = 2
  private[operators] def metricCode(name: String): Int =
    name.toLowerCase match {
      case "cosine" => MetricCosine
      case "dot_product" => MetricDot
      case "euclidean" => MetricEuclidean
      case other => throw new IllegalArgumentException(
        s"similarity_function '$other' is not supported (expected " +
          "cosine, dot_product or euclidean)")
    }
  private def metricScore(metric: Int, va: Array[Float], na: Double,
      v: Array[Float], nv: Double): Double =
    if (metric == MetricEuclidean) {
      var s = 0.0; var i = 0
      while (i < va.length) {
        val d = va(i).toDouble - v(i).toDouble; s += d * d; i += 1
      }
      -math.sqrt(s)
    } else {
      var s = 0.0; var i = 0
      while (i < va.length) { s += va(i).toDouble * v(i).toDouble; i += 1 }
      if (metric == MetricDot) s else s / (na * nv)
    }

  /** In-memory navigable-small-world graph over the declared metric's
    * score (cosine by default).
    * Single layer (HNSW's upper layers only shortcut entry — with a few
    * thousand nodes per partition the flat graph with a fixed entry point
    * searches in the same hop count). */
  private final class Nsw(m: Int, efConstruction: Int,
      metric: Int = MetricCosine) {
    private val vecs = ArrayBuffer[Array[Float]]()
    private val norms = ArrayBuffer[Double]()
    private val adj = ArrayBuffer[ArrayBuffer[Int]]()
    /** distance evaluations since [[resetEvals]] — comparison metric for
      * the layered upgrade (GraphAnnSpec). */
    var simEvals: Long = 0L
    def resetEvals(): Unit = simEvals = 0L

    private def sim(a: Int, v: Array[Float], nv: Double): Double = {
      simEvals += 1
      metricScore(metric, vecs(a), norms(a), v, nv)
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
        neighbors: Array[Array[Int]],
        metric: Int = MetricCosine): Nsw = {
      val g = new Nsw(0, 0, metric)
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

  /** Multi-layer HNSW (Malkov & Yashunin, arXiv:1603.09320 [P]) — the
    * r8-verdict upgrade over the flat NSW: geometric level assignment
    * SEEDED BY THE GLOBAL vec_id (deterministic and partition-independent
    * — the same vector lands the same level in any shard layout), greedy
    * single-entry descent through the upper layers, beam search only at
    * layer 0. Upper layers are pure shortcut structure: equal ef returns
    * recall ≥ the flat graph's with FEWER distance evaluations
    * (`simEvals` instruments exactly that; GraphAnnSpec asserts it).
    * The flat [[Nsw]] stays as the per-shard fallback and the preloaded
    * serve path for single-level artifacts. */
  private final class Hnsw(m: Int, efConstruction: Int,
      metric: Int = MetricCosine) {
    private val vecs = ArrayBuffer[Array[Float]]()
    private val norms = ArrayBuffer[Double]()
    /** adj(id)(level) — level 0 first; a node carries levels 0..L. */
    private val adj = ArrayBuffer[ArrayBuffer[ArrayBuffer[Int]]]()
    private var entry = -1
    private var maxLevel = -1
    /** distance evaluations since the last [[resetEvals]] — the cost
      * metric layers exist to reduce. */
    var simEvals: Long = 0L
    def resetEvals(): Unit = simEvals = 0L
    /** per-search score memo (active only inside [[search]]). */
    private var memo: java.util.HashMap[Integer, java.lang.Double] = null

    private def sim(a: Int, v: Array[Float], nv: Double): Double = {
      if (memo != null) {
        val hit = memo.get(a)
        if (hit != null) return hit.doubleValue
      }
      simEvals += 1
      val out = metricScore(metric, vecs(a), norms(a), v, nv)
      if (memo != null) memo.put(a, out)
      out
    }

    /** Deterministic geometric level: the seed (global vec_id) mixes
      * through a splitmix-style constant to a uniform in (0,1]; the
      * resulting floor(-ln(u)·mL) is the HNSW level draw with
      * mL = 1/ln(m) — reproducible across runs AND shard layouts. */
    private def levelFor(seed: Long): Int = {
      var z = seed + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      val u = ((z >>> 11).toDouble + 1.0) / (1L << 53).toDouble
      math.min((-math.log(u) / math.log(m.max(2))).toInt, 16)
    }

    /** Beam search within one layer (ties: smaller id wins), seeded from
      * `ep`; the [[Nsw]] search loop generalized with a level index. */
    private def searchLayer(v: Array[Float], nv: Double, ep: Int,
        ef: Int, level: Int): Seq[(Double, Int)] = {
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int.reverse)
      val visited = new java.util.BitSet(vecs.length)
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
      offer(ep)
      while (cand.nonEmpty) {
        val (s, id) = cand.dequeue()
        if (best.size == ef && ord.compare((s, id), best.first) < 0) cand.clear()
        else if (level < adj(id).length) adj(id)(level).foreach(offer)
      }
      import scala.jdk.CollectionConverters._
      best.descendingIterator.asScala.toSeq
    }

    /** Greedy single-candidate descent — the ef=1 upper-layer walk. */
    private def greedyStep(v: Array[Float], nv: Double, ep: Int,
        level: Int): Int = {
      var cur = ep
      var curSim = sim(cur, v, nv)
      var improved = true
      while (improved) {
        improved = false
        if (level < adj(cur).length) adj(cur)(level).foreach { n =>
          val s = sim(n, v, nv)
          if (s > curSim || (s == curSim && n < cur)) {
            cur = n; curSim = s; improved = true
          }
        }
      }
      cur
    }

    def search(v: Array[Float], ef: Int): Seq[(Int, Double)] = {
      if (vecs.isEmpty) return Nil
      val nv = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      // per-search memo: a node scored during the upper-layer descent is
      // never re-scored at layer 0 (the descent's whole point is to spend
      // those evaluations INSTEAD of broader layer-0 exploration)
      memo = new java.util.HashMap[Integer, java.lang.Double]()
      try {
        var ep = entry
        var lc = maxLevel
        while (lc > 0) { ep = greedyStep(v, nv, ep, lc); lc -= 1 }
        searchLayer(v, nv, ep, ef, 0).map { case (s, id) => (id, s) }
      } finally memo = null
    }

    def insert(v: Array[Float], seed: Long): Unit = {
      val id = vecs.length
      val l = levelFor(seed)
      vecs += v
      norms += math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      adj += ArrayBuffer.fill(l + 1)(ArrayBuffer.empty[Int])
      if (entry < 0) { entry = id; maxLevel = l; return }
      val nv = norms(id)
      var ep = entry
      var lc = maxLevel
      while (lc > l) { ep = greedyStep(v, nv, ep, lc); lc -= 1 }
      var level = math.min(l, maxLevel)
      while (level >= 0) {
        val w = searchLayer(v, nv, ep, efConstruction, level)
        // level 0 keeps up to 2M links (HNSW's Mmax0), upper levels M
        val cap = if (level == 0) 2 * m else m
        val nbrs = w.filter(_._2 != id).take(m)
        adj(id)(level) ++= nbrs.map(_._2)
        nbrs.foreach { case (_, n) =>
          adj(n)(level) += id
          if (adj(n)(level).length > cap) {
            val nvec = vecs(n); val nn = norms(n)
            val kept = adj(n)(level).map(x => (sim(x, nvec, nn), x))
              .sortBy(e => (-e._1, e._2)).take(cap).map(_._2)
            adj(n)(level).clear(); adj(n)(level) ++= kept
          }
        }
        ep = w.headOption.map(_._2).getOrElse(ep)
        level -= 1
      }
      if (l > maxLevel) { entry = id; maxLevel = l }
    }

    def size: Int = vecs.length

    /** Per-level adjacency for persistence — level 0 first. */
    def adjacency(id: Int): Seq[Seq[Int]] = adj(id).map(_.toSeq).toSeq
  }

  private object Hnsw {
    /** Reconstruct a searchable layered graph from persisted vectors +
      * per-level adjacency (no insert work). Entry point = the max-level
      * node, ties to the smaller local id — the same node the builder
      * ended with, recomputed deterministically. */
    def preloaded(vs: Array[Array[Float]],
        neighbors: Array[Array[Array[Int]]],
        metric: Int = MetricCosine): Hnsw = {
      val g = new Hnsw(8, 0, metric)
      var i = 0
      while (i < vs.length) {
        g.vecs += vs(i)
        g.norms += math.sqrt(vs(i).map(x => x.toDouble * x.toDouble).sum)
        g.adj += ArrayBuffer(neighbors(i).map(
          l => ArrayBuffer(l.toSeq: _*)).toSeq: _*)
        val lvl = neighbors(i).length - 1
        if (lvl > g.maxLevel) { g.maxLevel = lvl; g.entry = i }
        i += 1
      }
      g
    }
  }

  /** Per-partition graph kNN: builds the partition's HNSW (insertion in
    * vec_id order, levels seeded by vec_id), beam-searches the query,
    * emits the partition's top-k exact-rescored candidates. `ef` bounds
    * the layer-0 beam (recall/latency knob — at 100 TB this is the
    * per-shard search budget). */
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
        val g = new Hnsw(m, math.max(ef, 2 * m))
        rows.foreach(r => g.insert(r._2, r._1))
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
      m: Int = 8, efConstruction: Int = 96, shardOffset: Int = 0,
      metric: String = "cosine"): Unit = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // the metric is an INDEX property (cql31's declared
    // similarity_function): the graph's neighborhoods are built under it,
    // and the artifact carries it so the serve path scores the same way —
    // a euclidean-built index can never silently serve cosine
    val mc = metricCode(metric)
    vectors
      .select(col("vec_id").cast("long"), col("embedding"))
      .withColumn("shard",
        pmod(hash(col("vec_id")), lit(shards)) + lit(shardOffset))
      .as[(Long, Array[Float], Int)]
      .repartition(shards, col("shard"))
      .mapPartitions { it =>
        val rows = it.toArray
        rows.groupBy(_._3).iterator.flatMap { case (shard, grp) =>
          val sorted = grp.sortBy(_._1) // deterministic insertion order
          val g = new Hnsw(m, efConstruction, mc)
          sorted.foreach(r => g.insert(r._2, r._1))
          sorted.iterator.zipWithIndex.map { case ((vid, emb, _), local) =>
            (shard, local, vid, emb,
              g.adjacency(local).map(_.toArray).toArray)
          }
        }
      }
      .toDF("shard", "local_id", "vec_id", "embedding", "nbrs")
      .withColumn("metric", lit(metric.toLowerCase))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    // sidecar for the serve path: an underscore-prefixed file is hidden
    // from the parquet FileIndex, so it rides in the artifact dir without
    // touching the scan. Reading the metric from it costs a driver file
    // read instead of one Spark job per generation per serve — the r12
    // distinct()-scan put +35% on v24's wall (r13 bench protocol)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_graft_metric"),
      metric.toLowerCase.getBytes("UTF-8"))
  }

  /** A generation dir's declared metric: the `_graft_metric` sidecar when
    * present; pre-sidecar artifacts fall back to scanning the constant
    * `metric` column (one tiny job), and pre-metric artifacts read as
    * cosine — the historical behavior. */
  private def dirMetric(s: SparkSession, dir: String): String = {
    val side = java.nio.file.Paths.get(s"$dir/_graft_metric")
    if (java.nio.file.Files.isRegularFile(side))
      new String(java.nio.file.Files.readAllBytes(side), "UTF-8").trim
    else {
      val df = s.read.parquet(dir)
      if (df.columns.contains("metric"))
        df.select(col("metric")).head().getString(0)
      else "cosine"
    }
  }

  /** Serve a kNN query from a persisted graph index: each shard's graph is
    * reconstructed from its adjacency rows (NO insert/build work) and
    * beam-searched; per-shard candidates merge through the usual global
    * top-k. The plan reads ONLY the artifact + the broadcast query. */
  def serveGraphIndex(s: SparkSession, dir: String, queryVec: DataFrame,
      k: Int, ef: Int): DataFrame =
    serveGraphIndex(s, Seq(dir), queryVec, k, ef)

  def serveGraphIndex(s: SparkSession, dir: String, queryVec: DataFrame,
      k: Int): DataFrame =
    serveGraphIndex(s, Seq(dir), queryVec, k, 96)

  /** Multi-dir serve — base index + appended segment shards in ONE scan:
    * shard ids are disjoint across generations ([[buildGraphIndex]]'s
    * `shardOffset`), so every generation's graphs search independently
    * and candidates meet only in the global top-k merge. Serve cost is
    * flat in segment count: each segment adds k candidate rows to the
    * merge, never build work. */
  def serveGraphIndex(s: SparkSession, dirs: Seq[String],
      queryVec: DataFrame, k: Int, ef: Int = 96): DataFrame =
    serveGraphIndexMasked(s, dirs, queryVec, k, ef, deleted = None)

  /** Serve with a DELETION mask (the tombstone-consult shape, upstream
    * SAI/Lucene-HNSW filtered search): the graph is traversed INTACT —
    * deleted nodes still ROUTE the beam, since cutting them out would
    * orphan the neighborhoods they bridge — and candidates are masked
    * only at result collection. `deleted` is a one-column (`vec_id`)
    * deletion DataFrame applied as a broadcast LEFT-ANTI join on the
    * per-shard candidates — never materialized on the driver, so the
    * 10^9-tombstone form is the same plan (matching v20/d15). Each
    * shard emits its full ef-candidate beam when a mask is present so
    * post-join survivors can still fill the global top-k. */
  def serveGraphIndexMasked(s: SparkSession, dirs: Seq[String],
      queryVec: DataFrame, k: Int, ef: Int,
      deleted: Option[DataFrame]): DataFrame = {
    import s.implicits._
    // with a mask the per-shard emission must NOT truncate to k: a
    // shard's top-k could be entirely tombstoned while live candidates
    // sit just below — emit the whole beam and let the anti-join prune
    val emitN = if (deleted.isDefined) ef else k
    // one read per generation dir, unioned: each artifact has its own
    // partition-discovery root (shard=N subdirs), so a single multi-path
    // read would refuse the layout.
    val gens = dirs.map(s.read.parquet(_))
    // generations must score the SAME way — a cosine segment merged into
    // a euclidean base would rank on incomparable numbers; refuse rather
    // than return nonsense. Metrics come from each dir's sidecar (driver
    // file reads — r12's per-dir distinct() scan cost one Spark job per
    // generation per serve, +35% on v24's wall)
    val metrics = dirs.map(dirMetric(s, _)).toSet
    if (metrics.size != 1) throw new IllegalArgumentException(
      s"graph index generations disagree on similarity_function: $metrics")
    val mc = metricCode(metrics.head)
    val candidates = gens
      .map { df =>
        if (df.columns.contains("metric")) df.drop("metric") else df
      }
      .reduce(_ unionByName _)
      .select(col("shard").cast("int"), col("local_id").cast("int"),
        col("vec_id").cast("long"), col("embedding"), col("nbrs"))
      .crossJoin(broadcast(queryVec.select(col("qvec"))))
      .as[(Int, Int, Long, Array[Float], Array[Array[Int]], Array[Float])]
      .repartition(col("shard"))
      .mapPartitions { it =>
        val rows = it.toArray
        rows.groupBy(_._1).iterator.flatMap { case (_, grp) =>
          val sorted = grp.filter(r => r._4.length == r._6.length)
            .sortBy(_._2)
          if (sorted.isEmpty) Iterator.empty
          else {
            val qv = sorted(0)._6
            val g = Hnsw.preloaded(sorted.map(_._4), sorted.map(_._5), mc)
            takeRounded(g.search(qv, ef)
              .map { case (local, sim) => (sorted(local)._3, sim) }, emitN)
          }
        }
      }.toDF("vec_id", "sim")
    val live = deleted.fold(candidates)(del => candidates.join(
      broadcast(del.select(col("vec_id"))), Seq("vec_id"), "left_anti"))
    live.orderBy(round(col("sim"), 6).desc, col("vec_id").asc)
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
  /** The per-(corpus, mtime) persisted base index dir — the cache key
    * carries the corpus file's mtime: a regenerated fixture (same path,
    * new data) must rebuild, not serve the stale index. Shared by v16
    * (serve), v19 (segment append), and v21 (delete mask). */
  private def servedIndexDir(s: SparkSession, d: String): String = {
    val mtime = try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$d/embeddings.parquet")).toMillis
      catch { case _: Exception => 0L }
    indexCache.computeIfAbsent(s"$d@$mtime", { _ =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-graph-index").toString
      buildGraphIndex(Tables.embeddings(s, d), out)
      out
    })
  }

  def v16_graph_index(s: SparkSession, d: String): DataFrame = {
    val dir = servedIndexDir(s, d)
    val q = VectorQueries.queryVec(s, d, 0L)
    serveGraphIndex(s, dir, q, 10)
      .select(col("vec_id"), round(col("sim"), 6).as("cos_sim"))
  }

  /** Per-(corpus, mtime) EUCLIDEAN-metric index artifact for v25. */
  private val euclideanIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** V25 (r12): the declared `similarity_function` served END-TO-END
    * through the LIBRARY path — cql31 proved the dial on the CQL ANN
    * verb; this proves [[buildGraphIndex]]/[[serveGraphIndex]] honor it
    * too. The index is BUILT euclidean (neighborhoods selected under the
    * metric, the metric persisted in the artifact) and the serve path
    * picks the metric up from the artifact — no caller flag to forget,
    * so a euclidean corpus can never silently score cosine. Emits
    * nearest-first (vec_id, distance); the twin is the exact euclidean
    * top-10, so both the RANKING and the distance VALUES are
    * hash-verified (the serve loop and the codegen'd expression share
    * one subtraction-loop formula). */
  def v25_metric_serve(s: SparkSession, d: String): DataFrame = {
    val mtime = try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$d/embeddings.parquet")).toMillis
      catch { case _: Exception => 0L }
    val dir = euclideanIndexCache.computeIfAbsent(s"$d@$mtime", { _ =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-graph-euclid").toString
      buildGraphIndex(Tables.embeddings(s, d), out, metric = "euclidean")
      out
    })
    val q = VectorQueries.queryVec(s, d, 0L)
    serveGraphIndex(s, dir, q, 10) // sim = negated distance, desc merge
      .select(col("vec_id"), round(-col("sim"), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
  }

  /** GraphAnnSpec probe: build the layered HNSW and the flat NSW over the
    * SAME vectors (same insertion order, same m/efConstruction), search
    * each query at equal ef, and report per-variant (top-k ids, search
    * distance evals). The layered graph must reach recall ≥ the flat one
    * with fewer evaluations — the property the upper layers exist for. */
  private[graft] def probeLayered(vectors: Seq[(Long, Array[Float])],
      queries: Seq[Array[Float]], k: Int, efLayered: Int,
      efFlat: Int, m: Int = 8)
      : (Seq[Seq[Long]], Long, Seq[Seq[Long]], Long) = {
    val sorted = vectors.sortBy(_._1)
    val h = new Hnsw(m, math.max(efLayered, 2 * m))
    sorted.foreach { case (vid, v) => h.insert(v, vid) }
    val f = new Nsw(m, math.max(efFlat, 2 * m))
    sorted.foreach { case (_, v) => f.insert(v) }
    h.resetEvals(); f.resetEvals()
    val hTop = queries.map(q =>
      takeRounded(h.search(q, efLayered).map { case (l, s0) =>
        (sorted(l)._1, s0) }, k).map(_._1))
    val fTop = queries.map(q =>
      takeRounded(f.search(q, efFlat).map { case (l, s0) =>
        (sorted(l)._1, s0) }, k).map(_._1))
    (hTop, h.simEvals, fTop, f.simEvals)
  }

  /** Segment dir for [[v19_graph_append]] — the incoming batch's own
    * HNSW shards, built once per corpus version (mtime-keyed) with a
    * disjoint shard-id range. */
  private val segmentCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** V19 (v16 ⇄ v18 symmetry, r8-verdict task): graph-index SEGMENT
    * append — an incoming accepted batch builds its OWN small-world
    * shards, written beside the base artifact exactly the way upstream
    * SAI adds one vector-index segment per flushed sstable [U index/sai/
    * per-sstable segments] and FAISS adds after train [P]. The base
    * graphs are never touched; serving scans base + segment shards in
    * one plan and merges per-shard top-k. Oracle = exact top-10 over the
    * UNION corpus (recall 1.0 at fixture scale), so the append, the
    * disjoint shard routing, and the cross-generation merge are all
    * inside the hash gate. */
  def v19_graph_append(s: SparkSession, d: String): DataFrame = {
    val mtime = try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$d/embeddings.parquet")).toMillis
      catch { case _: Exception => 0L }
    val baseDir = servedIndexDir(s, d) // the SAME base generation v16/v21 serve
    val segDir = segmentCache.computeIfAbsent(s"$d@$mtime", { _ =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-graph-seg").toString
      val batch = Tables.embeddings(s, d)
        .filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      // 2 shards, ids offset past any base shard — one segment, own graphs
      buildGraphIndex(batch, out, shards = 2, shardOffset = 1000)
      out
    })
    val q = VectorQueries.queryVec(s, d, 0L)
    serveGraphIndex(s, Seq(baseDir, segDir), q, 10)
      .select(col("vec_id"), round(col("sim"), 6).as("cos_sim"))
  }

  /** V23 (r10 — the graph side's COMPACTION dial, d16's symmetric twin):
    * after segments accumulate, merge = REBUILD one base over the union
    * corpus (a graph merge is a rebuild by nature — adjacency is global
    * state, unlike the band index's content-preserving concat; this is
    * exactly the rebuild arm of v22's append-vs-rebuild decision). The
    * merged base serves ALONE and must return what base∪segment serving
    * returned — the twin is v19's exact union top-10, so the compaction
    * is hash-verified to change layout, never answers. */
  def v23_graph_merge(s: SparkSession, d: String): DataFrame = {
    val mtime = try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$d/embeddings.parquet")).toMillis
      catch { case _: Exception => 0L }
    val mergedDir = mergedCache.computeIfAbsent(s"$d@$mtime", { _ =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-graph-merged").toString
      val union = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
        .unionByName(Tables.embeddings(s, d)
          .filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
      buildGraphIndex(union, out)
      out
    })
    val q = VectorQueries.queryVec(s, d, 0L)
    serveGraphIndex(s, Seq(mergedDir), q, 10)
      .select(col("vec_id"), round(col("sim"), 6).as("cos_sim"))
  }

  private val mergedCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** V24 (r10): STREAMING graph-segment ingestion — d17's continuous-crawl
    * shape on the vector side: embedding batches arrive as a Structured
    * Streaming file source, each micro-batch builds its OWN graph-index
    * segment via `foreachBatch` (own shards, disjoint shard-id range —
    * v19's per-segment rule, stream-driven), and serving reads base ∪ all
    * streamed segments in the usual top-k merge. Twin = exact top-10 over
    * the equivalent batch union, so the stream→segment→serve loop is
    * hash-verified. */
  def v24_stream_graph(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val mtime = try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$d/embeddings.parquet")).toMillis
      catch { case _: Exception => 0L }
    val segRoot = streamSegCache.computeIfAbsent(s"$d@$mtime", { _ =>
      val in = java.nio.file.Paths.get(graft.Tables.tempRoot("graft-v24-in"))
      def stage(df: DataFrame, name: String): Unit = {
        val tmp = graft.Tables.tempRoot("graft-v24-w")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.copy(part.toPath, in.resolve(name),
          StandardCopyOption.REPLACE_EXISTING)
      }
      val emb = Tables.embeddings(s, d)
      stage(emb.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + 400000L).as("vec_id"), col("embedding")),
        "crawl1.parquet")
      stage(emb.filter(col("vec_id") % 6 === 0)
        .select((col("vec_id") + 500000L).as("vec_id"), col("embedding")),
        "crawl2.parquet")
      val root = graft.Tables.tempRoot("graft-v24-seg")
      val ckpt = graft.Tables.tempRoot("graft-v24-ckpt")
      val ss = StreamingQueries.streamSession(s)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, containsNull = true))))
      ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in.toString)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              batchId: Long) =>
            // one graph segment per micro-batch, disjoint shard-id range
            buildGraphIndex(batch.toDF(), s"$root/seg_$batchId",
              shards = 2, shardOffset = 2000 + batchId.toInt * 100)
            ()
        }
        .start().awaitTermination()
      root
    })
    val segDirs = new java.io.File(segRoot).listFiles()
      .filter(_.getName.startsWith("seg_")).map(_.toString).sorted.toSeq
    val q = VectorQueries.queryVec(s, d, 0L)
    serveGraphIndex(s, servedIndexDir(s, d) +: segDirs, q, 10)
      .select(col("vec_id"), round(col("sim"), 6).as("cos_sim"))
  }

  private val streamSegCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val exactStreamUnionTop10Sql =
    """WITH corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 400000 AS vec_id, embedding FROM embeddings
      |  WHERE vec_id % 4 = 0
      |  UNION ALL
      |  SELECT vec_id + 500000 AS vec_id, embedding FROM embeddings
      |  WHERE vec_id % 6 = 0),
      |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |  round(list_dot_product(CAST(embedding AS DOUBLE[]), qvec) /
      |        (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
      |         sqrt(list_dot_product(qvec, qvec))), 6) AS cos_sim
      |FROM corpus CROSS JOIN q
      |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin

  /** V7: graph-ANN top-10 for the embedding of vec_id 0 — the jvector/HNSW
    * analogue. Oracled against the EXACT top-10: the graph path is
    * deterministic and its fixture recall is 1.0 (GraphAnnSpec also checks
    * it stays 1.0 across partition counts), so the approximate index and
    * the oracle agree at verify scale. */
  def v7_knn_graph(s: SparkSession, d: String): DataFrame = {
    val q = VectorQueries.queryVec(s, d, 0L)
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

  /** v19's twin: exact top-10 over base ∪ appended batch. vec_id 0's own
    * +100000 copy ranks at similarity 1.0 right behind it — the
    * cross-generation merge must surface it or the hash misses. */
  private val exactUnionTop10Sql =
    """WITH corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
      |  WHERE vec_id % 5 = 0),
      |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |  round(list_dot_product(CAST(embedding AS DOUBLE[]), qvec) /
      |        (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
      |         sqrt(list_dot_product(qvec, qvec))), 6) AS cos_sim
      |FROM corpus CROSS JOIN q
      |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v7_knn_graph" -> (v7_knn_graph _),
    "v16_graph_index" -> (v16_graph_index _),
    "v19_graph_append" -> (v19_graph_append _),
    "v21_graph_delete" -> (v21_graph_delete _),
    "v23_graph_merge" -> (v23_graph_merge _),
    "v24_stream_graph" -> (v24_stream_graph _),
    "v25_metric_serve" -> (v25_metric_serve _))

  /** V21: the DELETE lifecycle for the graph index — deleted vectors
    * are masked at result collection while the beam still traverses
    * through them (orphaning their neighborhoods would cost recall);
    * zero rebuild. Twin = exact top-k over the LIVE vectors only. */
  def v21_graph_delete(s: SparkSession, d: String): DataFrame = {
    val dir = servedIndexDir(s, d)
    val deleted = Tables.embeddings(s, d)
      .filter(col("vec_id") % 5 === 2).select(col("vec_id"))
    val q = VectorQueries.queryVec(s, d, 0L)
    serveGraphIndexMasked(s, Seq(dir), q, k = 10, ef = 96, Some(deleted))
      .select(col("vec_id"), round(col("sim"), 6).as("cos_sim"))
  }

  private val exactLiveTop10Sql =
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |  round(list_dot_product(CAST(embedding AS DOUBLE[]), qvec) /
      |        (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
      |         sqrt(list_dot_product(qvec, qvec))), 6) AS cos_sim
      |FROM embeddings CROSS JOIN q
      |WHERE vec_id % 5 <> 2
      |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin

  val oracle: Map[String, String] = Map(
    "v7_knn_graph" -> exactTop10Sql,
    "v16_graph_index" -> exactTop10Sql,
    "v19_graph_append" -> exactUnionTop10Sql,
    "v21_graph_delete" -> exactLiveTop10Sql,
    // merged-base serving must equal base∪segment serving: v19's twin
    "v23_graph_merge" -> exactUnionTop10Sql,
    "v24_stream_graph" -> exactStreamUnionTop10Sql,
    // exact euclidean top-10, nearest-first: values AND ranking verified
    "v25_metric_serve" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_distance(CAST(embedding AS DOUBLE[]), qvec), 6) AS dist
        |FROM embeddings CROSS JOIN q
        |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin)
}
