package graft

import graft.operators.{CassandraModel, SkewJoin}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale-path operators: salted join (hot keys) and bucketed upsert log
  * (shuffle-free reconcile). Both assert semantics AND plan shape. */
class SkewScaleSpec extends SparkSpec {

  test("salted join equals the plain join on a hot-key dataset") {
    val big = Tables.lineitem(spark, sf)
      .select((col("l_orderkey") % 3L).as("hot"), col("l_extendedprice"),
        col("l_linenumber"))
    val dim = spark.range(0, 3).toDF("hot")
      .select(col("hot"), concat(lit("c"), col("hot")).as("klass"))
    val salted = SkewJoin.saltedJoin(big, dim, "hot", 4,
        xxhash64(col("l_linenumber")))
      .groupBy("klass").agg(count(lit(1)).as("n"))
    val plain = big.join(dim, "hot")
      .groupBy("klass").agg(count(lit(1)).as("n"))
    assert(salted.orderBy("klass").collect().toSeq ===
      plain.orderBy("klass").collect().toSeq)
  }

  test("salted join shuffles on (key, salt), spreading each hot key") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = Tables.lineitem(spark, sf)
        .select((col("l_orderkey") % 3L).as("hot"), col("l_linenumber"))
      val dim = spark.range(0, 3).toDF("hot")
      val plan = SkewJoin.saltedJoin(big, dim, "hot", 4,
          xxhash64(col("l_linenumber")))
        .queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(hot") && plan.contains("_salt"),
        s"expected shuffle keyed by (hot, _salt):\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("semdedup k-dial bounds per-cell pair work as the corpus scales") {
    import graft.operators.DedupQueries
    val target = 50L
    def pairWork(mult: Int): (Long, Long, Long) = {
      // replicate the corpus mult× with distinct ids (the 10× growth probe)
      val base = Tables.embeddings(spark, sf)
      val emb = (0 until mult).map(i => base.select(
        (col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
        .reduce(_ unionByName _)
      val n = emb.count()
      val k = DedupQueries.semdedupK(n, target)
      val cells = DedupQueries.semdedupAssignK(emb, k)
        .groupBy("cell").agg(count(lit(1)).as("sz"))
      val (sumSq, maxSz) = cells
        .agg(sum(col("sz") * col("sz")), max(col("sz"))).head() match {
          case r => (r.getLong(0), r.getLong(1))
        }
      (n, sumSq, maxSz)
    }
    val (n1, sq1, _) = pairWork(1)
    val (n10, sq10, _) = pairWork(10)
    assert(n10 === n1 * 10)
    // Σ|cell|² stays ≈ n·target as the corpus grows 10× — i.e. pair work
    // scales LINEARLY because k grew with n (the dial doing its job). A
    // generous constant absorbs cell-size skew around the mean.
    assert(sq1 <= 8L * n1 * target, s"1x pair work $sq1 vs n=$n1")
    assert(sq10 <= 8L * n10 * target, s"10x pair work $sq10 vs n=$n10")
    // and the 10× corpus pays ~10× the pair work, not 100× (the fixed-k
    // failure mode): allow 3× headroom over linear
    assert(sq10 <= 30L * sq1, s"superlinear growth: $sq1 -> $sq10")
  }

  test("bucketed upsert log: latest-wins view plans with NO shuffle") {
    val wh = Files.createTempDirectory("graft-blog").toString
    try {
      val bucketed = CassandraModel.bucketLog(
        CassandraModel.upsertLog(spark, sf), "upsert_b", s"$wh/upsert_b",
        buckets = 4)
      val view = CassandraModel.latestWinsView(bucketed)
      val plan = view.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed log must reconcile shuffle-free:\n$plan")
      // and it computes the same rows as the view over the raw log
      val raw = CassandraModel.latestWinsView(CassandraModel.upsertLog(spark, sf))
      assert(view.orderBy("pk").collect().toSeq ===
        raw.orderBy("pk").collect().toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS upsert_b")
  }
}
