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
