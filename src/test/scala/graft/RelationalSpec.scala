package graft

import graft.operators.RelationalQueries
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("entry smoke: flagship pricing summary returns groups with positive sums") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    assert(rows.forall(r => r.getLong(r.fieldIndex("count_order")) > 0))
  }

  test("every declared query key has an oracle twin") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected oracle-less queries: $noOracle")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("top-k collapses to a k-row result in strict descending order") {
    val prices = RelationalQueries.o1_topk(spark, sf)
      .collect().map(_.getDouble(2))
    assert(prices.length === 20)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("broadcast star join covers all regions present in the data") {
    val n = RelationalQueries.j1_broadcast_star(spark, sf).count()
    assert(n >= 1 && n <= 5)
  }

  test("as-of join: every purchase's matched click is at or before it") {
    val bad = RelationalQueries.j6_asof(spark, sf)
      .filter(col("last_click_ts").isNotNull &&
        col("last_click_ts") > col("purchase_ts"))
      .count()
    assert(bad === 0)
  }

  test("per-partition limit never exceeds k rows per key") {
    val over = RelationalQueries.a4_per_partition_limit(spark, sf)
      .groupBy("l_orderkey").count().filter(col("count") > 2).count()
    assert(over === 0)
  }
}
