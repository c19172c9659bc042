package graft

import org.apache.spark.sql.functions._
import graft.Q.{dbl, dec6}

/** GraftColumnarRule / ColumnarPartialAggExec (r11): the columnar partial
  * aggregate must be plan-visible on the supported shape and BYTE-EQUAL
  * to the stock row path everywhere. The stock reference for each check
  * is the same aggregate over a `repartition`ed child — the exchange
  * between scan and aggregate makes the rule bail by construction, so
  * both paths run in one session. */
class ColumnarAggSpec extends SparkSpec {

  private val events = () => Tables.events(spark, sf)

  test("the swap is plan-visible on t1's shape and absent once any " +
    "non-scan child intervenes") {
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val swapped = events().groupBy(date_trunc("hour", col("ts")))
        .agg(count(lit(1))).queryExecution.executedPlan.toString
      assert(swapped.contains("GraftColumnarPartialAgg"), swapped)
      assert(!swapped.contains("ColumnarToRow"),
        "the scan must feed the kernel directly")
      val bails = events().repartition(4)
        .groupBy(date_trunc("hour", col("ts")))
        .agg(count(lit(1))).queryExecution.executedPlan.toString
      assert(!bails.contains("GraftColumnarPartialAgg"), bails)
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  test("swapped aggregate equals the stock row path on t1's exact shape " +
    "(timestamp trunc key, string key, count + decimal sum)") {
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dbl(dec6(sum(dec6(col("value"))))).as("sv"))
      .orderBy("w", "event_type")
      .collect().map(_.toString).toSeq
    assert(agg(events()) === agg(events().repartition(7)))
  }

  test("int-typed and long-typed group keys emit their declared widths") {
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("l_linenumber"), col("l_orderkey") % 10)
      .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sk"))
      .orderBy(col("l_linenumber"), col("l_orderkey") % 10)
      .collect().map(_.toString).toSeq
    // l_linenumber parquet type is int-width in some fixtures, long in
    // others — either way swapped and stock must agree exactly
    val t = Tables.lineitem(spark, sf).select("l_linenumber", "l_orderkey")
    assert(agg(t) === agg(t.repartition(5)))
  }

  test("null group keys and null sum inputs follow Sum/Count buffer " +
    "semantics (sum null until first value; nulls group together)") {
    val dir = Tables.tempRoot("graft-colagg-nulls")
    spark.range(100).selectExpr(
      "CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id % 4 AS STRING) END AS k",
      "CASE WHEN id % 5 = 0 THEN NULL ELSE CAST(id AS DOUBLE) END AS v",
      "CASE WHEN id % 7 = 0 THEN NULL ELSE id END AS j")
      .write.mode("overwrite").parquet(dir)
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("k")
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        sum(col("v")).as("sv"), sum(col("j")).as("sj"))
      .orderBy("k")
      .collect().map(_.toString).toSeq
    val t = spark.read.parquet(dir)
    assert(agg(t) === agg(t.repartition(6)))
    // an all-null sum group emits null, not 0
    val allNull = spark.read.parquet(dir).filter(col("v").isNull)
    // (filter above the scan bails the rule — this row is the oracle)
    assert(allNull.agg(sum("v")).head().isNullAt(0))
  }

  test("decimal quantization matches Spark's double→decimal cast on .5 " +
    "boundary values (shortest-repr HALF_UP, not exact-binary rounding)") {
    val dir = Tables.tempRoot("graft-colagg-dec")
    // 1.0000005's binary expansion is just BELOW the boundary; Spark's
    // string-route cast rounds UP. Mix in exact halves and negatives.
    val vals = Seq(1.0000005, 2.0000015, -1.0000005, 0.1, 0.3333333,
      1234.5678905, 1e12 + 0.0000005, -0.0000005)
    import spark.implicits._
    vals.toDF("v").withColumn("g", lit("x"))
      .write.mode("overwrite").parquet(dir)
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("g").agg(dec6(sum(dec6(col("v")))).as("sv"))
      .collect().map(_.toString).toSeq
    val t = spark.read.parquet(dir)
    assert(agg(t) === agg(t.repartition(3)))
  }

  test("memory bound: a tiny maxGroups forces flush-and-reset mid-scan " +
    "and the final aggregate still merges the duplicate partial keys") {
    def agg() = events()
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dbl(dec6(sum(dec6(col("value"))))).as("sv"))
      .orderBy("w", "event_type")
      .collect().map(_.toString).toSeq
    val unbounded = agg()
    spark.conf.set("spark.graft.columnarAgg.maxGroups", "4")
    val flushed = try agg()
      finally spark.conf.unset("spark.graft.columnarAgg.maxGroups")
    assert(flushed === unbounded)
  }

  test("global aggregate (no grouping) swaps and equals stock, including " +
    "over an empty relation") {
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .collect().map(_.toString).toSeq
    // raw double sums are partition-order-dependent in STOCK Spark too,
    // so the reference must be the stock plan at the SAME partitioning:
    // toggle the rule off rather than repartition
    val swapped = agg(events())
    spark.conf.set("spark.graft.columnarAgg.enabled", "false")
    val stock = try agg(events())
      finally spark.conf.set("spark.graft.columnarAgg.enabled", "true")
    assert(swapped === stock)
    val dir = Tables.tempRoot("graft-colagg-empty")
    events().filter(lit(false)).write.mode("overwrite").parquet(dir)
    val empty = spark.read.parquet(dir)
    val r = empty.agg(count(lit(1)).as("n"), sum(col("value")).as("sv")).head()
    assert(r.getLong(0) === 0L && r.isNullAt(1))
  }
}
