package graft

import graft.operators.CassandraModel._
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CassandraModelSpec extends SparkSpec {

  test("latest-wins view is idempotent: re-applying to the view changes nothing") {
    val log = upsertLog(spark, sf)
    val v1 = latestWinsView(log).withColumn("_deleted", lit(false))
      .withColumn("v", col("v")) // view rows are themselves a valid log
    val v2 = latestWinsView(v1)
    assert(v1.drop("_deleted").exceptAll(v2).count() === 0)
    assert(v2.exceptAll(v1.drop("_deleted")).count() === 0)
  }

  test("tombstone wins: keys whose max-writetime cell is a delete are invisible") {
    val view = latestWinsView(upsertLog(spark, sf))
    val log = upsertLog(spark, sf)
    // keys where the winning (max _writetime, max v) cell is the tombstone:
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("pk").orderBy(col("_writetime").desc, col("v").desc)
    val tombstoneWins = log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("_deleted"))
      .select("pk")
    val visible = view.select("pk")
    assert(tombstoneWins.intersect(visible).count() === 0)
    assert(tombstoneWins.count() > 0, "fixture should produce winning tombstones")
  }

  test("every live key appears exactly once in the view") {
    val view = latestWinsView(upsertLog(spark, sf))
    val dupKeys = view.groupBy("pk").count().filter(col("count") > 1).count()
    assert(dupKeys === 0)
  }

  test("compact materializes exactly the view, sorted and re-readable") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val log = upsertLog(spark, sf)
    val compacted = compact(log, s"$dir/snapshot")
    val view = latestWinsView(log).withColumn("_token", tokenOf(col("pk")))
    assert(compacted.count() === view.count())
    assert(compacted.exceptAll(view.select(compacted.columns.map(col): _*)).count() === 0)
  }

  test("tokenOf is stable, non-negative, and bounded to 31 bits") {
    val toks = Tables.orders(spark, sf)
      .select(tokenOf(col("o_orderkey")).as("t"))
      .agg(min("t"), max("t")).head()
    assert(toks.getLong(0) >= 0L)
    assert(toks.getLong(1) < 2147483647L)
  }
}
