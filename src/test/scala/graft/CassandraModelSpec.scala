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

  test("partition tombstones drop whole partitions except strictly-newer writes") {
    val view = c10_partition_tombstone(spark, sf).collect()
    val byPk = view.groupBy(_.getLong(0))
    // a 13-but-not-26 partition is fully gone; a 26-partition keeps ONLY
    // its t=30 rewrite of ck=1; everything else is intact at t=10
    byPk.foreach { case (pk, rows) =>
      if (pk % 26 == 0) {
        assert(rows.map(_.getLong(1)).toSeq === Seq(1L), s"pk=$pk")
        assert(rows.head.getLong(3) === 30L, "the post-tombstone write survives")
      } else {
        assert(pk % 13 != 0L, s"pk=$pk should be tombstoned away")
        assert(rows.forall(_.getLong(3) === 10L))
      }
    }
    assert(byPk.keySet.exists(pk => pk % 26 == 0), "zombie-rule case present")
    assert(Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") < 300 && col("l_orderkey") % 13 === 0 &&
        col("l_orderkey") % 26 =!= 0)
      .count() > 0, "fully-deleted-partition case present in the fixture")
  }

  test("gc_grace: retained tombstones still shadow late writes; purged ones admit zombies") {
    import spark.implicits._
    val log = Seq(
      (1L, Option.empty[Double], Option.empty[String], 100L, 2, true), // old tombstone
      (2L, Option.empty[Double], Option.empty[String], 600L, 2, true)  // young tombstone
    ).toDF("pk", "price", "status", "_writetime", "v", "_deleted")
    val compacted = compactWithGrace(log, nowWt = 1009L, graceWt = 500L)
    assert(compacted.collect().map(_.getLong(0)).toSeq === Seq(2L),
      "only the inside-grace tombstone survives compaction (as a marker)")
    // a replica now streams in OLD writes (wt=50) for both keys
    val late = Seq(
      (1L, Some(9.0), Some("zombie"), 50L, 0, false),
      (2L, Some(9.0), Some("shadowed"), 50L, 0, false)
    ).toDF("pk", "price", "status", "_writetime", "v", "_deleted")
    val merged = latestWinsView(compacted.unionByName(late)).collect()
    assert(merged.map(_.getLong(0)).toSeq === Seq(1L),
      "pk=1 zombies back (its tombstone was purged); pk=2 stays shadowed — " +
        "exactly why upstream ties purging to gc_grace/repair")
  }

  test("cell-grace: retained CELL tombstones shadow late cell writes; purged ones admit zombies") {
    import spark.implicits._
    val log = Seq(
      // both keys: price written @10, then price CELL-deleted — pk=1's
      // tombstone (@20) ages out of grace (now=60, grace=25 → cutoff 35),
      // pk=2's (@40) stays inside it; status is never deleted
      (1L, Option(5.0), Option("A"), false, 10L),
      (1L, Option.empty[Double], Option.empty[String], true, 20L),
      (2L, Option(6.0), Option("B"), false, 10L),
      (2L, Option.empty[Double], Option.empty[String], true, 40L)
    ).toDF("pk", "price", "status", "_del_price", "_writetime")
    val snap = compactCellsWithGrace(log, nowWt = 60L, graceWt = 25L)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), r.getString(2), r.getBoolean(3))).toMap
    assert(snap(1L) === ((None, "A", false)),
      "pk=1: purged tombstone — cell gone, no marker, status untouched")
    assert(snap(2L) === ((None, "B", true)),
      "pk=2: inside grace — marker retained so it can still shadow")
    // a replica streams in an OLD price write (wt=15) for both keys; merge
    // the snapshot (markers carry their writetime) with the late cells
    val late = Seq(
      (1L, Option(9.0), Option.empty[String], false, 15L),
      (2L, Option(9.0), Option.empty[String], false, 15L)
    ).toDF("pk", "price", "status", "_del_price", "_writetime")
    val snapAsLog = compactCellsWithGrace(log, 60L, 25L)
      .select(col("pk"), col("price"), col("status"), col("_del_price"),
        coalesce(col("_del_price_wt"), lit(10L)).as("_writetime"))
    val merged = compactCellsWithGrace(snapAsLog.unionByName(late), 60L, 25L)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(merged(1L) === Some(9.0),
      "pk=1 price zombies back — its cell tombstone was purged")
    assert(merged(2L) === None,
      "pk=2 price stays shadowed by the retained cell marker")
  }

  test("tokenOf is stable, non-negative, and bounded to 31 bits") {
    val toks = Tables.orders(spark, sf)
      .select(tokenOf(col("o_orderkey")).as("t"))
      .agg(min("t"), max("t")).head()
    assert(toks.getLong(0) >= 0L)
    assert(toks.getLong(1) < 2147483647L)
  }
}
