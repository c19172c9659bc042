package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r12, VERDICT task 1; re-founded r15): settle the a1/t1/v1
  * asymptote BY MEASUREMENT under HONEST forcing. The r11 closure claimed
  * the residual vs DuckDB "amortizes to zero at real scale"; the judge's
  * decomposition says both engines are LINEAR past the fixed costs, so
  * the ratio converges to a constant, not to 1. This probe materializes
  * a slim fixture at factor N (default 1000× ≈ 100 M event rows — big
  * enough that the stage-pipeline fixed cost is <5% of the wall) and
  * times, warm min-of-3 in one JVM.
  *
  * r15 REFOUND: every timing is forced through [[Q.force]] (noop sink,
  * every column materialized). The r12–r13 series used `.collect()`,
  * which (a) was struck by the r14 forcing audit for agg-final shapes
  * when `count()` was used elsewhere, and (b) adds driver serialization
  * cost a noop sink does not — so the legacy numbers mixed distortions
  * and the weak/not-weak attribution for a1/t1/v1 now rests on THIS
  * protocol only. `count_star` is the one intentional exception: the
  * query itself is a bare count — the decode/job floor.
  *
  * Queries, per fixture:
  *   events/embeddings fixture (SPARK_GRAFT_ASYM, default 1000×):
  *     t1_swapped    — production t1 (GraftColumnarRule active)
  *     t1_stock      — rule off (ColumnarToRow + row-based partial agg)
  *     count_star    — bare decode floor
  *     v1            — exact kNN top-10 (broadcast qvec)
  *     t17           — MV build (first) + serve (warm)
  *   lineitem fixture (SPARK_GRAFT_ASYM_LI, default 167× ≈ 100 M rows):
  *     a1_swapped    — production a1 (wide columnar decimal kernel)
  *     a1_stock      — rule off
  *
  * DuckDB pairs the SAME fixtures same-day via tools/pair_duckdb.py.
  * Usage: `SPARK_GRAFT_ASYM=1000 sbt "runMain graft.AsymptoteProbe"`.
  */
object AsymptoteProbe {

  /** events+embeddings-only N× fixture (ScaleProbe.scaled would also
    * materialize lineitem at N× — 600 M rows nobody here reads). */
  private def scaledSlim(s: SparkSession, src: String, out: String,
      f: Int): Unit = {
    val fs = new java.io.File(out)
    if (fs.exists()) return
    fs.mkdirs()
    def copies(df: org.apache.spark.sql.DataFrame)(
        shift: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame) =
      (0 until f).map(i => shift(df, i)).reduce(_ unionByName _)
    val ev = s.read.parquet(s"$src/events.parquet")
    // TIME-ORDERED layout (r13): a production events table is written in
    // ingest order and compacted time-windowed (TWCS), so row-group
    // min/max on ts partitions the timeline — the layout t17's pruned
    // tail read models. The unsorted union (every copy spanning the full
    // range) would defeat min/max pruning in a way no real events table
    // does. Same bytes per row for every other query on this fixture.
    copies(ev)((d, i) => d
        .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000L)))
      .orderBy("ts")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val em = s.read.parquet(s"$src/embeddings.parquet")
    copies(em)((d, i) => d.withColumn("vec_id",
        col("vec_id") + lit(i.toLong * 10000000L)))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** lineitem-only N× fixture for a1 (r15 — a1 had NO asymptote datum
    * and is the one headline row above the 2× gate). Natural TPC-H
    * layout (orderkey-clustered, the generator's write order); keys
    * shifted per copy so joins/windows over the fixture stay sane. */
  private def scaledLineitem(s: SparkSession, src: String, out: String,
      f: Int): Unit = {
    val fs = new java.io.File(out)
    if (fs.exists()) return
    fs.mkdirs()
    val li = s.read.parquet(s"$src/lineitem.parquet")
    (0 until f).map(i => li.withColumn("l_orderkey",
        col("l_orderkey") + lit(i.toLong * 100000000L)))
      .reduce(_ unionByName _)
      // coalesce (no shuffle: orderkey clustering per branch survives) to
      // production-sized files — the raw union writes one ~10 MB file per
      // branch, and 168 tiny files measures per-file reader setup, not
      // the scan; a real 100 M-row table ships tens of large files
      .coalesce(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
  }

  private def time(f: => Unit): Double = {
    f // warm: plan + codegen + page cache
    (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_ASYM", "1000").toInt
    val liFactor = sys.env.getOrElse("SPARK_GRAFT_ASYM_LI", "167").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // comma-separated subset of {events,lineitem}; default both
    val groups = sys.env.getOrElse("SPARK_GRAFT_ASYM_GROUPS", "events,lineitem")
      .split(",").map(_.trim).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-asymptote-probe")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (groups("events")) {
      val dir = s"/tmp/graft-asym-${factor}x"
      scaledSlim(spark, base, dir, factor)
      val rows = spark.read.parquet(s"$dir/events.parquet").count()
      def report(name: String, sec: Double): Unit =
        println(f"""ASYM {"query":"$name","sec":$sec%.3f,"rows":$rows%d,"nsPerRow":${sec * 1e9 / rows}%.2f}""")

      spark.conf.set("spark.graft.columnarAgg.enabled", "true")
      report("t1_swapped",
        time(Q.force(operators.StreamingQueries.t1_tumbling(spark, dir))))
      spark.conf.set("spark.graft.columnarAgg.enabled", "false")
      report("t1_stock",
        time(Q.force(operators.StreamingQueries.t1_tumbling(spark, dir))))
      spark.conf.set("spark.graft.columnarAgg.enabled", "true")
      report("count_star",
        time { spark.read.parquet(s"$dir/events.parquet").count(); () })
      report("v1",
        time(Q.force(operators.VectorQueries.v1_knn_exact(spark, dir))))
      // t17 (r13): the MV answer to the decode floor — first call builds
      // the rollup MV through the streaming machinery (one-time, reported
      // separately), warm serves read hours×types MV rows + a one-hour
      // raw tail instead of the 100 M-row history
      val tBuild = {
        val t0 = System.nanoTime()
        Q.force(operators.StreamingQueries.t17_mv_rollup(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""ASYM {"query":"t17_mv_build_first","sec":$tBuild%.3f,"rows":$rows%d,"nsPerRow":${tBuild * 1e9 / rows}%.2f}""")
      report("t17_mv_serve",
        time(Q.force(operators.StreamingQueries.t17_mv_rollup(spark, dir))))
    }

    if (groups("lineitem")) {
      val liDir = s"/tmp/graft-asym-li-${liFactor}x"
      scaledLineitem(spark, base, liDir, liFactor)
      val liRows = spark.read.parquet(s"$liDir/lineitem.parquet").count()
      def reportLi(name: String, sec: Double): Unit =
        println(f"""ASYM {"query":"$name","sec":$sec%.3f,"rows":$liRows%d,"nsPerRow":${sec * 1e9 / liRows}%.2f}""")
      spark.conf.set("spark.graft.columnarAgg.enabled", "true")
      reportLi("a1_swapped",
        time(Q.force(operators.RelationalQueries.a1_pricing_summary(spark, liDir))))
      spark.conf.set("spark.graft.columnarAgg.enabled", "false")
      reportLi("a1_stock",
        time(Q.force(operators.RelationalQueries.a1_pricing_summary(spark, liDir))))
      spark.conf.set("spark.graft.columnarAgg.enabled", "true")
      reportLi("li_count_star",
        time { spark.read.parquet(s"$liDir/lineitem.parquet").count(); () })
    }
    spark.stop()
  }
}
