package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: focused per-query timing (warm plan + codegen, min of 5) for
  * the bench-gate pairing work — same session shape as [[Bench]]. Usage:
  * `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.BenchFocus q1 q2 …"`. */
object BenchFocus {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-focus")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_SCALE=N: materialize an N× copy of the dir first (the
    // ScaleProbe fixture path) and bench against it
    val scaleDir = sys.env.get("SPARK_GRAFT_SCALE").map { n =>
      val out = s"/tmp/graft-scale-${n}x"
      ScaleProbe.scaled(spark, dir, out, n.toInt)
      out
    }
    // experimental variants measured against their production twins
    import org.apache.spark.sql.functions._
    import graft.Q.{dbl, dec6}
    val variants: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "j1_fused" -> { (s, d) =>
        // ONE broadcast: supplier enriched with region name dim-side
        val dims = Tables.supplier(s, d)
          .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("r_name"))
        Tables.lineitem(s, d)
          .filter(col("l_shipdate").between(
            to_timestamp(lit("1997-01-01")), to_timestamp(lit("1997-12-31"))))
          .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("r_name"))
          .agg(dbl(dec6(sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount")))))).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("r_name")
      },
      "j1_dblsum" -> { (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate").between(
            to_timestamp(lit("1997-01-01")), to_timestamp(lit("1997-12-31"))))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("r_name")
      },
      "j2_preagg" -> { (s, d) =>
        // pre-aggregate lineitem revenue per order (one shuffle on the
        // fact key), join, then a plain count per priority — replaces
        // countDistinct's expand + extra exchange
        val liAgg = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(dec6(sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))).as("rev"))
        Tables.orders(s, d)
          .filter(year(col("o_orderdate")) === 1996)
          .join(liAgg, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            dbl(dec6(sum(col("rev")))).as("revenue"))
          .orderBy("o_orderpriority")
      },
      "t1_trunc" -> { (s, d) =>
        Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("win_start"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            dbl(dec6(sum(dec6(col("value"))))).as("sum_value"))
          .orderBy("win_start", "event_type")
      },
      "t1_dbl" -> { (s, d) =>
        Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("win_start"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
          .orderBy("win_start", "event_type")
      },
      "events_count" -> { (s, d) =>
        Tables.events(s, d).groupBy().count()
      },
      "emb_count" -> { (s, d) =>
        Tables.embeddings(s, d).groupBy().count()
      },
      "scan_count" -> { (s, d) =>
        Tables.lineitem(s, d).filter(col("l_shipdate").between(
          to_timestamp(lit("1997-01-01")), to_timestamp(lit("1997-12-31"))))
          .groupBy().count()
      })
    val benchDir = scaleDir.getOrElse(dir)
    args.foreach { name =>
      val fn = variants.getOrElse(name, SparkEntry.queries(name))
      (1 to 2).foreach(_ => fn(spark, benchDir).count()) // warm
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, benchDir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""FOCUS {"query":"$name","sec":$t%.3f,"dir":"$benchDir"}""")
    }
    spark.stop()
  }
}
