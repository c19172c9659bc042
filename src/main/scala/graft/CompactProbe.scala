package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the driver contract): measures what `COMPACT`
  * buys a long-running session. An upsert-heavy workload grows the
  * op-log linearly while its live row set stays flat; every read
  * reconciles the whole log, so read latency grows with the waves —
  * unless compaction periodically folds the log back to its surviving
  * subset. The two curves land in SCALE.md.
  *
  * Usage: `sbt "runMain graft.CompactProbe [waves] [keys]"`.
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val waves = args.lift(0).map(_.toInt).getOrElse(20)
    val keys = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("compact-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = graft.cql.CqlSession(spark)
    s.execute("CREATE TABLE cp (pk bigint PRIMARY KEY, v bigint, t text)")
    def readMs(): Double = {
      val t0 = System.nanoTime()
      s.execute("SELECT count(*) AS n, sum(v) AS sv FROM cp").collect()
      (System.nanoTime() - t0) / 1e6
    }
    for (mode <- Seq("uncompacted", "compact-every-5")) {
      s.execute("TRUNCATE cp")
      println(s"== $mode ==")
      for (wave <- 1 to waves) {
        for (k <- 1 to keys)
          s.execute(
            s"INSERT INTO cp (pk, v, t) VALUES ($k, ${wave * 1000 + k}, 'w$wave')")
        if (mode == "compact-every-5" && wave % 5 == 0) {
          val r = s.execute("COMPACT cp").head()
          println(f"   compact: ${r.getLong(2)}%6d -> ${r.getLong(3)}%5d rows")
        }
        if (wave % 5 == 0)
          println(f"wave $wave%3d  read ${readMs()}%8.1f ms")
      }
    }
    spark.stop()
  }
}
