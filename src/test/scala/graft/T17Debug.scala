package graft
import org.apache.spark.sql.SparkSession
object T17Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("t17dbg").withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft-asym-1000x"
    operators.StreamingQueries.t17_mv_rollup(spark, dir).collect() // build+warm
    def t(name: String)(f: => Unit): Unit = {
      val s0 = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }.min
      println(f"T17DBG $name: $s0%.3f s")
    }
    t("full_serve") { operators.StreamingQueries.t17_mv_rollup(spark, dir).collect() }
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(dir + "/events.parquet")
    val cut = java.time.LocalDateTime.parse("2024-01-30T23:00")
    val tail = raw.filter(col("ts") >= lit(cut))
    println("T17DBG tail rows: " + tail.count())
    t("tail_scan") { tail.groupBy(date_trunc("hour", col("ts").cast("timestamp")), col("event_type")).agg(count(lit(1))).collect() }
    t("job_floor") { spark.range(1).collect() }
    val q = operators.StreamingQueries.t17_mv_rollup(spark, dir)
    t("construct_only") { operators.StreamingQueries.t17_mv_rollup(spark, dir); () }
    t("reuse_collect") { q.collect() }
    val mvSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("win_start", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sum_value", org.apache.spark.sql.types.DoubleType)))
    t("fresh_tail_agg") {
      raw.filter(col("ts") >= lit(cut))
        .groupBy(date_trunc("hour", col("ts").cast("timestamp")).as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n")).collect(); () }
    t("fresh_raw_listing") { spark.read.parquet(dir + "/events.parquet"); () }
    t("fresh_count_tail") { spark.read.parquet(dir + "/events.parquet").filter(col("ts") >= lit(cut)).count(); () }
    operators.StreamingQueries.t17_mv_rollup(spark, dir).explain("formatted")
  }
}
