package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r14): the CDC segment-emission cost of a bulk delta — the
  * exact operation r14 changed from `shaped.coalesce(1).write` (one task
  * serializes the whole changed-row set; the r13 judge's #2) to a plain
  * distributed `shaped.write`. Measures both shapes on the same
  * materialized delta-sized DataFrame, min-of-3 each. */
object CdcEmitProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("cdc-emit-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = java.nio.file.Files.createTempDirectory("graft-cdcemit")
      .toString
    // shape a cat4-sized delta: every lineitem row as a post-image in a
    // log-like layout (the fold's real CDC input is exactly this — the
    // materialized log-schema rows of the statement)
    spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("_marker", lit(true))
      .withColumn("_writetime", lit(1L))
      .withColumn("_ttl", lit(null).cast("long"))
      .withColumn("_deleted", lit(false))
      .write.parquet(s"$base/staged")
    val shaped = spark.read.parquet(s"$base/staged")
    val n = shaped.count()
    def time(label: String)(body: Int => Unit): Double = {
      val t = (1 to 3).map { i =>
        val t0 = System.nanoTime(); body(i); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"CDCEMIT $label: $t%.2f s (min of 3, $n rows)")
      t
    }
    time("coalesce1_r13")(i =>
      shaped.coalesce(1).write.mode("overwrite").parquet(s"$base/c1-$i"))
    time("multifile_r14")(i =>
      shaped.write.mode("overwrite").parquet(s"$base/mf-$i"))
    spark.stop()
  }
}
