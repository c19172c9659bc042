package graft
import org.apache.spark.sql.SparkSession
/** Dev probe (r13): the incremental-resume cost of the t17 rollup MV at
  * the 100 M-row asymptote fixture — full build vs checkpointed resume
  * over one appended hour of data. */
object MvResumeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("mv-resume-probe").withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import java.nio.file.{Files, Paths}
    val dir = "/tmp/graft-asym-1000x"
    val base = Files.createTempDirectory("graft-mv-asym").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    // stage the full fixture as generation 1
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.list(Paths.get(s"$dir/events.parquet"))) {
      _.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).zipWithIndex
        .foreach { case (p, i) =>
          Files.copy(p, Paths.get(f"$src/g1-$i%04d.parquet")); () }
    }
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.streaming.StreamingPipelines.runToParquet(
        graft.streaming.StreamingPipelines.hourlyRollup(
          graft.streaming.StreamingPipelines.eventsStream(spark, src)),
        s"$base/mv", s"$base/ckpt")
      (System.nanoTime() - t0) / 1e9
    }
    println(f"MVPROBE full_build: ${run()}%.2f s")
    // generation 2: ONE appended hour past the fixture's max ts
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions._
    val maxTs = raw.agg(max(col("ts"))).head().get(0)
    raw.orderBy(col("ts").desc).limit(100000)
      .withColumn("ts", expr("ts + INTERVAL 2 HOURS"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/g2")
    scala.util.Using.resource(Files.list(Paths.get(s"$base/g2"))) {
      _.iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .foreach { p => Files.copy(p, Paths.get(s"$src/g2-0.parquet")); () }
    }
    println(f"MVPROBE resume_one_hour: ${run()}%.2f s")
    println("MVPROBE mv_rows: " +
      spark.read.parquet(s"$base/mv").count())
  }
}
