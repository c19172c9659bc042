package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: `runMain graft.Explain <query>[,<query>…] [sfDir]` — prints each
  * query's formatted physical plan and two warm timings (the bench's steady
  * state), for plan-shape audits without a full bench run. */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the generated-code cache defaults to 100 entries; the suite
      // holds 136 queries x several codegen units each, so the default
      // evicts-and-recompiles janino units inside the measured passes
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      Q.force(fn(spark, sfDir)) // warm codegen (full plan, not count-pruned)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Q.force(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(s"== $name: ${times.map(t => f"$t%.3f").mkString(" ")} s")
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
