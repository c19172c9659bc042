package graft
import org.apache.spark.sql.SparkSession

/** Dev probe (r16): the incremental-maintenance win of the a15 pricing MV
  * at the 100 M-row lineitem fixture — full build vs folding ONE appended
  * segment vs pure serve. Stage: 31 of the fixture's 32 production-sized
  * files are the standing table; the 32nd lands as the new segment.
  * All timings Q.force-forced (count() stays banned). */
object PricingMvProbe {
  def main(args: Array[String]): Unit = {
    val fixture = sys.env.getOrElse("SPARK_GRAFT_LI_FIXTURE",
      "/tmp/graft-asym-li-167x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("pricing-mv-probe").withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val src = s"$fixture/lineitem.parquet"
    require(new java.io.File(src).isDirectory,
      s"lineitem fixture missing at $src — run graft.AsymptoteProbe first")
    val base = Files.createTempDirectory("graft-a15-probe").toString
    val corpus = s"$base/corpus"
    Files.createDirectories(Paths.get(s"$corpus/lineitem.parquet"))
    val parts = scala.util.Using.resource(Files.list(Paths.get(src))) {
      _.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.toString)
    }
    require(parts.size >= 2, s"expected a multi-file fixture, got ${parts.size}")
    parts.dropRight(1).foreach { p =>
      Files.copy(p, Paths.get(s"$corpus/lineitem.parquet/${p.getFileName}")); ()
    }
    def timed(label: String): Double = {
      val t0 = System.nanoTime()
      Q.force(graft.operators.RelationalQueries.a15_mv_pricing(spark, corpus))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"MVPROBE $label: $dt%.2f s (path=" +
        graft.operators.RelationalQueries.a15LastBuild.get() + ")")
      dt
    }
    timed("full_build_31_files")
    timed("serve_unchanged")
    // the 32nd file lands as a new immutable segment
    val last = parts.last
    Files.copy(last, Paths.get(s"$corpus/lineitem.parquet/${last.getFileName}"))
    timed("incremental_one_segment")
    timed("serve_after_fold")
    // warm-JVM full rebuild over the SAME 32 files (fresh corpus dir so
    // the artifact cache can't serve) — the honest fold-vs-rebuild pair;
    // the first full_build above carries session warmup
    val corpus2 = s"$base/corpus2"
    Files.createDirectories(Paths.get(s"$corpus2/lineitem.parquet"))
    parts.foreach { p =>
      Files.copy(p, Paths.get(s"$corpus2/lineitem.parquet/${p.getFileName}")); ()
    }
    val t0 = System.nanoTime()
    Q.force(graft.operators.RelationalQueries.a15_mv_pricing(spark, corpus2))
    println(f"MVPROBE full_build_warm_32_files: ${(System.nanoTime() - t0) / 1e9}%.2f s (path=" +
      graft.operators.RelationalQueries.a15LastBuild.get() + ")")
  }
}
