package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (r17 optimization round): per-query JOB/STAGE breakdown —
  * `runMain graft.JobProbe <query>[,<query>…] [sfDir]` runs each query once
  * warm, then once measured with a listener attached, and prints every
  * Spark job's wall time, stage count, task count and shuffle bytes. The
  * point is attribution: a 2 s query made of 30 × 60 ms jobs is
  * scheduler/fixed-cost bound (fewer actions is the fix); one made of a
  * single 1.8 s job is stage-bound (the plan is the fix). Same session
  * shape as [[Bench]]. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, desc: String, var ms: Long = -1,
        var stages: Int = 0, var tasks: Int = 0, var shuffleBytes: Long = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, JobRec(js.jobId, desc))
        starts.put(js.jobId, js.time)
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { r =>
          r.ms = je.time - starts.getOrDefault(je.jobId, je.time)
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        // attribute the stage to the newest live job (good enough locally:
        // the bench runs queries sequentially)
        val m = info.taskMetrics
        val sb = m.shuffleReadMetrics.totalBytesRead +
          m.shuffleWriteMetrics.bytesWritten
        import scala.jdk.CollectionConverters._
        jobs.values().asScala.toSeq.sortBy(-_.id).headOption.foreach { r =>
          r.stages += 1
          r.tasks += info.numTasks
          r.shuffleBytes += sb
        }
      }
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      Q.force(fn(spark, sfDir)) // warm pass: codegen + caches
      jobs.clear(); starts.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      Q.force(fn(spark, sfDir))
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // the listener bus is async; give trailing events a moment
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val rs = jobs.values().asScala.toSeq.sortBy(_.id)
      println(f"== $name: $total%.3f s, ${rs.size} jobs")
      rs.foreach { r =>
        println(f"  job ${r.id}%4d ${r.ms}%6d ms stages=${r.stages}%2d " +
          f"tasks=${r.tasks}%4d shuffle=${r.shuffleBytes}%10d  ${r.desc.take(90)}")
      }
      println(f"  [sum-of-jobs ${rs.map(_.ms).filter(_ > 0).sum} ms; " +
        f"gap ${(total * 1000).toLong - rs.map(_.ms).filter(_ > 0).sum} ms " +
        "= driver/planning/sink time]")
    }
    spark.stop()
  }
}
