package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r17): attributes the CQL admin family's driver-side "gap" —
  * times an alternating INSERT/SELECT script (each SELECT forces an
  * engine rebuild because the INSERT bumped the mutation epoch) against
  * a SELECT-only script on a frozen epoch, isolating rebuild + planning
  * cost from job cost. */
object CqlGapProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeIt[A](label: String, n: Int)(f: => A): Unit = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  [cql-gap] $label%-42s ${dt}%.3f s total, ${dt / n * 1000}%.1f ms/op")
    }
    (1 to 2).foreach { rep =>
      println(s"== rep $rep")
      val s = graft.cql.CqlSession(spark)
      s.execute("CREATE TABLE gp (k bigint PRIMARY KEY, v text, n bigint)")
      (1 to 3).foreach(i => s.execute(
        s"CREATE TABLE gp$i (k bigint PRIMARY KEY, v text)"))
      timeIt("INSERT (write path, epoch bump)", 40) {
        s.execute(s"INSERT INTO gp (k, v, n) VALUES (${util.Random.nextInt(1000)}, 'x', 1)")
      }
      timeIt("SELECT after write (engine rebuild)", 40) {
        s.execute("INSERT INTO gp (k, v, n) VALUES (1, 'y', 2)")
        s.execute("SELECT k, v FROM gp WHERE k = 1").collect()
      }
      timeIt("SELECT frozen epoch (no rebuild)", 40) {
        s.execute("SELECT k, v FROM gp WHERE k = 1").collect()
      }
    }
    spark.stop()
  }
}
