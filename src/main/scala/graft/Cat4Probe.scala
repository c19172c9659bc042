package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r17): per-phase wall-time breakdown of cat4_bulk_merge —
  * the suite's most expensive query. Prints each statement's time over
  * several warm repetitions so driver-side planning cost is visible
  * separately from executor job time (guide §7.3: "the driver should do
  * almost no data work" — this measures whether it does). */
object Cat4Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  [cat4-probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to reps).foreach { i =>
      println(s"== rep $i")
      val s = spark
      val sess = t("CqlSession+CREATE") {
        val ss = graft.cql.CqlSession(s)
        ss.execute("CREATE TABLE cat_lineitem4 (lk bigint PRIMARY KEY, " +
          "qty double, flag text)")
        ss
      }
      t("exposeAsCatalog")(sess.exposeAsCatalog("graftcat4"))
      s.conf.set("spark.graft.catalog.deltaApplyRowLimit", "0")
      t("src dedupe view") {
        s.read.parquet(s"$d/lineitem.parquet")
          .selectExpr("CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS lk",
            "l_quantity AS qty", "l_returnflag AS flag")
          .groupBy("lk")
          .agg(min("qty").as("qty"), min("flag").as("flag"))
          .createOrReplaceTempView("cat4_src")
      }
      t("INSERT")(s.sql("INSERT INTO graftcat4.default.cat_lineitem4 " +
        "SELECT lk, qty, flag FROM cat4_src"))
      val mergeSql = """MERGE INTO graftcat4.default.cat_lineitem4 t
             USING (
               SELECT lk, qty + 1.0 AS p, flag FROM cat4_src
               UNION ALL
               SELECT lk + 10000000000 AS lk, qty * 2 AS p, flag
               FROM cat4_src
               UNION ALL
               SELECT lk + 20000000000 AS lk, qty * 3 AS p, flag
               FROM cat4_src
             ) s
             ON t.lk = s.lk
             WHEN MATCHED AND s.flag = 'R' THEN DELETE
             WHEN MATCHED THEN UPDATE SET qty = s.p
             WHEN NOT MATCHED THEN INSERT (lk, qty, flag)
               VALUES (s.lk, s.p, s.flag)"""
      t("MERGE")(s.sql(mergeSql))
      val fin = t("final SELECT plan")(
        s.sql("""SELECT flag AS l_returnflag, count(*) AS n,
             CAST(sum(CAST(qty AS DECIMAL(38,6))) AS DOUBLE) AS total,
             min(lk) AS first_key
             FROM graftcat4.default.cat_lineitem4
             GROUP BY flag ORDER BY flag"""))
      t("final SELECT force")(Q.force(fin))
      s.conf.unset("spark.graft.catalog.deltaApplyRowLimit")
    }
    spark.stop()
  }
}
