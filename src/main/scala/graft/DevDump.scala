package graft

import org.apache.spark.sql.SparkSession

/** Dev-only helper: print a named SparkEntry query's full result as
  * truncation-free rows — used while authoring VALUES oracle twins for
  * invariant-projection gate queries (the deterministic expected tables
  * are read off a real run, then frozen into oracleSql). */
object DevDump {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-devdump")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"===== $name =====")
      try {
        val df = SparkEntry.queries(name)(spark, sf)
        println(df.schema.treeString)
        df.collect().foreach(r => println("ROW|" + r.mkString("|")))
      } catch { case e: Exception =>
        println(s"ERROR ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
