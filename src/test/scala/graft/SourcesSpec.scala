package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** SURVEY §2.1 S8 — bulk load/unload (cqlsh COPY TO/FROM analogue): CSV
  * unload + schema'd reload round-trips exactly; parquet is the native path
  * (S5, exercised everywhere else). */
class SourcesSpec extends SparkSpec {

  test("CSV unload + load round-trips the customer table") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val out = s"$dir/customer_csv"
    val src = Tables.customer(spark, sf)
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read
      .option("header", "true")
      .schema(StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType))))
      .csv(out)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("JSON unload + load round-trips (S10 sink side)") {
    val dir = Files.createTempDirectory("graft-json").toString
    val out = s"$dir/nation_json"
    val src = Tables.nation(spark, sf)
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.exceptAll(src).count() === 0 && src.exceptAll(back).count() === 0)
  }
}
