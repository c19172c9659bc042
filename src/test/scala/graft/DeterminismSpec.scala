package graft

/** Every declared query must produce byte-identical output regardless of
  * shuffle parallelism — the property that makes the DuckDB oracle gate
  * meaningful on ANY cluster size (decimal sums, total output orders, and
  * sorted bucket expansions exist exactly for this). Sweeps the whole
  * SparkEntry registry so new queries are covered automatically. */
class DeterminismSpec extends SparkSpec {

  test("every declared query is invariant to spark.sql.shuffle.partitions") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        val a = fn(spark, sf).collect().map(_.toString).toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val b = fn(spark, sf).collect().map(_.toString).toSeq
        assert(a === b, s"$name output changed with shuffle parallelism")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
