package graft

import graft.functions.TextFunctions.{md5Hash60, ngramHash64, shingles, tokens}
import org.apache.spark.sql.functions._

/** The codegen'd NgramHash64 kernel must be BIT-IDENTICAL to the builtin
  * chain `transform(shingles(toks, n), md5Hash60)` it replaced in x26/x27
  * — that equality is what keeps the DuckDB oracle twins
  * (`md5(tk[i] || ' ' || …)`) valid. */
class NgramHashSpec extends SparkSpec {

  test("kernel ≡ builtin chain on every document at sf0.01, n = 2, 5, 8") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    Seq(2, 5, 8).foreach { n =>
      val t = tokens(col("text"))
      val diff = docs.select(
        ngramHash64(t, n).as("k"),
        transform(shingles(t, n), g => md5Hash60(g)).as("b"))
        .filter(col("k") =!= col("b")).count()
      assert(diff === 0L, s"n=$n: kernel diverges from the builtin chain")
    }
  }

  test("edge shapes: short docs, empty token, null elements follow " +
    "concat_ws semantics") {
    import spark.implicits._
    val rows = Seq(
      Seq("a", "b", "c"),          // normal
      Seq("a", "b"),               // fewer than n -> empty
      Seq(""),                     // single empty token
      Seq("a", "", "b"),           // interior empty string token
      Seq.empty[String]            // empty array
    ).toDF("toks")
    val out = rows.select(
      ngramHash64(col("toks"), 3).as("k"),
      transform(shingles(col("toks"), 3), g => md5Hash60(g)).as("b"))
      .collect()
    out.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // null ELEMENTS: concat_ws skips them without doubling the separator —
    // the kernel must agree (tokens() never yields null, but the kernel's
    // contract is the builtin's)
    val withNull = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b', 'c') AS toks")
    val r = withNull.select(
      ngramHash64(col("toks"), 3).as("k"),
      transform(shingles(col("toks"), 3), g => md5Hash60(g)).as("b"))
      .head()
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
  }

  test("the kernel projection stays inside whole-stage codegen") {
    val plan = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(ngramHash64(tokens(col("text")), 5).as("g"))
      .queryExecution.executedPlan.toString
    assert(plan.trim.startsWith("*("), plan.take(300))
  }
}
