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

  test("NgramBucketFold ≡ exact decimal sum over the exploded gram stream") {
    import graft.functions.TextFunctions.ngramBucketFold
    val W = 64
    // an arbitrary 6-dp weight per bucket (values ≤ 1, x19's ratio bound)
    val ratios6 = Array.tabulate(W)(b => (b * 15625L + 7L) % 1000001L)
    val ratioLit = lit(ratios6.map(_ / 1e6))
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .filter(size(tokens(col("text"))) >= 2)
    val diff = docs.select(
      ngramBucketFold(tokens(col("text")), 2, ratios6).as("k"),
      aggregate(ngramHash64(tokens(col("text")), 2),
        lit(BigDecimal(0)).cast("decimal(38,6)"),
        (acc, gh) => (acc + element_at(ratioLit,
          (pmod(gh, lit(W)) + 1L).cast("int")).cast("decimal(38,6)"))
          .cast("decimal(38,6)")).as("b"))
      .filter(col("k") =!= col("b")).count()
    assert(diff === 0L, "fold diverges from the exploded decimal sum")
    // edge shapes: < n tokens -> sum 0; null elements follow concat_ws
    val edge = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b') AS toks " +
        "UNION ALL SELECT array('a') UNION ALL SELECT array()")
    val rows = edge.select(
      ngramBucketFold(col("toks"), 2, ratios6).as("k"),
      aggregate(ngramHash64(col("toks"), 2),
        lit(BigDecimal(0)).cast("decimal(38,6)"),
        (acc, gh) => (acc + element_at(ratioLit,
          (pmod(gh, lit(W)) + 1L).cast("int")).cast("decimal(38,6)"))
          .cast("decimal(38,6)")).as("b")).collect()
    rows.foreach(r => assert(r.getDecimal(0) === r.getDecimal(1)))
  }

  test("the fold projection stays inside whole-stage codegen") {
    import graft.functions.TextFunctions.ngramBucketFold
    val plan = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(ngramBucketFold(tokens(col("text")), 2,
        Array.fill(64)(500000L)).as("w"))
      .queryExecution.executedPlan.toString
    assert(plan.trim.startsWith("*("), plan.take(300))
  }

  test("the kernel projection stays inside whole-stage codegen") {
    val plan = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(ngramHash64(tokens(col("text")), 5).as("g"))
      .queryExecution.executedPlan.toString
    assert(plan.trim.startsWith("*("), plan.take(300))
  }

  test("r15-advice: two identical folds are equal and semanticEquals " +
    "(profile held by value, not Array reference — subexpression " +
    "elimination and exchange reuse depend on it)") {
    import graft.functions.expressions.NgramBucketFold
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // a resolved child with value equality — the pin targets the PROFILE
    // argument (the r15 advice: Array[Long] compared by reference broke
    // equals/semanticEquals between otherwise-identical folds)
    def mk() = NgramBucketFold(
      Literal.create(Seq("a", "b", "c"), ArrayType(StringType)), 2,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(
        Array.tabulate(64)(_ * 1000L)))
    val (a, b) = (mk(), mk())
    assert(a === b)
    assert(a.semanticEquals(b))
    val c = b.copy(ratios6 = b.ratios6.updated(0, 7L))
    assert(a !== c)
  }
}
