package graft

import org.apache.spark.sql.functions._
import graft.operators.TextQueries

/** x31_bpe_apply: the applied-tokenizer accounting operator. The engine
  * semantics rest on one identity — left-to-right non-overlapping string
  * replace over the '/sym/'-wrapped form IS greedy BPE merge application
  * — so the spec pins (1) that identity on the raw engine `replace`, and
  * (2) the whole operator against an INDEPENDENT plain-Scala BPE
  * reference (explicit symbol vectors, no string encoding) on corpora
  * with merge runs, ties, non-alpha fallback tokens, and multi-round
  * merges-of-merges. */
class BpeApplySpec extends SparkSpec {

  // ——— independent reference implementation ———

  private def applyMerge(syms: Vector[String], m: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** token -> BPE unit count after k merges learned from the corpus
    * (freq-weighted pair counts, ties by "a/b" string ascending). */
  private def refBpe(tokensAll: Seq[String], k: Int): (Map[String, Int], Vector[(String, String)]) = {
    val freq = tokensAll.filter(_.matches("^[a-z]+$"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var words: Map[String, (Vector[String], Long)] =
      freq.map { case (t, f) => t -> (t.map(_.toString).toVector, f) }
    var merges = Vector.empty[(String, String)]
    var r = 0
    var done = false
    while (r < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.values.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val key = (syms(i), syms(i + 1))
          counts(key) = counts.getOrElse(key, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a + "/" + b) }._1
        merges :+= best
        words = words.map { case (t, (syms, f)) =>
          t -> (applyMerge(syms, best), f)
        }
      }
      r += 1
    }
    (words.map { case (t, (syms, _)) => t -> syms.size }, merges)
  }

  private def expected(docs: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Long)] = {
    val toks = docs.flatMap { case (_, text, src) =>
      text.toLowerCase.split(" ", -1).toSeq.map(src -> _)
    }
    val (units, _) = refBpe(toks.map(_._2), 8)
    toks.groupBy(_._1).map { case (src, ts) =>
      val ws = ts.size.toLong
      val alpha = ts.count(_._2.matches("^[a-z]+$")).toLong
      val bpe = ts.map { case (_, t) => units.getOrElse(t, 1).toLong }.sum
      src -> (ws, alpha, bpe)
    }
  }

  private def runX31(docs: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    val dir = Tables.tempRoot("graft-bpe-spec")
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextQueries.x31_bpe_apply(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("replace over '/sym/'-wrapped form merges runs like greedy BPE") {
    // the shared-boundary cases the double-separator encoding exists for
    val rows = spark.sql(
      """SELECT replace('/a//a//a//a/', '/a//a/', '/aa/') AS four,
        |       replace('/a//a//a/',    '/a//a/', '/aa/') AS three,
        |       replace('/e//ll/',      '/e//l/', '/el/') AS nofalse
        |""".stripMargin).head()
    assert(rows.getString(0) === "/aa//aa/") // both pairs merge
    assert(rows.getString(1) === "/aa//a/")  // leftmost-first, no overlap
    assert(rows.getString(2) === "/e//ll/")  // 'l' != 'll': no false match
  }

  test("run-heavy corpus collapses to whole-word symbols (merge-of-merge)") {
    // vocab {aaaa:2, aa:1}: r1 merges (a,a) [weight 7], r2 merges (aa,aa),
    // r3 finds no pairs and stops early — every alpha token ends 1 unit
    val out = runX31(Seq(
      (1L, "aaaa aaaa aa 42 x7!", "s")))
    assert(out("s") === ((5L, 3L, 5L)))
  }

  test("operator matches the independent reference on a mixed corpus") {
    val docs = Seq(
      (1L, "the merge scanner merges the merged merge runs", "news"),
      (2L, "lower the tower near the mower 42 times", "news"),
      (3L, "aaa aaaa aa a baaa", "runs"),
      (4L, "THE Merge LOWER c3po r2d2 !!", "runs"),
      (5L, "", "runs"), // empty text -> one '' token, non-alpha, 1 unit
      (6L, "merge merge merge scanner scanner the the the the", "web"))
    val exp = expected(docs)
    val got = runX31(docs)
    assert(got === exp, s"\nexpected $exp\ngot      $got")
    // the corpus must actually exercise multi-round merges: at least one
    // alpha token must have compressed below its character count
    val (units, merges) = refBpe(docs.flatMap(_._2.toLowerCase.split(" ", -1)), 8)
    assert(merges.size === 8)
    assert(units.exists { case (t, u) => u < t.length })
  }

  test("deterministic across runs (fresh training each construction)") {
    val docs = Seq(
      (1L, "alpha beta alpha gamma", "a"),
      (2L, "beta beta gamma delta epsilon", "b"))
    assert(runX31(docs) === runX31(docs))
  }
}
