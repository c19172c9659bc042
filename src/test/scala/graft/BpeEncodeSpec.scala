package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.expressions.BpeUnitCount
import graft.operators.{BpeModel, TextQueries}

/** The executor-side BPE encoder (r16): [[BpeUnitCount]]'s rank-scan loop
  * must be BIT-EQUAL to the gated K-nested-replace plan, and the
  * driver-local trainer must be BIT-EQUAL to the distributed one — the
  * layered argument that lets x33 run at production K:
  *   x31 twin gates the distributed trainer + replace-apply (K=8)
  *   → learnMergesLocal ≡ learnMerges          (pinned here, K=8/12)
  *   → BpeUnitCount ≡ replace-apply            (pinned here, learned +
  *     fuzzed tables, eval AND codegen paths)
  *   → x33's DuckDB twin re-applies the K=256 table independently. */
class BpeEncodeSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Independent reference: apply merges SEQUENTIALLY in rank order, each
    * as a left-to-right non-overlapping pass — exactly the foldLeft
    * `replace` semantics of bpeAccounting/BpeModel.unitCount. */
  private def refUnits(tok: String, merges: Seq[(String, String)]): Long = {
    if (tok.isEmpty || !tok.forall(c => c >= 'a' && c <= 'z')) 1L
    else {
      var syms = tok.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length.toLong
    }
  }

  test("driver-local trainer ≡ distributed trainer (K=8 and K=12)") {
    val vocab = BpeModel.collectVocab(spark, d)
    assert(vocab.nonEmpty)
    assert(BpeModel.learnMergesLocal(vocab, 8) ===
      BpeModel.learnMerges(spark, d, 8))
    assert(BpeModel.learnMergesLocal(vocab, 12) ===
      BpeModel.learnMerges(spark, d, 12))
    // greedy-prefix property carries to production K: the 256-run's head
    // is the 8-run (frozen x31/x32 consumers stay consistent with x33)
    val k256 = BpeModel.learnMergesLocal(vocab, 256)
    assert(k256.take(8) === BpeModel.learnMergesLocal(vocab, 8))
  }

  test("encoder ≡ K-nested-replace plan on the corpus (K=8 and K=12), " +
    "codegen path") {
    import spark.implicits._
    val toks = Tables.documents(spark, d)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
    for (k <- Seq(8, 12)) {
      val merges = BpeModel.learnMerges(spark, d, k)
      // the gated replace form, built directly from the K-run table
      // (BpeModel.unitCount serves v-pinned artifacts only)
      val w0 = regexp_replace(col("tok"), "(.)", "/$1/")
      val wK = merges.foldLeft(w0) { case (w, (a, b)) =>
        replace(w, lit(s"/$a//$b/"), lit(s"/$a$b/"))
      }
      val replaceUnits = when(col("tok").rlike("\\A[a-z]+\\z"),
        ((length(wK) - length(replace(wK, lit("/"), lit("")))) / lit(2)))
        .otherwise(lit(1)).cast("long")
      val units = org.apache.spark.sql.GraftShim.column(
        BpeUnitCount(org.apache.spark.sql.GraftShim.expression(col("tok")),
          merges))
      val diff = toks.select(col("tok"), replaceUnits.as("a"), units.as("b"))
        .filter(col("a") =!= col("b"))
      assert(diff.count() === 0L,
        s"K=$k mismatch rows: ${diff.limit(5).collect().mkString(", ")}")
      // and the scala reference agrees on every distinct token
      val rows = toks.distinct().limit(100000).as[String].collect()
      rows.foreach { t =>
        val got = BpeUnitCount.compute(UTF8String.fromString(t),
          new graft.functions.expressions.BpeRanks(merges))
        assert(got === refUnits(t, merges), s"token '$t' K=$k")
      }
    }
  }

  test("interpreted eval ≡ codegen kernel on edge tokens") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("a", "a"), ("aa", "aa"))
    val expr = BpeUnitCount(Literal(UTF8String.fromString("x"),
      org.apache.spark.sql.types.StringType), merges)
    val cases = Seq(
      "" -> 1L, // empty: non-alpha fallback
      "abc" -> 1L, // merge-of-merge: (a,b) then (ab,c)
      "aaaa" -> 1L, // run: (a,a) L-to-R twice, then (aa,aa)
      "aaa" -> 2L, // odd run: '/aa//a/' — no overlap
      "abcabc" -> 2L,
      "zqj" -> 3L, // no table hits: stays char-level
      "ab1" -> 1L, // digit → non-alpha
      "ab\n" -> 1L, // trailing newline must NOT classify alpha (r15 note)
      "Ab" -> 1L, // uppercase → non-alpha
      "héllo" -> 1L) // multibyte → non-alpha
    cases.foreach { case (t, exp) =>
      val viaEval = BpeUnitCount(Literal(UTF8String.fromString(t),
        org.apache.spark.sql.types.StringType), merges).eval(null)
      assert(viaEval === exp, s"eval('$t')")
      assert(refUnits(t, merges) === exp, s"ref('$t')")
    }
    assert(expr.checkInputDataTypes().isSuccess)
  }

  test("fuzz: learned tables from random corpora, random K — encoder ≡ " +
    "sequential replace reference on every token") {
    val seed = sys.env.getOrElse("GRAFT_FUZZ_SEED", "1600").toLong
    val rnd = new scala.util.Random(seed)
    val alpha = "abcde" // small alphabet → dense merge interactions
    def word(): String =
      (0 until (1 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (round <- 1 to 25) {
      val vocabWords = (1 to 40).map(_ => word()).distinct
      val vocab = vocabWords.map(w => (w, (1 + rnd.nextInt(9)).toLong)).toArray
      val k = 1 + rnd.nextInt(40)
      val merges = BpeModel.learnMergesLocal(vocab, k)
      if (merges.nonEmpty) {
        val ranks = new graft.functions.expressions.BpeRanks(merges)
        val probes = vocabWords ++ (1 to 60).map(_ => word()) ++
          Seq("", "x1", "aa\n", "ZZ")
        probes.foreach { t =>
          val got = BpeUnitCount.compute(UTF8String.fromString(t), ranks)
          assert(got === refUnits(t, merges),
            s"round $round seed $seed K=$k token '$t' merges $merges")
        }
      }
    }
  }

  test("x33 operator matches an end-to-end reference on a synthetic corpus") {
    val docs = Seq(
      (1L, "the merge scanner merges the merged merge runs again", "news"),
      (2L, "aaa aaaa aa a baaa cabcab 42 X!", "runs"),
      (3L, "merge merge scanner the the the lower tower mower", "web"))
    val dir = Tables.tempRoot("graft-x33-spec")
    import spark.implicits._
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.x33_bpe_encoder(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // reference: local trainer at K=256 + sequential-replace apply
    val merges = BpeModel.learnMergesLocal(
      BpeModel.collectVocab(spark, dir), 256)
    val exp = docs.flatMap { case (_, text, src) =>
      text.toLowerCase.split(" ", -1).toSeq.map(src -> _)
    }.groupBy(_._1).map { case (src, ts) =>
      val ws = ts.size.toLong
      val al = ts.count(t => t._2.nonEmpty &&
        t._2.forall(c => c >= 'a' && c <= 'z')).toLong
      val bpe = ts.map(t => refUnits(t._2, merges)).sum
      src -> (ws, al, bpe)
    }
    assert(got === exp)
    // tiny corpora exhaust pairs before 256 — the early stop is the
    // documented behavior, and some multi-round merging must have happened
    assert(merges.size > 4)
  }
}
