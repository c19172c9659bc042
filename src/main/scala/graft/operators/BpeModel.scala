package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** The persisted TOKENIZER behind x32 — "tokenizer as data", the artifact
  * lifecycle the index families and [[QualityModel]] already carry,
  * applied to the BPE merge table (a real pipeline trains a tokenizer
  * once and ships its vocab; it never re-learns merges per query).
  *
  * A model generation is the ordered top-K merge list learned from the
  * corpus by x31's count→argmax→replace loop (K = 8 for v1; a higher
  * version retrains with a LARGER K — the realistic upgrade: a longer
  * training run over the same corpus). The artifact is a parquet
  * `(merge_idx, left, right)` table plus a `_graft_model` sidecar
  * carrying the identity (family, k, version, corpus fingerprint), and
  * serving is FROZEN: a consumer pinned to v1 reads the SAME merges
  * after a v2 build — swapping generations is an explicit repin, gated
  * by [[driftDial]]'s measurement.
  *
  * Scale shape: training cost is x31's (one corpus shuffle to the
  * vocabulary; K bounded argmax rounds over the persisted |V| rows);
  * the artifact is K rows at ANY corpus size; serving is a bounded
  * driver-side merge read + a map-only K-replace apply pass. */
object BpeModel {
  /** v1's merge count — x31's K, so v1 serving is bit-identical to the
    * inline trainer (and shares its DuckDB twin). */
  val ServingVersion = 1
  def mergesFor(version: Int): Int = 8 + (version - 1) * 4

  val SidecarName = "_graft_model"

  private lazy val artifactRoot = graft.Tables.tempRoot("graft-bpe-model")
  private val mergesCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  /** x31's training loop, factored for reuse: the ordered top-K merges
    * of corpus `d` (pair counts freq-weighted over the alphabetic
    * vocabulary, ties by pair string ASC, greedy '/sym/'-wrapped
    * replace between rounds). */
  private[graft] def learnMerges(s: SparkSession, d: String,
      k: Int): Seq[(String, String)] = {
    val vocab = graft.Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("tok"))
      // \A..\z anchors (r15 advisor): Java's $ also matches before a
      // trailing line terminator, while the DuckDB twin's RE2 '$' and the
      // spec reference's .matches are end-of-text only — a token carrying
      // a trailing \n must classify non-alpha in BOTH engines
      .filter(col("tok").rlike("\\A[a-z]+\\z"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .withColumn("w", regexp_replace(col("tok"), "(.)", "/$1/"))
      .persist()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      var cur: DataFrame = vocab
      var r = 0
      var done = false
      while (r < k && !done) {
        val top = cur
          .select(col("f"),
            expr("filter(split(w, '/'), x -> x != '')").as("sy"))
          .filter(size(col("sy")) >= 2)
          .select(col("f"), explode(expr(
            "transform(sequence(1, size(sy) - 1)," +
              " i -> concat(element_at(sy, i), '/', element_at(sy, i + 1)))"))
            .as("pr"))
          .groupBy(col("pr")).agg(sum(col("f")).as("n"))
          .orderBy(col("n").desc, col("pr").asc)
          .limit(1).collect() // bounded: exactly the ONE winning pair
        if (top.isEmpty) done = true
        else {
          val pr = top(0).getString(0)
          val cut = pr.indexOf('/')
          val (a, b) = (pr.substring(0, cut), pr.substring(cut + 1))
          out += ((a, b))
          cur = cur.withColumn("w",
            replace(col("w"), lit(s"/$a//$b/"), lit(s"/$a$b/")))
        }
        r += 1
      }
    } finally { vocab.unpersist(false); () }
    out.toSeq
  }

  /** The corpus's (alpha-token, freq) VOCABULARY, collected to the driver
    * — ONE shuffle over the corpus, then a bounded read: training a
    * tokenizer on the aggregated word-count table (vocab ≪ corpus) is the
    * production shape every BPE trainer runs [P: Sennrich et al. 2016;
    * HuggingFace tokenizers / SentencePiece both train single-process
    * over word counts].
    *
    * `minFreq` is the FREQUENCY FLOOR (r16 verdict: the web-scale path) —
    * `HAVING count >= minFreq` applied INSIDE the agg plan, before the
    * collect: a web-scale corpus has ~10⁸ distinct alpha tokens, but the
    * mass is in the head — real trainers (SentencePiece, HF tokenizers)
    * prune hapax/low-freq types before pair counting, and a singleton
    * type contributes at most its own frequency to every pair count, so
    * the floor's effect on the argmax is bounded by minFreq × pairs-per-
    * word. minFreq=1 keeps every type (bit-compatible with the unpruned
    * trainer; the default). The floor executes map-side-combined in the
    * same shuffle — no extra pass.
    *
    * Guarded: refuses above `maxVocab` SURVIVING rows rather than
    * silently OOMing the driver — the refusal names the floor as the
    * remedy, because at 100 TB the right call is raising minFreq (the
    * production shape), not collecting 10⁸ rows. */
  def collectVocab(s: SparkSession, d: String,
      maxVocab: Int = 1 << 22, minFreq: Long = 1L): Array[(String, Long)] = {
    val rows = graft.Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("tok"))
      .filter(col("tok").rlike("\\A[a-z]+\\z"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .filter(col("f") >= minFreq)
      .limit(maxVocab + 1)
      .collect()
    require(rows.length <= maxVocab,
      s"corpus vocabulary exceeds maxVocab=$maxVocab rows at frequency " +
        s"floor $minFreq — raise minFreq (the production prune real " +
        "trainers run) or train with the distributed loop instead")
    rows.map(r => (r.getString(0), r.getLong(1)))
  }

  /** Driver-local replica of [[learnMerges]]'s K-round loop over a
    * collected vocabulary — the SAME algorithm term for term (adjacent
    * pair counts weighted by word freq, every position counted; winner =
    * max count with ties broken by the "left/right" pair string ASC —
    * String compareTo ≡ UTF8 binary order on the [a-z/] alphabet; merge
    * applied left-to-right non-overlapping), so the two trainers are
    * bit-equal (BpeEncodeSpec pins equality at K=8 and K=12). K rounds
    * over |V| in-memory words, zero Spark jobs — this is how a
    * production-K (32k+) table gets trained without K scheduler
    * round-trips. Stops early when no adjacent pairs remain. */
  def learnMergesLocal(vocab: Array[(String, Long)],
      k: Int): Seq[(String, String)] = {
    val words = vocab.map { case (t, f) =>
      (scala.collection.mutable.ArrayBuffer.from(t.map(_.toString)), f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var done = false
    while (r < k && !done) {
      val counts = new java.util.HashMap[String, Array[Long]]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val key = syms(i) + "/" + syms(i + 1)
          val slot = counts.computeIfAbsent(key, _ => new Array[Long](1))
          slot(0) += f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var bestPair: String = null
        var bestN = Long.MinValue
        counts.forEach { (pr, n) =>
          if (n(0) > bestN || (n(0) == bestN && pr.compareTo(bestPair) < 0)) {
            bestPair = pr; bestN = n(0)
          }
        }
        val cut = bestPair.indexOf('/')
        val a = bestPair.substring(0, cut)
        val b = bestPair.substring(cut + 1)
        out += ((a, b))
        words.foreach { case (syms, _) =>
          var i = 0
          var w = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              syms(w) = a + b; i += 2
            } else { syms(w) = syms(i); i += 1 }
            w += 1
          }
          syms.takeInPlace(w)
        }
      }
      r += 1
    }
    out.toSeq
  }

  private def corpusKey(d: String): String = {
    val mtime = try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$d/documents.parquet")).toMillis
      catch { case _: Exception => 0L }
    s"$d@$mtime"
  }

  /** Strong 64-bit corpus fingerprint (first 8 bytes of SHA-256 over the
    * full corpus key) — persisted in the sidecar and compared by
    * [[requireSameModel]], so two artifacts trained on DIFFERENT corpora
    * at the same version refuse to combine (r15 advisor note: the old
    * sidecar carried no corpus identity at all). */
  private[graft] def corpusFingerprint(key: String): Long = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(h, 0, 8).getLong
  }

  /** Filesystem-safe full corpus key (every byte outside [A-Za-z0-9._-]
    * maps to '_') — the artifact DIRECTORY key. The old name used a
    * 32-bit String.hashCode, where a collision would silently serve
    * another corpus's merge table; the sanitized full key cannot collide
    * across distinct (dir, mtime) pairs of sane paths, and the sidecar
    * fingerprint still guards the pathological ones. */
  private def sanitizedKey(key: String): String =
    key.map(c => if (c.isLetterOrDigit || c == '.' || c == '-') c else '_')

  /** Build the version-`v` tokenizer artifact for corpus `d` if absent:
    * parquet `(merge_idx, left, right)` + sidecar. Generations live side
    * by side (frozen serving). Returns the artifact directory. */
  def ensureArtifact(s: SparkSession, d: String,
      version: Int = ServingVersion): String = synchronized {
    require(version >= 1, s"tokenizer version must be >= 1, got $version")
    val key = corpusKey(d)
    val dir = s"$artifactRoot/bpe-${sanitizedKey(key)}-v$version"
    val done = new java.io.File(dir, SidecarName)
    if (!done.isFile) {
      val k = mergesFor(version)
      // r17: the driver-local trainer over the collected vocabulary —
      // bit-equal to the distributed loop (BpeEncodeSpec pins local ≡
      // distributed at K=8/12 + fuzz), one corpus shuffle instead of K
      // scheduler round-trips; learnMerges itself stays spec-covered
      val merges = learnMergesLocal(collectVocab(s, d), k)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((a, b), i) => (i, a, b) }
        .toDF("merge_idx", "left", "right")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val meta =
        s"""{"family":"bpe-merges","k":$k,"n_merges":${merges.size},""" +
          s""""version":$version,"corpus_fp":${corpusFingerprint(key)}}"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, SidecarName),
        meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
    dir
  }

  def readSidecar(dir: String): Map[String, Long] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, SidecarName)),
      java.nio.charset.StandardCharsets.UTF_8)
    "\"(\\w+)\":(-?\\d+)".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  /** The ordered merge table served FROM the artifact — a bounded
    * driver-side model read (≤K rows at any corpus size). REFUSES when
    * the sidecar declares a different version than the caller pinned
    * (the ANN mixed-metric / QualityModel rule). */
  def merges(s: SparkSession, d: String,
      version: Int = ServingVersion): Seq[(String, String)] = {
    val dir = ensureArtifact(s, d, version)
    val declared = readSidecar(dir).getOrElse("version", -1L)
    require(declared == version.toLong,
      s"tokenizer artifact at $dir declares version $declared but the " +
        s"caller pinned v$version — refusing to serve; rebuild the " +
        "artifact or repin the consumer")
    mergesCache.computeIfAbsent(dir, { _ =>
      s.read.parquet(dir).orderBy("merge_idx")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    })
  }

  /** Map-side BPE unit count of `tok` under the artifact's merge table:
    * K nested literal replaces over the '/sym/'-wrapped form, unit count
    * from separator arithmetic; non-alphabetic tokens count 1 unit. */
  def unitCount(s: SparkSession, d: String, tok: Column,
      version: Int = ServingVersion): Column = {
    val w0 = regexp_replace(tok, "(.)", "/$1/")
    val wK = merges(s, d, version).foldLeft(w0) { case (w, (a, b)) =>
      replace(w, lit(s"/$a//$b/"), lit(s"/$a$b/"))
    }
    when(tok.rlike("\\A[a-z]+\\z"),
      ((length(wK) - length(replace(wK, lit("/"), lit("")))) / lit(2)))
      .otherwise(lit(1)).cast("long")
  }

  /** The RETRAIN dial: re-tokenize a bounded probe batch under the
    * serving and a candidate generation and measure the token-budget
    * shift — `|bpe_new − bpe_old| / bpe_old` over the probe. Above
    * budgetShift the downstream token accounting must be recomputed
    * before the new generation serves ('re-tokenize'); under it the
    * swap is cosmetic ('keep'). One row out. */
  def driftDial(s: SparkSession, d: String, vOld: Int, vNew: Int,
      n: Int = 200, budgetShift: Double = 0.02): DataFrame = {
    graft.Tables.documents(s, d)
      .orderBy(col("doc_id").asc).limit(n)
      .select(explode(tokens(col("text"))).as("tok"))
      .select(unitCount(s, d, col("tok"), vOld).as("uo"),
        unitCount(s, d, col("tok"), vNew).as("un"))
      .agg(sum(col("uo")).as("bpe_old"), sum(col("un")).as("bpe_new"))
      .withColumn("shift",
        abs(col("bpe_new") - col("bpe_old")).cast("double") /
          col("bpe_old"))
      .withColumn("decision",
        when(col("shift") > budgetShift, lit("re-tokenize"))
          .otherwise(lit("keep")))
  }

  /** Token accountings may only be combined when produced by the same
    * tokenizer generation. */
  def requireSameModel(dirA: String, dirB: String): Unit = {
    val (a, b) = (readSidecar(dirA), readSidecar(dirB))
    Seq("version", "k", "n_merges", "corpus_fp").foreach { key =>
      require(a.get(key) == b.get(key),
        s"tokenizer artifacts disagree on $key (${a.get(key)} vs " +
          s"${b.get(key)}): refusing to combine token accountings across " +
          "generations/corpora — re-tokenize one side on the common " +
          "version first")
    }
  }
}
