package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side BPE encoder (r16) — the production-K answer to x31/x32's
  * K-nested-literal-replace plan (TextQueries.bpeAccounting): at a real
  * vocabulary (32k–50k merges) a 50 000-deep nested `replace` expression
  * tree is unplannable, so the merge table becomes a plan-constant RANK
  * TABLE and each token is encoded by the standard greedy merge loop
  * [P: Sennrich et al. 2016 §3.2; the rank-scan encode is the shape every
  * production tokenizer (HuggingFace tokenizers, SentencePiece BPE) runs]:
  * repeatedly find the adjacent symbol pair with the LOWEST merge rank
  * and merge ALL its occurrences left-to-right, until no adjacent pair is
  * in the table. Per-token cost is O(len²) hash probes — len = word
  * length, INDEPENDENT of K — vs the replace form's O(K·len) string
  * rewrites.
  *
  * EQUIVALENCE to the gated replace form: for a LEARNED merge table
  * (each side of a rank-r merge is buildable from merges of rank < r —
  * the greedy trainer's output always is), merging at rank r can only
  * create pairs whose merges rank AFTER r (a new symbol is strictly
  * longer than either side, so it cannot appear inside an earlier-rank
  * pair that was trained before it existed), hence one ascending-rank
  * sequential pass ≡ lowest-rank-first iteration. Within one rank, the
  * single left-to-right non-overlapping pass IS `replace`'s scan
  * semantics ('/a//a//a/' → '/aa//a/'), and the freshly merged symbol
  * can never extend the same rank's pair (left+right ≠ left). BpeEncodeSpec
  * pins the expression bit-equal to the foldLeft-replace column at
  * K=8/K=12 on the trained table and on run/tie/fallback corpora.
  *
  * Semantics of the VALUE: the per-token real-vocab unit count under the
  * merge table — alphabetic tokens (`\A[a-z]+\z`, checked as a byte loop:
  * exact end-of-text anchoring) count their post-merge symbols;
  * everything else counts 1 (x31's byte-fallback convention). Null in →
  * null out.
  *
  * Scale shape: the merge table rides the plan as ONE reference object
  * (broadcast with the task binary, built into a byte-keyed
  * open-addressed table once per executor), the expression stays inside
  * whole-stage codegen, and symbols are (start,len) spans over the
  * token's bytes — merging adjacent spans yields a longer span, so the
  * encode loop allocates nothing per row beyond the token's byte copy. */
case class BpeUnitCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.nonEmpty, "merge table must be non-empty")
  // Seq (value equality), not Array: two identical encoders must
  // semanticEquals for subexpression elimination (the NgramBucketFold
  // lesson, r14 advisor find)
  @transient private lazy val ranks = new BpeRanks(merges)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_unit_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string token, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    BpeUnitCount.compute(v.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the rank table is a per-plan constant: one reference object, not
    // per-row state — the expression stays codegen-compatible
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[BpeRanks].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.BpeUnitCount.compute($c, $ranksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeUnitCount {
  /** Reused span buffers — the encode loop is allocation-free past the
    * token byte copy. One frame per thread; tokens are words, so the
    * initial 64 covers all but pathological inputs. */
  private val scratch = new ThreadLocal[Array[Array[Int]]] {
    override def initialValue(): Array[Array[Int]] =
      Array(new Array[Int](64), new Array[Int](64))
  }

  def compute(tok: UTF8String, ranks: BpeRanks): Long = {
    val nB = tok.numBytes()
    // byte-loop \A[a-z]+\z: multibyte UTF-8 has bytes >= 0x80 (signed
    // negative) and fails the range check, so this is exact on any input
    if (nB == 0) return 1L
    val bytes = tok.getBytes
    var i = 0
    while (i < nB) {
      val b = bytes(i)
      if (b < 'a' || b > 'z') return 1L
      i += 1
    }
    if (nB == 1) return 1L
    var bufs = scratch.get()
    if (bufs(0).length < nB) {
      bufs = Array(new Array[Int](nB * 2), new Array[Int](nB * 2))
      scratch.set(bufs)
    }
    val start = bufs(0)
    val len = bufs(1)
    var m = nB
    i = 0
    while (i < nB) { start(i) = i; len(i) = 1; i += 1 }
    while (m > 1) {
      // lowest-rank adjacent pair present
      var bestRank = Int.MaxValue
      i = 0
      while (i < m - 1) {
        val r = ranks.rank(bytes, start(i), len(i), start(i + 1), len(i + 1))
        if (r >= 0 && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) return m.toLong
      // merge ALL its occurrences left-to-right, non-overlapping (rank
      // equality identifies the pair: ranks are unique per table entry,
      // and the merged symbol cannot restart a same-rank match)
      var w = 0
      var j = 0
      while (j < m) {
        if (j < m - 1 && ranks.rank(bytes, start(j), len(j),
            start(j + 1), len(j + 1)) == bestRank) {
          start(w) = start(j); len(w) = len(j) + len(j + 1); j += 2
        } else { start(w) = start(j); len(w) = len(j); j += 1 }
        w += 1
      }
      m = w
    }
    m.toLong
  }
}

/** Open-addressed (left, right) → rank table probed directly from byte
  * spans — no per-probe allocation. Keys are stored as
  * `left ++ 0x00 ++ right` (the 0x00 boundary byte cannot occur inside a
  * symbol: the encoder only reaches the table for `[a-z]+` tokens, so
  * ("a","bc") and ("ab","c") stay distinct). Built once per executor from
  * the plan-constant merge list. */
final class BpeRanks(merges: Seq[(String, String)]) extends Serializable {
  @transient private lazy val (keyTab, rankTab, mask): (Array[Array[Byte]], Array[Int], Int) = {
    var cap = 16
    while (cap < merges.size * 2) cap <<= 1
    val keys = new Array[Array[Byte]](cap)
    val ranks = new Array[Int](cap)
    val msk = cap - 1
    var r = 0
    merges.foreach { case (a, b) =>
      val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val key = new Array[Byte](ab.length + 1 + bb.length)
      System.arraycopy(ab, 0, key, 0, ab.length)
      key(ab.length) = 0
      System.arraycopy(bb, 0, key, ab.length + 1, bb.length)
      var idx = BpeRanks.hashBytes(key, 0, key.length) & msk
      var placed = false
      while (!placed) {
        if (keys(idx) == null) {
          keys(idx) = key; ranks(idx) = r; placed = true
        } else if (java.util.Arrays.equals(keys(idx), key)) {
          placed = true // duplicate pair: first (lowest) rank wins
        } else idx = (idx + 1) & msk
      }
      r += 1
    }
    (keys, ranks, msk)
  }

  /** Rank of the pair (bytes[s1,s1+l1), bytes[s2,s2+l2)), or -1. */
  def rank(bytes: Array[Byte], s1: Int, l1: Int, s2: Int, l2: Int): Int = {
    var h = BpeRanks.FnvBasis
    var i = s1
    val e1 = s1 + l1
    while (i < e1) { h = (h ^ (bytes(i) & 0xff)) * BpeRanks.FnvPrime; i += 1 }
    h = (h ^ 0) * BpeRanks.FnvPrime
    var j = s2
    val e2 = s2 + l2
    while (j < e2) { h = (h ^ (bytes(j) & 0xff)) * BpeRanks.FnvPrime; j += 1 }
    var idx = (h ^ (h >>> 16)).toInt & mask
    val totalLen = l1 + 1 + l2
    while (true) {
      val k = keyTab(idx)
      if (k == null) return -1
      if (k.length == totalLen && k(l1) == 0 &&
          BpeRanks.spanEquals(k, bytes, s1, l1, s2, l2)) return rankTab(idx)
      idx = (idx + 1) & mask
    }
    -1 // unreachable
  }
}

object BpeRanks {
  private[expressions] final val FnvBasis = 0xcbf29ce484222325L
  private[expressions] final val FnvPrime = 0x100000001b3L

  private[expressions] def hashBytes(a: Array[Byte], off: Int, len: Int): Int = {
    var h = FnvBasis
    var i = off
    val e = off + len
    while (i < e) { h = (h ^ (a(i) & 0xff)) * FnvPrime; i += 1 }
    (h ^ (h >>> 16)).toInt
  }

  private[expressions] def spanEquals(key: Array[Byte], bytes: Array[Byte],
      s1: Int, l1: Int, s2: Int, l2: Int): Boolean = {
    var i = 0
    while (i < l1) { if (key(i) != bytes(s1 + i)) return false; i += 1 }
    var j = 0
    while (j < l2) {
      if (key(l1 + 1 + j) != bytes(s2 + j)) return false
      j += 1
    }
    true
  }
}
