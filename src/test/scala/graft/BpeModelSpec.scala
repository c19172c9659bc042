package graft

import graft.operators.{BpeModel, TextQueries}
import org.apache.spark.sql.functions._

/** The persisted-tokenizer lifecycle behind x32 — versioned merge-table
  * artifacts with frozen serving, the re-tokenize drift dial, and
  * mixed-generation refusal ("tokenizer as data", the QualityModel /
  * index-family conventions applied to BPE). */
class BpeModelSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("artifact lifecycle: build once per (corpus, version), sidecar " +
    "round-trips, merges table is the learned loop's output in order") {
    val dir1 = BpeModel.ensureArtifact(spark, d)
    assert(dir1 === BpeModel.ensureArtifact(spark, d), "idempotent")
    val meta = BpeModel.readSidecar(dir1)
    assert(meta("version") === 1L)
    assert(meta("k") === BpeModel.mergesFor(1).toLong)
    // artifact content = an independent run of the training loop
    val served = BpeModel.merges(spark, d)
    val fresh = BpeModel.learnMerges(spark, d, BpeModel.mergesFor(1))
    assert(served === fresh)
    assert(served.nonEmpty)
  }

  test("x32 serve ≡ x31 fresh recompute (same K): the artifact path is " +
    "bit-identical to inline training") {
    val a = TextQueries.x31_bpe_apply(spark, d).collect().map(_.toString)
    val b = TextQueries.x32_bpe_served(spark, d).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("v1->v2 swap is FROZEN-serving: a v2 build (longer training run) " +
    "never moves a v1-pinned consumer") {
    val v1Before = BpeModel.merges(spark, d, 1)
    val dir2 = BpeModel.ensureArtifact(spark, d, 2)
    assert(BpeModel.readSidecar(dir2)("version") === 2L)
    assert(BpeModel.readSidecar(dir2)("k") === BpeModel.mergesFor(2).toLong)
    val v2 = BpeModel.merges(spark, d, 2)
    assert(BpeModel.merges(spark, d, 1) === v1Before)
    // a longer run extends the same greedy prefix: v1 is v2's prefix
    assert(v2.take(v1Before.size) === v1Before)
    assert(v2.size > v1Before.size)
  }

  test("drift dial: same-version shift is zero ('keep'); a longer-vocab " +
    "generation compresses the probe and the budget decides") {
    val same = BpeModel.driftDial(spark, d, 1, 1).head()
    assert(same.getAs[Double]("shift") === 0.0)
    assert(same.getAs[String]("decision") === "keep")
    val cross = BpeModel.driftDial(spark, d, 1, 2).head()
    // more merges can only compress (each merge reduces units)
    assert(cross.getAs[Long]("bpe_new") <= cross.getAs[Long]("bpe_old"))
    val shift = cross.getAs[Double]("shift")
    assert(shift > 0.0, "the longer run must actually change the budget")
    assert(cross.getAs[String]("decision") ===
      (if (shift > 0.02) "re-tokenize" else "keep"))
    val strict = BpeModel.driftDial(spark, d, 1, 2, budgetShift = 0.0).head()
    assert(strict.getAs[String]("decision") === "re-tokenize")
  }

  test("mixed-generation refusal: combining accountings across versions " +
    "and serving a version-mismatched artifact both refuse loudly") {
    val dir1 = BpeModel.ensureArtifact(spark, d, 1)
    val dir2 = BpeModel.ensureArtifact(spark, d, 2)
    BpeModel.requireSameModel(dir1, dir1)
    val e = intercept[IllegalArgumentException](
      BpeModel.requireSameModel(dir1, dir2))
    assert(e.getMessage.contains("refusing to combine"))
    val dir3 = BpeModel.ensureArtifact(spark, d, 3)
    val sc = java.nio.file.Paths.get(dir3, BpeModel.SidecarName)
    val orig = new String(java.nio.file.Files.readAllBytes(sc), "UTF-8")
    try {
      java.nio.file.Files.write(sc,
        orig.replace("\"version\":3", "\"version\":999").getBytes("UTF-8"))
      val e2 = intercept[IllegalArgumentException](
        BpeModel.merges(spark, d, 3))
      assert(e2.getMessage.contains("refusing to serve"))
    } finally { java.nio.file.Files.write(sc, orig.getBytes("UTF-8")); () }
  }

  test("frequency-floor vocab prune (r17, the web-scale path): " +
    "minFreq=1 is the unpruned collect bit-for-bit, minFreq=N keeps " +
    "exactly the f>=N rows, the pruned vocab trains, and the guard's " +
    "refusal names the floor as the remedy") {
    val full = BpeModel.collectVocab(spark, d).sortBy(_._1)
    assert(full.nonEmpty)
    assert(BpeModel.collectVocab(spark, d, minFreq = 1L)
      .sortBy(_._1).toSeq === full.toSeq)
    // a floor that provably bites on THIS fixture: one above the rarest
    // type's frequency (the fixture's frequencies are not all equal)
    assert(full.map(_._2).max > full.map(_._2).min)
    val floor = full.map(_._2).min + 1
    val pruned = BpeModel.collectVocab(spark, d, minFreq = floor).sortBy(_._1)
    assert(pruned.toSeq === full.filter(_._2 >= floor).toSeq,
      "the floor must drop exactly the below-floor types, nothing else")
    assert(pruned.length < full.length && pruned.nonEmpty)
    // the pruned vocabulary trains on the same local loop (a head-heavy
    // table: pruning only removes tail mass from the pair counts)
    val merges = BpeModel.learnMergesLocal(pruned, 8)
    assert(merges.nonEmpty)
    assert(merges === merges.distinct, "ranks are unique per table entry")
    // the OOM guard names raising the floor, not a dead end
    val e = intercept[IllegalArgumentException](
      BpeModel.collectVocab(spark, d, maxVocab = 1))
    assert(e.getMessage.contains("raise minFreq"))
  }
}
