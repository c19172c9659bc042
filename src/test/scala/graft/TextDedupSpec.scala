package graft

import graft.functions.TextFunctions._
import graft.operators.{DedupQueries, TextQueries}
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {

  private def df1(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("fingerprint is invariant under word order and duplication") {
    val d = df1((1L, "alpha beta gamma"), (2L, "gamma beta alpha alpha"),
      (3L, "alpha beta delta"))
    val fps = d.select(col("id"), fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("connected components: chains need multiple supersteps, clusters get min-id labels") {
    import spark.implicits._
    // a 5-chain (diameter 4 → several propagation rounds), a triangle,
    // and a detached pair — labels must be each component's min id
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), // chain
      (20L, 21L), (21L, 22L), (20L, 22L),             // triangle
      (30L, 31L)                                      // pair
    ).toDF("src", "dst")
    val lbl = DedupQueries.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 14L).forall(lbl(_) == 10L), s"chain: $lbl")
    assert((20L to 22L).forall(lbl(_) == 20L), s"triangle: $lbl")
    assert(Seq(30L, 31L).forall(lbl(_) == 30L), s"pair: $lbl")
    assert(lbl.size === 10)
  }

  test("RunLengthStats matches the builtin sort+fold bigram formulation") {
    // the codegen'd pair-sort must agree with the reference HOF chain
    // (array_sort over joined bigram strings + run-length aggregate) on
    // every shape: no repeats, a dominant run, all-same, short docs
    val d = df1(
      (1L, "a b c d"),                     // no repeated bigram
      (2L, "x y x y x y z"),               // dominant "x y" + "y x" runs
      (3L, "w w w w w"),                   // single bigram repeated 4x
      (4L, "solo"), (5L, ""),              // 0 bigrams
      (6L, "p q p q p r p q"))             // mixed repeats
    val grams = array_sort(shingles(tokens(col("text")), 2))
    val zero = struct(lit("").as("prev"), lit(0).as("run"),
      lit(0).as("maxrun"), lit(0).as("dup"))
    val ref = aggregate(grams, zero, (acc, x) => {
      val run = when(acc.getField("prev") === x, acc.getField("run") + 1)
        .otherwise(lit(1))
      struct(x.as("prev"), run.as("run"),
        greatest(acc.getField("maxrun"), run).as("maxrun"),
        (acc.getField("dup") +
          when(run === 2, 2).when(run > 2, 1).otherwise(0)).as("dup"))
    })
    val st = runLengthStats(tokens(col("text")))
    val rows = d.select(col("id"),
        size(grams).as("ref_n"), ref.getField("maxrun").as("ref_max"),
        ref.getField("dup").as("ref_dup"),
        st.getField("n_bigrams").as("n"), st.getField("maxrun").as("max"),
        st.getField("dup").as("dup"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("n") === r.getAs[Int]("ref_n"), s"n: $r")
      assert(r.getAs[Int]("max") === r.getAs[Int]("ref_max"), s"max: $r")
      assert(r.getAs[Int]("dup") === r.getAs[Int]("ref_dup"), s"dup: $r")
    }
  }

  test("minhash signatures of identical token sets are identical") {
    val d = df1((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "totally different words here indeed"))
    val sigs = d.select(col("id"),
        minhashSignature(shingles(tokens(col("text")), 3), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }

  test("simhash: identical docs at hamming 0; unrelated docs far apart") {
    val d = df1((1L, "spark query engine fast scan"),
      (2L, "spark query engine fast scan"),
      (3L, "zzz yyy xxx www vvv uuu"))
    val hs = d.select(col("id"), simhash(tokens(col("text"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) === hs(2L))
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) > 5)
  }

  test("exact dedup finds exactly the injected duplicates") {
    val docs = Tables.documents(spark, sf).count()
    val injected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0).count()
    val row = DedupQueries.d1_exact(spark, sf).head()
    assert(row.getLong(0) === docs + injected) // n_total
    assert(row.getLong(1) === docs)            // n_kept (all texts unique)
    assert(row.getLong(2) === injected)        // n_dropped
  }

  test("minhash LSH recovers every injected exact-duplicate pair") {
    import spark.implicits._
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id_a"),
        (col("doc_id") + 100000L).as("id_b"))
    val found = DedupQueries.d3_minhash_lsh(spark, sf)
    assert(expected.exceptAll(found.select("id_a", "id_b")).count() === 0,
      "every exact dup must share all bands")
  }

  test("language-id confusion matrix covers every labeled language deterministically") {
    val out1 = TextQueries.x1_langid(spark, sf).collect().toSeq
    val out2 = TextQueries.x1_langid(spark, sf).collect().toSeq
    assert(out1 === out2)
    val langs = out1.map(_.getString(0)).toSet
    assert(langs === Set("en", "es", "fr", "de", "zh"))
  }

  test("stratified sampling hits ~10% on the dominant stratum, ~50% on the tail") {
    val rows = TextQueries.x9_stratified(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (enDocs, enSampled, enRate) = rows("en")
    assert(enRate === 10L && rows("es")._3 === 50L)
    // md5-hash membership is a fixed set, not an expectation — bounds are
    // loose only because strata are small at spec scale
    assert(enSampled * 100 >= enDocs * 2 && enSampled * 100 <= enDocs * 25,
      s"en sampled $enSampled of $enDocs at 10%")
    rows.values.foreach { case (n, m, _) => assert(m <= n) }
  }

  test("rarity score floors above 1 and covers exactly the eval split") {
    val out = TextQueries.x11_perplexity(spark, sf).collect()
    val evalDocs = Tables.documents(spark, sf)
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100)
      .filter(col("h") < 10).count()
    assert(out.length.toLong === evalDocs)
    // inv_p = (N+V)/(tf+1) ≥ (N+V)/(N+1) > 1 for every token
    assert(out.forall(_.getDouble(2) > 1.0))
    assert(out.forall(_.getLong(1) > 0L))
  }

  test("sequence packing: bins are budget-aligned and partition the corpus") {
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val out = TextQueries.x10_pack(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum === nDocs, "every doc lands in one bin")
    // each source's bins are contiguous from 0, and a bin's START offset is
    // below its window end by construction (offset packing)
    out.groupBy(_.getString(0)).foreach { case (src, bins) =>
      val ids = bins.map(_.getLong(1)).sorted
      assert(ids.head === 0L, s"$src bins start at 0")
      assert(ids === (0L until ids.length).toSeq, s"$src bins are contiguous")
    }
  }

  test("semantic dedup drops every injected duplicate embedding") {
    val out = DedupQueries.d8_semdedup(spark, sf).collect()
    val nBase = Tables.embeddings(spark, sf).count()
    val nInjected = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 7 === 0).count()
    assert(out.map(_.getLong(1)).sum === nBase + nInjected, "cells partition")
    // every injected copy has an identical lower-id twin in its cell →
    // cosine 1.0 → dropped; kept + dropped partition each cell
    val droppedIds = out.flatMap(_.getString(4).split(",").filter(_.nonEmpty)
      .map(_.toLong)).toSet
    val injected = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 7 === 0)
      .collect().map(_.getLong(0) + 100000L)
    injected.foreach(id => assert(droppedIds.contains(id), s"copy $id kept"))
    out.foreach(r => assert(r.getLong(1) === r.getLong(2) + r.getLong(3)))
  }

  test("chunk dedup: an injected whole-doc copy duplicates every chunk") {
    val out = DedupQueries.d11_chunk_dedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // each +100000 copy repeats its original chunk-for-chunk, so every
    // one of its chunks ranks rn > 1 → n_dup_chunks == n_chunks
    val copies = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0).select("doc_id")
      .collect().map(_.getLong(0) + 100000L)
    assert(copies.nonEmpty)
    copies.foreach { id =>
      val (n, dup) = out(id)
      assert(n === dup, s"copy $id should have all $n chunks duplicated")
    }
  }

  test("incremental dedup: every incoming copy matches its origin via the index") {
    val pairs = DedupQueries.d12_incremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val copies = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    assert(copies.nonEmpty)
    // an exact copy shares every band with its origin → the probe join
    // must recover (origin, origin + 100000) for every incoming doc
    copies.foreach { id =>
      assert(pairs.contains((id, id + 100000L)), s"copy of $id not matched")
    }
  }

  test("band merge: the compacted index retains every generation's rows") {
    val pairs = DedupQueries.d16_band_merge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probed = Tables.documents(spark, sf)
      .filter(col("doc_id") % 13 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    assert(probed.nonEmpty)
    probed.foreach { id =>
      // base generation survives the merge: exact copy matches origin
      assert(pairs.contains((id, id + 400000L)), s"base match for $id lost")
      // segment generations survive: a doc admitted in an earlier crawl
      // (%5 → +100000, %11 → +300000) must also match the new copy
      if (id % 5 == 0)
        assert(pairs.contains((id + 100000L, id + 400000L)),
          s"segment-1 match for $id lost in merge")
      if (id % 11 == 0)
        assert(pairs.contains((id + 300000L, id + 400000L)),
          s"segment-2 match for $id lost in merge")
    }
  }

  test("streamed segment ingestion: each crawl batch's segment is probeable") {
    val pairs = DedupQueries.d17_stream_index(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probed = Tables.documents(spark, sf)
      .filter(col("doc_id") % 6 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    assert(probed.nonEmpty)
    probed.foreach { id =>
      // base corpus match
      assert(pairs.contains((id, id + 700000L)), s"base match for $id lost")
      // each streamed crawl's segment must answer the probe: batch 1
      // (%4 → +500000) and batch 2 (%9 → +600000)
      if (id % 4 == 0)
        assert(pairs.contains((id + 500000L, id + 700000L)),
          s"streamed segment 1 match for $id missing")
      if (id % 9 == 0)
        assert(pairs.contains((id + 600000L, id + 700000L)),
          s"streamed segment 2 match for $id missing")
    }
  }

  test("substring spans: an injected whole-doc copy is one full-length span") {
    val out = DedupQueries.d9_substring(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every copied doc with >= 8 tokens: original AND copy carry a span
    // covering the entire doc (all gram positions duplicated, one island)
    val copied = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).filter(_._2 >= 8)
    assert(copied.nonEmpty)
    copied.foreach { case (id, n) =>
      assert(out(id)._2 === n.toLong, s"doc $id full-doc span")
      assert(out(id + 100000L) === out(id), s"copy of $id matches")
    }
  }

  test("bloom-gated incremental dedup: same rows as the exact join, " +
    "bloom probe stays map-side codegen (no UDF)") {
    val out = DedupQueries.d13_bloom_incremental(spark, sf)
    // the plan probes a literal bloom (might_contain) — a codegen'd
    // Catalyst predicate, not a Scala UDF, and no extra shuffle before it
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    // bloom affects performance only: rows equal the bloom-free twin
    val docs = Tables.documents(spark, sf)
    val baseH = docs.select(md5(col("text")).as("h"))
    val incoming = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        md5(col("text")).as("h"))
      .unionByName(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          md5(concat(col("text"), lit(" novel"))).as("h")))
    val exact = incoming.join(baseH.distinct(), Seq("h"), "left_semi")
      .select(col("doc_id"), col("h")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = out.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === exact)
    assert(got.nonEmpty) // the re-crawled copies ARE caught
    // and the genuinely-new docs are NOT flagged
    assert(got.forall(_._1 < 200000L))
  }

  test("x29 quality classifier: map-side linear fold (no doc_id " +
    "exchange), deterministic scores, threshold splits the corpus") {
    val out = TextQueries.x29_quality_classifier(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_docs"))
      val keep = r.getLong(r.fieldIndex("n_keep"))
      val rate = r.getDouble(r.fieldIndex("keep_rate"))
      assert(keep >= 0 && keep <= n)
      // r14: keep_rate is the bare IEEE quotient (no round()) — exact
      assert(rate === keep.toDouble / n)
      // avg_score is sign-consistent with the integer mass
      val wsum = r.getLong(r.fieldIndex("sum_wnum"))
      val avg = r.getDouble(r.fieldIndex("avg_score"))
      assert(math.signum(avg) === math.signum(wsum.toDouble))
    }
    // a hash-uniform stub model over [-1, 1] must split, not rubber-stamp
    val total = rows.map(_.getLong(1)).sum
    val kept = rows.map(_.getLong(2)).sum
    assert(kept > total / 10 && kept < total * 9 / 10,
      s"degenerate classifier: kept $kept of $total")
    // the per-document score is a map-side higher-order fold: the ONLY
    // exchange is the per-source aggregate — no doc_id shuffle, no explode
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(doc_id"),
      "scoring must not shuffle on doc_id")
    assert(!plan.toLowerCase.contains("generate explode"),
      "scoring must not explode tokens")
    // determinism: a second run produces identical bytes
    assert(out.collect().map(_.toString).toSeq ===
      TextQueries.x29_quality_classifier(spark, sf).collect()
        .map(_.toString).toSeq)
  }

  test("x30 classified curation: the model gate composes with the x23 " +
    "stages — every survivor passes ALL five rules, plan shape holds") {
    val out = TextQueries.x30_classified_curation(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // x30 ⊆ x23: adding the classifier gate can only SHRINK each shard
    val x23 = TextQueries.x23_curation_pipeline(spark, sf).collect()
      .map(r => r.getLong(r.fieldIndex("shard")) ->
        r.getLong(r.fieldIndex("n_docs"))).toMap
    rows.foreach { r =>
      val (sh, n) = (r.getLong(r.fieldIndex("shard")),
        r.getLong(r.fieldIndex("n_docs")))
      assert(n <= x23.getOrElse(sh, 0L),
        s"shard $sh: classified keep-set exceeds the unclassified one")
      // survivors carry positive classifier mass by construction
      assert(r.getLong(r.fieldIndex("sum_wnum")) > 0L)
    }
    // the gate filtered SOMETHING (a rubber-stamp stage 0 is a bug)
    assert(rows.map(_.getLong(1)).sum < x23.values.sum)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(doc_id"),
      "scoring must not shuffle on doc_id")
    assert(plan.contains("BroadcastExchange"),
      "decontamination must broadcast the eval-hash set")
  }

  test("weighted sample: exactly k docs, biased toward longer documents") {
    val out = TextQueries.x24_weighted_sample(spark, sf)
      .agg(sum("n_sampled").as("k"), sum("sum_w").as("w")).head()
    assert(out.getLong(0) === 200L)
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg("n_chars")).head().getDouble(0)
    // selection keys are h/weight: length-weighted sampling MUST
    // over-represent long documents relative to a uniform draw
    assert(out.getLong(1).toDouble / 200.0 > corpusMean * 1.1)
  }
}
