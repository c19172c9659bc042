package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2.13 L1/L2 — deduplication for training-data pipelines.
  *
  * The fixture corpus has no literal duplicates, so the exact/fingerprint
  * queries dedup a deterministic corpus-with-injected-dups (documents ∪ a
  * shifted copy of every 5th doc) — derived identically in the oracle.
  *
  * Scale design: every variant is one hash-shuffle on the dedup key (content
  * hash / fingerprint / band hash); candidate verification joins only within
  * buckets — never an all-pairs product. MinHash/SimHash signatures are
  * single-pass builtin folds (no UDF, stays in codegen).
  */
object DedupQueries {

  /** documents plus exact-duplicate copies of every 5th doc (ids +100000). */
  private def corpusWithDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
  }

  /** [[corpusWithDups]] spread across tasks when the scan arrived
    * under-split — ONLY for the sketch queries (d3/d4), whose per-token
    * md5 + per-shingle permutation work must not run on the fixture's
    * single file-split (see [[Tables.spread]]). d1/d2 hash once per doc,
    * where the extra shuffle would cost more than it buys. */
  private def corpusSpread(s: SparkSession, d: String): DataFrame =
    Tables.spread(corpusWithDups(s, d), col("doc_id"))

  /** D1 (L1): exact dedup by content hash — keep lowest doc_id per group. */
  def d1_exact(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("h").orderBy(col("doc_id").asc)
    corpusWithDups(s, d)
      .withColumn("h", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .groupBy()
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** D2 (L2 fingerprint): order-insensitive near-dup clusters (sorted distinct
    * token set) — cluster count + sizes over the duplicated corpus. */
  def d2_fingerprint(s: SparkSession, d: String): DataFrame =
    corpusWithDups(s, d)
      .withColumn("fp", fingerprint(col("text")))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("keeper"))
      .filter(col("cluster_size") > 1)
      .select(col("keeper"), col("cluster_size"))
      .orderBy("keeper")

  /** All ordered pairs (a < b) from a sorted array — the in-bucket candidate
    * expansion shared by D3/D4. Buckets are small by the LSH premise, so the
    * quadratic expansion is per-bucket-bounded; crucially the sketch pipeline
    * upstream is computed ONCE (a self-join would recompute the whole
    * shingle→signature subtree for each side). */
  private def orderedPairs(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), size(ids)), y =>
        struct(x.as("id_a"), y.as("id_b")))))

  /** Skew guard for in-bucket pair expansion: a degenerate hot bucket (many
    * boilerplate near-identical docs sharing a band hash) would concentrate
    * O(|bucket|²) pairs in one task. Production LSH dedup drops such buckets
    * (their pairs are rediscovered by the other bands, or are boilerplate you
    * WANT dropped); the cap bounds one task's expansion at 64·63/2 pairs.
    * Mirrored in the DuckDB twin so the cap itself is hash-verified. */
  private val MaxBucket = 64

  /** 2^31 − 1 (prime) — modulus of the Carter-Wegman permutation family. */
  private val P = 2147483647L

  /** 60-bit token hash shared bit-for-bit with the DuckDB twin (x6/x8's
    * convention): first 15 hex chars of md5 → BIGINT, computed by the
    * codegen'd [[graft.functions.expressions.Md5Prefix64]] (digest bytes →
    * long; the builtin conv(substring(md5)) chain allocates three strings
    * per TOKEN, which was the d3/d4 hot loop). */
  private def mdTokHash(t: Column): Column = md5Hash60(t)

  /** D3 (L2 MinHash+LSH): 32-perm MinHash over 3-gram shingles, 8 bands × 4
    * rows; candidate pairs = docs sharing a band hash. Fully oracled: the
    * token hash is md5-derived (same bits in DuckDB), the shingle hash is a
    * polynomial combine mod p, and the permutations are Carter-Wegman — every
    * step ANSI-SQL-expressible, so the whole pipeline is hash-verified.
    *
    * Plan shape (deliberate): explode shingles, then ONE codegen'd
    * hash-aggregate computing all 32 `min(perm_i)` partials map-side —
    * higher-order-function folds evaluate interpreted per row, which is the
    * wrong shape for a 100 TB corpus; explode+agg is the one that vectorizes
    * and partial-aggregates. Candidate pairs come from ONE shuffle on
    * (band, bandhash) + in-bucket expansion — never a self-join that would
    * run the sketch pipeline twice. The explode carries 8-byte longs, never
    * materialized shingle strings (~60 B each at corpus scale).
    */
  def d3_minhash_lsh(s: SparkSession, d: String): DataFrame =
    d3Pairs(s, d).orderBy("id_a", "id_b")

  /** D3's candidate pairs WITHOUT the presentation sort — d7 consumes
    * these directly (a global sort of the candidate set buys the
    * components fixpoint nothing and is real work at 100 TB). */
  private def d3Pairs(s: SparkSession, d: String): DataFrame =
    bandedSignatures(corpusSpread(s, d)).groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= MaxBucket)
      .select(explode(orderedPairs(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

  /** The MinHash+LSH banding shared by d3 and the incremental path (d12):
    * token hash once per token mod p; shingle hash = polynomial combine of
    * the 3 token hashes mod p; 32 Carter-Wegman permutations
    * h_i = (a_i·h + b_i) mod p — the mod makes each argmin independent (a
    * plain linear map is monotone: every component would share one argmin
    * and LSH collapses). Operands sized for ANSI Long arithmetic:
    * h ∈ [0, 2^31), a_i < 2^32, so a_i·h + b_i < 2^63. One codegen'd
    * hash-aggregate computes all 32 min(perm_i) partials map-side; the
    * band key is xxhash64 of the band slice (8-byte key compression — the
    * OUTPUT depends only on band-tuple equality, so the oracle's
    * string-tuple key groups identically, collision odds ~ buckets²/2^64).
    * Returns (doc_id, band, bh). */
  private def bandedSignatures(docs: DataFrame): DataFrame = {
    val th = col("th")
    val shingled = docs
      .select(col("doc_id"), transform(tokens(col("text")), t => mdTokHash(t) % P).as("th"))
      .filter(size(th) >= 3)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(th) - 2),
        i => ((element_at(th, i) * lit(1000003L) + element_at(th, i + 1)) % P
          * lit(999983L) + element_at(th, i + 2)) % P)).as("h"))
    def perm(i: Int) =
      (col("h") * lit(2L * i + 0x9E3779B1L) + lit(i * 0x85EBCA77L)) % P
    val sigs = shingled.groupBy(col("doc_id"))
      .agg(min(perm(0)).as("h0"),
        (1 until 32).map(i => min(perm(i)).as(s"h$i")): _*)
    val sig = array((0 until 32).map(i => col(s"h$i")): _*)
    sigs.select(col("doc_id"), explode(lshBands(sig, 8, 4)).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.bh"))
  }

  /** D4 (L2 SimHash): 60-bit simhash (md5-derived token hash, so the sketch
    * is bit-identical in the DuckDB twin → fully oracled); pairs within
    * hamming distance 3 among banded candidates.
    *
    * Same scale shape as D3: explode tokens, hash each ONCE (codegen), one
    * hash-aggregate with the bit-count sums packed 4-per-long, then assemble
    * the sketch. Docs with ≥ 2^15 tokens are excluded up front (mirrored in
    * the twin): the top packed slot is shifted by 48, so a counter needs
    * n < 2^15 to keep the packed sum inside a signed long — the guard makes
    * the bound explicit instead of silently corrupting the sketch. */
  def d4_simhash(s: SparkSession, d: String): DataFrame = {
    val hashed = corpusSpread(s, d)
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) < 32768) // packed-counter width guard (see doc)
      .select(col("doc_id"), explode(col("ts")).as("t"))
      .select(col("doc_id"), mdTokHash(col("t")).as("h"))
    // pack bit-counters 4-per-long (16-bit slots): 15 agg buffers cover the
    // 60 hash bits (slot s of buffer q counts bit q + 15·s)
    val counted = hashed.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"),
        (0 until 15).map { q =>
          sum((0 until 4).map { slot =>
            shiftleft(shiftright(col("h"), q + 15 * slot).bitwiseAND(1L),
              16 * slot)
          }.reduce(_ + _)).as(s"p$q")
        }: _*)
    val sh = counted.select(col("doc_id"),
      (0 until 60).map { j =>
          val bj = shiftright(col(s"p${j % 15}"), 16 * (j / 15))
            .bitwiseAND(0xFFFFL)
          when(bj * 2 > col("n"), lit(1L << j)).otherwise(0L)
        }
        .reduce(_.bitwiseOR(_)).as("sh"))
    // band by 15-bit quarters: near-identical sketches share ≥1 quarter.
    // Same one-shuffle bucket-expansion shape (and MaxBucket skew cap) as D3.
    val banded = sh.select(col("doc_id"), col("sh"),
        explode(array((0 until 4).map(q =>
          struct(lit(q).as("q"),
            shiftright(col("sh"), q * 15).bitwiseAND(0x7FFFL).as("qh"))): _*)).as("b"))
      .select(col("doc_id"), col("sh"), col("b.q"), col("b.qh"))
    val ds = col("ds")
    banded.groupBy(col("q"), col("qh"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sh")))).as("ds"))
      .filter(size(ds) > 1 && size(ds) <= MaxBucket)
      .select(explode(flatten(transform(ds, (x, i) =>
        transform(slice(ds, i + lit(2), size(ds)), y =>
          struct(x.getField("doc_id").as("id_a"),
            y.getField("doc_id").as("id_b"),
            hamming64(x.getField("sh"), y.getField("sh")).as("dist")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.dist").cast("int").as("dist"))
      .distinct()
      .filter(col("dist") <= 3)
      .orderBy("id_a", "id_b")
  }

  /** D5 (L2 n-gram Jaccard): exact word-trigram Jaccard similarity for pairs
    * within the same source (the bucket), doc_id < 150. Fully oracled —
    * verifies the shingle/intersection algebra that D3 approximates. */
  def d5_ngram_jaccard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") < 150)
      .select(col("doc_id"), col("source"),
        array_distinct(shingles(tokens(col("text")), 3)).as("sh"))
    docs.as("a").join(docs.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))), 6).as("jaccard"))
      .filter(col("jaccard") > 0.01)
      .orderBy("id_a", "id_b")
  }

  /** Connected components by distributed min-label propagation: each
    * superstep every vertex takes the min label among itself and its
    * neighbors (one join + one aggregate, both keyed on the vertex —
    * ONE shuffle per superstep), until a fixpoint. Rounds = graph
    * diameter; near-dup graphs are unions of small dense clusters, so the
    * diameter is tiny and this beats the O(log n) star-contraction
    * variants on constant factors (no re-edging). `localCheckpoint`
    * truncates the per-round lineage so the plan stays flat at any round
    * count. Isolated vertices keep their own id as the component. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    // seed with the 1-hop neighborhood min — one aggregation that fuses
    // the first propagation round into the init: near-dup components are
    // mostly cliques (a shared LSH bucket edges all pairs), so most of the
    // graph converges at the seed and the loop's first convergence count
    // ends it after a single superstep
    var lbl = sym.groupBy(col("src").as("id"))
      .agg(min(least(col("src"), col("dst"))).as("lbl")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    val maxRounds = 256 // >> any near-dup graph diameter; a backstop only
    while (changed > 0 && rounds < maxRounds) {
      val merged = superstep(sym, lbl).localCheckpoint()
      changed = merged.filter(col("newlbl") < col("maxlbl")).count()
      lbl = merged.select(col("id"), col("newlbl").as("lbl"))
      rounds += 1
    }
    sym.unpersist()
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxRounds supersteps " +
        "(graph diameter exceeds the backstop) — refusing to return " +
        "partial labels")
    lbl
  }

  /** One min-label-propagation round: neighbor labels via an equi-join on
    * the vertex, then ONE vertex-keyed aggregate carrying old+new labels so
    * the convergence count reads the checkpointed rows instead of
    * recomputing the join (which doubled every superstep). Exposed for
    * ScalePlanSpec, which pins the per-round plan shape. */
  private[graft] def superstep(sym: DataFrame, lbl: DataFrame): DataFrame = {
    val nbr = sym.join(lbl, sym("src") === lbl("id"))
      .select(col("dst").as("id"), col("lbl"))
    nbr.unionByName(lbl)
      .groupBy("id").agg(min("lbl").as("newlbl"), max("lbl").as("maxlbl"))
  }

  /** D6 (L2 cluster consolidation): the step real dedup pipelines need
    * AFTER pair generation — group near-duplicate PAIRS into clusters and
    * keep one representative each. Pairs are D5's exact trigram-Jaccard
    * edges (same-source, doc_id < 300); components by
    * [[connectedComponents]]; output one row per cluster: representative
    * (min doc_id), size, sorted members. The DuckDB twin computes the same
    * closure with a recursive CTE, so the distributed fixpoint itself is
    * hash-verified. */
  def d6_components(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
      .select(col("doc_id"), col("source"),
        array_distinct(shingles(tokens(col("text")), 3)).as("sh"))
    val pairs = docs.as("a").join(docs.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .filter(col("j") > 0.01)
      .select("src", "dst")
    componentSummary(connectedComponents(pairs))
  }

  /** One row per component: representative id, size, members as a sorted
    * comma-joined STRING — a string (not an array) so the driver's pandas
    * sort/hash gate can order the column (arrays are unhashable there). */
  private def componentSummary(lbl: DataFrame): DataFrame =
    lbl.groupBy(col("lbl").as("comp_id"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",", sort_array(collect_list(col("id")))).as("members"))
      .orderBy("comp_id")

  /** D7 (L2+ production consolidation): the pipeline a 100 TB dedup run
    * actually executes — LSH candidate pairs (D3's md5-shared banding, so
    * every step is oracle-expressible) → connected components → one row per
    * cluster. D6 verifies the closure algebra on exact Jaccard edges; D7 is
    * the declared scale path: pair generation is D3's single (band,bandhash)
    * shuffle (never an all-pairs join), and each component superstep is one
    * checkpointed shuffle (see [[connectedComponents]]). The DuckDB twin
    * re-derives the identical candidate set from the shared band algebra and
    * closes it with a recursive CTE. */
  def d7_components_lsh(s: SparkSession, d: String): DataFrame =
    componentSummary(connectedComponents(
      d3Pairs(s, d).select(col("id_a").as("src"), col("id_b").as("dst"))))

  /** D10 (L2+ canonical selection): the KEEP RULE a production dedup run
    * applies after clustering (RefinedWeb/FineWeb keep the best document
    * of each near-dup cluster): within each D7 component keep the LONGEST
    * document (ties → lowest id), drop the rest. Quality here is length —
    * the rule composes with any scorer (x2/x17) unchanged.
    * Scale shape: one extra label-keyed window + aggregate on top of the
    * d7 label propagation — the labels are already partitioned by
    * component, so the keep rule adds ONE shuffle of (id, lbl, n) triples
    * regardless of corpus size. */
  def d10_canonical(s: SparkSession, d: String): DataFrame = {
    val lbl = connectedComponents(
      d3Pairs(s, d).select(col("id_a").as("src"), col("id_b").as("dst")))
    val len = corpusWithDups(s, d)
      .select(col("doc_id"), length(col("text")).as("n"))
    val w = Window.partitionBy(col("lbl"))
      .orderBy(col("n").desc, col("id").asc)
    lbl.join(len, lbl("id") === len("doc_id"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("lbl").as("comp_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(when(col("rn") === 1, col("id"))).as("keep_id"),
        concat_ws(",", sort_array(collect_list(
          when(col("rn") =!= 1, col("id"))))).as("dropped_ids"))
      .orderBy("comp_id")
  }

  /** D11 (L2+ chunk-level dedup — the CCNet/paragraph shape [P: Wenzek et
    * al. 2020, arXiv:1911.00359 "CCNet": dedup at paragraph granularity
    * removes boilerplate exact-duplicate spans that whole-document hashing
    * misses): documents split into disjoint 16-token chunks (the corpus
    * has no paragraph breaks, so fixed-width chunks stand in — x7's
    * convention), each chunk md5-hashed; a chunk is a DUPLICATE when the
    * same hash occurred at a smaller (doc_id, chunk_idx). One row per
    * affected doc: chunk/dup counts and the duplicated token mass.
    *
    * Scale shape: hash per chunk (not per token), ONE count-over-window
    * shuffle on the 16-byte chunk hash, then a doc-keyed agg — d9's
    * span-index shape at chunk granularity, linear in the corpus. */
  def d11_chunk_dedup(s: SparkSession, d: String): DataFrame = {
    val chunks = corpusSpread(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          floor((size(col("toks")) - 1) / 16).cast("int"))).as("ci"))
      .select(col("doc_id"), col("ci"),
        slice(col("toks"), col("ci") * 16 + 1, lit(16)).as("ctoks"))
      .select(col("doc_id"), col("ci"), size(col("ctoks")).as("n_toks"),
        md5(concat_ws(" ", col("ctoks"))).as("h"))
    val w = Window.partitionBy(col("h"))
      .orderBy(col("doc_id").asc, col("ci").asc)
    chunks
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("rn") > 1, col("n_toks")).otherwise(0L))
          .as("n_dup_tokens"))
      .filter(col("n_dup_chunks") > 0)
      .orderBy("doc_id")
  }

  /** The persisted LSH band index d12 probes — built ONCE per corpus
    * version from the base documents (doc_id, band, bh as parquet), the
    * way a production crawl pipeline keeps a standing dedup index and
    * checks each INCOMING batch against it instead of re-deduping the
    * whole corpus per crawl [P: Lee et al. 2022 §5 discuss dedup cost at
    * corpus scale; the incremental index is the standard mitigation]. */
  private val bandIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def bandIndexDir(s: SparkSession, d: String): String = {
    // mtime in the key: a regenerated fixture rebuilds the index instead
    // of serving stale bands (same rule as GraphAnn's index cache)
    bandIndexCache.computeIfAbsent(s"$d@${docsMtime(d)}", { _ =>
      val dir = Tables.tempRoot("graft-band-index")
      bandedSignatures(Tables.spread(Tables.documents(s, d), col("doc_id")))
        .write.mode("overwrite").parquet(dir)
      dir
    })
  }

  /** D12 (L2+ incremental dedup): an INCOMING batch (the +100000 copies —
    * a crawl that re-collected known content) is near-dup-checked against
    * the persisted band index of the existing corpus. Emits the matched
    * (idx_id, new_id) pairs. The new batch never pairs with itself — at
    * crawl scale the standing index is large and the batch small, so the
    * probe is one equi-join on (band, bh) against a bucket-capped index;
    * the whole-corpus re-dedup d3 runs is exactly what this path avoids. */
  /** The shared serve-side probe: cap hot buckets on the (possibly
    * masked/merged) INDEX side, band the probe docs, equi-join under the
    * cap, emit distinct (idx_id, new_id) matches — the ONE pipeline
    * d12/d14/d15 all run, so a cap or probe fix lands everywhere. */
  private def probeBandIndex(idx0: DataFrame,
      probeDocs: DataFrame): DataFrame = {
    val idx = idx0.select(col("doc_id").as("idx_id"), col("band"), col("bh"))
    val bucketOk = idx.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("bn")).filter(col("bn") <= MaxBucket)
      .select(col("band"), col("bh"))
    bandedSignatures(probeDocs)
      .select(col("doc_id").as("new_id"), col("band"), col("bh"))
      .join(idx.join(bucketOk, Seq("band", "bh")), Seq("band", "bh"))
      .select(col("idx_id"), col("new_id")).distinct()
      .orderBy("idx_id", "new_id")
  }

  def d12_incremental(s: SparkSession, d: String): DataFrame =
    probeBandIndex(
      s.read.parquet(bandIndexDir(s, d)),
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))

  /** The band-index SEGMENT d14 appends: an ACCEPTED incoming batch's
    * bands written ONCE as their own parquet segment beside the base
    * index — v18's per-flush segment rule applied to the dedup index
    * (upstream SAI builds one index segment per flushed sstable and
    * searches base + segments [U index/sai/]; FAISS's add-after-train is
    * the vector-side analogue). The base index is NEVER rewritten; a
    * rebuild is only worth it when segment count makes the probe-side
    * union wide (the compaction analogue — SCALE.md records the
    * threshold shape). */
  private val bandSegmentCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def bandSegmentDir(s: SparkSession, d: String): String = {
    bandSegmentCache.computeIfAbsent(s"$d@${docsMtime(d)}", { _ =>
      val dir = Tables.tempRoot("graft-band-seg")
      val accepted = Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      bandedSignatures(accepted).write.mode("overwrite").parquet(dir)
      dir
    })
  }

  /** D14 (L2+ band-index segment append): the index LIFECYCLE closed —
    * after d12 admits a batch, its bands append as ONE segment; the next
    * batch probes base + segments as a plain parquet union, so the second
    * crawl sees the first crawl's accepted docs WITHOUT any index
    * rebuild. One equi-join on (band, bh) against the unioned index,
    * bucket cap applied to the UNION (a bucket hot only across
    * generations is still hot — the cap must see the merged index, and
    * the twin mirrors it). Probe cost is flat in segment count until
    * compaction (each segment is one more leaf in the same scan). */
  def d14_band_append(s: SparkSession, d: String): DataFrame =
    probeBandIndex(
      s.read.parquet(bandIndexDir(s, d))
        .unionByName(s.read.parquet(bandSegmentDir(s, d))),
      Tables.documents(s, d).filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text")))

  /** D15: the DELETE lifecycle for the standing band index — v20's twin
    * on the dedup side (upstream SAI consults tombstones at query time;
    * a removed doc's postings stay on disk). Corpus docs deleted since
    * the index was built are masked at PROBE time: the index stream
    * LEFT-ANTI joins a small broadcast deletion segment BEFORE the
    * bucket cap, so removed docs never match an incoming batch, buckets
    * that only looked hot because of deleted members become admissible
    * again, and the index is never rebuilt. */
  def d15_band_delete(s: SparkSession, d: String): DataFrame =
    probeBandIndex(
      s.read.parquet(bandIndexDir(s, d))
        .join(broadcast(s.read.parquet(d15DeleteSegDir(s, d))),
          Seq("doc_id"), "left_anti"),
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))

  /** A SECOND accepted segment (a later crawl's admissions — the %11
    * docs as +300000 copies), so the merge dial has more than one
    * segment to compact. Same per-(corpus, mtime) artifact convention
    * as [[bandSegmentDir]]. */
  private val bandSegment2Cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def bandSegment2Dir(s: SparkSession, d: String): String = {
    bandSegment2Cache.computeIfAbsent(s"$d@${docsMtime(d)}", { _ =>
      val dir = Tables.tempRoot("graft-band-seg2")
      val accepted = Tables.documents(s, d).filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 300000L).as("doc_id"), col("text"))
      bandedSignatures(accepted).write.mode("overwrite").parquet(dir)
      dir
    })
  }

  /** The band-index MERGE verb — the compaction analogue d14 left open
    * (upstream SAI merges per-sstable index segments when sstables
    * compact [U index/sai/]; the PQ side's rebuild dial is v22): base +
    * segments are rewritten ONCE into a single artifact, clustered by
    * the probe join key (band, bh) so merged buckets are co-located,
    * and subsequent probes scan ONE leaf instead of a base∪segments
    * union. Rows are identical to the union by construction — the merge
    * moves bytes, never content — so probe(merged) ≡ probe(union); the
    * d16 twin pins that equivalence against DuckDB. */
  def mergeBandIndex(s: SparkSession, dirs: Seq[String],
      out: String): Unit =
    dirs.map(s.read.parquet(_)).reduce(_ unionByName _)
      .repartition(col("band"), col("bh"))
      .write.mode("overwrite").parquet(out)

  private val mergedBandCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def mergedBandIndexDir(s: SparkSession, d: String): String = {
    mergedBandCache.computeIfAbsent(s"$d@${docsMtime(d)}", { _ =>
      val out = Tables.tempRoot("graft-band-merged")
      mergeBandIndex(s, Seq(bandIndexDir(s, d), bandSegmentDir(s, d),
        bandSegment2Dir(s, d)), out)
      out
    })
  }

  /** D16 (L2 cpt — band-index segment COMPACTION): after two accepted
    * batches the standing index holds base + 2 segments; the merge verb
    * compacts them into a new base and a THIRD crawl (%13 docs as
    * +400000 copies) probes the merged artifact alone. The twin runs
    * the same banding over the three-generation corpus union — green
    * means compaction changed the layout and nothing else. */
  def d16_band_merge(s: SparkSession, d: String): DataFrame =
    probeBandIndex(
      s.read.parquet(mergedBandIndexDir(s, d)),
      Tables.documents(s, d).filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 400000L).as("doc_id"), col("text")))

  /** D17 (L2 stream — STREAMING segment ingestion): the continuous-crawl
    * form of d14 — accepted batches arrive as a Structured Streaming file
    * source (`maxFilesPerTrigger = 1`, AvailableNow), and each micro-batch
    * writes its bands as ONE new segment via `foreachBatch` (the per-flush
    * segment rule upstream SAI applies per flushed sstable, here driven by
    * the stream itself). The next crawl probes base ∪ all streamed
    * segments under the merged bucket cap; the twin bands the equivalent
    * batch union, so the whole stream→segment→probe loop is
    * hash-verified. Scale: each micro-batch costs one banding pass over
    * ITS OWN rows (never the corpus), and serve cost is d14's — flat in
    * segment count until d16's merge dial fires. */
  /** D18 (r11): LSH candidate RECALL against exact-Jaccard ground truth
    * — the sketch-quality eval an operator runs before trusting MinHash
    * dedup at corpus scale (v14_recall_eval's dedup-side counterpart;
    * the banding theory's (1-(1-s^r)^b) curve, measured on this corpus).
    * Ground truth: ALL pairs among doc_id < 150 with true 3-gram-shingle
    * Jaccard ≥ 0.1, bucketed by floor(j·10); candidates: d3's banded
    * pairs restricted to the same scope. Reports per-bucket truth and
    * hit counts — recall must rise with similarity, which the gate pins
    * numerically. Scale: ground truth is an EVAL over a bounded sample
    * (all-pairs on 150 docs); the candidates come from the production
    * single-shuffle banding — never all-pairs on the corpus. */
  def d18_lsh_recall(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") < 150)
      .select(col("doc_id"),
        array_distinct(shingles(tokens(col("text")), 3)).as("sh"))
    val truth = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .filter(col("j") >= 0.1)
    val cand = d3Pairs(s, d)
      .filter(col("id_a") < 150 && col("id_b") < 150)
      .withColumn("hit", lit(1L))
    truth.join(cand, Seq("id_a", "id_b"), "left")
      .groupBy(floor(col("j") * 10).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .orderBy("bucket")
  }

  def d17_stream_index(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val (inDir, segRoot) = d17Staged.computeIfAbsent(
      s"$d@${docsMtime(d)}", { _ =>
        val in = java.nio.file.Paths.get(Tables.tempRoot("graft-d17-in"))
        def stage(df: DataFrame, name: String): Unit = {
          val tmp = Tables.tempRoot("graft-d17-w")
          df.coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          Files.copy(part.toPath, in.resolve(name),
            StandardCopyOption.REPLACE_EXISTING)
        }
        val docs = Tables.documents(s, d)
        stage(docs.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text")),
          "crawl1.parquet")
        stage(docs.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 600000L).as("doc_id"), col("text")),
          "crawl2.parquet")
        val segRoot = Tables.tempRoot("graft-d17-seg")
        val ckpt = Tables.tempRoot("graft-d17-ckpt")
        val ss = StreamingQueries.streamSession(s)
        val docSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))
        ss.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", "1").parquet(in.toString)
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                batchId: Long) =>
              bandedSignatures(batch.toDF())
                .write.mode("overwrite").parquet(s"$segRoot/seg_$batchId")
              ()
          }
          .start().awaitTermination()
        (in.toString, segRoot)
      })
    val _ = inDir
    probeBandIndex(
      s.read.parquet(bandIndexDir(s, d))
        .unionByName(s.read.parquet(s"$segRoot/seg_*")),
      Tables.documents(s, d).filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 700000L).as("doc_id"), col("text")))
  }

  private val d17Staged =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def docsMtime(d: String): Long =
    try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$d/documents.parquet")).toMillis
    catch { case _: Exception => 0L }

  /** The deletion segment (doc_ids removed from the corpus), persisted
    * once per (corpus, mtime) beside the other index artifacts. */
  private val d15SegCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def d15DeleteSegDir(s: SparkSession, d: String): String = {
    d15SegCache.computeIfAbsent(s"$d@${docsMtime(d)}", { _ =>
      val out = graft.Tables.tempRoot("graft-band-deletes")
      Tables.documents(s, d).filter(col("doc_id") % 7 === 3)
        .select(col("doc_id")).write.mode("overwrite").parquet(out)
      out
    })
  }


  /** D13 (L2++ bloom-gated incremental exact dedup): dedup an INCOMING
    * batch against the standing corpus WITHOUT shuffling the corpus per
    * batch — the 100 TB-against-petabase shape. The corpus's content
    * hashes fold into ONE distributed Bloom filter (Catalyst
    * `BloomFilterAggregate`, the expression Spark's own runtime-filter
    * injection uses — partial blooms merge on the executors, the driver
    * holds only the final ~1 MB bitset). Incoming rows probe the bloom
    * MAP-SIDE (`BloomFilterMightContain` over `xxhash64`, codegen'd — no
    * UDF, no shuffle), and only the maybe-hits reach the exact semi-join
    * that removes false positives. The bloom affects PERFORMANCE only:
    * the final rows equal the exact join's, so the query hash-matches a
    * plain SQL twin regardless of fpp. Sized for corpus capacity (1 M
    * items here ≈ 0.9 MB; at 10^10 base docs the same shape broadcasts
    * ~12 GB or shards the bloom by hash prefix — SCALE.md). */
  def d13_bloom_incremental(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val docs = Tables.documents(s, d)
    val baseH = docs.select(md5(col("text")).as("h"))
    // incoming: re-crawled exact copies (every 5th doc) + genuinely new
    // content (every 7th doc, text extended) — hits AND misses
    val incoming = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        md5(col("text")).as("h"))
      .unionByName(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          md5(concat(col("text"), lit(" novel"))).as("h")))
    val bloomBytes = baseH.select(GraftShim.column(
        new BloomFilterAggregate(
          GraftShim.expression(xxhash64(col("h"))), 1000000L)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val mightContain = GraftShim.column(new BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      GraftShim.expression(xxhash64(col("h")))))
    incoming.filter(mightContain) // map-side prune: misses never shuffle
      // no distinct() on the build side: left_semi already emits each
      // probe row at most once, and a distinct would shuffle the whole
      // corpus a second time — against the query's own premise
      .join(baseH, Seq("h"), "left_semi") // exact FP removal
      .select(col("doc_id"), col("h"))
      .orderBy("doc_id")
  }

  /** embeddings plus exact copies of every 7th vector (vec_id + 100000) —
    * the semantic-duplicate injection the oracle mirrors (the fixture has no
    * literal embedding duplicates, like the document corpus for d1/d2). */
  private def embWithDups(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    e.unionByName(e.filter(col("vec_id") % 7 === 0)
      .withColumn("vec_id", col("vec_id") + 100000L))
  }

  /** D8 (L2+ semantic dedup, the SemDeDup shape — Abbas et al. 2023,
    * arXiv:2303.09540): assign every embedding to its nearest centroid cell
    * (the IVF codebook of [[VectorQueries.centroids]], broadcast), then drop
    * any vector whose rounded cosine similarity to a LOWER-id vector in the
    * SAME cell exceeds 0.95. One row per cell: totals, drop counts, and the
    * dropped ids (sorted, comma-joined — a string for the driver's gate).
    *
    * Scale shape: codebook broadcast (trained on a sample upstream — here
    * the base table's per-label decimal means, order-independent and thus
    * oracle-able); assignment is map-side against the broadcast; the pair
    * join is an equi-join ON CELL — Σ|cell|² work, never all-pairs, and the
    * cluster count k is the dial that bounds |cell| at corpus scale (the
    * paper's own premise). Declarative drop rule (∃ lower-id near-twin in
    * cell) rather than the greedy sequential sweep: order-free, so it
    * distributes and the DuckDB twin can express it exactly. */
  def d8_semdedup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val cents = broadcast(VectorQueries.centroids(s, d))
    val asg = embWithDups(s, d)
      .crossJoin(cents)
      .withColumn("dist", euclideanFast(col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cell"), col("embedding")),
        struct(col("dist"), col("cell"))).as("a"))
      .select(col("vec_id"), col("a.cell").as("cell"), col("a.embedding").as("v"))
      // the assignment pass (corpus × centroids distances + one min_by
      // shuffle) feeds THREE consumers (both pair sides + the final
      // join); checkpoint it once or the most expensive stage runs 3×
      .localCheckpoint(true)
    val a = asg.select(col("vec_id").as("id_a"), col("cell"), col("v").as("va"))
    val b = asg.select(col("vec_id").as("id_b"), col("cell").as("cb"),
      col("v").as("vb"))
    val dropped = a.join(b, col("cell") === col("cb") && col("id_a") < col("id_b"))
      .filter(round(cosineFast(col("va"), col("vb")), 6) > 0.95)
      .select(col("id_b").as("vec_id")).distinct()
    asg.join(dropped.withColumn("dup", lit(1L)), Seq("vec_id"), "left")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_total"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dropped"),
        concat_ws(",", sort_array(collect_list(
          when(col("dup") === 1L, col("vec_id"))))).as("dropped_ids"))
      .withColumn("n_kept", col("n_total") - col("n_dropped"))
      .select("cell", "n_total", "n_kept", "n_dropped", "dropped_ids")
      .orderBy("cell")
  }

  /** The SemDeDup k dial made explicit (VERDICT r7 task 7): the paper's
    * premise is that the within-cell pair join costs Σ|cell|², so k must
    * GROW with the corpus to hold the mean cell size — and with it the
    * per-cell pair count — constant. `k = ceil(n / targetCellSize)` keeps
    * E[|cell|] = targetCellSize, making the expected join work
    * Σ|cell|² ≈ n · targetCellSize — LINEAR in the corpus for a fixed
    * target (SkewScaleSpec asserts the bound at 1× and 10×). */
  def semdedupK(corpusSize: Long, targetCellSize: Long): Int =
    math.max(1, math.ceil(corpusSize.toDouble / targetCellSize).toInt)

  /** Cell assignment under an explicit-k codebook: the k seeds are the
    * embeddings of the k smallest vec_ids (a deterministic, oracle-able
    * stand-in for k-means++ init — the SemDeDup shape only needs SOME
    * partition of the space whose cells stay bounded). Seeds broadcast
    * (k·dim floats — fine to k ≈ 10⁵; past that, assign via a quantized
    * prefix join instead). Returns (vec_id, cell). */
  def semdedupAssignK(emb: DataFrame, k: Int): DataFrame = {
    import graft.functions.VectorFunctions._
    val seeds = broadcast(emb.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed")))
    emb.crossJoin(seeds)
      .withColumn("dist", euclideanFast(col("embedding"), col("seed")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("seed_id"), struct(col("dist"), col("seed_id")))
        .as("cell"))
  }

  /** Token-gram width of the substring-dedup index (d9). */
  private val GramK = 8

  /** D9 (L2+ exact substring dedup, the span-index shape of Lee et al. 2022,
    * arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    * Better"): index every [[GramK]]-token gram with its position, keep
    * grams occurring ≥ 2 times anywhere in the corpus, and merge each doc's
    * adjacent duplicated positions into maximal spans (gaps-and-islands).
    * One row per affected doc: span count and duplicated token mass.
    *
    * Scale shape: the gram table carries (doc_id, pos, 8-byte hash) — never
    * materialized gram STRINGS (~50 B each at corpus scale); duplicate
    * marking is ONE count-over-window shuffle on the hash (the suffix-array
    * pass of the paper collapses to this for fixed K); span merging is one
    * doc-keyed window — embarrassingly partition-parallel. Gram hash =
    * per-token md5-derived 60-bit hash folded mod p (d3's token-hash
    * convention), so every step is DuckDB-expressible and hash-verified. */
  def d9_substring(s: SparkSession, d: String): DataFrame = {
    val th = col("th")
    def gramHash(i: Column): Column =
      (1 until GramK).foldLeft(element_at(th, i)) { (h, j) =>
        (h * lit(1000003L) + element_at(th, i + lit(j))) % P
      }
    val grams = corpusSpread(s, d)
      .select(col("doc_id"),
        transform(tokens(col("text")), t => mdTokHash(t) % P).as("th"))
      .filter(size(th) >= GramK)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(th) - (GramK - 1)),
        i => struct(i.as("pos"), gramHash(i).as("h")))).as("g"))
      .select(col("doc_id"), col("g.pos"), col("g.h"))
    grams
      .withColumn("nocc", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("nocc") >= 2)
      .withColumn("grp", col("pos") -
        row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy(col("doc_id"), col("grp"))
      .agg((max("pos") - min("pos") + GramK).as("toks"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum("toks").as("dup_tokens"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_exact" -> (d1_exact _),
    "d2_fingerprint" -> (d2_fingerprint _),
    "d3_minhash_lsh" -> (d3_minhash_lsh _),
    "d4_simhash" -> (d4_simhash _),
    "d5_ngram_jaccard" -> (d5_ngram_jaccard _),
    "d6_components" -> (d6_components _),
    "d7_components_lsh" -> (d7_components_lsh _),
    "d10_canonical" -> (d10_canonical _),
    "d8_semdedup" -> (d8_semdedup _),
    "d9_substring" -> (d9_substring _),
    "d11_chunk_dedup" -> (d11_chunk_dedup _),
    "d12_incremental" -> (d12_incremental _),
    "d13_bloom_incremental" -> (d13_bloom_incremental _),
    "d14_band_append" -> (d14_band_append _),
    "d15_band_delete" -> (d15_band_delete _),
    "d16_band_merge" -> (d16_band_merge _),
    "d17_stream_index" -> (d17_stream_index _),
    "d18_lsh_recall" -> (d18_lsh_recall _),
  )

  private val corpusCteBody =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0)""".stripMargin
  private val corpusCte = "WITH " + corpusCteBody

  /** D3's DuckDB twin, generated from the same constants: md5-derived token
    * hash mod p, polynomial shingle hash, 32 Carter-Wegman min-perms, 8×4
    * bands. The band KEY representation differs (string tuple here, xxhash64
    * there) but grouping equality — the only thing the output depends on —
    * is identical. */
  private val d3CandCtes: String = {
    s"""$corpusCteBody,
       |${bandCtes("", "SELECT doc_id, text FROM corpus")},
       |ok AS (SELECT band, key FROM banded GROUP BY band, key
       |       HAVING count(*) BETWEEN 2 AND $MaxBucket),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
       |  FROM banded a
       |  JOIN ok ON ok.band = a.band AND ok.key = a.key
       |  JOIN banded c ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id)""".stripMargin
  }

  // the recall eval's twin: exact-Jaccard truth over the same <150 scope,
  // the SAME banded candidate CTEs, per-bucket LEFT-join counts
  private val d18Oracle: String =
    s"""WITH $d3CandCtes,
       |docs AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(tk) - 1),
       |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |        FROM documents WHERE doc_id < 150)),
       |truth AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
       |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id),
       |scoped AS (
       |  SELECT id_a, id_b FROM cand WHERE id_a < 150 AND id_b < 150)
       |SELECT CAST(floor(j * 10) AS INT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_truth,
       |  CAST(sum(CASE WHEN s.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hit
       |FROM truth t LEFT JOIN scoped s
       |  ON t.id_a = s.id_a AND t.id_b = s.id_b
       |WHERE j >= 0.1
       |GROUP BY bucket ORDER BY bucket""".stripMargin

  private val d3Oracle: String =
    s"""WITH $d3CandCtes
       |SELECT id_a, id_b FROM cand ORDER BY id_a, id_b""".stripMargin

  /** The banding CTE chain for an arbitrary source select, prefix-named so
    * two instances coexist (d12's index side and probe side). Mirrors
    * [[bandedSignatures]] constant-for-constant. */
  private def bandCtes(prefix: String, srcSql: String): String = {
    val mins = (0 until 32).map { i =>
      s"min((h * ${2L * i + 0x9E3779B1L} + ${i * 0x85EBCA77L}) % 2147483647) AS m$i"
    }.mkString(", ")
    val sigArr = (0 until 32).map(i => s"m$i").mkString("[", ", ", "]")
    s"""${prefix}tok AS (SELECT doc_id, list_transform(string_split(lower(text), ' '),
       |    t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647) AS th
       |  FROM ($srcSql)),
       |${prefix}shingle AS (SELECT doc_id,
       |    unnest(list_transform(range(1, len(th) - 1),
       |      i -> ((th[i] * 1000003 + th[i+1]) % 2147483647 * 999983 + th[i+2]) % 2147483647)) AS h
       |  FROM ${prefix}tok WHERE len(th) >= 3),
       |${prefix}sig AS (SELECT doc_id, $mins FROM ${prefix}shingle GROUP BY doc_id),
       |${prefix}banded AS (SELECT doc_id, band,
       |    array_to_string(($sigArr)[(band*4+1):(band*4+4)], ',') AS key
       |  FROM ${prefix}sig CROSS JOIN (SELECT unnest(range(0, 8)) AS band) b)""".stripMargin
  }

  private val d11Oracle: String =
    s"""$corpusCte,
       |tok0 AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
       |  FROM corpus WHERE len(string_split(lower(text), ' ')) >= 1),
       |chunked AS (SELECT doc_id, ci,
       |    toks[(ci*16+1):(ci*16+16)] AS ctoks
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(0,
       |            cast(floor((len(toks) - 1) / 16.0) AS int) + 1)) AS ci
       |        FROM tok0)),
       |hashed AS (SELECT doc_id, ci, len(ctoks) AS n_toks,
       |    md5(array_to_string(ctoks, ' ')) AS h
       |  FROM chunked),
       |ranked AS (SELECT *, row_number() OVER (
       |    PARTITION BY h ORDER BY doc_id, ci) AS rn FROM hashed)
       |SELECT doc_id, count(*) AS n_chunks,
       |  cast(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS bigint) AS n_dup_chunks,
       |  cast(sum(n_toks) AS bigint) AS n_tokens,
       |  cast(sum(CASE WHEN rn > 1 THEN n_toks ELSE 0 END) AS bigint) AS n_dup_tokens
       |FROM ranked GROUP BY doc_id
       |HAVING sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) > 0
       |ORDER BY doc_id""".stripMargin

  private val d12Oracle: String =
    s"""WITH ${bandCtes("i", "SELECT doc_id, text FROM documents")},
       |${bandCtes("n",
         "SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0")},
       |iok AS (SELECT band, key FROM ibanded GROUP BY band, key
       |        HAVING count(*) <= $MaxBucket)
       |SELECT i.doc_id AS idx_id, n.doc_id AS new_id
       |FROM ibanded i
       |JOIN iok ON iok.band = i.band AND iok.key = i.key
       |JOIN nbanded n ON i.band = n.band AND i.key = n.key
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** d12's twin with the deletion mask applied to the index side BEFORE
    * the bucket cap (live entries decide admissibility, mirroring the
    * serve path). */
  private val d15Oracle: String =
    s"""WITH ${bandCtes("i", "SELECT doc_id, text FROM documents")},
       |${bandCtes("n",
         "SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0")},
       |ilive AS (SELECT * FROM ibanded WHERE doc_id % 7 <> 3),
       |iok AS (SELECT band, key FROM ilive GROUP BY band, key
       |        HAVING count(*) <= $MaxBucket)
       |SELECT i.doc_id AS idx_id, n.doc_id AS new_id
       |FROM ilive i
       |JOIN iok ON iok.band = i.band AND iok.key = i.key
       |JOIN nbanded n ON i.band = n.band AND i.key = n.key
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** D7's twin: D3's candidate CTEs verbatim, closed by a recursive CTE —
    * the same closure algebra as D6's twin, over the LSH candidate graph. */
  private val d7Oracle: String =
    s"""WITH RECURSIVE $d3CandCtes,
       |edges AS (SELECT id_a AS src, id_b AS dst FROM cand
       |          UNION SELECT id_b, id_a FROM cand),
       |reach AS (
       |  SELECT src AS a, src AS b FROM edges
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
       |SELECT lbl AS comp_id, count(*) AS n_docs,
       |  string_agg(id::VARCHAR, ',' ORDER BY id) AS members
       |FROM (SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a)
       |GROUP BY lbl ORDER BY comp_id""".stripMargin

  /** D10's twin: d7's label CTE joined with corpus lengths, the same
    * (length desc, id asc) keep window. */
  private val d10Oracle: String =
    s"""WITH RECURSIVE $d3CandCtes,
       |edges AS (SELECT id_a AS src, id_b AS dst FROM cand
       |          UNION SELECT id_b, id_a FROM cand),
       |reach AS (
       |  SELECT src AS a, src AS b FROM edges
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
       |lab AS (SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a),
       |ln AS (SELECT doc_id, len(text) AS n FROM corpus),
       |rk AS (
       |  SELECT lab.lbl, lab.id, row_number() OVER (PARTITION BY lab.lbl
       |    ORDER BY ln.n DESC, lab.id ASC) AS rn
       |  FROM lab JOIN ln ON lab.id = ln.doc_id)
       |SELECT lbl AS comp_id, count(*) AS n_docs,
       |  cast(max(CASE WHEN rn = 1 THEN id END) AS bigint) AS keep_id,
       |  coalesce(string_agg(CASE WHEN rn <> 1 THEN id::VARCHAR END,
       |    ',' ORDER BY id), '') AS dropped_ids
       |FROM rk GROUP BY lbl ORDER BY comp_id""".stripMargin

  /** D4's DuckDB twin: same 60-bit md5-derived sketch, bit-for-bit. */
  private val d4Oracle: String =
    s"""$corpusCte,
       |tok AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM corpus),
       |th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(ts) AS t FROM tok WHERE len(ts) < 32768)),
       |nt AS (SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id),
       |bits AS (SELECT doc_id, j, sum((h >> j) & 1) AS c
       |  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS j) js
       |  GROUP BY doc_id, j),
       |sk AS (SELECT b.doc_id,
       |    cast(sum(CASE WHEN 2 * b.c > nt.n THEN (1::BIGINT << b.j) ELSE 0 END) AS BIGINT) AS sh
       |  FROM bits b JOIN nt ON b.doc_id = nt.doc_id GROUP BY b.doc_id),
       |banded AS (SELECT doc_id, sh, q, (sh >> (15 * q)) & 32767 AS qh
       |  FROM sk CROSS JOIN (SELECT unnest(range(0, 4)) AS q) qs),
       |ok AS (SELECT q, qh FROM banded GROUP BY q, qh
       |       HAVING count(*) BETWEEN 2 AND $MaxBucket)
       |SELECT id_a, id_b, dist FROM (
       |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
       |    cast(bit_count(xor(a.sh, c.sh)) AS int) AS dist
       |  FROM banded a
       |  JOIN ok ON ok.q = a.q AND ok.qh = a.qh
       |  JOIN banded c ON a.q = c.q AND a.qh = c.qh AND a.doc_id < c.doc_id)
       |WHERE dist <= 3 ORDER BY id_a, id_b""".stripMargin

  /** D8's twin: v6's centroid/assignment CTE algebra over the dup-injected
    * corpus, the same cell-scoped pair join, the same rounded-cosine rule. */
  private val d8Oracle: String =
    """WITH emb AS (SELECT vec_id, embedding, label FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, embedding, label FROM embeddings WHERE vec_id % 7 = 0),
      |flat AS (
      |  SELECT label, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) g),
      |cent AS (
      |  SELECT label AS cell, dim,
      |    CAST(CAST(CAST(sum(CAST(x AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS DOUBLE)
      |         / count(*) AS REAL) AS m
      |  FROM flat GROUP BY label, dim),
      |centv AS (SELECT cell, list(CAST(m AS DOUBLE) ORDER BY dim) AS centroid
      |          FROM cent GROUP BY cell),
      |dists AS (
      |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.cell,
      |    list_distance(CAST(e.embedding AS DOUBLE[]), c.centroid) AS dist
      |  FROM emb e CROSS JOIN centv c),
      |asg AS (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY dist, cell) AS rn FROM dists)
      |  WHERE rn = 1),
      |dropped AS (SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
      |    ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE round(list_dot_product(a.v, b.v) /
      |        (sqrt(list_dot_product(a.v, a.v)) *
      |         sqrt(list_dot_product(b.v, b.v))), 6) > 0.95)
      |SELECT cell, count(*) AS n_total,
      |  cast(count(*) - count(d.vec_id) AS bigint) AS n_kept,
      |  cast(count(d.vec_id) AS bigint) AS n_dropped,
      |  coalesce(string_agg(CASE WHEN d.vec_id IS NOT NULL
      |      THEN g.vec_id::VARCHAR END, ',' ORDER BY g.vec_id), '') AS dropped_ids
      |FROM asg g LEFT JOIN dropped d ON g.vec_id = d.vec_id
      |GROUP BY cell ORDER BY cell""".stripMargin

  /** D9's twin: same md5-token poly-fold gram hash (generated from the same
    * constants), duplicate marking by count-over-window, islands by
    * pos − row_number. */
  private val d9Oracle: String = {
    val poly = (1 until GramK).foldLeft("th[i]") { (h, j) =>
      s"(($h) * 1000003 + th[i+$j]) % 2147483647"
    }
    s"""$corpusCte,
       |tok AS (SELECT doc_id, list_transform(string_split(lower(text), ' '),
       |    t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647) AS th
       |  FROM corpus),
       |gram AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(th) - ${GramK - 2}),
       |    i -> {'pos': i, 'h': $poly})) AS u
       |  FROM tok WHERE len(th) >= $GramK)),
       |marked AS (SELECT doc_id, pos,
       |    count(*) OVER (PARTITION BY h) AS nocc FROM gram),
       |isl AS (SELECT doc_id, pos,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM marked WHERE nocc >= 2),
       |spans AS (SELECT doc_id, grp, max(pos) - min(pos) + $GramK AS toks
       |          FROM isl GROUP BY doc_id, grp)
       |SELECT doc_id, count(*) AS n_spans, cast(sum(toks) AS bigint) AS dup_tokens
       |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "d3_minhash_lsh" -> d3Oracle,
    "d18_lsh_recall" -> d18Oracle,
    "d4_simhash" -> d4Oracle,
    "d11_chunk_dedup" -> d11Oracle,
    "d12_incremental" -> d12Oracle,
    "d15_band_delete" -> d15Oracle,
    // base ∪ appended segment as the index side, the second batch as
    // probe — bucket cap over the MERGED index, mirroring the serve path
    "d14_band_append" ->
      s"""WITH ${bandCtes("i",
           """SELECT doc_id, text FROM documents
             |UNION ALL
             |SELECT doc_id + 100000 AS doc_id, text FROM documents
             |WHERE doc_id % 5 = 0""".stripMargin)},
         |${bandCtes("n",
           "SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0")},
         |iok AS (SELECT band, key FROM ibanded GROUP BY band, key
         |        HAVING count(*) <= $MaxBucket)
         |SELECT i.doc_id AS idx_id, n.doc_id AS new_id
         |FROM ibanded i
         |JOIN iok ON iok.band = i.band AND iok.key = i.key
         |JOIN nbanded n ON i.band = n.band AND i.key = n.key
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the merged artifact's rows = the three-generation union's rows;
    // the third crawl probes under the same cap convention
    "d16_band_merge" ->
      s"""WITH ${bandCtes("i",
           """SELECT doc_id, text FROM documents
             |UNION ALL
             |SELECT doc_id + 100000 AS doc_id, text FROM documents
             |WHERE doc_id % 5 = 0
             |UNION ALL
             |SELECT doc_id + 300000 AS doc_id, text FROM documents
             |WHERE doc_id % 11 = 0""".stripMargin)},
         |${bandCtes("n",
           "SELECT doc_id + 400000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0")},
         |iok AS (SELECT band, key FROM ibanded GROUP BY band, key
         |        HAVING count(*) <= $MaxBucket)
         |SELECT i.doc_id AS idx_id, n.doc_id AS new_id
         |FROM ibanded i
         |JOIN iok ON iok.band = i.band AND iok.key = i.key
         |JOIN nbanded n ON i.band = n.band AND i.key = n.key
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // streamed segments ≡ the batch union: the stream moved the bytes,
    // banding and cap semantics are identical
    "d17_stream_index" ->
      s"""WITH ${bandCtes("i",
           """SELECT doc_id, text FROM documents
             |UNION ALL
             |SELECT doc_id + 500000 AS doc_id, text FROM documents
             |WHERE doc_id % 4 = 0
             |UNION ALL
             |SELECT doc_id + 600000 AS doc_id, text FROM documents
             |WHERE doc_id % 9 = 0""".stripMargin)},
         |${bandCtes("n",
           "SELECT doc_id + 700000 AS doc_id, text FROM documents WHERE doc_id % 6 = 0")},
         |iok AS (SELECT band, key FROM ibanded GROUP BY band, key
         |        HAVING count(*) <= $MaxBucket)
         |SELECT i.doc_id AS idx_id, n.doc_id AS new_id
         |FROM ibanded i
         |JOIN iok ON iok.band = i.band AND iok.key = i.key
         |JOIN nbanded n ON i.band = n.band AND i.key = n.key
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the bloom is performance-only: final rows = the exact semi-join
    "d13_bloom_incremental" ->
      """WITH base AS (SELECT md5(text) AS h FROM documents),
        |inc AS (
        |  SELECT doc_id + 100000 AS doc_id, md5(text) AS h
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 200000 AS doc_id, md5(text || ' novel') AS h
        |  FROM documents WHERE doc_id % 7 = 0)
        |SELECT doc_id, h FROM inc WHERE h IN (SELECT h FROM base)
        |ORDER BY doc_id""".stripMargin,
    "d1_exact" ->
      s"""$corpusCte
        |SELECT count(*) AS n_total,
        |  cast(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS bigint) AS n_kept,
        |  cast(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS bigint) AS n_dropped
        |FROM (SELECT row_number() OVER (PARTITION BY md5(text)
        |        ORDER BY doc_id) AS rn FROM corpus)""".stripMargin,
    "d2_fingerprint" ->
      s"""$corpusCte
        |SELECT min(doc_id) AS keeper, count(*) AS cluster_size
        |FROM (SELECT doc_id,
        |        md5(array_to_string(list_sort(list_distinct(
        |          string_split(lower(text), ' '))), ' ')) AS fp
        |      FROM corpus)
        |GROUP BY fp HAVING count(*) > 1 ORDER BY keeper""".stripMargin,
    "d5_ngram_jaccard" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, len(string_split(lower(text),' ')) - 1),
        |      i -> string_split(lower(text),' ')[i] || ' ' ||
        |           string_split(lower(text),' ')[i+1] || ' ' ||
        |           string_split(lower(text),' ')[i+2])) AS sh
        |  FROM documents WHERE doc_id < 150)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |          len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        |  FROM docs a JOIN docs b ON a.source = b.source AND a.doc_id < b.doc_id)
        |WHERE jaccard > 0.01 ORDER BY id_a, id_b""".stripMargin,
    // Same D5 edges (doc_id < 300), transitive closure by recursive CTE,
    // component id = min reachable doc_id — the twin of the distributed
    // min-label fixpoint.
    "d6_components" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, len(string_split(lower(text),' ')) - 1),
        |      i -> string_split(lower(text),' ')[i] || ' ' ||
        |           string_split(lower(text),' ')[i+1] || ' ' ||
        |           string_split(lower(text),' ')[i+2])) AS sh
        |  FROM documents WHERE doc_id < 300),
        |pairs AS (
        |  SELECT src, dst FROM (
        |    SELECT a.doc_id AS src, b.doc_id AS dst,
        |      len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        len(list_distinct(list_concat(a.sh, b.sh))) AS j
        |    FROM docs a JOIN docs b
        |      ON a.source = b.source AND a.doc_id < b.doc_id)
        |  WHERE j > 0.01),
        |edges AS (SELECT src, dst FROM pairs
        |          UNION SELECT dst, src FROM pairs),
        |reach AS (
        |  SELECT src AS a, src AS b FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
        |SELECT lbl AS comp_id, count(*) AS n_docs,
        |  string_agg(id::VARCHAR, ',' ORDER BY id) AS members
        |FROM (SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a)
        |GROUP BY lbl ORDER BY comp_id""".stripMargin,
    "d7_components_lsh" -> d7Oracle,
    "d10_canonical" -> d10Oracle,
    "d8_semdedup" -> d8Oracle,
    "d9_substring" -> d9Oracle,
  )

}
