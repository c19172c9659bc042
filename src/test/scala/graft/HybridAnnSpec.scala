package graft

import graft.operators.HybridAnn
import graft.operators.HybridAnn.AnnStats
import org.apache.spark.sql.functions._

/** The SAI-style hybrid ANN planner: the pure cost decision, the stats
  * probe, and that each declared query takes the arm its selectivity
  * demands — with the plan shape to prove it. */
class HybridAnnSpec extends SparkSpec {

  test("decide: selective predicates pre-filter, permissive ones post-filter") {
    // 10% predicate over 500 rows: score 50 exact vs scan 31 + consume 100
    assert(HybridAnn.decide(10, AnnStats(500, 0.10)))
    // 90% predicate: score 450 exact vs scan 31 + consume 11
    assert(!HybridAnn.decide(10, AnnStats(500, 0.90)))
    // degenerate zero-selectivity probe must not divide by zero
    assert(HybridAnn.decide(10, AnnStats(500, 0.0)))
    // huge corpus, same selectivity: the n·sel term dominates → post-filter
    assert(!HybridAnn.decide(10, AnnStats(1000000000L, 0.10)))
  }

  test("probeStats measures the fixture's label selectivity from a key range") {
    val emb = Tables.embeddings(spark, sf)
    val sel = HybridAnn.probeStats(emb, col("label") === 3)
    val permissive = HybridAnn.probeStats(emb, col("label") =!= 3)
    assert(sel.rows === emb.count())
    assert(sel.selectivity > 0.0 && sel.selectivity < 0.3,
      s"label=3 should probe selective, got ${sel.selectivity}")
    assert(permissive.selectivity > 0.7,
      s"label!=3 should probe permissive, got ${permissive.selectivity}")
    assert(math.abs(sel.selectivity + permissive.selectivity - 1.0) < 1e-9)
  }

  test("v9 takes the pre-filter arm: pushed predicate + distributed top-k") {
    val stats = HybridAnn.probeStats(
      Tables.embeddings(spark, sf), col("label") === 3)
    assert(HybridAnn.decide(10, stats), "selective predicate must pre-filter")
    val df = HybridAnn.prefilterKnn(spark, sf, col("label") === 3, 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"exact top-k must not global-sort:\n$plan")
    // when another suite has cached the table, the filter pushes into the
    // InMemoryTableScan instead of the parquet scan — both are the pushed
    // shape this test pins
    assert(plan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]")
        || plan.matches("(?s).*InMemoryTableScan.*\\(label#\\d+ = 3\\).*"),
      s"the predicate must reach the scan:\n$plan")
    assert(df.collect().forall(_.getInt(1) === 3))
  }

  test("knnHybrid routes by decide(): selective pre arm, permissive post arm") {
    // plan shape identifies the arm: pre-filter = pushed predicate +
    // broadcast query vector (nested-loop); post-filter = bucket equi-join
    val pre = HybridAnn.knnHybrid(spark, sf, col("label") === 3, 10)
      .queryExecution.executedPlan.toString
    assert(pre.contains("BroadcastNestedLoopJoin"),
      s"selective predicate must route to the pre-filter arm:\n$pre")
    val post = HybridAnn.knnHybrid(spark, sf, col("label") =!= 3, 10)
      .queryExecution.executedPlan.toString
    assert(post.contains("BroadcastHashJoin") ||
      post.contains("SortMergeJoin"),
      s"permissive predicate must route to the bucket equi-join arm:\n$post")
  }

  test("v10 takes the post-filter arm and its candidates come from ONE bucket") {
    val stats = HybridAnn.probeStats(
      Tables.embeddings(spark, sf), col("label") =!= 3)
    assert(!HybridAnn.decide(10, stats), "permissive predicate must post-filter")
    val post = HybridAnn.postfilterKnn(spark, sf, col("label") =!= 3, 10)
    val rows = post.collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(1) !== 3))
    // post-filter results are a subset of the bucket's unfiltered candidates
    val bucketIds = HybridAnn.postfilterKnn(spark, sf, lit(true), 1000)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).forall(bucketIds))
  }

  test("multi-probe widens the candidate set monotonically toward exact") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    val one = ids(HybridAnn.postfilterKnnMultiprobe(spark, sf, lit(true), 1000, 1))
    val three = ids(HybridAnn.postfilterKnnMultiprobe(spark, sf, lit(true), 1000, 3))
    val all = ids(HybridAnn.prefilterKnn(spark, sf, lit(true), 100000))
    assert(one.subsetOf(three), "probing more buckets never loses candidates")
    assert(three.subsetOf(all))
    assert(three.size > one.size, "hamming-adjacent buckets add candidates")
    // 1-probe equals the plain post-filter arm
    assert(one === ids(HybridAnn.postfilterKnn(spark, sf, lit(true), 1000)))
  }

  test("the two arms agree whenever the bucket holds the true top-k") {
    // With the always-true predicate the post-filter arm is plain bucketed
    // ANN; every id it returns must score no better than the exact arm's
    // k-th result (the standard ANN recall bound sanity check).
    val exact = HybridAnn.prefilterKnn(spark, sf, lit(true), 10)
      .collect().map(r => r.getDouble(2)).min
    val approx = HybridAnn.postfilterKnn(spark, sf, lit(true), 10)
      .collect().map(r => r.getDouble(2)).max
    assert(approx <= HybridAnn.prefilterKnn(spark, sf, lit(true), 1)
      .collect().head.getDouble(2) + 1e-12,
      "no candidate can beat the exact top-1")
    assert(exact <= approx + 1.0, "scores are on the same [-1,1] scale")
  }
}
