package graft

import org.apache.spark.sql.functions._
import graft.operators.RelationalQueries

/** a15's incremental maintenance (r16): new part files fold into the
  * standing pricing MV instead of a full rebuild, bit-for-bit equal to
  * rebuilding from scratch; rewritten/removed inputs (compaction) force
  * the full path. The probe counter (`a15LastBuild`) pins WHICH path ran
  * — an incremental claim that silently rebuilt would otherwise pass. */
class A15IncrementalSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  /** A corpus dir whose lineitem is a multi-file directory (the fixture
    * is a single file; the ingest shape under maintenance is segments). */
  private def stageCorpus(nParts: Int): String = {
    val dir = Tables.tempRoot("graft-a15-spec")
    Tables.lineitem(spark, src).repartition(nParts)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def serveRows(d: String): Seq[String] =
    RelationalQueries.a15_mv_pricing(spark, d).collect().map(_.toString).toSeq

  test("append-only ingest takes the incremental path and serves " +
    "bit-for-bit what a full rebuild serves") {
    val d = stageCorpus(4)
    val first = serveRows(d)
    assert(RelationalQueries.a15LastBuild.get() === "full")
    // unchanged inputs: pure serve, no rebuild
    val again = serveRows(d)
    assert(RelationalQueries.a15LastBuild.get() === "serve")
    assert(again === first)
    // new segments land (orderkeys shifted so the fold isn't a no-op on
    // any group): the standing MV must fold ONLY the new files
    Tables.lineitem(spark, src)
      .filter(col("l_orderkey") % 3 === 0)
      .withColumn("l_quantity", col("l_quantity") + lit(1.0))
      .repartition(2)
      .write.mode("append").parquet(s"$d/lineitem.parquet")
    val incr = serveRows(d)
    assert(RelationalQueries.a15LastBuild.get() === "incremental")
    // reference: the SAME total row set built in one shot in a fresh dir
    val ref = Tables.tempRoot("graft-a15-spec-ref")
    spark.read.parquet(s"$d/lineitem.parquet")
      .write.mode("overwrite").parquet(s"$ref/lineitem.parquet")
    val full = serveRows(ref)
    assert(RelationalQueries.a15LastBuild.get() === "full")
    assert(incr === full, "incremental fold diverged from full rebuild")
    assert(incr !== first, "the appended segments must change the summary")
  }

  test("a rewritten input file (compaction) forces the full path") {
    val d = stageCorpus(3)
    serveRows(d)
    assert(RelationalQueries.a15LastBuild.get() === "full")
    val before = serveRows(d)
    assert(RelationalQueries.a15LastBuild.get() === "serve")
    // rewrite one folded part file byte-identically: size equal, mtime
    // moves — the inventory no longer matches, and subset fails
    val parts = new java.io.File(s"$d/lineitem.parquet").listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    val f = parts.head.toPath
    val bytes = java.nio.file.Files.readAllBytes(f)
    Thread.sleep(1100) // mtime granularity can be 1s on some filesystems
    java.nio.file.Files.write(f, bytes)
    val after = serveRows(d)
    assert(RelationalQueries.a15LastBuild.get() === "full")
    assert(after === before, "same bytes must serve the same summary")
  }

  test("r16-advice: a previously returned lazy DataFrame pins ITS " +
    "generation across a refresh — the swap repoints, never deletes the " +
    "serving generation") {
    val d = stageCorpus(2)
    // returned but NOT collected: the plan pins the gen-1 directory
    val lazyDf = RelationalQueries.a15_mv_pricing(spark, d)
    val firstGen = RelationalQueries.a15_mv_pricing(spark, d)
      .collect().map(_.toString).toSeq
    // a refresh lands (new segment → incremental fold → pointer repoint)
    Tables.lineitem(spark, src)
      .filter(col("l_orderkey") % 4 === 0)
      .withColumn("l_quantity", col("l_quantity") + lit(2.0))
      .repartition(1)
      .write.mode("append").parquet(s"$d/lineitem.parquet")
    val secondGen = serveRows(d)
    assert(RelationalQueries.a15LastBuild.get() === "incremental")
    assert(secondGen !== firstGen)
    // the OLD DataFrame still reads its own (retained) generation —
    // with the old delete-then-rename swap this read hit a missing dir
    // or silently served the newer generation
    assert(lazyDf.collect().map(_.toString).toSeq === firstGen,
      "a pre-refresh DataFrame must keep serving its own generation")
  }
}
