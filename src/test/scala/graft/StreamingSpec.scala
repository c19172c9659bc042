package graft

import graft.streaming.StreamingPipelines
import graft.operators.StreamingQueries
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

class StreamingSpec extends SparkSpec {

  /** Stage the single-file events parquet into a directory (the file stream
    * source consumes directories). */
  private lazy val stagedDir: String = {
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("eventsStream constructs on an empty dir (declared-schema fallback)") {
    // the footer probe can't read an empty staging dir — construction must
    // fall back to the declared schema instead of throwing (the pre-probe
    // behavior), so a stream can be opened before the first file lands
    val empty = Files.createTempDirectory("graft-stream-empty").toString
    val df = StreamingPipelines.eventsStream(spark, empty)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.contains("ts"))
  }

  test("streaming hourly tumble (AvailableNow) equals the batch twin") {
    val stream = StreamingPipelines.eventsStream(spark, stagedDir)
    StreamingPipelines.runToMemory(
      StreamingPipelines.hourlyCounts(stream), "t1_stream", "complete")
    val streamed = spark.table("t1_stream")
      .orderBy("win_start", "event_type")
      .collect().toSeq
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))
      .orderBy("win_start", "event_type")
      .collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup-within-watermark emits each event_id once") {
    val stream = StreamingPipelines.eventsStream(spark, stagedDir)
    StreamingPipelines.runToMemory(
      StreamingPipelines.dedupStream(stream), "t5_stream", "append")
    val n = spark.table("t5_stream").count()
    val distinctIds = Tables.events(spark, sf)
      .select("event_id").distinct().count()
    assert(n === distinctIds)
  }

  test("t13's staged dup stream actually carries duplicates (guard: the " +
    "gate row cannot pass vacuously)") {
    // the staged dir = fixture + %5 copies in-file + %3 copies cross-file;
    // WITHOUT dedup the stream must emit strictly more rows than the fixture
    val dupDir = graft.operators.StreamingQueries.stageDupEventsForTest(
      spark, sf)
    val staged = spark.read.parquet(dupDir)
    val base = Tables.events(spark, sf)
    assert(staged.count() > base.count())
    // and every staged row is an exact fixture copy: dedup's keeper choice
    // cannot affect the emitted set
    assert(staged.select("event_id").distinct().count() === base.count())
  }

  test("T8 stream-stream interval join equals the batch interval join") {
    val stream = StreamingPipelines.eventsStream(spark, stagedDir)
    StreamingPipelines.runToMemory(
      StreamingPipelines.clickToPurchase(stream), "t8_stream", "append")
    val streamed = spark.table("t8_stream")
      .orderBy("user_id", "click_id", "purchase_id").collect().toSeq
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val batch = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("c_ts"), col("p_ts"))
      .orderBy("user_id", "click_id", "purchase_id").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty, "fixture must produce click→purchase pairs")
  }

  test("T8b LEFT OUTER stream-stream join: inner rows match batch; nulls are true non-conversions") {
    val stream = StreamingPipelines.eventsStream(spark, stagedDir)
    StreamingPipelines.runToMemory(
      StreamingPipelines.clickToPurchaseOuter(stream), "t8b_stream", "append")
    val streamed = spark.table("t8b_stream")
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val batchOuter = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("c_ts"), col("p_ts"))
    // matched rows emit immediately — identical to the batch inner result
    assert(streamed.filter(col("purchase_id").isNotNull)
        .orderBy("user_id", "click_id", "purchase_id").collect().toSeq ===
      batchOuter.filter(col("purchase_id").isNotNull)
        .orderBy("user_id", "click_id", "purchase_id").collect().toSeq)
    // null rows emit only once the watermark CLOSES a click's window, so
    // the stream may withhold tail clicks the batch reports — but it must
    // never fabricate a null for a click that actually converted
    val streamedNulls = streamed.filter(col("purchase_id").isNull)
      .select("click_id").collect().map(_.getLong(0)).toSet
    val batchNulls = batchOuter.filter(col("purchase_id").isNull)
      .select("click_id").collect().map(_.getLong(0)).toSet
    assert(streamedNulls.subsetOf(batchNulls),
      "no false non-conversions (correct-by-watermark, not by timeout)")
    assert(streamedNulls.nonEmpty,
      "watermark-closed windows must emit their abandoned clicks")
  }

  test("T6 transformWithState: final per-user running totals equal the batch aggregate") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = StreamingPipelines.eventsStream(spark, stagedDir)
      StreamingPipelines.runToMemory(
        StreamingPipelines.runningTotals(stream).toDF(), "t6_stream", "update")
      // update mode may emit one snapshot per batch; the LAST per user must
      // equal the batch truth (single batch here → exactly one emission)
      val streamed = spark.table("t6_stream")
        .groupBy("user_id")
        .agg(max(col("n_events")).as("n_events"))
      val batch = Tables.events(spark, sf)
        .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("incremental MV maintenance: watermarked window agg appends finalized buckets to parquet") {
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft-mv")
    val out = s"$base/mv"; val ckpt = s"$base/ckpt"
    val q = StreamingPipelines.hourlyCounts(
        StreamingPipelines.eventsStream(spark, stagedDir))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append") // append = emit each window once, when finalized
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val mv = spark.read.parquet(out)
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))
    // every emitted MV row is exactly a batch row (windows past the
    // watermark; the tail window stays pending until more data arrives)
    assert(mv.count() > 0)
    assert(mv.exceptAll(batch).count() === 0)
  }

  test("MV maintenance RESUMES over a grown source: the checkpointed " +
    "second run appends only newly-closed windows, never recomputing " +
    "or duplicating history (t17's scale claim)") {
    val base = Files.createTempDirectory("graft-mv-resume")
    val src = s"$base/src"; val out = s"$base/mv"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))
    // generation 1: the fixture's first half by event_id parity proxy —
    // written from the RAW read so the staged footer type matches
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val half = raw.count() / 2
    // a TOTAL order (ts, event_id) so limit/offset split ties identically
    // — the two generations must partition the fixture exactly
    val sorted = raw.orderBy("ts", "event_id")
    sorted.limit(half.toInt)
      .coalesce(1).write.mode("overwrite").parquet(s"$base/g1")
    sorted.offset(half.toInt)
      .coalesce(1).write.mode("overwrite").parquet(s"$base/g2")
    def stage(gen: String, as: String): Unit =
      scala.util.Using.resource(Files.list(Paths.get(s"$base/$gen"))) {
        _.filter(_.toString.endsWith(".parquet"))
          .forEach(p => { Files.copy(p, Paths.get(s"$src/$as")); () })
      }
    stage("g1", "b0.parquet")
    def run(): Unit =
      StreamingPipelines.runToParquet(
        StreamingPipelines.hourlyRollup(
          StreamingPipelines.eventsStream(spark, src)), out, ckpt)
    run()
    val mv1 = spark.read.parquet(out).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(mv1.nonEmpty)
    // generation 2: the disjoint second half arrives as a second file
    // (its rows strictly extend the timeline past gen 1's pending tail)
    stage("g2", "b1.parquet")
    run()
    val mv2rows = spark.read.parquet(out).collect()
      .map(r => ((r.getTimestamp(0), r.getString(1)), r.getLong(2))).toSeq
    // no window key emitted twice — the checkpoint resumed; a history
    // recompute would re-append every gen-1 window
    assert(mv2rows.map(_._1).distinct.size === mv2rows.size,
      "resumed run must not duplicate previously-closed windows")
    assert(mv2rows.size > mv1.size, "new closed windows must append")
    // the grown MV still matches first-principles: every closed-window
    // row equals the batch aggregate over the full source
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,6)")).cast("decimal(38,6)")
          .cast("double").as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
    assert(spark.read.parquet(out).exceptAll(batch).count() === 0,
      "every resumed MV row must equal its batch re-derivation")
  }

  test("checkpointed dedup stream survives restarts: duplicate files add zero rows, new keys append") {
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft-ckpt")
    val in = base.resolve("in"); Files.createDirectory(in)
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    Files.copy(Paths.get(s"$sf/events.parquet"), in.resolve("f1.parquet"))

    def runOnce(): Unit = {
      val q = StreamingPipelines.eventsStream(spark, in.toString)
        .dropDuplicates("event_id")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val n = Tables.events(spark, sf).count()

    runOnce()
    assert(spark.read.parquet(out).count() === n)

    // restart with a byte-identical second file: dedup state was
    // checkpointed, so nothing new is emitted
    Files.copy(Paths.get(s"$sf/events.parquet"), in.resolve("f2.parquet"))
    runOnce()
    assert(spark.read.parquet(out).count() === n)

    // restart with genuinely new keys: exactly those append. Transform a RAW
    // read so the appended file keeps the fixture's physical ts type (the
    // stream's probed schema must match every file in the dir).
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("event_id", col("event_id") + 10000000L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(in.toString)
    runOnce()
    assert(spark.read.parquet(out).count() === 2 * n)
    assert(spark.read.parquet(out).select("event_id").distinct().count() === 2 * n)
  }

  test("streaming upsert sink: incremental grace-compacted flushes equal the batch view") {
    import graft.operators.CassandraModel
    val log = CassandraModel.upsertLog(spark, sf)
    val inDir = Files.createTempDirectory("graft-upsert-in")
    val snapDir = Files.createTempDirectory("graft-upsert-out").toString + "/snap"
    val ckpt = Files.createTempDirectory("graft-upsert-ckpt").toString
    // two arrival waves: versions {0,2} land first, then {1} — so wave 2
    // delivers writes OLDER than wave-1 tombstones (the zombie hazard);
    // the reconcile is commutative, so any split must converge the same
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-upsert-w").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, inDir.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    stage(log.filter(col("v") =!= 1), "w1.parquet")
    stage(log.filter(col("v") === 1), "w2.parquet")
    val writes = spark.readStream.schema(log.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
    StreamingPipelines.upsertSink(writes, snapDir, ckpt,
      nowWt = 1009L, graceWt = 2000L).awaitTermination()
    val snap = spark.read.parquet(snapDir)
    val cols = Seq("pk", "price", "status", "_writetime", "v")
    val live = snap.filter(!col("_deleted"))
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val expect = CassandraModel.latestWinsView(log)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(live === expect,
      "two incremental flushes must converge to the batch latest-wins view")
    // every key whose WINNER is a tombstone survives as a retained marker
    // (grace covers the whole writetime domain here)
    val nKeys = log.select("pk").distinct().count()
    assert(snap.filter(col("_deleted")).count() === nKeys - live.size,
      "winning tombstones must be retained as markers, not purged")
  }

  test("batch session windows match the gaps-and-islands formulation") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val gi = Tables.events(spark, sf)
      .filter(col("user_id") < 30)
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) >= 30L * 60 * 1000000, 1)
        .otherwise(0))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "n_events")
    val sw = StreamingQueries.t3_session(spark, sf)
      .select("user_id", "session_start", "n_events")
    assert(sw.exceptAll(gi).count() === 0)
    assert(gi.exceptAll(sw).count() === 0)
  }
}
