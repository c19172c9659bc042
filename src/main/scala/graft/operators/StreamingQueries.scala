package graft.operators

import graft.{Tables, Q}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** SURVEY §2.9 — batch twins of the streaming surface (T1–T3, T5). The same
  * transformations run as true Structured Streaming in
  * [[graft.streaming.StreamingPipelines]] (verified stream-vs-batch in
  * StreamingSpec); these batch declarations are the oracle-checkable face.
  *
  * Scale: tumbling/sliding windows are pure map + one agg shuffle keyed by
  * (window, type) — at 100 TB the watermark bounds state, and the batch twin
  * partitions by day. Session windows shuffle once by user.
  */
object StreamingQueries {
  import Q.{dec6, dbl}

  /** T1: hourly tumbling window — count + sum per (hour, event_type).
    * Batch path groups on `date_trunc` rather than `window()`: for an
    * epoch-aligned tumbling width the two keys are IDENTICAL values, but
    * the struct(start,end) group key costs a measured ~12% at sf10 (r9
    * BenchFocus: 0.419 → 0.369 s at 10M events) — pure key-width overhead
    * in the shuffle. The STREAMING twin `t8_stream_tumbling` keeps
    * `window()`, which watermark eviction actually needs. */
  def t1_tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dbl(dec6(sum(dec6(col("value"))))).as("sum_value"))
      .orderBy("win_start", "event_type")

  /** T2: sliding window 1h/15m — each event lands in 4 windows. */
  def t2_sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))
      .filter(col("event_type") === "purchase")
      .orderBy("win_start", "event_type")

  /** T3: session windows (30-min gap) per user — session start, size, span.
    * `session_window` works in batch mode; the DuckDB twin is the classic
    * gaps-and-islands formulation. */
  def t3_session(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        dbl(dec6(sum(dec6(col("value"))))).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("sum_value"))
      .filter(col("user_id") < 30)
      .orderBy("user_id", "session_start")

  /** T5: stateful dedup twin — first event per (user_id, event_type, day)
    * in (ts, event_id) order, i.e. dropDuplicatesWithinWatermark's batch
    * semantics with a deterministic keeper. */
  def t5_dedup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("user_id") < 20)
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("day"), col("event_id"))
      .orderBy("user_id", "event_type", "day")
  }

  /** T9: gap-fill / resample — the dense-grid op every time-series store
    * bolts onto sparse events (upstream has no analogue; InfluxDB/Timescale
    * `time_bucket_gapfill`): per user (< 20), an hourly grid spanning the
    * user's own [min, max] bucket, actual per-bucket sums left-joined in,
    * missing hours emitted with n = 0 and the last seen sum carried
    * forward (`last(_, ignoreNulls)` over an unbounded-preceding frame).
    * Scale: the grid generates ~rows×avg_gap cells map-side via
    * `sequence` (no join against a calendar table), then ONE shuffle on
    * user_id shared by the join and the fill window. */
  def t9_gapfill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id") < 20)
      .withColumn("bucket", date_trunc("hour", col("ts")))
    val actual = ev.groupBy(col("user_id"), col("bucket"))
      .agg(count(lit(1)).as("n"), dec6(sum(dec6(col("value")))).as("sv"))
    val grid = ev.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 HOUR"))).as("bucket"))
    val w = Window.partitionBy("user_id").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(actual, Seq("user_id", "bucket"), "left")
      .select(col("user_id"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(last(col("sv"), ignoreNulls = true).over(w).cast("double"), 6)
          .as("filled_sum"))
      .orderBy("user_id", "bucket")
  }

  /** T8 — the TRUE streaming executor inside the driver's hash gate (the
    * streaming rows were spec-only before): stage the events fixture into
    * a file-source dir, run the watermarked hourly tumbling pipeline to
    * completion (Trigger.AvailableNow) into a memory sink, and return the
    * sink's table. The DuckDB twin is the plain batch aggregation — so
    * the file stream source, watermark bookkeeping, streaming state
    * store, and sink commit protocol all sit inside the row/hash compare.
    * Unique sink name per call: bench/verify invoke queries repeatedly in
    * one session. */
  def t8_stream_tumbling(s: SparkSession, d: String): DataFrame = {
    val name = s"t8_sink_${System.nanoTime()}"
    val ss = streamSession(s)
    graft.streaming.StreamingPipelines.runToMemory(
      graft.streaming.StreamingPipelines.hourlyCounts(
        graft.streaming.StreamingPipelines.eventsStream(ss, stageEvents(d))),
      name, "complete")
    ss.table(name).orderBy("win_start", "event_type")
  }

  /** Streaming state-store count equals the stream's shuffle-partition
    * count (per stateful operator, per side for joins), and each store
    * pays per-batch snapshot/commit maintenance regardless of data volume.
    * The session's batch setting (the core count — sized for the
    * relational suite) is far too many stores for the fixture stream, and
    * the per-store fixed cost dominates the gate queries. Sizing
    * partitions to stream VOLUME is exactly what a production deployment
    * does with the SAME conf (guide §2.2: partitions in the 100 MB–1 GB
    * range — the staged fixture stream is ~2 MB total, so even n = 1
    * would hold; n = 4 keeps the stateful operators exercising real
    * multi-partition state). r17 A/B at 32 cores, same window, warm
    * min-of-5: n=8 → n=4 wins on EVERY gate stream — t10 3.55 → 2.55 s,
    * t13 1.55 → 1.31, t8 1.27 → 1.09, t12/t11/c13 −0.1 s each — because
    * the per-batch fixed cost is per-store, not per-row. Derived from
    * stream volume, not host cores: the value is identical at any
    * SPARK_GRAFT_CPUS, so the driver's core-scaling bench is untouched.
    * Applied on a cloned per-stream session so the shared session's
    * batch setting is never touched. */
  private[operators] def streamSession(s: SparkSession, n: Int = 4)
      : SparkSession = {
    // a CLONED session (shared context, private conf): mutating the shared
    // session's conf — even set/restore — leaked the stream sizing into
    // any batch query planned concurrently (the parallel suites this file
    // supports). The clone dies with the stream; nothing to restore.
    val ss = s.newSession()
    Seq("spark.sql.session.timeZone",
        "spark.sql.legacy.parquet.nanosAsLong").foreach { k =>
      s.conf.getOption(k).foreach(ss.conf.set(k, _))
    }
    ss.conf.set("spark.sql.shuffle.partitions", n.toString)
    ss
  }

  /** Stage the events fixture as a single file-source dir (ONE file → ONE
    * micro-batch, so no cross-batch watermark drops and the run is
    * deterministic). Shared by the true-streaming gate queries. Cached per
    * (source dir, JVM): bench/verify call each gate query repeatedly in one
    * session and re-copying the fixture per call was 22% of the r7 suite —
    * the streamed BYTES are identical either way, so the gate semantics
    * (file source, watermark, state store, sink commit) are untouched. */
  private val stagedEvents =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stageEvents(d: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // mtime in the key (same rule as the index caches): a regenerated
    // fixture must re-stage, or the stream side would aggregate old rows
    // while the batch twin reads the new ones
    val mtime = try Files.getLastModifiedTime(
        Paths.get(s"$d/events.parquet")).toMillis
      catch { case _: Exception => 0L }
    stagedEvents.computeIfAbsent(s"$d@$mtime", { _ =>
      val dir = Paths.get(graft.Tables.tempRoot("graft-stream"))
      val src = Paths.get(s"$d/events.parquet")
      // the fixture is ONE file in driver-generated dirs but a DIRECTORY
      // of part files for scaled probe fixtures — a shallow Files.copy of
      // a directory stages an empty dir and the stream reads NOTHING
      // (caught in r13: the asymptote fixture silently fed t17 an empty
      // MV). Stage every part file; still one AvailableNow batch.
      if (Files.isDirectory(src)) {
        import scala.jdk.CollectionConverters._
        // Files.list returns a Stream holding a directory handle — close
        // it (r13 advisor: the unclosed stream leaked one fd per staging)
        scala.util.Using.resource(Files.list(src)) { st =>
          st.iterator().asScala
            .filter(p => p.getFileName.toString.endsWith(".parquet"))
            .zipWithIndex.foreach { case (p, i) =>
              Files.copy(p, dir.resolve(f"part-$i%05d.parquet"),
                StandardCopyOption.REPLACE_EXISTING)
            }
        }
      } else
        Files.copy(src, dir.resolve("part-0.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      dir.toString
    })
  }

  /** Staged dir for [[t13_stream_dedup]]: the events fixture PLUS exact-copy
    * duplicates, split so both dedup regimes are exercised — `b0.parquet`
    * carries the full fixture with the event_id%5 subset doubled inside the
    * SAME file (intra-batch dedup), `b1.parquet` is a whole second file of
    * event_id%3 copies (cross-batch dedup through the watermark state
    * store under maxFilesPerTrigger=1). Files are written from the RAW
    * fixture read so every staged file shares the fixture's physical ts
    * type (eventsStream probes one footer for the whole dir). Cached per
    * (source dir, fixture mtime), same rule as [[stageEvents]]. */
  private val stagedDupEvents =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stageDupEvents(s: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val mtime = try Files.getLastModifiedTime(
        Paths.get(s"$d/events.parquet")).toMillis
      catch { case _: Exception => 0L }
    stagedDupEvents.computeIfAbsent(s"$d@$mtime", { _ =>
      val dir = Paths.get(graft.Tables.tempRoot("graft-stream-dup"))
      val raw = s.read.parquet(s"$d/events.parquet")
      def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val tmp = graft.Tables.tempRoot("graft-stream-dup-w")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.copy(part.toPath, dir.resolve(name),
          StandardCopyOption.REPLACE_EXISTING)
        ()
      }
      stage(raw.unionAll(raw.filter(col("event_id") % 5 === 0)), "b0.parquet")
      stage(raw.filter(col("event_id") % 3 === 0), "b1.parquet")
      dir.toString
    })
  }

  private[graft] def stageDupEventsForTest(s: SparkSession, d: String)
      : String = stageDupEvents(s, d)

  /** T13 — TRUE streaming dedup inside the hash gate (T5's executor
    * counterpart, `dropDuplicatesWithinWatermark` on the real engine):
    * the staged stream carries the fixture plus exact-copy duplicates,
    * one set doubled inside the same file and one whole file of copies
    * arriving as a second micro-batch (see [[stageDupEvents]]). Because
    * every injected duplicate is an exact row copy, the emitted SET
    * equals the original fixture no matter which copy the state store
    * keeps — deterministic by construction — while a dedup miss in
    * either regime (within a batch, or across batches through the
    * event_id state store) surfaces as extra rows in the hash compare.
    * Copies landing below the batch-1 watermark are dropped by the
    * stateful-operator late-row contract — equally absent from the twin.
    * The DuckDB twin is simply the fixture itself. */
  def t13_stream_dedup(s: SparkSession, d: String): DataFrame = {
    val name = s"t13_sink_${System.nanoTime()}"
    val ss = streamSession(s)
    graft.streaming.StreamingPipelines.runToMemory(
      graft.streaming.StreamingPipelines.dedupStream(
        graft.streaming.StreamingPipelines.eventsStream(
          ss, stageDupEvents(s, d), maxFilesPerTrigger = 1))
        .filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"), col("event_type")),
      name, "append")
    ss.table(name).orderBy("event_id")
  }

  /** T14 (r11) — TRUE streaming CDC consumption in the gate [U 4.0
    * `cdc = true` table option, db/commitlog/CommitLogSegmentManagerCDC:
    * committed mutations of a cdc table also land in cdc_raw for a
    * tailing consumer]: a cdc-enabled table takes inserts, an update, a
    * BATCH (insert + delete sharing ONE coordinator timestamp — the
    * upstream batch rule, visible in the log), and a FAILED LWT that
    * must leak nothing; a Spark streaming consumer then tails the
    * cdc_raw analogue (file source over commit-ordered segments,
    * Trigger.AvailableNow, append sink). The projection derives each
    * row's op from the mutation markers and orders by the session's
    * LOGICAL writetime clock — fully deterministic, so the twin is the
    * literal mutation log. */
  def t14_cdc_stream(s: SparkSession, d: String): DataFrame = {
    val sess = graft.cql.CqlSession(s)
    sess.execute(
      "CREATE TABLE cdc14 (k bigint PRIMARY KEY, v text) WITH cdc = true")
    sess.execute("INSERT INTO cdc14 (k, v) VALUES (1, 'a')")
    sess.execute("INSERT INTO cdc14 (k, v) VALUES (2, 'b')")
    sess.execute("UPDATE cdc14 SET v = 'a2' WHERE k = 1")
    sess.execute("BEGIN BATCH " +
      "INSERT INTO cdc14 (k, v) VALUES (3, 'c'); " +
      "DELETE FROM cdc14 WHERE k = 2; APPLY BATCH")
    // a failed conditional write commits nothing → no CDC segment
    sess.execute("UPDATE cdc14 SET v = 'x' WHERE k = 9 IF v = 'nope'")
    val name = s"t14_sink_${System.nanoTime()}"
    graft.streaming.StreamingPipelines.runToMemory(
      sess.cdcStream("cdc14").select(
        col("_writetime").as("wt"),
        when(col("_deleted"), lit("delete"))
          .when(col("_marker"), lit("insert"))
          .otherwise(lit("update")).as("op"),
        col("k"), col("v")),
      name, "append")
    s.table(name).orderBy("wt", "k")
  }

  /** T15 (r11 capstone) — CDC-based REPLICATION end-to-end: a source
    * session's mutations flow through its cdc stream into a SECOND
    * session via `foreachBatch` → `applyCdcBatch`, which applies the RAW
    * log rows with their source timestamps — so the replica reconciles
    * to the source's exact state, including the out-of-order
    * USING TIMESTAMP write that must LOSE on both sides (latest-wins
    * commutativity is what makes log shipping a correct replication
    * protocol; upstream's repair/streaming move the same mutation
    * payloads [U db/streaming/, excluded as cluster infra — this is the
    * engine's replication-shaped analogue on the CDC surface]). The
    * gate projects the REPLICA's reconciled rows. */
  def t15_cdc_replicate(s: SparkSession, d: String): DataFrame = {
    val src = graft.cql.CqlSession(s)
    src.execute("CREATE TABLE rep15 (k bigint PRIMARY KEY, v text, " +
      "n bigint) WITH cdc = true")
    src.execute("INSERT INTO rep15 (k, v, n) VALUES (1, 'a', 10)")
    src.execute("INSERT INTO rep15 (k, v, n) VALUES (2, 'b', 20)")
    src.execute("UPDATE rep15 SET v = 'a2' WHERE k = 1")
    src.execute("UPDATE rep15 SET n = 21 WHERE k = 2")
    src.execute("DELETE FROM rep15 WHERE k = 1")
    src.execute("INSERT INTO rep15 (k, v) VALUES (3, 'x') " +
      "USING TIMESTAMP 100")
    src.execute("UPDATE rep15 USING TIMESTAMP 90 SET v = 'y' WHERE k = 3")
    val replica = graft.cql.CqlSession(s)
    replica.execute("CREATE TABLE rep15 (k bigint PRIMARY KEY, v text, " +
      "n bigint)")
    val q = src.cdcStream("rep15").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        replica.applyCdcBatch("rep15", batch)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    replica.execute("SELECT k, v, n FROM rep15").orderBy("k")
  }

  /** T16 (r12) — the CDC OPERATIONAL LIFECYCLE in the gate [U
    * db/commitlog/CommitLogSegmentManagerCDC: cdc_total_space rejects
    * writes when the consumer falls behind; consumers delete processed
    * segments — the two halves that make CDC safe to leave enabled]:
    * (1) a consumer drains the first segment; (2) with the space bound
    * tripped a write to the cdc table REJECTS statement-atomically (the
    * row is NOT applied locally) while non-cdc tables stay writable;
    * (3) lifting the bound re-admits writes; (4) the consumer ACK
    * (`cdcReap`) frees the consumed segments' bytes; (5) a FRESH
    * consumer sees exactly the post-reap history. Every probe projects
    * a literal row, so the twin is a VALUES table. */
  /** Per-(corpus, mtime) maintained hourly-rollup MV for t17 — built once
    * by the streaming machinery (checkpointed parquet sink), served many.
    * The build-once/serve-many convention of every index cache. */
  private val rollupMvCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** T17 (r13) — the engine-level answer to the raw-scan decode floor the
    * r12 AsymptoteProbe measured on t1 (≈2.9× vs DuckDB at 100 M rows,
    * decode-rate-bound): nobody scans 100 TB of raw events per dashboard
    * query — Cassandra's own answer to "hourly rollup over raw events" is
    * a maintained materialized view. The rollup MV is kept by the
    * STREAMING machinery ([[graft.streaming.StreamingPipelines
    * .hourlyRollup]]: append mode, a window row lands exactly once its
    * end passes the watermark — final and immutable), and the serve path
    * reads the MV's closed hours plus re-derives ONLY the open tail
    * (ts ≥ last closed hour + 1h) from raw — the freshness bound. At
    * 100 TB the MV is hours×types rows and the tail scan is one
    * partition-pruned hour; the full-history scan happens zero times per
    * query. The result is EXACTLY t1's rows (same twin re-derives
    * everything from raw), so closed-window finality, the decimal
    * combine-order rule, and the tail stitch are all hash-verified. */
  def t17_mv_rollup(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val mtime = try Files.getLastModifiedTime(
        Paths.get(s"$d/events.parquet")).toMillis
      catch { case _: Exception => 0L }
    val mvSchema = StructType(Seq(
      StructField("win_start", org.apache.spark.sql.types.TimestampType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("sum_value", org.apache.spark.sql.types.DoubleType)))
    val dir = rollupMvCache.computeIfAbsent(s"$d@$mtime", { _ =>
      val out = graft.Tables.tempRoot("graft-rollup-mv")
      val ss = streamSession(s)
      graft.streaming.StreamingPipelines.runToParquet(
        graft.streaming.StreamingPipelines.hourlyRollup(
          graft.streaming.StreamingPipelines.eventsStream(
            ss, stageEvents(d))),
        s"$out/data", s"$out/ckpt")
      // compact the sink's per-partition micro-files into ONE serving
      // segment and persist the freshness high-water WITH the artifact —
      // the serve path must be one job over two small scans, not a
      // footer-listing walk plus a separate max() job per query
      val sink = s.read.schema(mvSchema).parquet(s"$out/data")
      sink.coalesce(1).write.mode("overwrite").parquet(s"$out/mv")
      val hw = s.read.schema(mvSchema).parquet(s"$out/mv")
        .agg(max(col("win_start"))).head()
      val hwMs = if (hw.isNullAt(0)) Long.MinValue
        else hw.getTimestamp(0).getTime
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out/highwater"),
        hwMs.toString.getBytes("UTF-8"))
      out
    })
    val mv = s.read.schema(mvSchema).parquet(s"$dir/mv")
    // freshness bound (read with the artifact — no per-query max() job):
    // hours after the last CLOSED window re-derive from raw (the open
    // tail — one pruned hour at production scale)
    val hwMs = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/highwater")), "UTF-8").trim.toLong
    val tailEvents =
      if (hwMs == Long.MinValue) Tables.events(s, d) // degenerate: empty MV
      else eventsFrom(s, d, hwMs + 3600000L)
    val tail = tailEvents
      .groupBy(date_trunc("hour", col("ts")).as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        dbl(dec6(sum(dec6(col("value"))))).as("sum_value"))
    mv.unionByName(tail).orderBy("win_start", "event_type")
  }

  /** Normalized events with `ts >= cutoffMs`, the predicate applied to the
    * RAW parquet column BEFORE the µs normalization — `timestamp_micros(ts
    * div 1000) >= lit` is an expression filter the scan cannot use, while
    * `ts >= <nanos>` reaches PushedFilters and prunes row groups by
    * min/max. On a time-ordered layout (ingest order ≈ ts order — what
    * TWCS gives an events table) the tail read touches one hour of row
    * groups, not the history. */
  private def eventsFrom(s: SparkSession, d: String,
      cutoffMs: Long): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // nanosAsLong: integer nanos since epoch
        raw.filter(col("ts") >= lit(cutoffMs * 1000000L))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType =>
        raw.filter(col("ts") >= lit(java.time.LocalDateTime.ofInstant(
            java.time.Instant.ofEpochMilli(cutoffMs),
            java.time.ZoneOffset.UTC)))
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        raw.filter(col("ts") >= lit(new java.sql.Timestamp(cutoffMs)))
    }
  }

  def t16_cdc_lifecycle(s: SparkSession, d: String): DataFrame = {
    val sess = graft.cql.CqlSession(s)
    sess.execute(
      "CREATE TABLE cdc16 (k bigint PRIMARY KEY, v text) WITH cdc = true")
    sess.execute("INSERT INTO cdc16 (k, v) VALUES (1, 'a')")
    def drained(): Seq[Long] = {
      val name = s"t16_sink_${System.nanoTime()}"
      graft.streaming.StreamingPipelines.runToMemory(
        sess.cdcStream("cdc16").select(col("k")), name, "append")
      s.table(name).collect().map(_.getLong(0)).sorted.toSeq
    }
    val firstDrain = drained()
    s.conf.set("spark.graft.cdc.total_space_in_mb", "0")
    val (rejected, nonCdcOk) =
      try {
        val r =
          try { sess.execute("INSERT INTO cdc16 (k, v) VALUES (2, 'b')"); false }
          catch { case _: graft.cql.CqlInvalidQueryException => true }
        sess.execute("CREATE TABLE plain16 (k bigint PRIMARY KEY)")
        sess.execute("INSERT INTO plain16 (k) VALUES (1)")
        (r, true)
      } finally s.conf.unset("spark.graft.cdc.total_space_in_mb")
    val countAfterReject =
      sess.execute("SELECT count(*) FROM cdc16").head().getLong(0)
    sess.execute("INSERT INTO cdc16 (k, v) VALUES (2, 'b')") // bound lifted
    val freed = sess.cdcReap("cdc16") // ack both consumed segments
    sess.execute("INSERT INTO cdc16 (k, v) VALUES (3, 'c')")
    val freshDrain = drained() // only post-reap history remains
    import scala.jdk.CollectionConverters._
    s.createDataFrame(Seq(
      Row(1L, "consumer_drain", firstDrain.mkString("k=", ",", "")),
      Row(2L, "bound_reject",
        s"rejected=$rejected count=$countAfterReject non_cdc_ok=$nonCdcOk"),
      Row(3L, "bound_lift", "k2_inserted=true"),
      Row(4L, "reap", s"freed_positive=${freed > 0L}"),
      Row(5L, "fresh_consumer", freshDrain.mkString("k=", ",", ""))
    ).asJava, StructType(Seq(
      StructField("seq", LongType),
      StructField("probe", StringType),
      StructField("detail", StringType))))
      .orderBy("seq")
  }

  /** T10 — the TRUE stream-stream join executor inside the hash gate
    * (T8+ was spec-only): clicks joined to the same user's purchases
    * within 30 minutes after, run as a watermarked streaming interval
    * join (Trigger.AvailableNow, append sink). Inner joins emit every
    * match in the batch where both sides are present, and the single
    * staged file keeps everything in one batch — so the streaming join
    * state machine (two keyed state stores + interval eviction) produces
    * exactly the batch join, which is what the DuckDB twin computes. */
  def t10_stream_join(s: SparkSession, d: String): DataFrame = {
    val name = s"t10_sink_${System.nanoTime()}"
    val ss = streamSession(s)
    graft.streaming.StreamingPipelines.runToMemory(
      graft.streaming.StreamingPipelines.clickToPurchase(
        graft.streaming.StreamingPipelines.eventsStream(ss, stageEvents(d))),
      name, "append")
    ss.table(name).orderBy("click_id", "purchase_id")
  }

  /** T12 — TRUE streaming session windows inside the hash gate (T3's
    * executor counterpart): the watermarked 30-minute-gap session
    * pipeline runs on the real streaming engine (file source, session-
    * merging state store, Trigger.AvailableNow) in COMPLETE mode — the
    * full merged-session state emits at batch end, so nothing is withheld
    * by the initial watermark and each session carries its final
    * (start, count), which is what the batch gaps-and-islands twin
    * computes. (Update mode is the one Spark rejects for session-window
    * aggregation — sessions merge, they don't update in place.) The
    * defensive max() collapse mirrors t11's and is a no-op at one batch;
    * the one-file-one-batch invariant is stageEvents' contract. */
  def t12_stream_session(s: SparkSession, d: String): DataFrame = {
    val name = s"t12_sink_${System.nanoTime()}"
    val ss = streamSession(s)
    graft.streaming.StreamingPipelines.runToMemory(
      graft.streaming.StreamingPipelines.userSessions(
        graft.streaming.StreamingPipelines.eventsStream(ss, stageEvents(d))),
      name, "complete")
    ss.table(name).filter(col("user_id") < 30)
      .groupBy("user_id", "session_start")
      .agg(max("n_events").as("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** T11 — the TRUE `transformWithState` executor inside the hash gate
    * (T6 was spec-only): per-user running (count, Σ event_id) through a
    * RocksDB ValueState processor, snapshots into a memory sink. The
    * accumulators are integer-exact so the final snapshot hashes
    * identically to the DuckDB GROUP BY twin; `max` per user collapses
    * intermediate snapshots if the source ever splits into >1 batch
    * (both fields are monotone in batch order). The RocksDB provider is
    * scoped to the stream's CLONED session — other pipelines keep their
    * default state store with nothing to restore. */
  def t11_stream_totals(s: SparkSession, d: String): DataFrame = {
    val ss = streamSession(s)
    // RocksDB provider scoped to the clone — other pipelines keep the
    // default state store without any restore dance
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val name = s"t11_sink_${System.nanoTime()}"
    graft.streaming.StreamingPipelines.runToMemory(
      graft.streaming.StreamingPipelines.runningCounts(
        graft.streaming.StreamingPipelines.eventsStream(ss, stageEvents(d)))
        .toDF(),
      name, "update")
    ss.table(name).groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max(col("sum_event_id")).as("sum_event_id"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t10_stream_join" -> (t10_stream_join _),
    "t11_stream_totals" -> (t11_stream_totals _),
    "t12_stream_session" -> (t12_stream_session _),
    "t13_stream_dedup" -> (t13_stream_dedup _),
    "t14_cdc_stream" -> (t14_cdc_stream _),
    "t15_cdc_replicate" -> (t15_cdc_replicate _),
    "t16_cdc_lifecycle" -> (t16_cdc_lifecycle _),
    "t17_mv_rollup" -> (t17_mv_rollup _),
    "t8_stream_tumbling" -> (t8_stream_tumbling _),
    "t9_gapfill" -> (t9_gapfill _),
    "t1_tumbling" -> (t1_tumbling _),
    "t2_sliding" -> (t2_sliding _),
    "t3_session" -> (t3_session _),
    "t5_dedup" -> (t5_dedup _),
  )

  val oracle: Map[String, String] = Map(
    // the replica's reconciled state: k=1 tombstoned, k=2 merged from
    // two writes, k=3 keeps the ts-100 value (the ts-90 update lost on
    // the SOURCE and must lose identically on the replica)
    "t15_cdc_replicate" ->
      """SELECT CAST(k AS BIGINT) AS k, v, CAST(n AS BIGINT) AS n
        |FROM (VALUES (2, 'b', 21), (3, 'x', NULL))
        |AS t(k, v, n) ORDER BY k""".stripMargin,
    // the literal operational-lifecycle scorecard: bound rejects
    // statement-atomically, reap frees, the fresh consumer sees only
    // post-reap history
    "t16_cdc_lifecycle" ->
      """SELECT CAST(seq AS BIGINT) AS seq, probe, detail FROM (VALUES
        |  (1, 'consumer_drain', 'k=1'),
        |  (2, 'bound_reject', 'rejected=true count=1 non_cdc_ok=true'),
        |  (3, 'bound_lift', 'k2_inserted=true'),
        |  (4, 'reap', 'freed_positive=true'),
        |  (5, 'fresh_consumer', 'k=3'))
        |AS t(seq, probe, detail) ORDER BY seq""".stripMargin,
    // the literal mutation log: the batch pair shares writetime 4, the
    // failed LWT leaks nothing
    "t14_cdc_stream" ->
      """SELECT CAST(wt AS BIGINT) AS wt, op, CAST(k AS BIGINT) AS k, v
        |FROM (VALUES
        |  (1, 'insert', 1, 'a'),
        |  (2, 'insert', 2, 'b'),
        |  (3, 'update', 1, 'a2'),
        |  (4, 'insert', 3, 'c'),
        |  (4, 'delete', 2, NULL))
        |AS t(wt, op, k, v) ORDER BY wt, k""".stripMargin,
    // same per-user hourly grid (generate_series is end-inclusive, as is
    // Spark's sequence on even steps), same left join + carry-forward
    "t9_gapfill" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('hour', cast(ts AS timestamp)) AS bucket,
        |    value
        |  FROM events WHERE user_id < 20),
        |actual AS (
        |  SELECT user_id, bucket, count(*) AS n,
        |    cast(sum(cast(value AS decimal(38,6))) AS decimal(38,6)) AS sv
        |  FROM e GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(min(bucket), max(bucket),
        |    INTERVAL 1 HOUR)) AS bucket
        |  FROM e GROUP BY user_id)
        |SELECT g.user_id, g.bucket,
        |  coalesce(a.n, 0) AS n,
        |  round(cast(last_value(a.sv IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.bucket
        |    ROWS UNBOUNDED PRECEDING) AS double), 6) AS filled_sum
        |FROM grid g LEFT JOIN actual a
        |  ON g.user_id = a.user_id AND g.bucket = a.bucket
        |ORDER BY g.user_id, g.bucket""".stripMargin,
    "t1_tumbling" ->
      """SELECT date_trunc('hour', cast(ts AS timestamp)) AS win_start, event_type,
        |  count(*) AS n,
        |  cast(cast(sum(cast(value AS decimal(38,6))) AS decimal(38,6)) AS double) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the MV-served rollup must equal the full re-derivation from raw —
    // t1's own twin, so closed-window finality + the tail stitch are
    // hash-verified against first principles
    "t17_mv_rollup" ->
      """SELECT date_trunc('hour', cast(ts AS timestamp)) AS win_start, event_type,
        |  count(*) AS n,
        |  cast(cast(sum(cast(value AS decimal(38,6))) AS decimal(38,6)) AS double) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t8_stream_tumbling" ->
      """SELECT date_trunc('hour', cast(ts AS timestamp)) AS win_start,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the streaming interval join ≡ the batch self-join it bounds
    "t10_stream_join" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        |  p.event_id AS purchase_id, cast(c.ts AS timestamp) AS c_ts,
        |  cast(p.ts AS timestamp) AS p_ts
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND cast(p.ts AS timestamp) >= cast(c.ts AS timestamp)
        |  AND cast(p.ts AS timestamp)
        |      <= cast(c.ts AS timestamp) + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,
    // final ValueState snapshot per user ≡ the batch GROUP BY
    "t11_stream_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |  cast(sum(event_id) AS bigint) AS sum_event_id
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "t2_sliding" ->
      """SELECT win_start, event_type, count(*) AS n FROM (
        |  SELECT event_type,
        |    cast(to_timestamp(((epoch_us(cast(ts AS timestamp)) // 900000000) - j) * 900000000 / 1000000) AS timestamp) AS win_start
        |  FROM events CROSS JOIN (SELECT unnest(range(0,4)) AS j) js)
        |WHERE event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same gaps-and-islands twin as t3, count-only projection — the
    // streamed session store must reproduce the batch sessionization
    "t12_stream_session" ->
      """WITH e AS (SELECT user_id, cast(ts AS timestamp) AS ts
        |           FROM events WHERE user_id < 30),
        |flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           >= INTERVAL 30 MINUTE
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |                  ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "t3_session" ->
      """WITH e AS (SELECT user_id, cast(ts AS timestamp) AS ts, value
        |           FROM events WHERE user_id < 30),
        |flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           >= INTERVAL 30 MINUTE
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |                  ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |  cast(cast(sum(cast(value AS decimal(38,6))) AS decimal(38,6)) AS double) AS sum_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // the stream input is fixture ∪ exact copies; dedup on event_id must
    // reduce it back to exactly the fixture
    "t13_stream_dedup" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE user_id < 50 ORDER BY event_id""".stripMargin,
    "t5_dedup" ->
      """SELECT user_id, event_type, date_trunc('day', cast(ts AS timestamp)) AS day,
        |  event_id
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type, date_trunc('day', cast(ts AS timestamp))
        |        ORDER BY cast(ts AS timestamp), event_id) AS rn
        |      FROM events)
        |WHERE rn = 1 AND user_id < 20
        |ORDER BY user_id, event_type, day""".stripMargin,
  )
}
