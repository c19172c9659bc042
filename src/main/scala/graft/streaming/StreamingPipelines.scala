package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** SURVEY §2.9 — true Structured Streaming pipelines (the CDC/commit-log
  * analogue, upstream `db/commitlog/CommitLogReader.java` [U]): a file-source
  * stream over an events directory, the same transforms as the batch twins in
  * [[graft.operators.StreamingQueries]], verified stream≡batch in
  * StreamingSpec via Trigger.AvailableNow into a memory sink.
  *
  * Scale notes: the file source scales to object-store listings with
  * `maxFilesPerTrigger`; watermarks bound window state; dedup-within-watermark
  * keeps the state store finite — the 100 TB stream shape.
  */
/** Input row for the T6 stateful processor. */
case class UserEvent(user_id: Long, value: Double)
/** Emitted running snapshot per user. */
case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)
/** Input row for the oracle-gated T6 variant (long-exact accumulator). */
case class EventKeyed(user_id: Long, event_id: Long)
/** Emitted snapshot for the oracle-gated T6 variant: both fields are
  * integer-exact, so the hash compare is order-insensitive (double sums
  * would depend on iteration order). */
case class UserCounts(user_id: Long, n_events: Long, sum_event_id: Long)

object StreamingPipelines {

  /** readStream over a parquet events dir (explicit schema — required by the
    * file source). The fixture's `ts` physical type has varied across driver
    * generations (ns → LongType under nanosAsLong, µs → Timestamp[NTZ]), so
    * probe the actual footer with a batch read (every call site stages at
    * least one file before opening the stream) and normalize to µs
    * TimestampType the same way [[Tables.events]] does. */
  def eventsStream(s: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    import org.apache.spark.sql.types._
    // probe the staged file's footer; an empty/unreadable dir (construction
    // before the first stage) falls back to the declared schema so stream
    // construction degrades to the pre-probe behavior instead of throwing
    val tsType =
      try s.read.parquet(dir).schema("ts").dataType
      catch { case scala.util.control.NonFatal(_) =>
        Tables.eventsRawSchema.find(_.name == "ts").get.dataType }
    val schema = StructType(Tables.eventsRawSchema.map {
      case f if f.name == "ts" => f.copy(dataType = tsType)
      case f => f
    })
    val reader = s.readStream.schema(schema)
    val raw = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      else reader).parquet(dir)
    tsType match {
      case LongType => // nanosAsLong: integer nanos since epoch
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** T1 streaming: watermarked hourly tumbling counts per event type. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

  /** T17 (r13): the MAINTAINED hourly rollup — t1's shape (count + decimal
    * sum per hour × event_type) as an incrementally-updated materialized
    * pre-aggregate. Append mode: a window row is emitted exactly once its
    * end passes the watermark (final, immutable — the MV row), so the sink
    * accumulates CLOSED hours only and the serve path re-derives just the
    * open tail from raw. Decimal sums make the streamed partials
    * combine-order-proof, which is what lets the MV row hash-match the
    * batch re-derivation. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,6)")).cast("decimal(38,6)")
          .cast("double").as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run a (watermarked, append-mode) pipeline to completion over the
    * files currently in the dir and SINK IT AS PARQUET — the maintained-MV
    * shape ([[hourlyRollup]]'s consumer): checkpointed, so a later run
    * over a grown source dir resumes incrementally instead of recomputing
    * history. */
  def runToParquet(df: DataFrame, outDir: String,
      checkpointDir: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** T3 streaming: session windows per user (30-minute gap). */
  def userSessions(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** T5 streaming: idempotent-upsert analogue — drop duplicate event_ids
    * within the watermark. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** T6 — arbitrary per-key state (`transformWithState`, the Spark-4 CQL-UDA
    * -on-a-stream analogue): running per-user event count + value total,
    * emitted as an updated snapshot on every input batch. Requires the
    * RocksDB state store provider (set in the spec/session conf). */
  class UserRunningTotals
      extends StatefulProcessor[Long, UserEvent, UserTotals] {
    @transient private var state: ValueState[UserTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserTotals](
        "totals", Encoders.product[UserTotals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[UserTotals] = {
      val prev = Option(state.get()).getOrElse(UserTotals(key, 0L, 0.0))
      var n = prev.n_events; var sum = prev.sum_value
      rows.foreach { r => n += 1; sum += r.value }
      val next = UserTotals(key, n, sum)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** T6 pipeline: per-user running totals over the event stream. */
  def runningTotals(events: DataFrame): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new UserRunningTotals,
        TimeMode.None(), OutputMode.Update(), Encoders.product[UserTotals])
  }

  /** T6 (oracle-gated variant) — same `transformWithState` machinery, but
    * the accumulators are longs (count + Σ event_id), so the emitted
    * snapshot is bit-exact regardless of per-batch iteration order and can
    * sit inside the driver's hash gate. */
  class UserRunningCounts
      extends StatefulProcessor[Long, EventKeyed, UserCounts] {
    @transient private var state: ValueState[UserCounts] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserCounts](
        "counts", Encoders.product[UserCounts], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventKeyed],
        timers: TimerValues): Iterator[UserCounts] = {
      val prev = Option(state.get()).getOrElse(UserCounts(key, 0L, 0L))
      var n = prev.n_events; var se = prev.sum_event_id
      rows.foreach { r => n += 1; se += r.event_id }
      val next = UserCounts(key, n, se)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** T6 pipeline (oracle-gated): per-user event count + Σ event_id. */
  def runningCounts(events: DataFrame): Dataset[UserCounts] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("event_id")).as[EventKeyed]
      .groupByKey(_.user_id)
      .transformWithState(new UserRunningCounts,
        TimeMode.None(), OutputMode.Update(), Encoders.product[UserCounts])
  }

  /** S6/S7 write path — the memtable-flush analogue: a STREAM of cell
    * writes materializes a latest-wins snapshot table via `foreachBatch`
    * merge. Each micro-batch unions with the current snapshot and rewrites
    * it through [[graft.operators.CassandraModel.compactWithGrace]] —
    * flush and compaction collapse into one step because parquet snapshots
    * are immutable like SSTables. Using the GRACE-aware compaction is what
    * makes incremental merge CORRECT: a young tombstone survives as a
    * marker and still shadows an older write arriving in a later batch;
    * with plain latest-wins it would zombie back (StreamingSpec proves
    * both directions). Merge order cannot matter — the reconcile is a
    * commutative semilattice join on (writetime, v) — so out-of-order
    * file arrival is safe.
    *
    * Scale: each flush is one shuffle on pk (bucketLog the snapshot and it
    * is map-only); the snapshot rewrite is bounded by live keys + young
    * tombstones, the same bound upstream compaction carries. */
  def upsertSink(writes: DataFrame, snapshotDir: String,
      checkpointDir: String, nowWt: Long, graceWt: Long): StreamingQuery =
    writes.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        // Hadoop FS check, NOT java.io.File: on hdfs://, s3a://, … a local
        // File probe is always false and the overwrite below would destroy
        // the accumulated snapshot on every micro-batch
        val p = new org.apache.hadoop.fs.Path(snapshotDir)
        val bak = new org.apache.hadoop.fs.Path(snapshotDir + ".prev")
        val tmp = new org.apache.hadoop.fs.Path(snapshotDir + ".staging")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        // crash recovery: if the final dir is missing but .prev survives,
        // the last run died between the two renames below — .prev IS the
        // last committed snapshot, resume from it
        if (!fs.exists(p) && fs.exists(bak) && !fs.rename(bak, p))
          throw new java.io.IOException(
            s"snapshot recovery: rename($bak, $p) failed — refusing to " +
              "proceed (the batch would merge against an empty snapshot " +
              "and the delete below would drop the last committed state)")
        val existing =
          if (fs.exists(p)) Some(s.read.parquet(snapshotDir)) else None
        val log = existing.fold(batch.toDF())(_.unionByName(batch.toDF()))
        val merged = graft.operators.CassandraModel
          .compactWithGrace(log, nowWt, graceWt)
        // NEVER overwrite the accumulated snapshot in place — a crash
        // mid-write would destroy every previously merged batch (the
        // memtable-flush durability this sink exists to model). Stage the
        // new snapshot beside it, then swap with two atomic renames; the
        // committed state survives a crash at ANY point.
        if (fs.exists(tmp)) fs.delete(tmp, true)
        merged.write.parquet(tmp.toString)
        if (fs.exists(bak)) fs.delete(bak, true)
        // Every rename result is CHECKED: HDFS-style FileSystem.rename
        // reports failure with `false`, not an exception. Proceeding past
        // a failed rename(tmp, p) to the delete(bak) below would destroy
        // the last committed snapshot — the precise loss the staging
        // dance exists to prevent — so abort with .prev intact instead.
        if (fs.exists(p) && !fs.rename(p, bak))
          throw new java.io.IOException(
            s"snapshot swap: rename($p, $bak) failed; committed snapshot untouched")
        if (!fs.rename(tmp, p))
          throw new java.io.IOException(
            s"snapshot swap: rename($tmp, $p) failed; last snapshot preserved at $bak")
        fs.delete(bak, true)
        ()
      }
      .start()

  /** T8: stream-stream interval join (upstream has no analogue — this is
    * the CDC-enrichment shape every streaming pipeline needs): each click
    * joined to the same user's purchases within 30 minutes AFTER it. Both
    * sides are watermarked and the join carries the time-range condition,
    * so Spark bounds both state stores (rows older than watermark+interval
    * are evicted) — the state-finite 100 TB/day shape. */
  def clickToPurchase(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("c_ts"), col("p_ts"))
  }

  /** T8b: stream-stream LEFT OUTER interval join — clicks that convert
    * carry their purchase; clicks that don't still emit (null purchase)
    * once the watermark proves no match can arrive. The outer side is the
    * part inner joins can't express: abandoned-funnel rows materialize
    * exactly when their joinable window closes, which is what makes the
    * state store provably finite AND the null results correct-by-watermark
    * rather than correct-by-timeout. */
  def clickToPurchaseOuter(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("c_ts"), col("p_ts"))
  }

  /** Run any of the above to completion over the files currently in the dir
    * (AvailableNow = bounded run of the unbounded plan) into an in-memory
    * table; returns the finished query. Test/demo harness — production sinks
    * parquet/Kafka instead. */
  def runToMemory(df: DataFrame, name: String, outputMode: String): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}
