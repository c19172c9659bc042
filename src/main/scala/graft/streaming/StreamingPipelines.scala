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

object StreamingPipelines {

  /** readStream over a parquet events dir (explicit schema — required by the
    * file source; ts arrives as ns-longs under nanosAsLong). */
  def eventsStream(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(Tables.eventsRawSchema).parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** T1 streaming: watermarked hourly tumbling counts per event type. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

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
