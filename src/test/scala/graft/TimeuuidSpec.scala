package graft

import graft.functions.TimeuuidFunctions._
import org.apache.spark.sql.functions._

class TimeuuidSpec extends SparkSpec {

  private lazy val ev = Tables.events(spark, sf).limit(200).cache()

  test("minTimeuuid round-trips its timestamp at µs precision") {
    val bad = ev.select(col("ts"),
        timeuuidToTimestamp(minTimeuuid(col("ts"))).as("rt"))
      .filter(col("ts") =!= col("rt")).count()
    assert(bad === 0)
  }

  test("produced uuids are valid v1 layout") {
    val u = ev.select(minTimeuuid(col("ts")).as("u")).head().getString(0)
    assert(u.matches("[0-9a-f]{8}-[0-9a-f]{4}-1[0-9a-f]{3}-8000-000000000000"), u)
    val mx = ev.select(maxTimeuuid(col("ts")).as("u")).head().getString(0)
    assert(mx.endsWith("-bfff-ffffffffffff"))
  }

  test("min/max bounds bracket every uuid generated within the same timestamp") {
    // string ordering of the hex fields ≠ timeuuid ordering in general, but
    // tick extraction IS the total order — verify via ticks
    val rows = ev.select(
        timeuuidTicks(minTimeuuid(col("ts"))).as("lo"),
        timeuuidTicks(maxTimeuuid(col("ts"))).as("hi")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1))) // same ts → same ticks
  }

  test("unixTimestampOf returns epoch millis") {
    val bad = ev.select(unix_millis(col("ts")).as("ms"),
        unixTimestampOf(minTimeuuid(col("ts"))).as("u"))
      .filter(col("ms") =!= col("u")).count()
    assert(bad === 0)
  }

  test("uppercase-hex timeuuids compare inside the min/max bracket") {
    // RFC 4122 allows uppercase hex on input; some drivers emit it. The
    // comparable must case-fold or the tail sorts outside the bracket.
    val u = ev.select(minTimeuuid(col("ts")).as("u"), col("ts")).head()
    val upper = u.getString(0).toUpperCase
    val in = spark.range(1).select(
        timeuuidComparable(lit(upper)).as("c"),
        timeuuidComparable(minTimeuuid(lit(u.getTimestamp(1)))).as("lo"),
        timeuuidComparable(maxTimeuuid(lit(u.getTimestamp(1)))).as("hi"))
      .filter(col("c") >= col("lo") && col("c") <= col("hi")).count()
    assert(in === 1, s"uppercase $upper fell outside its own tick bracket")
  }

  test("matches java.util.UUID's own v1 timestamp decoding") {
    val u = ev.select(minTimeuuid(col("ts")).as("u"), col("ts")).head()
    val juuid = java.util.UUID.fromString(u.getString(0))
    assert(juuid.version() === 1)
    val micros = (juuid.timestamp() - 0L) / 10 - GregorianOffset / 10
    // juuid.timestamp() counts the same Gregorian 100ns ticks
    assert(juuid.timestamp() ===
      spark.range(1).select(timeuuidTicks(lit(u.getString(0)))).head().getLong(0))
  }
}
