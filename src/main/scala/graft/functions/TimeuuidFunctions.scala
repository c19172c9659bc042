package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY §2.8 F2 — the CQL timeuuid function family
  * (`minTimeuuid/maxTimeuuid/toTimestamp/dateOf/unixTimestampOf`, upstream
  * `cql3/functions/TimeFcts.java` [U], unverifiable per SURVEY §0), as pure
  * builtin Column compositions over the RFC-4122 version-1 layout:
  * 60-bit count of 100ns ticks since 1582-10-15, split
  * time_low(32) | time_mid(16) | version+time_hi(16).
  */
object TimeuuidFunctions {

  /** 100ns ticks between the Gregorian epoch (1582-10-15) and 1970-01-01. */
  val GregorianOffset: Long = 122192928000000000L

  private def hexOf(c: Column, width: Int): Column =
    lpad(lower(hex(c)), width, "0")

  /** 60-bit tick count → RFC-4122 v1 uuid string with the given clockseq/
    * node tail (min tail for [[minTimeuuid]], max tail for [[maxTimeuuid]]). */
  private def build(ticks: Column, tail: String): Column =
    concat_ws("-",
      hexOf(ticks.bitwiseAND(0xFFFFFFFFL), 8),                     // time_low
      hexOf(shiftright(ticks, 32).bitwiseAND(0xFFFFL), 4),         // time_mid
      concat(lit("1"), hexOf(shiftright(ticks, 48).bitwiseAND(0xFFFL), 3)),
      lit(tail.split("-")(0)), lit(tail.split("-")(1)))

  private def ticksOf(ts: Column): Column =
    unix_micros(ts) * 10L + GregorianOffset

  /** Smallest timeuuid for a timestamp — CQL `minTimeuuid(ts)`; use as an
    * inclusive lower bound in clustering-range predicates. */
  def minTimeuuid(ts: Column): Column = build(ticksOf(ts), "8000-000000000000")

  /** Largest timeuuid for a timestamp — CQL `maxTimeuuid(ts)`. */
  def maxTimeuuid(ts: Column): Column = build(ticksOf(ts), "bfff-ffffffffffff")

  /** Embedded 60-bit tick count of a v1 uuid string. */
  def timeuuidTicks(u: Column): Column =
    conv(concat(substring(u, 16, 3), substring(u, 10, 4), substring(u, 1, 8)),
      16, 10).cast("long")

  // `/` on longs is double division in Spark SQL — ticks exceed 2^53, so
  // integral `div` is required for exactness
  private def idiv(a: Column, b: Long): Column =
    call_function("div", a, lit(b))

  /** CQL `toTimestamp(timeuuid)` / `dateOf` — µs-precision timestamp.
    * DOCUMENTED DEVIATION: upstream truncates to epoch millis (its Date
    * codec); here the engine's native timestamps are µs, so the
    * conversion keeps the full tick precision — a precision superset the
    * µs round-trip invariant (TimeuuidSpec) depends on. */
  def timeuuidToTimestamp(u: Column): Column =
    timestamp_micros(idiv(timeuuidTicks(u) - GregorianOffset, 10L))

  /** CQL `unixTimestampOf(timeuuid)` — epoch millis. */
  def unixTimestampOf(u: Column): Column =
    idiv(timeuuidTicks(u) - GregorianOffset, 10000L)

  /** Timeuuid ORDER key: (60-bit ticks, clockseq+node hex tail) — upstream
    * compares v1 uuids by embedded time first, then the remaining bytes
    * (`TimeUUIDType.compareTo` [U]); plain string order would sort by
    * time_low first and scramble the timeline. The tail's lexicographic hex
    * order matches its unsigned byte order (fixed-width lowercase hex), and
    * all RFC-4122 v1 uuids carry variant bits 10xx, so minTimeuuid's 8000…
    * and maxTimeuuid's bfff… tails bracket every real uuid at that tick.
    * Documented deviation: upstream compares the tail bytes SIGNED
    * (TimeUUIDType's 0x8080… MIN constant); this key orders the tail as
    * unsigned hex — sound for the min/max BRACKET bounds produced here
    * (they pin the tail to its extremes), but not a general same-tick
    * tie-break for arbitrary node/clockseq values. */
  def timeuuidComparable(u: Column): Column = {
    // lower(): uuids may arrive uppercase-hex (valid per RFC 4122); the
    // min/max bracket tails are lowercase, so compare case-folded.
    val lu = lower(u)
    struct(timeuuidTicks(lu).as("t"),
      concat(substring(lu, 20, 4), substring(lu, 25, 12)).as("tail"))
  }
}
