package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture loaders (FIXTURES.md, SURVEY §1.2).
  *
  * All tables are read straight from the driver-generated parquet. The only
  * normalization is `events.ts`: the fixture stores parquet `timestamp[ns]`,
  * which Spark 4 surfaces as `LongType` (nanos) when
  * `spark.sql.legacy.parquet.nanosAsLong=true` — we truncate to microsecond
  * `TimestampType` (same truncation DuckDB applies casting ns→µs), so both
  * engines agree bit-for-bit on every timestamp they output.
  */
object Tables {
  private def p(s: SparkSession, d: String, name: String): DataFrame =
    s.read.parquet(s"$d/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = p(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = p(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = p(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = p(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = p(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = p(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = p(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = p(s, d, "documents")

  /** Spread a CPU-heavy map stage across the cluster when the source scan
    * arrived under-split (a single small parquet file = one task — the
    * fixture case; a parquet row group cannot be split, so only a shuffle
    * redistributes it). No-op when the input is already well-partitioned —
    * a 100 TB corpus in thousands of splits never pays this shuffle.
    * Deterministic: hash partitioning on `key`, no round-robin. */
  /** A temp dir removed on JVM exit — staged fixtures and persisted index
    * artifacts otherwise accumulate one tree per process forever. */
  def tempRoot(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir.toString
  }

  def spread(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // probe the LEAF scan's split count instead of df.rdd.getNumPartitions:
    // materializing the RDD lineage under AQE finalizes the plan and would
    // eagerly RUN any upstream shuffle at composition time for a caller
    // that passes a join/agg frame
    val leafSplits = df.queryExecution.logical.collectLeaves().map {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.length
          case _ => Int.MaxValue
        }
      case _ => Int.MaxValue // non-file source: assume well-partitioned
    }
    if (leafSplits.isEmpty || leafSplits.min >= target) df
    else df.repartition(target, key)
  }
  def embeddings(s: SparkSession, d: String): DataFrame = p(s, d, "embeddings")

  /** events with `ts` normalized to µs TimestampType regardless of how the
    * session surfaced the ns-precision parquet column. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = p(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanosAsLong: integer nanos since epoch
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Schema used for streaming reads of events (file stream source requires
    * an explicit schema; ts arrives as nanos LongType under nanosAsLong). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
}

/** Shared helpers for deterministic, DuckDB-oracle-safe expressions. */
object Q {
  /** Execute a query COMPLETELY for timing: write every output column to
    * the no-op sink. `df.count()` is NOT a benchmark forcing function —
    * Catalyst prunes an inner Aggregate's aggregate expressions under an
    * outer `count(1)` (the plan legitimately needs only the group keys),
    * so a `groupBy().agg(...)` query "timed" via count() measures a
    * grouped scan of the key columns with `functions=[]` and never
    * evaluates the aggregates (r14 find: x29's fold — 95% of its work —
    * was pruned out of every bench pass; a1's eight sums likewise). The
    * noop sink materializes every column of every row and discards them
    * executor-side — no driver collect cost distorting large results. */
  def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Sums over doubles are order-dependent; cast per-row to an exact decimal
    * before aggregating so Spark and DuckDB (and Spark run-to-run across
    * shuffle orders) agree exactly. Per-row double arithmetic (+,-,*,/,sqrt)
    * is IEEE-deterministic and needs no such treatment. */
  def dec6(c: Column): Column = c.cast("decimal(38,6)")

  /** Final-output form of a decimal aggregate: the exact decimal value cast
    * to double. Both engines correctly round the same exact decimal to the
    * same IEEE double, and a double column round-trips identically through
    * parquet/pandas on both sides — whereas a decimal output surfaces as
    * `Decimal('1.500000')` from Spark parquet but `1.5` float64 from DuckDB
    * and hash-mismatches.
    *
    * SCALE BOUND: the "both engines round identically" argument relies on the
    * unscaled decimal(38,6) value staying < 2^53 (exactly representable
    * half-way comparisons). That holds through verify scale sf0.01 and bench
    * scale sf0.1 with ~10^4 margin (largest observed sum ≈ 10^9 · 10^6 scale
    * = 10^15 < 9·10^15); a verification run at sf ≥ 10 would cross it and
    * decimal→double ties could differ by 1 ulp between engines. If the
    * verify scale ever grows, emit string-formatted decimals instead. */
  def dbl(c: Column): Column = c.cast("double")

  def ts(sd: String): Column = lit(sd).cast("timestamp")
}
