package graft.operators

import graft.Tables
import graft.functions.WeightedSumAggregator
import org.apache.spark.sql.{DataFrame, SparkSession, Encoders}
import org.apache.spark.sql.functions._

/** SURVEY §2.4 A5 / §2.11 — user-defined aggregates, the CQL
  * `CREATE AGGREGATE` surface, as typed `Aggregator`s behind `udaf()`. */
object UdafQueries {

  /** U1: quantity-weighted mean price per return flag via the UDA. The
    * aggregate's exact micro-unit buffer makes it shuffle-order-proof; the
    * final ratio is double division, twinned 1:1 in the oracle. */
  def u1_weighted_avg(s: SparkSession, d: String): DataFrame = {
    val wsum = udaf(new WeightedSumAggregator(),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(wsum(col("l_extendedprice"), col("l_quantity")).as("b"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round((col("b.wx6").cast("double") / 1e6) /
          (col("b.w6").cast("double") / 1e6), 6).as("weighted_avg_price"),
        col("n"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u1_weighted_avg" -> (u1_weighted_avg _),
  )

  val oracle: Map[String, String] = Map(
    "u1_weighted_avg" ->
      """SELECT l_returnflag,
        |  round(cast(sum(cast(l_extendedprice * l_quantity AS decimal(38,6))) AS double) /
        |        cast(sum(cast(l_quantity AS decimal(38,6))) AS double), 6) AS weighted_avg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
