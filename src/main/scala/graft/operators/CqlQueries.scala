package graft.operators

import graft.cql.CqlEngine
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY §2.10/§2.11 — the CQL TEXT path itself as driver-verified
  * queries: these run reference-style CQL strings end-to-end (tokenizer →
  * parser → validation → Catalyst plan) and land in the same DuckDB hash
  * gate as every native query. A reference user's query text, not just its
  * semantics, is what gets verified.
  */
object CqlQueries {

  /** CQL1: clustering slice — point partition, reversed clustering order,
    * LIMIT. The (ts, event_id) clustering pair is unique, so CQL's own
    * ordering is already total (no wrapper sort). */
  def cql1_slice(s: SparkSession, d: String): DataFrame =
    CqlEngine.forFixtures(s, d).execute(
      "SELECT ts, event_id, event_type FROM events WHERE user_id = 5 " +
        "ORDER BY ts DESC, event_id DESC LIMIT 20")

  /** CQL2: aggregation through the text path. CQL defines no result order
    * for aggregates (the coordinator streams groups), so the gate's total
    * order is applied OUTSIDE the engine — on the returned DataFrame. */
  def cql2_group(s: SparkSession, d: String): DataFrame =
    CqlEngine.forFixtures(s, d).execute(
      "SELECT l_returnflag, count(*) AS n, min(l_quantity) AS minq, " +
        "max(l_quantity) AS maxq FROM lineitem GROUP BY l_returnflag " +
        "ALLOW FILTERING")
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cql1_slice" -> (cql1_slice _),
    "cql2_group" -> (cql2_group _),
  )

  val oracle: Map[String, String] = Map(
    "cql1_slice" ->
      """SELECT cast(ts AS timestamp) AS ts, event_id, event_type
        |FROM events WHERE user_id = 5
        |ORDER BY ts DESC, event_id DESC LIMIT 20""".stripMargin,
    "cql2_group" ->
      """SELECT l_returnflag, count(*) AS n,
        |  min(l_quantity) AS minq, max(l_quantity) AS maxq
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
