package graft.cql

import graft.operators.CassandraModel
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CQL DML AST. */
sealed trait CqlDml { def table: String }
case class CqlInsert(table: String, columns: Seq[String], values: Seq[Any],
  usingTimestamp: Option[Long], usingTtl: Option[Long]) extends CqlDml
case class CqlUpdate(table: String, assignments: Seq[(String, Any)],
  keyPredicates: Seq[(String, Any)], usingTimestamp: Option[Long],
  usingTtl: Option[Long]) extends CqlDml
case class CqlDelete(table: String, keyPredicates: Seq[(String, Any)],
  usingTimestamp: Option[Long]) extends CqlDml

/** SURVEY §2.12 — the CQL write path on the upsert-log model: INSERT/UPDATE/
  * DELETE (all upserts) append typed cell-writes to a per-table log; reads
  * reconcile with [[CassandraModel.reconcileView]] (per-cell latest-wins,
  * tombstone shadowing, (timestamp, value) tie-break — the `Cells.reconcile`
  * semantics [U]). `USING TIMESTAMP` is honored; without it a session-
  * monotonic clock assigns timestamps, like a coordinator would.
  *
  * Each mutation is one appended single-row DataFrame — "BATCH" semantics
  * fall out (a batch is one multi-row append). State lives in this session
  * object; production would append parquet files (the commitlog role) and
  * run [[CassandraModel.compact]] periodically.
  */
class CqlSession(spark: SparkSession, defs: Map[String, CqlTable]) {

  private case class TableState(schema: StructType, partitionKeys: Seq[String],
    clusteringKeys: Seq[String], var log: DataFrame)

  private val state: Map[String, TableState] = defs.map { case (name, t) =>
    val base = t.df
      .withColumn("_writetime", lit(0L))
      .withColumn("_ttl", lit(null).cast("long"))
      .withColumn("_deleted", lit(false))
    name.toLowerCase -> TableState(t.df.schema, t.partitionKeys,
      t.clusteringKeys, base)
  }

  private var clock: Long = 1L

  private def dataCols(t: TableState): Seq[String] = t.schema.fieldNames.toSeq

  private def keyCols(t: TableState): Seq[String] =
    t.partitionKeys ++ t.clusteringKeys

  /** Reconciled read view of a table's current log. `nowUs` (epoch micros)
    * enables cell-level TTL expiry for cells written `USING TTL`. */
  def view(table: String, nowUs: Option[Long] = None): DataFrame = {
    val t = tableState(table)
    CassandraModel.reconcileView(t.log, keyCols(t),
      dataCols(t).filterNot(keyCols(t).contains), nowUs)
  }

  /** Run a CQL statement: SELECT returns rows; DML mutates and returns an
    * empty DataFrame (like a CQL void result). */
  def execute(cql: String): DataFrame = {
    val trimmed = cql.trim
    val kw = trimmed.takeWhile(!_.isWhitespace).toLowerCase
    kw match {
      case "select" =>
        val catalog = state.map { case (name, t) =>
          name -> CqlTable(view(name), t.partitionKeys, t.clusteringKeys)
        }
        new CqlEngine(spark, catalog).execute(trimmed)
      case "insert" | "update" | "delete" =>
        applyDml(CqlParser.parseDml(trimmed)); spark.emptyDataFrame
      case other =>
        throw new CqlInvalidQueryException(s"unsupported statement: $other")
    }
  }

  private def tableState(name: String): TableState =
    state.getOrElse(name.toLowerCase,
      throw new CqlInvalidQueryException(s"unknown table $name"))

  private def nextTs(explicit: Option[Long]): Long =
    explicit.getOrElse { val t = clock; clock += 1; t }

  private def applyDml(dml: CqlDml): Unit = {
    val t = tableState(dml.table)
    val keys = keyCols(t)
    val row: Seq[(String, Option[Any])] = dml match {
      case CqlInsert(_, cols, vals, _, _) =>
        if (cols.length != vals.length)
          throw new CqlInvalidQueryException("column/value count mismatch")
        val m = cols.map(_.toLowerCase).zip(vals).toMap
        dataCols(t).map(c => c -> m.get(c.toLowerCase))
      case CqlUpdate(_, assignments, preds, _, _) =>
        val a = assignments.map { case (c, v) => c.toLowerCase -> v }.toMap
        val k = preds.map { case (c, v) => c.toLowerCase -> v }.toMap
        if (a.keySet.exists(c => keys.exists(_.equalsIgnoreCase(c))))
          throw new CqlInvalidQueryException("PRIMARY KEY columns cannot be SET")
        dataCols(t).map(c => c -> a.get(c.toLowerCase).orElse(k.get(c.toLowerCase)))
      case CqlDelete(_, preds, _) =>
        val k = preds.map { case (c, v) => c.toLowerCase -> v }.toMap
        dataCols(t).map(c => c -> k.get(c.toLowerCase))
    }
    // writes must address a full primary key (ModificationStatement rule)
    keys.foreach { k =>
      if (row.find(_._1.equalsIgnoreCase(k)).flatMap(_._2).isEmpty)
        throw new CqlInvalidQueryException(
          s"PRIMARY KEY column $k must be restricted/provided in a write")
    }
    val (ts, ttl, deleted) = dml match {
      case i: CqlInsert => (nextTs(i.usingTimestamp), i.usingTtl, false)
      case u: CqlUpdate => (nextTs(u.usingTimestamp), u.usingTtl, false)
      case d: CqlDelete => (nextTs(d.usingTimestamp), None, true)
    }
    val cols = row.map { case (name, v) =>
      val dt = t.schema(t.schema.fieldIndex(name)).dataType
      v.map(x => lit(x).cast(dt)).getOrElse(lit(null).cast(dt)).as(name)
    } ++ Seq(lit(ts).as("_writetime"),
      ttl.map(lit(_)).getOrElse(lit(null)).cast("long").as("_ttl"),
      lit(deleted).as("_deleted"))
    t.log = t.log.unionByName(spark.range(1).select(cols: _*))
  }
}

object CqlSession {
  /** A session over an empty table — CREATE TABLE analogue for tests/demos. */
  def emptyTable(spark: SparkSession, name: String, schema: StructType,
      partitionKeys: Seq[String], clusteringKeys: Seq[String] = Nil): CqlSession =
    new CqlSession(spark, Map(name ->
      CqlTable(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
        partitionKeys, clusteringKeys)))
}
