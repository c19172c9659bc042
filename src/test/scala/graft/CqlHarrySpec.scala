package graft

import graft.cql.CqlSession
import org.apache.spark.sql.types._

/** Harry-lite model check of the CQL TEXT write path (SURVEY §5.2.3;
  * upstream's Harry fuzzer plays the same game against a quiescent model):
  * random INSERT/UPDATE/DELETE sequences — with deliberately colliding
  * timestamps — execute through `CqlSession.execute`, and the final SELECT
  * must equal an INDEPENDENT in-memory implementation of Cassandra's
  * reconcile rules (upstream `db/rows/Rows.merge` / `Cells.reconcile` [U]):
  *
  *  - higher writetime wins; at equal writetime a tombstone beats a live
  *    cell, and between live cells the greater value wins;
  *  - a row/partition tombstone shadows everything at ts <= its own;
  *  - an INSERT's row marker keeps the row alive after all-cell deletes,
  *    an UPDATE-only row disappears with its last live cell.
  *
  * Any divergence between the engine's distributed fold and this 40-line
  * model is a real semantics bug in one of them. */
class CqlHarrySpec extends SparkSpec {

  private case class MCell(ts: Long, tomb: Boolean, v: Option[Any])

  /** Reconcile winner: lexicographic max of (ts, tomb, value). */
  private def winner(cells: Seq[MCell], rowDel: Long): Option[Any] = {
    val live = cells.filter(_.ts > rowDel)
    if (live.isEmpty) None
    else {
      val w = live.maxBy(c => (c.ts, c.tomb, c.v match {
        case Some(l: Long) => ("%019d".format(l), "")
        case Some(s: String) => ("", s)
        case _ => ("", "")
      }))
      if (w.tomb) None else w.v
    }
  }

  private class Model {
    val cellsA = collection.mutable.Map.empty[Long, List[MCell]].withDefaultValue(Nil)
    val cellsB = collection.mutable.Map.empty[Long, List[MCell]].withDefaultValue(Nil)
    val markers = collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    val rowDel = collection.mutable.Map.empty[Long, Long].withDefaultValue(Long.MinValue)

    def visible: Seq[(Long, Option[Long], Option[String])] =
      (cellsA.keySet ++ cellsB.keySet ++ markers.keySet).toSeq.sorted.flatMap { pk =>
        val del = rowDel(pk)
        val a = winner(cellsA(pk), del).map(_.asInstanceOf[Long])
        val b = winner(cellsB(pk), del).map(_.asInstanceOf[String])
        val markerLive = markers(pk).exists(_ > del)
        if (a.nonEmpty || b.nonEmpty || markerLive) Some((pk, a, b)) else None
      }
  }

  test("random mutation sequences match the reconcile model (engine ≡ model)") {
    // GRAFT_FUZZ_ROUNDS / GRAFT_FUZZ_SEED: long-hunt knobs (defaults = CI)
    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260813L))
    val nRounds = sys.env.getOrElse("GRAFT_FUZZ_ROUNDS", "8").toInt
    for (round <- 1 to nRounds) {
      val s = CqlSession.emptyTable(spark, "t", StructType(Seq(
        StructField("pk", LongType), StructField("a", LongType),
        StructField("b", StringType))), partitionKeys = Seq("pk"))
      val m = new Model
      for (_ <- 1 to 24) {
        val pk = rnd.nextInt(3).toLong
        val ts = 1L + rnd.nextInt(8) // small range → frequent collisions
        rnd.nextInt(8) match {
          case 0 =>
            val (av, bv) = (rnd.nextInt(5).toLong, s"v${rnd.nextInt(5)}")
            s.execute(s"INSERT INTO t (pk, a, b) VALUES ($pk, $av, '$bv') " +
              s"USING TIMESTAMP $ts")
            m.markers(pk) ::= ts
            m.cellsA(pk) ::= MCell(ts, tomb = false, Some(av))
            m.cellsB(pk) ::= MCell(ts, tomb = false, Some(bv))
          case 1 =>
            val av = rnd.nextInt(5).toLong
            s.execute(s"INSERT INTO t (pk, a) VALUES ($pk, $av) " +
              s"USING TIMESTAMP $ts")
            m.markers(pk) ::= ts
            m.cellsA(pk) ::= MCell(ts, tomb = false, Some(av))
          case 2 =>
            val av = rnd.nextInt(5).toLong
            s.execute(s"UPDATE t USING TIMESTAMP $ts SET a = $av WHERE pk = $pk")
            m.cellsA(pk) ::= MCell(ts, tomb = false, Some(av))
          case 3 =>
            val bv = s"v${rnd.nextInt(5)}"
            s.execute(s"UPDATE t USING TIMESTAMP $ts SET b = '$bv' WHERE pk = $pk")
            m.cellsB(pk) ::= MCell(ts, tomb = false, Some(bv))
          case 4 =>
            val (av, bv) = (rnd.nextInt(5).toLong, s"v${rnd.nextInt(5)}")
            s.execute(s"UPDATE t USING TIMESTAMP $ts SET a = $av, b = '$bv' " +
              s"WHERE pk = $pk")
            m.cellsA(pk) ::= MCell(ts, tomb = false, Some(av))
            m.cellsB(pk) ::= MCell(ts, tomb = false, Some(bv))
          case 5 =>
            s.execute(s"DELETE FROM t USING TIMESTAMP $ts WHERE pk = $pk")
            m.rowDel(pk) = math.max(m.rowDel(pk), ts)
          case 6 =>
            s.execute(s"DELETE a FROM t USING TIMESTAMP $ts WHERE pk = $pk")
            m.cellsA(pk) ::= MCell(ts, tomb = true, None)
          case 7 =>
            s.execute(s"DELETE b FROM t USING TIMESTAMP $ts WHERE pk = $pk")
            m.cellsB(pk) ::= MCell(ts, tomb = true, None)
        }
      }
      val got = s.execute("SELECT pk, a, b FROM t").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          Option(r.getString(2))))
        .sortBy(_._1).toSeq
      assert(got === m.visible, s"engine diverged from model in round $round")
    }
  }

  /** Clustering-key variant: partition tombstones (`DELETE WHERE pk=…`)
    * shadow every older row of the partition; row tombstones target one
    * (pk, ck); both interact with cell writes, markers, and each other at
    * colliding timestamps. */
  private class CkModel {
    case class K(pk: Long, ck: Long)
    val cellsA = collection.mutable.Map.empty[K, List[MCell]].withDefaultValue(Nil)
    val markers = collection.mutable.Map.empty[K, List[Long]].withDefaultValue(Nil)
    val rowDel = collection.mutable.Map.empty[K, Long].withDefaultValue(Long.MinValue)
    val partDel = collection.mutable.Map.empty[Long, Long].withDefaultValue(Long.MinValue)

    def visible: Seq[(Long, Long, Option[Long])] =
      (cellsA.keySet ++ markers.keySet).toSeq.sortBy(k => (k.pk, k.ck))
        .flatMap { k =>
          val del = math.max(rowDel(k), partDel(k.pk))
          val a = winner(cellsA(k), del).map(_.asInstanceOf[Long])
          val markerLive = markers(k).exists(_ > del)
          if (a.nonEmpty || markerLive) Some((k.pk, k.ck, a)) else None
        }
  }

  test("random mutations with clustering keys and partition tombstones match the model") {
    val rnd = new scala.util.Random(8138102L)
    for (round <- 1 to 6) {
      val s = CqlSession.emptyTable(spark, "t", StructType(Seq(
        StructField("pk", LongType), StructField("ck", LongType),
        StructField("a", LongType))),
        partitionKeys = Seq("pk"), clusteringKeys = Seq("ck"))
      val m = new CkModel
      for (_ <- 1 to 28) {
        val pk = rnd.nextInt(2).toLong
        val ck = rnd.nextInt(3).toLong
        val ts = 1L + rnd.nextInt(8)
        val k = m.K(pk, ck)
        rnd.nextInt(8) match {
          case 0 | 1 =>
            val av = rnd.nextInt(5).toLong
            s.execute(s"INSERT INTO t (pk, ck, a) VALUES ($pk, $ck, $av) " +
              s"USING TIMESTAMP $ts")
            m.markers(k) ::= ts
            m.cellsA(k) ::= MCell(ts, tomb = false, Some(av))
          case 2 | 3 =>
            val av = rnd.nextInt(5).toLong
            s.execute(s"UPDATE t USING TIMESTAMP $ts SET a = $av " +
              s"WHERE pk = $pk AND ck = $ck")
            m.cellsA(k) ::= MCell(ts, tomb = false, Some(av))
          case 4 | 5 =>
            s.execute(s"DELETE FROM t USING TIMESTAMP $ts " +
              s"WHERE pk = $pk AND ck = $ck")
            m.rowDel(k) = math.max(m.rowDel(k), ts)
          case 6 =>
            s.execute(s"DELETE FROM t USING TIMESTAMP $ts WHERE pk = $pk")
            m.partDel(pk) = math.max(m.partDel(pk), ts)
          case 7 =>
            s.execute(s"DELETE a FROM t USING TIMESTAMP $ts " +
              s"WHERE pk = $pk AND ck = $ck")
            m.cellsA(k) ::= MCell(ts, tomb = true, None)
        }
      }
      val got = s.execute("SELECT pk, ck, a FROM t").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .sortBy(t2 => (t2._1, t2._2)).toSeq
      assert(got === m.visible,
        s"engine diverged from clustering model in round $round")
    }
  }

  /** Static-column variant: static cells live per PARTITION — row deletes
    * never touch them, partition deletes do, and a partition whose rows
    * are all gone but whose static survives answers with one phantom row
    * (null clustering). */
  private class StaticModel {
    case class K(pk: Long, ck: Long)
    val cellsA = collection.mutable.Map.empty[K, List[MCell]].withDefaultValue(Nil)
    val markers = collection.mutable.Map.empty[K, List[Long]].withDefaultValue(Nil)
    val statics = collection.mutable.Map.empty[Long, List[MCell]].withDefaultValue(Nil)
    val rowDel = collection.mutable.Map.empty[K, Long].withDefaultValue(Long.MinValue)
    val partDel = collection.mutable.Map.empty[Long, Long].withDefaultValue(Long.MinValue)

    def visible: Seq[(Long, Option[Long], Option[Long], Option[Long])] = {
      val pks = (cellsA.keySet.map(_.pk) ++ statics.keySet).toSeq.sorted
      pks.flatMap { pk =>
        val st = winner(statics(pk), partDel(pk)).map(_.asInstanceOf[Long])
        val rows = cellsA.keySet.filter(_.pk == pk).toSeq.sortBy(_.ck)
          .flatMap { k =>
            val del = math.max(rowDel(k), partDel(pk))
            val a = winner(cellsA(k), del).map(_.asInstanceOf[Long])
            val live = a.nonEmpty || markers(k).exists(_ > del)
            if (live) Some((pk, Some(k.ck), a, st)) else None
          }
        if (rows.nonEmpty) rows
        else if (st.nonEmpty) Seq((pk, None, None, st)) // phantom static row
        else Nil
      }
    }
  }

  test("random mutations with static columns match the model (phantom rows included)") {
    val rnd = new scala.util.Random(5550123L)
    for (round <- 1 to 6) {
      val s = CqlSession.emptyTable(spark, "t", StructType(Seq(
        StructField("pk", LongType), StructField("ck", LongType),
        StructField("a", LongType), StructField("st", LongType))),
        partitionKeys = Seq("pk"), clusteringKeys = Seq("ck"),
        staticKeys = Seq("st"))
      val m = new StaticModel
      for (_ <- 1 to 28) {
        val pk = rnd.nextInt(2).toLong
        val ck = rnd.nextInt(3).toLong
        val ts = 1L + rnd.nextInt(8)
        val k = m.K(pk, ck)
        rnd.nextInt(8) match {
          case 0 =>
            val (av, sv) = (rnd.nextInt(5).toLong, rnd.nextInt(5).toLong)
            s.execute(s"INSERT INTO t (pk, ck, a, st) VALUES " +
              s"($pk, $ck, $av, $sv) USING TIMESTAMP $ts")
            m.markers(k) ::= ts
            m.cellsA(k) ::= MCell(ts, tomb = false, Some(av))
            m.statics(pk) ::= MCell(ts, tomb = false, Some(sv))
          case 1 | 2 =>
            val av = rnd.nextInt(5).toLong
            s.execute(s"INSERT INTO t (pk, ck, a) VALUES ($pk, $ck, $av) " +
              s"USING TIMESTAMP $ts")
            m.markers(k) ::= ts
            m.cellsA(k) ::= MCell(ts, tomb = false, Some(av))
          case 3 =>
            val av = rnd.nextInt(5).toLong
            s.execute(s"UPDATE t USING TIMESTAMP $ts SET a = $av " +
              s"WHERE pk = $pk AND ck = $ck")
            m.cellsA(k) ::= MCell(ts, tomb = false, Some(av))
          case 4 =>
            val sv = rnd.nextInt(5).toLong
            s.execute(s"UPDATE t USING TIMESTAMP $ts SET st = $sv " +
              s"WHERE pk = $pk")
            m.statics(pk) ::= MCell(ts, tomb = false, Some(sv))
          case 5 =>
            s.execute(s"DELETE FROM t USING TIMESTAMP $ts " +
              s"WHERE pk = $pk AND ck = $ck")
            m.rowDel(k) = math.max(m.rowDel(k), ts)
          case 6 =>
            s.execute(s"DELETE FROM t USING TIMESTAMP $ts WHERE pk = $pk")
            m.partDel(pk) = math.max(m.partDel(pk), ts)
          case 7 =>
            s.execute(s"DELETE a FROM t USING TIMESTAMP $ts " +
              s"WHERE pk = $pk AND ck = $ck")
            m.cellsA(k) ::= MCell(ts, tomb = true, None)
        }
      }
      val got = s.execute("SELECT pk, ck, a, st FROM t").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .sortBy(t4 => (t4._1, t4._2)).toSeq
      assert(got === m.visible.sortBy(t4 => (t4._1, t4._2)),
        s"engine diverged from static model in round $round")
    }
  }

  test("random mutation sequences fire the audit trigger exactly once " +
    "per applied statement (audit ≡ model)") {
    // triggers joined the write path in r8: the audit table's reconciled
    // state after a random script must equal a per-statement model — one
    // augmented row per applied mutation keyed (pk, client ts), colliding
    // keys resolved last-statement-wins (the augmented writes carry
    // strictly increasing server timestamps)
    val rnd = new scala.util.Random(20260814L)
    val s = CqlSession(spark)
    s.execute("CREATE TABLE ht (k bigint PRIMARY KEY, v double)")
    s.execute("CREATE TABLE audit11 (k bigint, wt bigint, op text, " +
      "v double, PRIMARY KEY (k, wt))")
    s.execute("CREATE TRIGGER haud ON ht " +
      "USING 'graft.operators.GateAuditTrigger'")
    val model =
      collection.mutable.Map.empty[(Long, Long), (String, Option[Double])]
    for (_ <- 1 to 40) {
      val pk = rnd.nextInt(4).toLong
      val ts = 1L + rnd.nextInt(10) // collisions on purpose
      rnd.nextInt(3) match {
        case 0 =>
          val v = rnd.nextInt(100).toDouble
          s.execute(s"INSERT INTO ht (k, v) VALUES ($pk, $v) " +
            s"USING TIMESTAMP $ts")
          model((pk, ts)) = ("W", Some(v))
        case 1 =>
          val v = rnd.nextInt(100).toDouble
          s.execute(s"UPDATE ht USING TIMESTAMP $ts SET v = $v WHERE k = $pk")
          model((pk, ts)) = ("W", Some(v))
        case 2 =>
          s.execute(s"DELETE FROM ht USING TIMESTAMP $ts WHERE k = $pk")
          model((pk, ts)) = ("D", None)
      }
    }
    val got = s.execute("SELECT k, wt, op, v FROM audit11").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got === model.toMap)
  }

  test("COPY round-trips random reconciled states (export → import ≡ original)") {
    // the reconciled VIEW is what COPY TO exports; importing it into a
    // fresh table must reproduce exactly that view — ties the CSV bridge
    // into the same model-checked write path as everything else
    val rnd = new scala.util.Random(90125834L)
    for (round <- 1 to 3) {
      val s = CqlSession.emptyTable(spark, "src_t", StructType(Seq(
        StructField("pk", LongType), StructField("ck", LongType),
        StructField("a", LongType), StructField("b", StringType))),
        partitionKeys = Seq("pk"), clusteringKeys = Seq("ck"))
      for (_ <- 1 to 25) {
        val pk = rnd.nextInt(3).toLong
        val ck = rnd.nextInt(4).toLong
        val ts = 1L + rnd.nextInt(8)
        rnd.nextInt(5) match {
          case 0 | 1 => s.execute("INSERT INTO src_t (pk, ck, a, b) VALUES " +
            s"($pk, $ck, ${rnd.nextInt(9)}, 'v${rnd.nextInt(9)}') " +
            s"USING TIMESTAMP $ts")
          case 2 => s.execute(s"UPDATE src_t USING TIMESTAMP $ts SET " +
            s"a = ${rnd.nextInt(9)} WHERE pk = $pk AND ck = $ck")
          case 3 => s.execute(s"DELETE FROM src_t USING TIMESTAMP $ts " +
            s"WHERE pk = $pk AND ck = $ck")
          case 4 => s.execute(s"DELETE b FROM src_t USING TIMESTAMP $ts " +
            s"WHERE pk = $pk AND ck = $ck")
        }
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-harry-copy")
        .toString + "/out"
      s.execute(s"COPY src_t TO '$dir'")
      s.execute("CREATE TABLE dst_t (pk bigint, ck bigint, a bigint, " +
        "b text, PRIMARY KEY (pk, ck))")
      s.execute(s"COPY dst_t FROM '$dir'")
      def view(t: String) = s.execute(s"SELECT pk, ck, a, b FROM $t")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getString(3))))
        .sortBy(t4 => (t4._1, t4._2)).toSeq
      assert(view("dst_t") === view("src_t"),
        s"COPY round-trip diverged in round $round")
    }
  }

  test("paged reads reassemble random mutation states exactly (paging ≡ unpaged)") {
    // Harry-style check of O4 paging over reconciled state: after a random
    // mutation burst, concatenated pages — single-partition, pk IN, and
    // full scan, at several fetch sizes — must equal the unpaged result in
    // page order, with no row lost or duplicated at any page boundary.
    val rnd = new scala.util.Random(41290735L)
    for (round <- 1 to 4) {
      val s = CqlSession.emptyTable(spark, "t", StructType(Seq(
        StructField("pk", LongType), StructField("ck", LongType),
        StructField("a", LongType))),
        partitionKeys = Seq("pk"), clusteringKeys = Seq("ck"))
      for (_ <- 1 to 30) {
        val pk = rnd.nextInt(3).toLong
        val ck = rnd.nextInt(5).toLong
        val ts = 1L + rnd.nextInt(8)
        rnd.nextInt(6) match {
          case 0 | 1 | 2 => s.execute("INSERT INTO t (pk, ck, a) VALUES " +
            s"($pk, $ck, ${rnd.nextInt(9)}) USING TIMESTAMP $ts")
          case 3 => s.execute(s"UPDATE t USING TIMESTAMP $ts SET " +
            s"a = ${rnd.nextInt(9)} WHERE pk = $pk AND ck = $ck")
          case 4 => s.execute(s"DELETE FROM t USING TIMESTAMP $ts " +
            s"WHERE pk = $pk AND ck = $ck")
          case 5 => s.execute(s"DELETE a FROM t USING TIMESTAMP $ts " +
            s"WHERE pk = $pk AND ck = $ck")
        }
      }
      val eng = s.engineView
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
      val whole = rows(eng.execute("SELECT pk, ck, a FROM t"))
        .sortBy(t3 => (t3._1, t3._2))
      for (fetch <- Seq(1, 2, 7)) {
        val scan = eng.executePaged("SELECT pk, ck, a FROM t", fetch)
          .flatMap(rows).toSeq
        assert(scan === whole, s"full-scan paging fetch=$fetch round $round")
        val in = eng.executePaged(
          "SELECT pk, ck, a FROM t WHERE pk IN (0, 2)", fetch)
          .flatMap(rows).toSeq
        assert(in === whole.filter(t3 => t3._1 == 0L || t3._1 == 2L),
          s"pk IN paging fetch=$fetch round $round")
        val single = eng.executePaged(
          "SELECT pk, ck, a FROM t WHERE pk = 1", fetch).flatMap(rows).toSeq
        assert(single === whole.filter(_._1 == 1L),
          s"single-partition paging fetch=$fetch round $round")
      }
    }
  }
}
