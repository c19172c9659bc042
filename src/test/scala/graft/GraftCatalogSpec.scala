package graft

import graft.cql.CqlSession

class GraftCatalogSpec extends SparkSpec {

  test("three-part-name Spark SQL reads the CQL registry") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_users (user_id bigint PRIMARY KEY, " +
      "name text, age bigint)")
    s.execute("INSERT INTO cat_users (user_id, name, age) VALUES (1, 'ann', 30)")
    s.execute("INSERT INTO cat_users (user_id, name, age) VALUES (2, 'bob', 40)")
    s.exposeAsCatalog("graft")
    val rows = spark.sql(
      "SELECT user_id, name FROM graft.default.cat_users ORDER BY user_id")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "ann"), (2L, "bob")))
    // catalog reads see the reconciled view: a newer write wins
    s.execute("UPDATE cat_users SET name = 'anna' WHERE user_id = 1")
    val after = spark.sql(
      "SELECT name FROM graft.default.cat_users WHERE user_id = 1").collect()
    assert(after.map(_.getString(0)).toSeq === Seq("anna"))
    // and a session-side DELETE disappears from the Spark-side read
    s.execute("DELETE FROM cat_users WHERE user_id = 2")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.cat_users")
      .head().getLong(0) === 1L)
  }

  test("Spark SQL DELETE routes through the CQL tombstone path") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_del (k bigint PRIMARY KEY, v text)")
    (1L to 5L).foreach(i =>
      s.execute(s"INSERT INTO cat_del (k, v) VALUES ($i, 'v$i')"))
    s.exposeAsCatalog("graft")
    spark.sql("DELETE FROM graft.default.cat_del WHERE k = 2")
    // IN expands under one shared timestamp, like the CQL verb
    spark.sql("DELETE FROM graft.default.cat_del WHERE k IN (4, 5)")
    assert(spark.sql("SELECT k FROM graft.default.cat_del ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // the delete is a real tombstone: CQL-side reads agree
    assert(s.execute("SELECT k FROM cat_del").collect().map(_.getLong(0))
      .sorted.toSeq === Seq(1L, 3L))
    // a CQL write AFTER the Spark delete resurrects the row (newer ts wins)
    s.execute("INSERT INTO cat_del (k, v) VALUES (2, 'back')")
    assert(spark.sql(
      "SELECT v FROM graft.default.cat_del WHERE k = 2").head().getString(0)
      === "back")
  }

  test("Spark SQL DELETE with non-key predicates falls back to the " +
    "row-level delta path (scan → delete by primary key)") {
    // r10–r11 behavior was an analysis-time refusal; r12's
    // SupportsRowLevelOperations makes arbitrary-predicate DELETE work:
    // Spark scans for matching rows and the delta deletes them BY KEY,
    // so the tombstones written are exactly CQL's
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_del2 (k bigint PRIMARY KEY, v text)")
    s.execute("INSERT INTO cat_del2 (k, v) VALUES (1, 'x')")
    s.execute("INSERT INTO cat_del2 (k, v) VALUES (2, 'xy')")
    s.execute("INSERT INTO cat_del2 (k, v) VALUES (3, 'z')")
    s.exposeAsCatalog("graft")
    spark.sql("DELETE FROM graft.default.cat_del2 WHERE v LIKE 'x%'")
    assert(spark.sql("SELECT k FROM graft.default.cat_del2 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
    // the deletes are real tombstones: CQL-side reads agree, and a later
    // CQL write resurrects the row (newer timestamp wins)
    assert(s.execute("SELECT k FROM cat_del2").collect().map(_.getLong(0))
      .toSeq === Seq(3L))
    s.execute("INSERT INTO cat_del2 (k, v) VALUES (1, 'back')")
    assert(s.execute("SELECT v FROM cat_del2 WHERE k = 1").head()
      .getString(0) === "back")
  }

  test("Spark SQL UPDATE rewrites through the delta path: post-image " +
    "upserts, explicit nulls tombstone, key-moving update = delete+insert") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_upd (k bigint PRIMARY KEY, v text, n bigint)")
    s.execute("INSERT INTO cat_upd (k, v, n) VALUES (1, 'a', 10)")
    s.execute("INSERT INTO cat_upd (k, v, n) VALUES (2, 'b', 20)")
    s.execute("INSERT INTO cat_upd (k, v, n) VALUES (3, 'c', 30)")
    s.exposeAsCatalog("graft")
    spark.sql("UPDATE graft.default.cat_upd SET n = n + 100 WHERE k <= 2")
    assert(spark.sql(
      "SELECT k, n FROM graft.default.cat_upd ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 110L), (2L, 120L), (3L, 30L)))
    // CQL side agrees (same reconcile view)
    assert(s.execute("SELECT n FROM cat_upd WHERE k = 1").head()
      .getLong(0) === 110L)
    // SET v = NULL writes a cell tombstone, not a no-op: the old value
    // must NOT resurrect
    spark.sql("UPDATE graft.default.cat_upd SET v = NULL WHERE k = 3")
    assert(s.execute("SELECT v FROM cat_upd WHERE k = 3").head().isNullAt(0))
    // a key-moving UPDATE (inexpressible in CQL) maps to delete+insert
    spark.sql("UPDATE graft.default.cat_upd SET k = 7 WHERE k = 2")
    assert(spark.sql("SELECT k FROM graft.default.cat_upd ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 7L))
    assert(s.execute("SELECT v FROM cat_upd WHERE k = 7").head()
      .getString(0) === "b")
  }

  test("Spark SQL MERGE INTO compiles to upserts + tombstones under one " +
    "coordinator timestamp") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_mrg (k bigint PRIMARY KEY, v text, n bigint)")
    s.execute("INSERT INTO cat_mrg (k, v, n) VALUES (1, 'old1', 1)")
    s.execute("INSERT INTO cat_mrg (k, v, n) VALUES (2, 'old2', 2)")
    s.execute("INSERT INTO cat_mrg (k, v, n) VALUES (3, 'old3', 3)")
    s.exposeAsCatalog("graft")
    import spark.implicits._
    Seq((2L, "new2", 20L), (3L, "del", 0L), (4L, "new4", 40L))
      .toDF("k", "v", "n").createOrReplaceTempView("mrg_src")
    spark.sql(
      """MERGE INTO graft.default.cat_mrg t USING mrg_src s ON t.k = s.k
         WHEN MATCHED AND s.v = 'del' THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
         WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, s.v, s.n)""")
    assert(spark.sql(
      "SELECT k, v, n FROM graft.default.cat_mrg ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1L, "old1", 1L), (2L, "new2", 20L), (4L, "new4", 40L)))
    // both surfaces see one reconciled truth
    assert(s.execute("SELECT count(*) FROM cat_mrg").head().getLong(0) === 3L)
    // ONE coordinator timestamp for the whole statement: every cell the
    // merge wrote carries the same writetime
    val wts = s.execute(
      "SELECT WRITETIME(v) FROM cat_mrg WHERE k IN (2, 4)").collect()
      .map(_.getLong(0)).distinct
    assert(wts.length === 1, s"merge cells carry ${wts.length} writetimes")
  }

  test("row-level ops enforce MODIFY and refuse masked tables without " +
    "UNMASK (the rewrite would persist masked values)") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_rl (k bigint PRIMARY KEY, " +
      "ssn text MASKED WITH mask_replace('X'), n bigint)")
    s.execute("INSERT INTO cat_rl (k, ssn, n) VALUES (1, 'secret', 5)")
    s.execute("CREATE ROLE rl_writer WITH LOGIN = true AND PASSWORD = 'p'")
    s.execute("GRANT SELECT ON cat_rl TO rl_writer")
    s.execute("GRANT MODIFY ON cat_rl TO rl_writer")
    s.exposeAsCatalog("graft")
    s.login("rl_writer", "p")
    try {
      // MODIFY granted but no UNMASK: the update must refuse rather than
      // write back the masked rendering of untouched columns
      val e = intercept[Exception] {
        spark.sql("UPDATE graft.default.cat_rl SET n = 6 WHERE k = 1")
      }
      assert(e.getMessage.contains("UNMASK"), e.getMessage)
    } finally s.login("cassandra", "cassandra")
    s.execute("GRANT UNMASK ON cat_rl TO rl_writer")
    s.login("rl_writer", "p")
    try {
      spark.sql("UPDATE graft.default.cat_rl SET n = 6 WHERE k = 1")
    } finally s.login("cassandra", "cassandra")
    val r = s.execute("SELECT ssn, n FROM cat_rl WHERE k = 1").head()
    assert(r.getString(0) === "secret" && r.getLong(1) === 6L,
      "clear value survives a row-level update by an UNMASK-granted role")
    // and a role WITHOUT MODIFY is refused outright
    s.execute("CREATE ROLE rl_reader WITH LOGIN = true AND PASSWORD = 'p'")
    s.execute("GRANT SELECT ON cat_rl TO rl_reader")
    s.execute("GRANT UNMASK ON cat_rl TO rl_reader")
    s.login("rl_reader", "p")
    try {
      val e = intercept[Exception] {
        spark.sql("UPDATE graft.default.cat_rl SET n = 7 WHERE k = 1")
      }
      assert(e.getMessage.toLowerCase.contains("modify"), e.getMessage)
    } finally s.login("cassandra", "cassandra")
  }

  test("UPDATE on a blob-keyed table is ONE upsert (byte[] key equality " +
    "— reference equality would tombstone the row it updates)") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_blob (k blob PRIMARY KEY, n bigint)")
    s.execute("INSERT INTO cat_blob (k, n) VALUES (0x0102, 1)")
    s.execute("INSERT INTO cat_blob (k, n) VALUES (0xff, 7)")
    s.exposeAsCatalog("graft")
    spark.sql("UPDATE graft.default.cat_blob SET n = n + 10 WHERE n < 5")
    // misread key equality would emit delete(k)+upsert(k) at ONE shared
    // timestamp — the tombstone wins the tie and the row disappears
    val rows = spark.sql(
      "SELECT n FROM graft.default.cat_blob ORDER BY n").collect()
      .map(_.getLong(0)).toSeq
    assert(rows === Seq(7L, 11L), s"blob-keyed update lost rows: $rows")
    assert(s.execute("SELECT count(*) FROM cat_blob").head()
      .getLong(0) === 2L)
  }

  test("row-level ops address compound (partition, clustering) keys") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_ck (p bigint, c bigint, v text, " +
      "PRIMARY KEY (p, c))")
    Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "c")).foreach {
      case (p, c, v) =>
        s.execute(s"INSERT INTO cat_ck (p, c, v) VALUES ($p, $c, '$v')")
    }
    s.exposeAsCatalog("graft")
    // the rowId is the FULL primary key: only (1,2) changes
    spark.sql("UPDATE graft.default.cat_ck SET v = 'x' " +
      "WHERE p = 1 AND c = 2")
    assert(spark.sql("SELECT v FROM graft.default.cat_ck ORDER BY p, c")
      .collect().map(_.getString(0)).toSeq === Seq("a", "x", "c"))
    // non-key predicate DELETE goes through the delta and tombstones
    // exactly the addressed row
    spark.sql("DELETE FROM graft.default.cat_ck WHERE v = 'x'")
    assert(s.execute("SELECT p, c FROM cat_ck").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      Seq((1L, 1L), (2L, 1L)))
    // a partition-key-only DELETE stays on the METADATA path (one CQL
    // partition tombstone, not a per-row delta): the addressable subset
    // the r12 canDeleteWhere tightening must keep claiming
    s.execute("INSERT INTO cat_ck (p, c, v) VALUES (1, 5, 'e')")
    spark.sql("DELETE FROM graft.default.cat_ck WHERE p = 1")
    assert(s.execute("SELECT p FROM cat_ck").collect()
      .map(_.getLong(0)).toSeq === Seq(2L),
      "partition delete must clear every clustering row under p = 1")
  }

  test("chained key-move UPDATE (SET k = k + 1): a delete colliding with " +
    "an upserted key must not tombstone the moved row") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_chain (k bigint PRIMARY KEY, v text)")
    (1L to 3L).foreach(i =>
      s.execute(s"INSERT INTO cat_chain (k, v) VALUES ($i, 'v$i')"))
    s.exposeAsCatalog("graft")
    // rows move 1→2, 2→3, 3→4: the delta holds delete(2)+upsert(2) and
    // delete(3)+upsert(3) — at one shared timestamp a surviving row
    // tombstone would win the tie and erase the moved rows
    spark.sql("UPDATE graft.default.cat_chain SET k = k + 1")
    val got = spark.sql(
      "SELECT k, v FROM graft.default.cat_chain ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((2L, "v1"), (3L, "v2"), (4L, "v3")),
      s"chained key-move lost rows: $got")
    // the vacated head key is gone on both surfaces
    assert(s.execute("SELECT count(*) FROM cat_chain").head()
      .getLong(0) === 3L)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE branches (update + delete) " +
    "rewrite through the same delta") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_nbs (k bigint PRIMARY KEY, v text, n bigint)")
    (1L to 4L).foreach(i =>
      s.execute(s"INSERT INTO cat_nbs (k, v, n) VALUES ($i, 'v$i', $i)"))
    s.exposeAsCatalog("graft")
    import spark.implicits._
    Seq((2L, 20L), (3L, 30L)).toDF("k", "n")
      .createOrReplaceTempView("nbs_src")
    spark.sql(
      """MERGE INTO graft.default.cat_nbs t USING nbs_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET n = s.n
         WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN DELETE
         WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    val got = spark.sql(
      "SELECT k, v, n FROM graft.default.cat_nbs ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((2L, "v2", 20L), (3L, "v3", 30L),
      (4L, "stale", 4L)))
    // CQL surface sees the same post-state
    assert(s.execute("SELECT v FROM cat_nbs WHERE k = 4").head()
      .getString(0) === "stale")
    assert(s.execute("SELECT count(*) FROM cat_nbs").head().getLong(0) === 3L)
  }

  test("MERGE fuzz: 10 seeded random three-branch merges converge to an " +
    "independent in-memory model on BOTH surfaces") {
    val rnd = new scala.util.Random(20260815L)
    val s = CqlSession(spark)
    s.exposeAsCatalog("graftfz")
    import spark.implicits._
    for (round <- 1 to 10) {
      val tbl = s"mfz$round"
      s.execute(s"CREATE TABLE $tbl (k bigint PRIMARY KEY, v text, n bigint)")
      val target = (0L until 20L).filter(_ => rnd.nextBoolean())
        .map(k => (k, s"t$k", rnd.nextInt(100).toLong))
      target.foreach { case (k, v, n) =>
        s.execute(s"INSERT INTO $tbl (k, v, n) VALUES ($k, '$v', $n)") }
      // act: 0 = delete-if-matched, 1/2 = update-or-insert
      val source = (0L until 25L).filter(_ => rnd.nextBoolean())
        .map(k => (k, s"s$k", rnd.nextInt(100).toLong, rnd.nextInt(3)))
      source.toDF("k", "v", "n", "act")
        .createOrReplaceTempView(s"mfz_src$round")
      spark.sql(
        s"""MERGE INTO graftfz.default.$tbl t USING mfz_src$round s
           ON t.k = s.k
           WHEN MATCHED AND s.act = 0 THEN DELETE
           WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n + t.n
           WHEN NOT MATCHED AND s.act <> 0 THEN
             INSERT (k, v, n) VALUES (s.k, s.v, s.n)""")
      // the model: plain scala fold of the same branch semantics
      val tmap = target.map(t => t._1 -> t).toMap
      val expected = scala.collection.mutable.Map.empty[Long, (String, Long)]
      target.foreach { case (k, v, n) => expected(k) = (v, n) }
      source.foreach { case (k, v, n, act) =>
        if (tmap.contains(k)) {
          if (act == 0) expected.remove(k)
          else expected(k) = (v, n + tmap(k)._3)
        } else if (act != 0) expected(k) = (v, n)
      }
      val got = spark.sql(s"SELECT k, v, n FROM graftfz.default.$tbl")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
        .toMap
      assert(got === expected.toMap, s"round $round (Spark read) diverged")
      val cql = s.execute(s"SELECT k, v, n FROM $tbl").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(cql === expected.toMap, s"round $round (CQL read) diverged")
    }
  }

  test("MERGE INTO a materialized view refuses at analysis") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_mvb (k bigint PRIMARY KEY, v bigint)")
    s.execute("INSERT INTO cat_mvb (k, v) VALUES (1, 2)")
    s.execute("CREATE MATERIALIZED VIEW cat_mvv AS SELECT k, v FROM " +
      "cat_mvb WHERE k IS NOT NULL AND v IS NOT NULL PRIMARY KEY (v, k)")
    s.exposeAsCatalog("graft")
    val e = intercept[Exception] {
      spark.sql("UPDATE graft.default.cat_mvv SET v = 9 WHERE k = 1")
    }
    assert(e.getMessage.contains("not writable"), e.getMessage)
  }

  test("Spark SQL TRUNCATE TABLE is the CQL verb, auto_snapshot included") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_tr (k bigint PRIMARY KEY, v text)")
    s.execute("INSERT INTO cat_tr (k, v) VALUES (1, 'x')")
    s.execute("INSERT INTO cat_tr (k, v) VALUES (2, 'y')")
    s.exposeAsCatalog("graft")
    spark.sql("TRUNCATE TABLE graft.default.cat_tr")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.cat_tr")
      .head().getLong(0) === 0L)
    // the safety net fired: a truncated-N-cat_tr snapshot exists
    val snaps = s.execute(
      "SELECT name FROM system_views.snapshots").collect()
      .map(_.getString(0))
    assert(snaps.exists(_.matches("truncated-\\d+-cat_tr")), snaps.toSeq)
  }

  test("SHOW TABLES / SHOW NAMESPACES list the registry") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_t1 (k bigint PRIMARY KEY, v bigint)")
    s.execute("CREATE TABLE cat_t2 (k bigint PRIMARY KEY, v bigint)")
    s.exposeAsCatalog("graft")
    val tables = spark.sql("SHOW TABLES IN graft.default").collect()
      .map(_.getString(1)).toSet
    assert(Set("cat_t1", "cat_t2").subsetOf(tables))
    val namespaces = spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).toSet
    assert(namespaces.contains("default"))
    assert(namespaces.contains("system_schema"))
  }

  test("system virtual tables are reachable by three-part name") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_sys (k bigint PRIMARY KEY, v text)")
    s.exposeAsCatalog("graft")
    val names = spark.sql(
      "SELECT table_name FROM graft.system_schema.tables").collect()
      .map(_.getString(0)).toSet
    assert(names.contains("cat_sys"))
  }

  test("materialized views read through the catalog") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_ord (k bigint, c bigint, amt bigint, " +
      "PRIMARY KEY (k, c))")
    s.execute("INSERT INTO cat_ord (k, c, amt) VALUES (1, 1, 10)")
    s.execute("INSERT INTO cat_ord (k, c, amt) VALUES (1, 2, 20)")
    s.execute("CREATE MATERIALIZED VIEW cat_by_c AS SELECT c, k, amt " +
      "FROM cat_ord WHERE c IS NOT NULL AND k IS NOT NULL " +
      "PRIMARY KEY (c, k)")
    s.exposeAsCatalog("graft")
    val rows = spark.sql(
      "SELECT amt FROM graft.default.cat_by_c WHERE c = 2").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(20L))
  }

  test("CREATE TABLE ... PARTITIONED BY through the catalog maps to CQL") {
    val s = CqlSession(spark)
    s.exposeAsCatalog("graft")
    spark.sql("CREATE TABLE graft.default.cat_new " +
      "(k BIGINT, c BIGINT, v STRING) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('clustering_key' = 'c')")
    // the table landed in the CQL registry with the declared key shape
    s.execute("INSERT INTO cat_new (k, c, v) VALUES (1, 2, 'x')")
    assert(s.execute("SELECT v FROM cat_new WHERE k = 1 AND c = 2")
      .head().getString(0) === "x")
    assert(spark.sql("SELECT v FROM graft.default.cat_new WHERE k = 1")
      .head().getString(0) === "x")
    // ORDER BY on the clustering column is legal → ck registered
    s.execute("SELECT v FROM cat_new WHERE k = 1 ORDER BY c DESC")
    intercept[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException] {
      spark.sql("CREATE TABLE graft.default.cat_new (k BIGINT) " +
        "PARTITIONED BY (k)")
    }
  }

  test("INSERT INTO through the catalog lands in the CQL reconcile view") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_w (k bigint PRIMARY KEY, v text, n bigint)")
    s.execute("INSERT INTO cat_w (k, v, n) VALUES (1, 'cql', 10)")
    s.exposeAsCatalog("graft")
    spark.sql("INSERT INTO graft.default.cat_w VALUES (2, 'sparksql', 20)")
    // both surfaces see the Spark-SQL write
    assert(s.execute("SELECT v FROM cat_w WHERE k = 2").head()
      .getString(0) === "sparksql")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.cat_w")
      .head().getLong(0) === 2L)
    // the catalog write is a timestamped upsert: it shadows the older CQL
    // cell for the same key, and a NEWER CQL write shadows it back
    spark.sql("INSERT INTO graft.default.cat_w VALUES (1, 'sparksql2', 11)")
    assert(s.execute("SELECT v FROM cat_w WHERE k = 1").head()
      .getString(0) === "sparksql2")
    s.execute("UPDATE cat_w SET v = 'cql2' WHERE k = 1")
    assert(spark.sql("SELECT v FROM graft.default.cat_w WHERE k = 1")
      .head().getString(0) === "cql2")
    // multi-row INSERT ... SELECT stays one bulk append (and is visible)
    spark.sql("INSERT INTO graft.default.cat_w " +
      "SELECT id + 100, concat('r', id), id FROM range(5)")
    assert(s.execute("SELECT count(*) FROM cat_w").head().getLong(0) === 7L)
  }

  test("INSERT OVERWRITE through the catalog truncates then appends") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_ow (k bigint PRIMARY KEY, v text)")
    s.execute("INSERT INTO cat_ow (k, v) VALUES (1, 'old')")
    s.execute("INSERT INTO cat_ow (k, v) VALUES (2, 'old')")
    s.exposeAsCatalog("graft")
    spark.sql("INSERT OVERWRITE graft.default.cat_ow VALUES (3, 'new')")
    assert(s.execute("SELECT count(*) FROM cat_ow").head().getLong(0) === 1L)
    assert(s.execute("SELECT v FROM cat_ow WHERE k = 3").head()
      .getString(0) === "new")
  }

  test("catalog writes enforce the session's auth and key contracts") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_wauth (k bigint PRIMARY KEY, v bigint)")
    s.execute("CREATE ROLE cat_reader WITH LOGIN = true")
    s.execute("GRANT SELECT ON cat_wauth TO cat_reader")
    s.exposeAsCatalog("graft")
    // a null primary key is rejected — at Spark analysis now that the
    // catalog declares pk columns non-nullable (CQL contract), or by the
    // session's COPY FROM check if a nullable source slips through
    val eNull = intercept[Exception] {
      spark.sql("INSERT INTO graft.default.cat_wauth " +
        "SELECT CAST(NULL AS BIGINT), 1")
    }
    val nullMsg = chain(eNull).toLowerCase
    assert(nullMsg.contains("null primary key") ||
      nullMsg.contains("nullable") || nullMsg.contains("not null") ||
      nullMsg.contains("null value"), chain(eNull))
    // system tables stay read-only through the catalog
    val eSys = intercept[Exception] {
      spark.sql("INSERT INTO graft.system_schema.tables " +
        "VALUES ('default', 'hack', 0)")
    }
    val sysMsg = chain(eSys).toLowerCase
    assert(sysMsg.contains("does not support") ||
      sysMsg.contains("unsupported") || sysMsg.contains("read-only") ||
      sysMsg.contains("cannot be written"), sysMsg)
    // a role without MODIFY cannot write through the catalog side door
    s.login("cat_reader")
    val ePerm = intercept[Exception] {
      spark.sql("INSERT INTO graft.default.cat_wauth VALUES (1, 1)")
    }
    assert(chain(ePerm).contains("MODIFY"), chain(ePerm))
    s.login("cassandra", "cassandra")
    assert(s.execute("SELECT count(*) FROM cat_wauth").head()
      .getLong(0) === 0L)
  }

  test("materialized views are read-only through the catalog") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_mvro (k bigint, c bigint, v bigint, " +
      "PRIMARY KEY (k, c))")
    s.execute("CREATE MATERIALIZED VIEW cat_mvro_v AS SELECT c, k, v " +
      "FROM cat_mvro WHERE c IS NOT NULL AND k IS NOT NULL " +
      "PRIMARY KEY (c, k)")
    s.exposeAsCatalog("graft")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.default.cat_mvro_v VALUES (1, 1, 1)")
    }
    // read-only capability: Spark rejects at analysis, not a late
    // 'unknown table' from the write bridge
    val msg = e.getMessage.toLowerCase
    assert(msg.contains("does not support") || msg.contains("unsupported") ||
      msg.contains("append"), msg)
  }

  test("catalog INSERT materializes its source: later reads are stable") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_mat (k bigint PRIMARY KEY, v double)")
    s.exposeAsCatalog("graft")
    // a non-deterministic insert query: if the append kept the lazy plan,
    // every read would re-roll the keys/values and disagree
    spark.sql("INSERT INTO graft.default.cat_mat " +
      "SELECT CAST(rand() * 1000000000 AS BIGINT) + id * 2000000000, " +
      "rand() FROM range(5)")
    val r1 = spark.sql("SELECT k, v FROM graft.default.cat_mat ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val r2 = s.execute("SELECT k, v FROM cat_mat ALLOW FILTERING")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
    assert(r1.length === 5)
    assert(r1 === r2) // CQL and Spark SQL read the same materialized rows
    val r3 = s.execute("SELECT k, v FROM cat_mat ALLOW FILTERING")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
    assert(r2 === r3) // and re-reads agree with themselves
  }

  test("catalog scans push filters and prune columns like any parquet scan") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_push (k bigint PRIMARY KEY, a bigint, " +
      "b text, c text)")
    (1L to 50L).foreach(i =>
      s.execute(s"INSERT INTO cat_push (k, a, b, c) VALUES ($i, ${i * 2}, " +
        s"'b$i', 'c$i')"))
    s.exposeAsCatalog("graft")
    val df = spark.sql(
      "SELECT a FROM graft.default.cat_push WHERE a > 40")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("c#"),
      "unused columns not pruned")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ===
      (42L to 100L by 2).toSeq)
  }

  test("system_views reads through the catalog are live (no stale snapshot)") {
    val s = CqlSession(spark)
    s.exposeAsCatalog("graft")
    val n1 = spark.sql(
      "SELECT request_count FROM graft.system_views.clients")
      .head().getLong(0)
    s.execute("SELECT name FROM system_views.settings LIMIT 1")
    val n2 = spark.sql(
      "SELECT request_count FROM graft.system_views.clients")
      .head().getLong(0)
    assert(n2 > n1)
  }

  test("DROP TABLE through the catalog removes the CQL table") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_drop (k bigint PRIMARY KEY)")
    s.exposeAsCatalog("graft")
    spark.sql("DROP TABLE graft.default.cat_drop")
    intercept[graft.cql.CqlInvalidQueryException] {
      s.execute("SELECT * FROM cat_drop")
    }
  }

  test("ALTER TABLE through the catalog compiles to CQL DDL") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_alter (k bigint PRIMARY KEY, v bigint)")
    s.execute("INSERT INTO cat_alter (k, v) VALUES (1, 10)")
    s.exposeAsCatalog("graft")
    spark.sql("ALTER TABLE graft.default.cat_alter ADD COLUMNS (w STRING)")
    s.execute("UPDATE cat_alter SET w = 'x' WHERE k = 1")
    assert(spark.sql("SELECT w FROM graft.default.cat_alter WHERE k = 1")
      .head().getString(0) === "x")
    spark.sql("ALTER TABLE graft.default.cat_alter DROP COLUMN w")
    assert(!spark.sql("SELECT * FROM graft.default.cat_alter")
      .columns.contains("w"))
    // the session's own guards apply: dropping a PRIMARY KEY column is
    // rejected by the CQL validation this compiles into
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.cat_alter DROP COLUMN k")
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(m =>
        m.toLowerCase.contains("primary key") ||
          m.toLowerCase.contains("key column"))))
  }

  // ——— r13: the DISTRIBUTED delta fold (executor-spilled parquet
  // segments, anti-join collision rule, one log-fold materialization).
  // `deltaApplyRowLimit = 0` forces every delta — however small — down
  // the large-delta path, so the same semantic scenarios that pin the
  // per-row bridge above re-verify the distributed one. ———

  private def forceDistributed[A](body: => A): A = {
    spark.conf.set("spark.graft.catalog.deltaApplyRowLimit", "0")
    try body
    finally spark.conf.unset("spark.graft.catalog.deltaApplyRowLimit")
  }

  test("distributed fold: the delta commit message carries a segment " +
    "path and counts — no row buffer to scale with the delta") {
    // structural pin: the ONLY fields are Option[String] + three Longs
    // (r17 adds keyMoveDeletes — still a COUNT, which is the point).
    // If a row collection ever creeps back into the commit message, the
    // driver is again O(changed rows) and this fails at compile/run.
    val fields = classOf[graft.spark.GraftDeltaMessage]
      .getDeclaredFields.filterNot(_.isSynthetic)
      .map(f => (f.getName, f.getType.getSimpleName)).toSeq.sorted
    assert(fields === Seq(("deletes", "long"), ("keyMoveDeletes", "long"),
      ("segment", "Option"), ("upserts", "long")),
      s"commit message grew row-shaped state: $fields")
  }

  test("distributed fold: MERGE fuzz converges to the in-memory model " +
    "(same branches as the per-row fuzz, forced down the big-delta path)") {
    forceDistributed {
      val rnd = new scala.util.Random(20260815L)
      val s = CqlSession(spark)
      s.exposeAsCatalog("graftfzd")
      import spark.implicits._
      for (round <- 1 to 5) {
        val tbl = s"mfzd$round"
        s.execute(
          s"CREATE TABLE $tbl (k bigint PRIMARY KEY, v text, n bigint)")
        val target = (0L until 20L).filter(_ => rnd.nextBoolean())
          .map(k => (k, s"t$k", rnd.nextInt(100).toLong))
        target.foreach { case (k, v, n) =>
          s.execute(s"INSERT INTO $tbl (k, v, n) VALUES ($k, '$v', $n)") }
        val source = (0L until 25L).filter(_ => rnd.nextBoolean())
          .map(k => (k, s"s$k", rnd.nextInt(100).toLong, rnd.nextInt(3)))
        source.toDF("k", "v", "n", "act")
          .createOrReplaceTempView(s"mfzd_src$round")
        spark.sql(
          s"""MERGE INTO graftfzd.default.$tbl t USING mfzd_src$round s
             ON t.k = s.k
             WHEN MATCHED AND s.act = 0 THEN DELETE
             WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n + t.n
             WHEN NOT MATCHED AND s.act <> 0 THEN
               INSERT (k, v, n) VALUES (s.k, s.v, s.n)""")
        val tmap = target.map(t => t._1 -> t).toMap
        val expected = scala.collection.mutable.Map.empty[Long, (String, Long)]
        target.foreach { case (k, v, n) => expected(k) = (v, n) }
        source.foreach { case (k, v, n, act) =>
          if (tmap.contains(k)) {
            if (act == 0) expected.remove(k)
            else expected(k) = (v, n + tmap(k)._3)
          } else if (act != 0) expected(k) = (v, n)
        }
        val got = spark.sql(s"SELECT k, v, n FROM graftfzd.default.$tbl")
          .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
          .toMap
        assert(got === expected.toMap, s"round $round (Spark read) diverged")
        val cql = s.execute(s"SELECT k, v, n FROM $tbl").collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
        assert(cql === expected.toMap, s"round $round (CQL read) diverged")
      }
    }
  }

  test("distributed fold: chained key-move UPDATE survives (anti-join " +
    "collision rule replaces the driver-side Set)") {
    forceDistributed {
      val s = CqlSession(spark)
      s.execute("CREATE TABLE cat_chaind (k bigint PRIMARY KEY, v text)")
      (1L to 3L).foreach(i =>
        s.execute(s"INSERT INTO cat_chaind (k, v) VALUES ($i, 'v$i')"))
      s.exposeAsCatalog("graft")
      spark.sql("UPDATE graft.default.cat_chaind SET k = k + 1")
      val got = spark.sql(
        "SELECT k, v FROM graft.default.cat_chaind ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === Seq((2L, "v1"), (3L, "v2"), (4L, "v3")),
        s"chained key-move lost rows on the distributed path: $got")
    }
  }

  test("distributed fold: a no-key-move MERGE (delete + update + insert " +
    "branches) skips the anti-join yet keeps every delete effective " +
    "(r17 keyMoveDeletes elision)") {
    forceDistributed {
      val s = CqlSession(spark)
      s.execute("CREATE TABLE cat_nokm (k bigint PRIMARY KEY, n bigint)")
      (1L to 6L).foreach(i =>
        s.execute(s"INSERT INTO cat_nokm (k, n) VALUES ($i, ${i * 10})"))
      s.exposeAsCatalog("graftnokm")
      import spark.implicits._
      // source touches every target key (even → DELETE, odd → UPDATE)
      // plus inserts 7..8 — no UPDATE moves its key, so the commit
      // messages report keyMoveDeletes = 0 and the fold takes the
      // elided path; the deletes MUST still tombstone their rows
      (1L to 8L).map(k => (k, k * 100)).toDF("k", "p")
        .createOrReplaceTempView("nokm_src")
      spark.sql("""MERGE INTO graftnokm.default.cat_nokm t
                   USING nokm_src s ON t.k = s.k
                   WHEN MATCHED AND s.k % 2 = 0 THEN DELETE
                   WHEN MATCHED THEN UPDATE SET n = s.p
                   WHEN NOT MATCHED THEN INSERT (k, n) VALUES (s.k, s.p)""")
      val got = spark.sql(
        "SELECT k, n FROM graftnokm.default.cat_nokm ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === Seq((1L, 100L), (3L, 300L), (5L, 500L),
        (7L, 700L), (8L, 800L)),
        s"no-key-move MERGE diverged on the elided path: $got")
    }
  }

  test("distributed fold: blob-keyed UPDATE is ONE upsert (catalyst " +
    "byte[] equality in the writer)") {
    forceDistributed {
      val s = CqlSession(spark)
      s.execute("CREATE TABLE cat_blobd (k blob PRIMARY KEY, n bigint)")
      s.execute("INSERT INTO cat_blobd (k, n) VALUES (0x0102, 1)")
      s.execute("INSERT INTO cat_blobd (k, n) VALUES (0xff, 7)")
      s.exposeAsCatalog("graft")
      spark.sql("UPDATE graft.default.cat_blobd SET n = n + 10 WHERE n < 5")
      val rows = spark.sql(
        "SELECT n FROM graft.default.cat_blobd ORDER BY n").collect()
        .map(_.getLong(0)).toSeq
      assert(rows === Seq(7L, 11L), s"blob-keyed update lost rows: $rows")
    }
  }

  test("distributed fold: a PURE-DELETE delta (non-key predicate) " +
    "tombstones by key without touching the anti-join's data columns") {
    forceDistributed {
      val s = CqlSession(spark)
      s.execute("CREATE TABLE cat_deld (k bigint PRIMARY KEY, v text)")
      (1L to 5L).foreach(i =>
        s.execute(s"INSERT INTO cat_deld (k, v) VALUES ($i, 'v${i % 2}')"))
      s.exposeAsCatalog("graft")
      // non-key predicate → the row-level delta; all ops are deletes
      spark.sql("DELETE FROM graft.default.cat_deld WHERE v = 'v1'")
      assert(spark.sql("SELECT k FROM graft.default.cat_deld ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(2L, 4L))
      assert(s.execute("SELECT count(*) FROM cat_deld").head()
        .getLong(0) === 2L)
    }
  }

  test("distributed fold: post-image nulls are EXPLICIT — scalar cell " +
    "tombstone and collection set-to-null, shadowing older writes") {
    forceDistributed {
      val s = CqlSession(spark)
      s.execute("CREATE TABLE cat_nulld (k bigint PRIMARY KEY, v text, " +
        "tags list<bigint>, w bigint)")
      s.execute(
        "INSERT INTO cat_nulld (k, v, tags, w) VALUES (1, 'x', [1, 2], 0)")
      s.exposeAsCatalog("graft")
      spark.sql("UPDATE graft.default.cat_nulld SET v = NULL, " +
        "tags = NULL, w = 5 WHERE k = 1")
      val r = s.execute("SELECT v, tags, w FROM cat_nulld WHERE k = 1").head()
      assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) === 5L,
        s"post-image nulls must overwrite: $r")
      // the null is a real tombstone at the shared coordinator timestamp:
      // an OLDER CQL write cannot resurrect the cell
      val wt = s.execute("SELECT writetime(w) AS wt FROM cat_nulld")
        .head().getLong(0)
      s.execute(s"UPDATE cat_nulld USING TIMESTAMP ${wt - 1} " +
        "SET v = 'ghost' WHERE k = 1")
      assert(s.execute("SELECT v FROM cat_nulld WHERE k = 1").head()
        .isNullAt(0), "older write must stay shadowed by the tombstone")
    }
  }

  test("distributed fold: compound (partition, clustering) keys, a " +
    "collection column, and a static column shape into the log exactly " +
    "like the per-row path") {
    val s = CqlSession(spark)
    def mk(tbl: String): Unit = {
      s.execute(s"CREATE TABLE $tbl (p bigint, c bigint, tags list<bigint>, " +
        "st text STATIC, v text, PRIMARY KEY (p, c))")
      Seq((1L, 1L, "[1, 2]", "s1", "a"), (1L, 2L, "[3]", "s1", "b"),
        (2L, 1L, "[4]", "s2", "c")).foreach { case (p, c, tg, st, v) =>
        s.execute(s"INSERT INTO $tbl (p, c, tags, st, v) VALUES " +
          s"($p, $c, $tg, '$st', '$v')")
      }
    }
    mk("cat_cmp_row"); mk("cat_cmp_dist")
    s.exposeAsCatalog("graft")
    import spark.implicits._
    Seq((1L, 1L, "x"), (1L, 2L, "y"), (2L, 1L, "z"), (3L, 1L, "w"))
      .toDF("p", "c", "nv").createOrReplaceTempView("cmp_src")
    def merge(tbl: String): Unit = spark.sql(
      s"""MERGE INTO graft.default.$tbl t USING cmp_src s
          ON t.p = s.p AND t.c = s.c
          WHEN MATCHED AND s.nv = 'y' THEN DELETE
          WHEN MATCHED THEN UPDATE SET v = s.nv, tags = NULL
          WHEN NOT MATCHED THEN INSERT (p, c, v) VALUES (s.p, s.c, s.nv)""")
    merge("cat_cmp_row") // default limit: the per-row applyDml path
    forceDistributed { merge("cat_cmp_dist") }
    def state(tbl: String): Seq[String] =
      s.execute(s"SELECT p, c, tags, st, v FROM $tbl").collect()
        .map(_.toString).sorted.toSeq
    assert(state("cat_cmp_dist") === state("cat_cmp_row"),
      "distributed and per-row folds must produce identical post-states")
    // the UPDATE's explicit tags = NULL folded a set-to-null on BOTH paths
    assert(s.execute("SELECT tags FROM cat_cmp_dist WHERE p = 1 AND c = 1")
      .head().isNullAt(0))
    // statics survive (the post-image carries them through the upsert)
    assert(s.execute("SELECT st FROM cat_cmp_dist WHERE p = 1 AND c = 1")
      .head().getString(0) === "s1")
  }

  test("distributed fold: a UDT (struct) column rides the post-image — " +
    "update, explicit null, and untouched-copy all match the per-row path") {
    val s = CqlSession(spark)
    s.execute("CREATE TYPE addr13 (street text, zip bigint)")
    def mk(tbl: String): Unit = {
      s.execute(s"CREATE TABLE $tbl (k bigint PRIMARY KEY, a addr13, " +
        "m map<text, bigint>, n bigint)")
      s.execute(s"INSERT INTO $tbl (k, a, m, n) VALUES " +
        "(1, {street: 'main', zip: 10}, {'x': 1}, 1)")
      s.execute(s"INSERT INTO $tbl (k, a, m, n) VALUES " +
        "(2, {street: 'side', zip: 20}, {'y': 2}, 2)")
      s.execute(s"INSERT INTO $tbl (k, a, m, n) VALUES " +
        "(3, {street: 'far', zip: 30}, {'z': 3}, 3)")
    }
    mk("cat_udt_row"); mk("cat_udt_dist")
    s.exposeAsCatalog("graft")
    def mutate(tbl: String): Unit = {
      // k=1: replace the struct wholesale; k=2: null it out (explicit);
      // k=3: touch only n — the untouched struct must copy through
      spark.sql(s"UPDATE graft.default.$tbl SET a = " +
        "named_struct('street', 'new', 'zip', 99L) WHERE k = 1")
      spark.sql(s"UPDATE graft.default.$tbl SET a = NULL, " +
        "m = map('w', 9L) WHERE k = 2")
      spark.sql(s"UPDATE graft.default.$tbl SET n = n + 10 WHERE k = 3")
    }
    mutate("cat_udt_row")
    forceDistributed { mutate("cat_udt_dist") }
    def state(tbl: String): Seq[String] =
      s.execute(s"SELECT k, a, m, n FROM $tbl").collect()
        .map(_.toString).sorted.toSeq
    assert(state("cat_udt_dist") === state("cat_udt_row"))
    assert(s.execute("SELECT a.street FROM cat_udt_dist WHERE k = 1")
      .head().getString(0) === "new")
    assert(s.execute("SELECT a FROM cat_udt_dist WHERE k = 2")
      .head().isNullAt(0))
    assert(s.execute("SELECT a.zip, n FROM cat_udt_dist WHERE k = 3")
      .head().toSeq === Seq(30L, 13L))
    // the map post-image replaced wholesale; untouched map copied through
    assert(s.execute("SELECT m FROM cat_udt_dist WHERE k = 2")
      .head().getMap[String, Long](0) === Map("w" -> 9L))
    assert(s.execute("SELECT m FROM cat_udt_dist WHERE k = 3")
      .head().getMap[String, Long](0) === Map("z" -> 3L))
  }

  test("pure DELETE delta on a masked table needs MODIFY, not UNMASK " +
    "(tombstones persist no post-image); UPDATE still requires UNMASK") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE cat_maskd (k bigint PRIMARY KEY, " +
      "ssn text MASKED WITH mask_replace('X'), n bigint)")
    s.execute("INSERT INTO cat_maskd (k, ssn, n) VALUES (1, 'a', 10)")
    s.execute("INSERT INTO cat_maskd (k, ssn, n) VALUES (2, 'b', 20)")
    s.execute("CREATE ROLE clerkd WITH LOGIN = true")
    s.execute("GRANT SELECT ON cat_maskd TO clerkd")
    s.execute("GRANT MODIFY ON cat_maskd TO clerkd")
    s.exposeAsCatalog("graft")
    s.login("clerkd")
    try {
      // non-key predicate → the row-level delta path; a MODIFY-only
      // role can DELETE (r13, advisor: key-addressed tombstones only)
      spark.sql("DELETE FROM graft.default.cat_maskd WHERE n = 10")
      // but an UPDATE would persist masked post-images — still refused
      val e = intercept[Exception] {
        spark.sql("UPDATE graft.default.cat_maskd SET n = 9 WHERE n = 20")
      }
      assert(Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(x => Option(x.getMessage)
          .exists(_.contains("UNMASK"))), e.getMessage)
    } finally s.login("cassandra", "cassandra")
    assert(s.execute("SELECT k FROM cat_maskd").collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("trigger-bearing tables replay the delta per-row WITHIN the limit; " +
    "past it the MERGE refuses loudly (r14 — never an unbounded driver " +
    "collect, the one uncapped collect the r13 judge found)") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE audit_log (k bigint, wt bigint, tbl text, " +
      "was_delete boolean, PRIMARY KEY (k, wt))")
    s.execute("CREATE TABLE cat_trgd (k bigint PRIMARY KEY, v text)")
    s.execute("INSERT INTO cat_trgd (k, v) VALUES (1, 'seed')")
    s.execute("CREATE TRIGGER catd ON cat_trgd USING 'graft.AuditTrigger'")
    s.exposeAsCatalog("graft")
    import spark.implicits._
    // a MATCHED branch forces the row-level DELTA rewrite (an
    // insert-only MERGE compiles to a plain append, which — like COPY
    // FROM and catalog INSERT — is the bulk surface triggers skip)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .createOrReplaceTempView("trgd_src")
    val merge =
      """MERGE INTO graft.default.cat_trgd t USING trgd_src s
         ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET v = s.v
         WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
    // within the limit (default 10k): per-row replay, triggers fire
    spark.sql(merge)
    assert(s.execute("SELECT count(*) FROM audit_log").head()
      .getLong(0) === 2L,
      "MERGE mutations on a trigger table must fire the trigger per row")
    // PAST the limit: refuse with the documented guardrail error —
    // per-mutation trigger replay is coordinator-bound, so the scale-safe
    // behavior is a loud refusal, not a collect() of the whole delta
    val e = intercept[Exception](forceDistributed { spark.sql(merge) })
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(m =>
        m.contains("deltaApplyRowLimit") && m.contains("trigger"))),
      s"expected the trigger-table guardrail error, got: ${e.getMessage}")
    // the refusal left table AND audit state untouched
    assert(s.execute("SELECT v FROM cat_trgd WHERE k = 1").head()
      .getString(0) === "a")
    assert(s.execute("SELECT count(*) FROM audit_log").head()
      .getLong(0) === 2L, "a refused MERGE must not fire triggers")
    s.execute("DROP TRIGGER catd ON cat_trgd")
    // with the trigger gone the same statement folds distributed and lands
    forceDistributed { spark.sql(merge) }
    assert(spark.sql("SELECT count(*) FROM graft.default.cat_trgd")
      .head().getLong(0) === 2L)
  }

  test("distributed-vs-per-row differential fuzz: 3 seeded mid-size " +
    "merges (2k-row targets, collections + nulls) produce IDENTICAL " +
    "post-states on both apply paths") {
    // GRAFT_FUZZ_ROUNDS / GRAFT_FUZZ_SEED: long-hunt knobs (defaults = CI)
    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260815L))
    val s = CqlSession(spark)
    s.exposeAsCatalog("graftdiff")
    import spark.implicits._
    val nRounds = sys.env.getOrElse("GRAFT_FUZZ_ROUNDS", "3").toInt
    for (round <- 1 to nRounds) {
      def mk(tbl: String): Unit = s.execute(
        s"CREATE TABLE $tbl (k bigint PRIMARY KEY, v text, n bigint, " +
          "tags list<bigint>)")
      mk(s"dfr$round"); mk(s"dfd$round")
      // one bulk INSERT via the catalog seeds BOTH tables identically
      val target = (0L until 2000L).map(k =>
        (k, s"t$k", rnd.nextInt(1000).toLong,
          if (k % 7 == 0) null else Seq(k % 5, k % 3)))
      val tdf = target.toDF("k", "v", "n", "tags")
      tdf.createOrReplaceTempView(s"dft_src$round")
      Seq(s"dfr$round", s"dfd$round").foreach(t => spark.sql(
        s"INSERT INTO graftdiff.default.$t SELECT * FROM dft_src$round"))
      // act: 0 = delete-if-matched, 1 = update (nulls v on n%10==0),
      // 2 = update+key-independent; unmatched rows insert
      val source = (0L until 2500L).filter(_ => rnd.nextBoolean())
        .map(k => (k, s"s$k", rnd.nextInt(1000).toLong, rnd.nextInt(3)))
      source.toDF("k", "v", "n", "act")
        .createOrReplaceTempView(s"dfs_src$round")
      def merge(tbl: String): Unit = spark.sql(
        s"""MERGE INTO graftdiff.default.$tbl t USING dfs_src$round s
            ON t.k = s.k
            WHEN MATCHED AND s.act = 0 THEN DELETE
            WHEN MATCHED AND s.n % 10 = 0 THEN
              UPDATE SET v = NULL, n = s.n, tags = NULL
            WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n + t.n
            WHEN NOT MATCHED AND s.act <> 0 THEN
              INSERT (k, v, n) VALUES (s.k, s.v, s.n)""")
      merge(s"dfr$round") // per-row replay (default limit)
      forceDistributed { merge(s"dfd$round") }
      def state(tbl: String): Seq[String] =
        s.execute(s"SELECT k, v, n, tags FROM $tbl").collect()
          .map(_.toString).sorted.toSeq
      val (a, b) = (state(s"dfr$round"), state(s"dfd$round"))
      assert(a.size === b.size, s"round $round row counts diverge")
      assert(a === b, s"round $round states diverge")
    }
  }

  test("distributed fold: a CDC-enabled table's delta lands as one " +
    "reapable segment") {
    forceDistributed {
      val s = CqlSession(spark)
      s.execute("CREATE TABLE cat_cdcd (k bigint PRIMARY KEY, v bigint) " +
        "WITH cdc = true")
      (1L to 4L).foreach(i =>
        s.execute(s"INSERT INTO cat_cdcd (k, v) VALUES ($i, $i)"))
      s.exposeAsCatalog("graft")
      val before = s.cdcReap("cat_cdcd") // drain the insert segments
      assert(before > 0L)
      spark.sql("UPDATE graft.default.cat_cdcd SET v = v * 10 WHERE k <= 2")
      val freed = s.cdcReap("cat_cdcd")
      assert(freed > 0L,
        "the distributed delta fold must emit a CDC segment")
    }
  }
}
