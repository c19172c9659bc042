package graft

import graft.cql.{CqlInvalidQueryException, CqlSession}

/** Keyspace-scoped table registry (r9) — upstream semantics: same-named
  * tables in different keyspaces are DISTINCT, bare names resolve against
  * the session's current keyspace (`USE`), the keyspace binds at prepare
  * time, and DROP KEYSPACE drops its contents
  * [U schema/Schema.java, service/ClientState.java]. */
class CqlKeyspaceSpec extends SparkSpec {

  private def fresh = {
    val s = CqlSession(spark)
    s.execute("CREATE KEYSPACE ksa WITH replication = " +
      "{'class': 'SimpleStrategy', 'replication_factor': 1}")
    s.execute("CREATE KEYSPACE ksb WITH replication = " +
      "{'class': 'SimpleStrategy', 'replication_factor': 1}")
    s
  }

  test("same-named tables in different keyspaces hold distinct data") {
    val s = fresh
    s.execute("CREATE TABLE ksa.t (k bigint PRIMARY KEY, v text)")
    s.execute("CREATE TABLE ksb.t (k bigint PRIMARY KEY, v text)")
    s.execute("CREATE TABLE t (k bigint PRIMARY KEY, v text)") // default
    s.execute("INSERT INTO ksa.t (k, v) VALUES (1, 'a')")
    s.execute("INSERT INTO ksb.t (k, v) VALUES (1, 'b')")
    s.execute("INSERT INTO t (k, v) VALUES (1, 'd')")
    assert(s.execute("SELECT v FROM ksa.t WHERE k = 1")
      .head().getString(0) === "a")
    assert(s.execute("SELECT v FROM ksb.t WHERE k = 1")
      .head().getString(0) === "b")
    assert(s.execute("SELECT v FROM t WHERE k = 1")
      .head().getString(0) === "d")
    // default.t and t are the same table
    assert(s.execute("SELECT v FROM default.t WHERE k = 1")
      .head().getString(0) === "d")
  }

  test("bare names resolve against the USE'd keyspace — no fallback to " +
    "default") {
    val s = fresh
    s.execute("CREATE TABLE t2 (k bigint PRIMARY KEY, v text)") // default
    s.execute("INSERT INTO t2 (k, v) VALUES (1, 'd')")
    s.execute("USE ksa")
    // upstream: unknown table, NOT a silent fallback to default.t2
    intercept[CqlInvalidQueryException] {
      s.execute("SELECT v FROM t2 WHERE k = 1")
    }
    s.execute("CREATE TABLE t2 (k bigint PRIMARY KEY, v text)") // ksa.t2
    s.execute("INSERT INTO t2 (k, v) VALUES (1, 'a')")
    assert(s.execute("SELECT v FROM t2 WHERE k = 1")
      .head().getString(0) === "a")
    // the default table is still reachable by qualified name
    assert(s.execute("SELECT v FROM default.t2 WHERE k = 1")
      .head().getString(0) === "d")
    s.execute("USE default")
    assert(s.execute("SELECT v FROM t2 WHERE k = 1")
      .head().getString(0) === "d")
  }

  test("the keyspace binds at PREPARE time, not execution time") {
    val s = fresh
    s.execute("CREATE TABLE ksa.pt (k bigint PRIMARY KEY, v text)")
    s.execute("CREATE TABLE ksb.pt (k bigint PRIMARY KEY, v text)")
    s.execute("USE ksa")
    val ins = s.prepare("INSERT INTO pt (k, v) VALUES (?, ?)")
    val sel = s.prepare("SELECT v FROM pt WHERE k = ?")
    s.execute("USE ksb") // must NOT re-target the prepared statements
    ins.execute(1L, "bound-at-prepare")
    assert(sel.execute(1L).head().getString(0) === "bound-at-prepare")
    assert(s.execute("SELECT count(*) FROM ksa.pt").head().getLong(0) === 1L)
    assert(s.execute("SELECT count(*) FROM ksb.pt").head().getLong(0) === 0L)
    s.execute("USE default")
  }

  test("DML, UPDATE, DELETE, BATCH, and COPY address the right keyspace") {
    val s = fresh
    s.execute("CREATE TABLE ksa.m (k bigint PRIMARY KEY, v bigint)")
    s.execute("CREATE TABLE ksb.m (k bigint PRIMARY KEY, v bigint)")
    s.execute("USE ksa")
    s.execute("INSERT INTO m (k, v) VALUES (1, 10)")
    s.execute("UPDATE m SET v = 11 WHERE k = 1")
    s.execute("BEGIN BATCH " +
      "INSERT INTO m (k, v) VALUES (2, 20); " +
      "INSERT INTO ksb.m (k, v) VALUES (2, 200); " +
      "APPLY BATCH")
    assert(s.execute("SELECT v FROM m WHERE k = 1").head().getLong(0) === 11L)
    assert(s.execute("SELECT v FROM ksb.m WHERE k = 2")
      .head().getLong(0) === 200L)
    s.execute("DELETE FROM m WHERE k = 1")
    assert(s.execute("SELECT count(*) FROM m").head().getLong(0) === 1L)
    assert(s.execute("SELECT count(*) FROM ksb.m").head().getLong(0) === 1L)
    s.execute("USE default")
  }

  test("DROP KEYSPACE drops its tables and views; other keyspaces survive") {
    val s = fresh
    s.execute("CREATE TABLE ksa.d1 (k bigint PRIMARY KEY, v bigint)")
    s.execute("CREATE TABLE ksb.d1 (k bigint PRIMARY KEY, v bigint)")
    s.execute("INSERT INTO ksb.d1 (k, v) VALUES (1, 1)")
    s.execute("USE ksa")
    s.execute("CREATE MATERIALIZED VIEW dmv AS SELECT k, v FROM d1 " +
      "WHERE k IS NOT NULL AND v IS NOT NULL PRIMARY KEY (v, k)")
    s.execute("USE default")
    s.execute("DROP KEYSPACE ksa")
    intercept[CqlInvalidQueryException] {
      s.execute("SELECT * FROM ksa.d1")
    }
    // a re-created keyspace starts empty
    s.execute("CREATE KEYSPACE ksa WITH replication = " +
      "{'class': 'SimpleStrategy', 'replication_factor': 1}")
    intercept[CqlInvalidQueryException] { s.execute("SELECT * FROM ksa.d1") }
    assert(s.execute("SELECT v FROM ksb.d1 WHERE k = 1")
      .head().getLong(0) === 1L)
  }

  test("schema introspection and DESCRIBE attribute the owning keyspace") {
    val s = fresh
    s.execute("CREATE TABLE ksa.si (k bigint PRIMARY KEY, v text)")
    s.execute("CREATE TABLE si (k bigint PRIMARY KEY, v text)")
    val rows = s.execute("SELECT keyspace_name, table_name FROM " +
      "system_schema.tables WHERE table_name = 'si' ALLOW FILTERING")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(rows === Seq(("default", "si"), ("ksa", "si")))
    val d = s.execute("DESCRIBE TABLE ksa.si").head()
    assert(d.getString(0) === "ksa")
    assert(d.getString(3).contains("CREATE TABLE ksa.si"))
    // the emitted DDL re-executes against the right keyspace
    val s2 = CqlSession(spark)
    s2.execute("CREATE KEYSPACE ksa WITH replication = " +
      "{'class': 'SimpleStrategy', 'replication_factor': 1}")
    s2.execute(d.getString(3))
    s2.execute("INSERT INTO ksa.si (k, v) VALUES (1, 'x')")
    assert(s2.execute("SELECT v FROM ksa.si WHERE k = 1")
      .head().getString(0) === "x")
  }

  test("auth: grants scope to the keyspace-qualified table resource") {
    val s = fresh
    s.execute("CREATE TABLE ksa.au (k bigint PRIMARY KEY, v bigint)")
    s.execute("CREATE TABLE au (k bigint PRIMARY KEY, v bigint)")
    s.execute("INSERT INTO ksa.au (k, v) VALUES (1, 1)")
    s.execute("INSERT INTO au (k, v) VALUES (1, 2)")
    s.execute("CREATE ROLE ksreader WITH LOGIN = true")
    s.execute("GRANT SELECT ON ksa.au TO ksreader")
    s.login("ksreader")
    assert(s.execute("SELECT v FROM ksa.au WHERE k = 1")
      .head().getLong(0) === 1L)
    // the grant does NOT cover the default keyspace's same-named table
    intercept[CqlInvalidQueryException] {
      s.execute("SELECT v FROM au WHERE k = 1")
    }
    s.login("cassandra", "cassandra")
    // a bare GRANT under USE scopes to the CURRENT keyspace
    s.execute("USE ksa")
    s.execute("CREATE ROLE ksreader2 WITH LOGIN = true")
    s.execute("GRANT SELECT ON au TO ksreader2")
    s.login("ksreader2")
    assert(s.execute("SELECT v FROM au WHERE k = 1")
      .head().getLong(0) === 1L)
    intercept[CqlInvalidQueryException] {
      s.execute("SELECT v FROM default.au WHERE k = 1")
    }
    s.login("cassandra", "cassandra")
    s.execute("USE default")
  }

  test("materialized views scope to their base table's keyspace") {
    val s = fresh
    s.execute("CREATE TABLE ksa.mb (k bigint PRIMARY KEY, v bigint)")
    s.execute("CREATE TABLE mb (k bigint PRIMARY KEY, v bigint)")
    s.execute("INSERT INTO ksa.mb (k, v) VALUES (1, 10)")
    s.execute("INSERT INTO mb (k, v) VALUES (1, 20)")
    s.execute("USE ksa")
    s.execute("CREATE MATERIALIZED VIEW mv1 AS SELECT k, v FROM mb " +
      "WHERE k IS NOT NULL AND v IS NOT NULL PRIMARY KEY (v, k)")
    // same name is free in another keyspace
    s.execute("USE default")
    s.execute("CREATE MATERIALIZED VIEW mv1 AS SELECT k, v FROM mb " +
      "WHERE k IS NOT NULL AND v IS NOT NULL PRIMARY KEY (v, k)")
    assert(s.execute("SELECT v FROM ksa.mv1 WHERE v = 10")
      .head().getLong(0) === 10L)
    assert(s.execute("SELECT v FROM mv1 WHERE v = 20")
      .head().getLong(0) === 20L)
    // a view cannot live in a different keyspace than its base
    intercept[CqlInvalidQueryException] {
      s.execute("CREATE MATERIALIZED VIEW ksb.mvx AS SELECT k, v FROM " +
        "ksa.mb WHERE k IS NOT NULL AND v IS NOT NULL PRIMARY KEY (v, k)")
    }
    // system_schema.views attributes the owning keyspace, bare names
    val vr = s.execute("SELECT keyspace_name, view_name, base_table_name " +
      "FROM system_schema.views ALLOW FILTERING").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(vr.contains(("ksa", "mv1", "mb")))
    assert(vr.contains(("default", "mv1", "mb")))
    s.execute("DROP MATERIALIZED VIEW ksa.mv1")
    assert(s.execute("SELECT v FROM mv1 WHERE v = 20")
      .head().getLong(0) === 20L) // the default-ks view survives
    intercept[CqlInvalidQueryException] { s.execute("SELECT * FROM ksa.mv1") }
  }

  test("index names scope per keyspace; DROP INDEX resolves via USE") {
    val s = fresh
    s.execute("CREATE TABLE ksa.ix (k bigint PRIMARY KEY, v text)")
    s.execute("CREATE TABLE ix (k bigint PRIMARY KEY, v text)")
    s.execute("CREATE INDEX vidx ON ksa.ix (v)")
    s.execute("CREATE INDEX vidx ON ix (v)") // same name, other keyspace
    val ir = s.execute("SELECT keyspace_name, table_name, index_name FROM " +
      "system_schema.indexes ALLOW FILTERING").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(ir.contains(("ksa", "ix", "vidx")))
    assert(ir.contains(("default", "ix", "vidx")))
    // DESCRIBE INDEX under USE resolves the bare name per keyspace and
    // emits DDL that re-executes against the right (qualified) table
    s.execute("USE ksa")
    val d = s.execute("DESCRIBE INDEX vidx").head()
    assert(d.getString(0) === "ksa")
    assert(d.getString(3).contains("ON ksa.ix"))
    s.execute("DROP INDEX vidx") // drops ksa's
    s.execute("USE default")
    intercept[CqlInvalidQueryException] { s.execute("DROP INDEX ksa.vidx") }
    s.execute("DROP INDEX vidx") // default's still there
  }

  test("UDTs scope per keyspace: same names distinct, bare names bind " +
    "to the current keyspace, cross-keyspace use rejected") {
    val s = fresh
    s.execute("CREATE TYPE ksa.addr (street text, zip bigint)")
    s.execute("CREATE TYPE ksb.addr (city text)") // same name, other ks
    s.execute("CREATE TYPE addr (country text)")  // default ks
    // each keyspace's table binds ITS OWN addr
    s.execute("CREATE TABLE ksa.ut (k bigint PRIMARY KEY, " +
      "a frozen<ksa.addr>)")
    s.execute("USE ksb")
    s.execute("CREATE TABLE ut (k bigint PRIMARY KEY, a frozen<addr>)")
    s.execute("INSERT INTO ut (k, a) VALUES (1, {city: 'oslo'})")
    assert(s.execute("SELECT a.city FROM ut WHERE k = 1")
      .head().getString(0) === "oslo")
    s.execute("USE default")
    s.execute("INSERT INTO ksa.ut (k, a) VALUES (1, " +
      "{street: 's1', zip: 7})")
    assert(s.execute("SELECT a.zip FROM ksa.ut WHERE k = 1")
      .head().getLong(0) === 7L)
    // a bare name under default does NOT see ksa's type shape
    s.execute("CREATE TABLE utd (k bigint PRIMARY KEY, a frozen<addr>)")
    s.execute("INSERT INTO utd (k, a) VALUES (1, {country: 'no'})")
    assert(s.execute("SELECT a.country FROM utd WHERE k = 1")
      .head().getString(0) === "no")
    // cross-keyspace use is rejected, as upstream
    val e = intercept[CqlInvalidQueryException] {
      s.execute("CREATE TABLE x (k bigint PRIMARY KEY, a frozen<ksa.addr>)")
    }
    assert(e.getMessage.contains("keyspace they are defined in"))
    // system_schema.types attributes owners; DESCRIBE round-trips
    val tys = s.execute("SELECT keyspace_name, type_name FROM " +
      "system_schema.types WHERE type_name = 'addr' ALLOW FILTERING")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(tys === Set(("default", "addr"), ("ksa", "addr"),
      ("ksb", "addr")))
    val ddl = s.execute("DESCRIBE TYPE ksb.addr").head().getString(3)
    assert(ddl.contains("ksb.addr"), ddl)
    // DROP KEYSPACE drops its types; same-named others survive
    s.execute("DROP KEYSPACE ksb")
    intercept[CqlInvalidQueryException] { s.execute("DESCRIBE TYPE ksb.addr") }
    assert(s.execute("DESCRIBE TYPE addr").head().getString(3)
      .contains("country"))
  }

  test("functions and aggregates scope per keyspace; qualified " +
    "invocation crosses keyspaces, bare follows USE") {
    val s = fresh
    s.execute("CREATE TABLE ksa.ft (k bigint PRIMARY KEY, v bigint)")
    s.execute("INSERT INTO ksa.ft (k, v) VALUES (1, 10)")
    // same-named function per keyspace, different bodies
    s.execute("CREATE FUNCTION ksa.scale (x bigint) CALLED ON NULL INPUT " +
      "RETURNS bigint LANGUAGE java AS 'return x * 2;'")
    s.execute("CREATE FUNCTION scale (x bigint) CALLED ON NULL INPUT " +
      "RETURNS bigint LANGUAGE java AS 'return x * 3;'") // default ks
    s.execute("USE ksa")
    assert(s.execute("SELECT scale(v) AS sv FROM ft WHERE k = 1")
      .head().getLong(0) === 20L) // bare binds to ksa's
    // qualified invocation reaches the other keyspace's function
    assert(s.execute("SELECT default.scale(v) AS sv FROM ft WHERE k = 1")
      .head().getLong(0) === 30L)
    s.execute("USE default")
    assert(s.execute("SELECT scale(v) AS sv FROM ksa.ft WHERE k = 1")
      .head().getLong(0) === 30L) // bare binds to default's
    assert(s.execute("SELECT ksa.scale(v) AS sv FROM ksa.ft WHERE k = 1")
      .head().getLong(0) === 20L)
    // an aggregate's state function must share its keyspace
    val e = intercept[CqlInvalidQueryException] {
      s.execute("CREATE AGGREGATE ksb.bad (bigint) SFUNC ksa.scale " +
        "STYPE bigint")
    }
    assert(e.getMessage.contains("same keyspace"), e.getMessage)
    // system_schema attributes owners; DROP KEYSPACE drops its functions
    val fns = s.execute("SELECT keyspace_name, function_name FROM " +
      "system_schema.functions WHERE function_name = 'scale' " +
      "ALLOW FILTERING").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(fns === Set(("default", "scale"), ("ksa", "scale")))
    s.execute("DROP KEYSPACE ksa")
    intercept[CqlInvalidQueryException] { s.execute("DESCRIBE FUNCTION ksa.scale") }
    assert(s.execute("DESCRIBE FUNCTION scale").head().getString(3)
      .contains("x * 3"))
    s.execute("DROP FUNCTION scale")
  }

  test("bare function names bind at PREPARE time, like table names") {
    val s = fresh
    s.execute("CREATE TABLE ksa.fp (k bigint PRIMARY KEY)")
    s.execute("CREATE TABLE ksb.fp (k bigint PRIMARY KEY)")
    s.execute("INSERT INTO ksa.fp (k) VALUES (1)")
    s.execute("INSERT INTO ksb.fp (k) VALUES (1)")
    s.execute("CREATE FUNCTION ksa.boost (x bigint) CALLED ON NULL INPUT " +
      "RETURNS bigint LANGUAGE java AS 'return x + 100;'")
    s.execute("CREATE FUNCTION ksb.boost (x bigint) CALLED ON NULL INPUT " +
      "RETURNS bigint LANGUAGE java AS 'return x + 200;'")
    s.execute("USE ksa")
    val sel = s.prepare("SELECT boost(k) AS b FROM fp WHERE k = ?")
    s.execute("USE ksb") // must re-target NEITHER the table NOR the fn
    assert(sel.execute(1L).head().getLong(0) === 101L)
    s.execute("USE default")
  }

  test("LWT conditional writes address the keyspace-scoped table") {
    val s = fresh
    s.execute("CREATE TABLE ksa.lw (k bigint PRIMARY KEY, v bigint)")
    s.execute("CREATE TABLE lw (k bigint PRIMARY KEY, v bigint)")
    s.execute("USE ksa")
    // IF NOT EXISTS applies against ksa.lw, not default.lw
    assert(s.execute("INSERT INTO lw (k, v) VALUES (1, 10) IF NOT EXISTS")
      .head().getBoolean(0) === true)
    assert(s.execute("INSERT INTO lw (k, v) VALUES (1, 11) IF NOT EXISTS")
      .head().getBoolean(0) === false)
    s.execute("USE default")
    // the default-keyspace twin is untouched; its own LWT still applies
    assert(s.execute("INSERT INTO lw (k, v) VALUES (1, 20) IF NOT EXISTS")
      .head().getBoolean(0) === true)
    assert(s.execute("UPDATE ksa.lw SET v = 12 WHERE k = 1 IF v = 10")
      .head().getBoolean(0) === true)
    assert(s.execute("SELECT v FROM ksa.lw WHERE k = 1")
      .head().getLong(0) === 12L)
    assert(s.execute("SELECT v FROM lw WHERE k = 1")
      .head().getLong(0) === 20L)
  }

  test("r9 review fixes: keyspace-DDL permission targets, default-" +
    "keyspace guards, NTS shorthand, durable_writes validation") {
    val s = fresh
    // permission check targets the STATEMENT's keyspace, not the
    // session's current one (the bypass the r9 review caught)
    s.execute("CREATE ROLE ddl9 WITH LOGIN = true")
    s.execute("GRANT CREATE ON KEYSPACE default TO ddl9")
    s.execute("GRANT DROP ON KEYSPACE default TO ddl9")
    s.login("ddl9")
    intercept[CqlInvalidQueryException] {
      s.execute("CREATE TYPE ksa.sneak (x bigint)")
    }
    intercept[CqlInvalidQueryException] { s.execute("DROP KEYSPACE ksa") }
    s.execute("CREATE TYPE okt (x bigint)") // default: granted
    s.login("cassandra", "cassandra")
    // the implicit default keyspace exists and cannot be dropped
    assert(intercept[CqlInvalidQueryException] {
      s.execute("CREATE KEYSPACE default WITH replication = " +
        "{'class': 'SimpleStrategy', 'replication_factor': 1}")
    }.getMessage.contains("already exists"))
    intercept[CqlInvalidQueryException] { s.execute("DROP KEYSPACE default") }
    // NTS bare replication_factor expands to the known datacenter
    s.execute("CREATE KEYSPACE nts9 WITH replication = " +
      "{'class': 'NetworkTopologyStrategy', 'replication_factor': 3}")
    val m = s.execute("SELECT replication FROM system_schema.keyspaces " +
      "WHERE keyspace_name = 'nts9'").head().getMap[String, String](0)
    assert(m.get("datacenter1").contains("3"))
    assert(!m.contains("replication_factor"))
    // durable_writes must be a real boolean
    intercept[CqlInvalidQueryException] {
      s.execute("CREATE KEYSPACE dw9 WITH replication = " +
        "{'class': 'SimpleStrategy', 'replication_factor': 1} " +
        "AND durable_writes = maybe")
    }
    s.execute("DROP KEYSPACE nts9")
  }

  test("r9 review fix: catalog DDL stays keyspace-pinned across USE") {
    val s = fresh
    s.execute("CREATE TABLE ksa.cd (k bigint PRIMARY KEY, v text)")
    s.execute("CREATE TABLE cd (k bigint PRIMARY KEY, v text)")
    s.execute("INSERT INTO ksa.cd (k, v) VALUES (1, 'keep')")
    s.exposeAsCatalog("graft_cd")
    s.execute("USE ksa")
    // a default-namespace drop must NOT re-resolve to ksa.cd
    spark.sql("DROP TABLE graft_cd.default.cd")
    assert(s.execute("SELECT v FROM ksa.cd WHERE k = 1")
      .head().getString(0) === "keep")
    intercept[CqlInvalidQueryException] { s.execute("SELECT * FROM default.cd") }
    // CREATE through the catalog lands in the named namespace
    spark.sql("CREATE TABLE graft_cd.default.cd2 (k BIGINT, v STRING) " +
      "PARTITIONED BY (k)")
    s.execute("INSERT INTO default.cd2 (k, v) VALUES (1, 'd2')")
    assert(spark.sql("SELECT v FROM graft_cd.default.cd2").head()
      .getString(0) === "d2")
    s.execute("USE default")
    // non-cascade namespace drop of a non-empty keyspace refuses
    val e = intercept[Exception] { spark.sql("DROP NAMESPACE graft_cd.ksa") }
    assert(e.getMessage.contains("SCHEMA_NOT_EMPTY") ||
      e.getMessage.toLowerCase.contains("non-empty"), e.toString)
    assert(s.execute("SELECT v FROM ksa.cd WHERE k = 1")
      .head().getString(0) === "keep")
    spark.sql("DROP NAMESPACE graft_cd.ksa CASCADE")
    intercept[CqlInvalidQueryException] { s.execute("SELECT * FROM ksa.cd") }
  }

  test("random interleaved scripts across three keyspaces match an " +
    "independent resolution model") {
    val rnd = new scala.util.Random(20260816L)
    for (round <- 1 to 3) {
      val s = fresh
      s.execute("CREATE TABLE ksa.m (k bigint PRIMARY KEY, v bigint)")
      s.execute("CREATE TABLE ksb.m (k bigint PRIMARY KEY, v bigint)")
      s.execute("CREATE TABLE m (k bigint PRIMARY KEY, v bigint)")
      val model = Map(
        "ksa" -> collection.mutable.Map.empty[Long, Long],
        "ksb" -> collection.mutable.Map.empty[Long, Long],
        "default" -> collection.mutable.Map.empty[Long, Long])
      var cur = "default"
      val kss = Seq("ksa", "ksb", "default")
      for (_ <- 1 to 60) {
        val k = rnd.nextInt(4).toLong
        val v = rnd.nextInt(100).toLong
        rnd.nextInt(7) match {
          case 0 => // USE
            cur = kss(rnd.nextInt(3))
            s.execute(s"USE $cur")
          case 1 | 2 => // bare write resolves against cur
            s.execute(s"INSERT INTO m (k, v) VALUES ($k, $v)")
            model(cur)(k) = v
          case 3 => // qualified write
            val ks = kss(rnd.nextInt(3))
            s.execute(s"INSERT INTO $ks.m (k, v) VALUES ($k, $v)")
            model(ks)(k) = v
          case 4 => // bare delete
            s.execute(s"DELETE FROM m WHERE k = $k")
            model(cur).remove(k)
          case 5 => // qualified update (upsert semantics in this model)
            val ks = kss(rnd.nextInt(3))
            s.execute(s"UPDATE $ks.m SET v = $v WHERE k = $k")
            if (model(ks).contains(k)) model(ks)(k) = v
            else model(ks)(k) = v // UPDATE upserts the cell
          case 6 => // full compare of all three tables
            kss.foreach { ks =>
              val got = s.execute(s"SELECT k, v FROM $ks.m").collect()
                .map(r => r.getLong(0) -> r.getLong(1)).toMap
              assert(got === model(ks).toMap,
                s"round $round: $ks.m diverged (current ks $cur)")
            }
        }
      }
      s.execute("USE default")
      kss.foreach { ks =>
        val got = s.execute(s"SELECT k, v FROM $ks.m").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === model(ks).toMap, s"round $round final: $ks.m diverged")
      }
    }
  }

  test("system.size_estimates attributes the owning keyspace (the Spark " +
    "connector's split-planning read)") {
    val s = fresh
    s.execute("CREATE TABLE ksa.se (k bigint PRIMARY KEY, v bigint)")
    s.execute("INSERT INTO ksa.se (k, v) VALUES (1, 1)")
    s.execute("CREATE TABLE se (k bigint PRIMARY KEY, v bigint)")
    s.execute("INSERT INTO se (k, v) VALUES (1, 1)")
    val rows = s.execute("SELECT keyspace_name, table_name, " +
      "partitions_count FROM system.size_estimates WHERE table_name = " +
      "'se' ALLOW FILTERING").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows === Set(("default", "se", 1L), ("ksa", "se", 1L)), rows)
  }

  test("COPY TO/FROM addresses the keyspace-scoped table under USE") {
    val s = fresh
    s.execute("CREATE TABLE ksa.cp (k bigint PRIMARY KEY, v text)")
    s.execute("CREATE TABLE cp (k bigint PRIMARY KEY, v text)")
    s.execute("INSERT INTO ksa.cp (k, v) VALUES (1, 'from-ksa')")
    s.execute("INSERT INTO cp (k, v) VALUES (1, 'from-default')")
    val dir = java.nio.file.Files.createTempDirectory("graft-ks-copy")
    s.execute("USE ksa")
    s.execute(s"COPY cp TO '$dir/out' WITH HEADER = true") // ksa's cp
    s.execute("USE default")
    s.execute("TRUNCATE cp")
    s.execute(s"COPY cp FROM '$dir/out' WITH HEADER = true") // default's cp
    assert(s.execute("SELECT v FROM cp WHERE k = 1")
      .head().getString(0) === "from-ksa") // the ksa export landed here
    assert(s.execute("SELECT v FROM ksa.cp WHERE k = 1")
      .head().getString(0) === "from-ksa") // source untouched
  }

  test("Spark catalog namespaces list per-keyspace tables and route writes") {
    val s = fresh
    s.execute("CREATE TABLE ksa.ct (k bigint PRIMARY KEY, v text)")
    s.execute("CREATE TABLE ct (k bigint PRIMARY KEY, v text)")
    s.exposeAsCatalog("graft_ks")
    val ksaTables = spark.sql("SHOW TABLES IN graft_ks.ksa")
      .collect().map(_.getString(1)).toSeq
    assert(ksaTables === Seq("ct"))
    spark.sql("INSERT INTO graft_ks.ksa.ct SELECT 1L AS k, 'a' AS v")
    spark.sql("INSERT INTO graft_ks.default.ct SELECT 1L AS k, 'd' AS v")
    assert(spark.sql("SELECT v FROM graft_ks.ksa.ct").head().getString(0)
      === "a")
    assert(s.execute("SELECT v FROM ksa.ct WHERE k = 1")
      .head().getString(0) === "a")
    assert(s.execute("SELECT v FROM ct WHERE k = 1")
      .head().getString(0) === "d")
  }
}
