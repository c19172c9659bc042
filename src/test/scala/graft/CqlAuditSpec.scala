package graft

import graft.cql.{CqlInvalidQueryException, CqlSession}

/** Audit / full-query logging [U audit/AuditLogManager.java,
  * FullQueryLogger.java] + the live-statements virtual table
  * [U db/virtual/QueriesTable.java]. */
class CqlAuditSpec extends SparkSpec {

  test("AUDIT ON records role-attributed categorized rows; OFF stops") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE au_t (k bigint PRIMARY KEY, v text)")
    // untouched before enabling
    s.execute("INSERT INTO au_t (k, v) VALUES (1, 'a')")
    assert(s.execute("SELECT count(*) FROM system_views.audit_log")
      .head().getLong(0) === 0L)
    assert(!s.auditEnabled)
    s.execute("AUDIT ON")
    assert(s.auditEnabled)
    s.execute("INSERT INTO au_t (k, v) VALUES (2, 'b')")
    s.execute("SELECT v FROM au_t WHERE k = 2")
    s.execute("ALTER TABLE au_t ADD extra bigint")
    s.execute("LIST ROLES")
    s.execute("AUDIT OFF")
    val rows = s.execute("SELECT seq, role, category, statement, success " +
      "FROM system_views.audit_log").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4))).toSeq.sortBy(_._1)
    assert(rows.map(x => (x._2, x._3, x._5)) === Seq(
      ("cassandra", "DML", true),
      ("cassandra", "QUERY", true),
      ("cassandra", "DDL", true),
      ("cassandra", "DCL", true)))
    assert(rows.map(_._1) === Seq(1L, 2L, 3L, 4L))
    // OFF: the read above and anything later adds nothing
    s.execute("INSERT INTO au_t (k, v) VALUES (3, 'c')")
    assert(s.execute("SELECT count(*) FROM system_views.audit_log")
      .head().getLong(0) === 4L)
  }

  test("failures audit with success=false and the error class; " +
    "the statement still throws") {
    val s = CqlSession(spark)
    s.execute("AUDIT ON")
    intercept[CqlInvalidQueryException] {
      s.execute("SELECT v FROM no_such_table_au")
    }
    val r = s.execute("SELECT statement, success, error " +
      "FROM system_views.audit_log").head()
    assert(r.getString(0).startsWith("SELECT v FROM no_such_table_au"))
    assert(!r.getBoolean(1))
    assert(r.getString(2) === "CqlInvalidQueryException")
  }

  test("login success and failure audit under AUTH, attributed to the " +
    "attempted role") {
    val s = CqlSession(spark)
    s.execute("CREATE ROLE au_role WITH LOGIN = true AND PASSWORD = 'pw'")
    s.execute("AUDIT ON")
    intercept[CqlInvalidQueryException] { s.login("au_role", "wrong") }
    s.login("au_role", "pw")
    s.login("cassandra", "cassandra")
    val rows = s.execute("SELECT seq, role, category, statement, success " +
      "FROM system_views.audit_log ALLOW FILTERING").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getBoolean(4))).toSeq
    assert(rows === Seq(
      ("au_role", "AUTH", "LOGIN au_role", false),
      ("au_role", "AUTH", "LOGIN au_role", true),
      ("cassandra", "AUTH", "LOGIN cassandra", true)))
  }

  test("prepared executions audit under the statement's category") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE au_p (k bigint PRIMARY KEY, v bigint)")
    val p = s.prepare("INSERT INTO au_p (k, v) VALUES (?, ?)")
    s.execute("AUDIT ON")
    p.execute(1L, 10L)
    p.execute(2L, 20L)
    s.execute("AUDIT OFF")
    val rows = s.execute("SELECT category, statement FROM " +
      "system_views.audit_log").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq.fill(2)(
      ("DML", "INSERT INTO au_p (k, v) VALUES (?, ?)")))
  }

  test("audit ring-buffers at the trace cap — oldest rows evicted, " +
    "seq keeps counting") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE au_r (k bigint PRIMARY KEY, v bigint)")
    s.execute("AUDIT ON")
    (1 to 260).foreach(i =>
      s.execute(s"INSERT INTO au_r (k, v) VALUES ($i, $i)"))
    s.execute("AUDIT OFF")
    val seqs = s.execute("SELECT seq FROM system_views.audit_log")
      .collect().map(_.getLong(0)).sorted
    assert(seqs.length === 256)
    assert(seqs.head === 5L && seqs.last === 260L)
  }

  test("system_views.queries reports the in-flight statement (itself) " +
    "and drains after completion") {
    val s = CqlSession(spark)
    val live = s.execute("SELECT thread_id, role, running_micros, task " +
      "FROM system_views.queries").collect()
    assert(live.length === 1)
    assert(live.head.getString(3)
      .startsWith("SELECT thread_id, role, running_micros, task"))
    assert(live.head.getString(1) === "cassandra")
    assert(live.head.getLong(2) >= 0L)
    // after the statement returns, the registry is empty: a later read
    // sees only ITS OWN row, never the previous statement's
    val again = s.execute("SELECT task FROM system_views.queries")
      .collect().map(_.getString(0)).toSeq
    assert(again === Seq("SELECT task FROM system_views.queries"))
  }

  test("AUDIT statements report state and are not themselves audited") {
    val s = CqlSession(spark)
    assert(!s.execute("AUDIT").head().getBoolean(0))
    s.execute("AUDIT ON")
    assert(s.execute("AUDIT").head().getBoolean(0))
    s.execute("AUDIT OFF")
    assert(s.execute("SELECT count(*) FROM system_views.audit_log")
      .head().getLong(0) === 0L)
    intercept[CqlInvalidQueryException] { s.execute("AUDIT SIDEWAYS") }
  }
}
