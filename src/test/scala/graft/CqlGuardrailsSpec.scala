package graft

import graft.cql.{CqlInvalidQueryException, CqlSession}

/** The configurable-guardrails slice [U db/guardrails/Guardrails.java]:
  * conf-driven, upstream exemptions (superusers and system tables are
  * never guarded), fail guardrails throw, warn guardrails surface on the
  * session's client-warnings channel. */
class CqlGuardrailsSpec extends SparkSpec {

  private def withConf(k: String, v: String)(f: => Unit): Unit = {
    spark.conf.set(s"spark.graft.guardrails.$k", v)
    try f finally spark.conf.unset(s"spark.graft.guardrails.$k")
  }

  private def roleSession(): CqlSession = {
    val s = CqlSession(spark)
    s.execute("CREATE ROLE gr_role WITH LOGIN = true")
    s.execute("GRANT SELECT ON KEYSPACE default TO gr_role")
    s.execute("GRANT MODIFY ON KEYSPACE default TO gr_role")
    s.execute("GRANT CREATE ON KEYSPACE default TO gr_role")
    s
  }

  test("allow_filtering guardrail rejects residual scans (superuser and " +
    "system tables exempt)") {
    val s = roleSession()
    s.execute("CREATE TABLE gr_af (k bigint PRIMARY KEY, v bigint)")
    s.execute("INSERT INTO gr_af (k, v) VALUES (1, 1)")
    withConf("allow_filtering_enabled", "false") {
      s.login("gr_role")
      val e = intercept[CqlInvalidQueryException] {
        s.execute("SELECT v FROM gr_af WHERE v = 1 ALLOW FILTERING")
      }
      assert(e.getMessage.contains("ALLOW FILTERING is not allowed"))
      // the prepared path hits the same guardrail
      intercept[CqlInvalidQueryException] {
        s.prepare("SELECT v FROM gr_af WHERE v = ? ALLOW FILTERING")
          .execute(1L)
      }
      // key-addressed reads are untouched
      assert(s.execute("SELECT v FROM gr_af WHERE k = 1").count() === 1)
      // system tables stay readable however they like
      assert(s.execute("SELECT table_name FROM system_schema.tables")
        .count() >= 1)
      // superusers are exempt (upstream rule)
      s.login("cassandra", "cassandra")
      assert(s.execute("SELECT v FROM gr_af WHERE v = 1 ALLOW FILTERING")
        .count() === 1)
    }
    // default (no conf): allowed for everyone
    s.login("gr_role")
    assert(s.execute("SELECT v FROM gr_af WHERE v = 1 ALLOW FILTERING")
      .count() === 1)
    s.login("cassandra", "cassandra")
  }

  test("user_timestamps guardrail rejects USING TIMESTAMP writes") {
    val s = roleSession()
    s.execute("CREATE TABLE gr_ts (k bigint PRIMARY KEY, v bigint)")
    withConf("user_timestamps_enabled", "false") {
      s.login("gr_role")
      val e = intercept[CqlInvalidQueryException] {
        s.execute("INSERT INTO gr_ts (k, v) VALUES (1, 1) USING TIMESTAMP 5")
      }
      assert(e.getMessage.contains("User provided timestamps"))
      s.execute("INSERT INTO gr_ts (k, v) VALUES (1, 1)") // plain write ok
      s.login("cassandra", "cassandra")
      // superuser exempt
      s.execute("INSERT INTO gr_ts (k, v) VALUES (2, 2) USING TIMESTAMP 7")
    }
    s.login("gr_role")
    s.execute("INSERT INTO gr_ts (k, v) VALUES (3, 3) USING TIMESTAMP 9")
    s.login("cassandra", "cassandra")
  }

  test("tables warn/fail thresholds gate CREATE TABLE") {
    val s = roleSession()
    s.execute("CREATE TABLE gr_t1 (k bigint PRIMARY KEY)")
    withConf("tables_fail_threshold", "0") {
      s.login("gr_role")
      val e = intercept[CqlInvalidQueryException] {
        s.execute("CREATE TABLE gr_t2 (k bigint PRIMARY KEY)")
      }
      assert(e.getMessage.contains("Guardrail tables violated"))
      s.login("cassandra", "cassandra")
      // superuser exempt
      s.execute("CREATE TABLE gr_t3 (k bigint PRIMARY KEY)")
    }
    withConf("tables_warn_threshold", "0") {
      s.login("gr_role")
      s.execute("CREATE TABLE gr_t4 (k bigint PRIMARY KEY)")
      assert(s.lastWarnings.exists(_.contains("Guardrail tables violated")))
      // warnings are per-statement: the next statement clears them
      s.execute("SELECT k FROM gr_t4 WHERE k = 1")
      assert(s.lastWarnings.isEmpty)
      s.login("cassandra", "cassandra")
    }
  }

  test("items_per_collection warn threshold flags oversized collections") {
    val s = roleSession()
    s.execute("CREATE TABLE gr_coll (k bigint PRIMARY KEY, " +
      "l list<bigint>, m map<text, bigint>)")
    withConf("items_per_collection_warn_threshold", "2") {
      s.login("gr_role")
      s.execute("INSERT INTO gr_coll (k, l) VALUES (1, [1, 2, 3])")
      assert(s.lastWarnings.exists(w =>
        w.contains("items_per_collection") && w.contains("3 items")))
      s.execute("INSERT INTO gr_coll (k, m) VALUES " +
        "(2, {'a': 1, 'b': 2, 'c': 3})")
      assert(s.lastWarnings.exists(_.contains("items_per_collection")))
      s.execute("INSERT INTO gr_coll (k, l) VALUES (3, [1, 2])")
      assert(s.lastWarnings.isEmpty) // within threshold
      s.login("cassandra", "cassandra")
    }
  }

  test("guardrail settings surface in system_views.settings") {
    val s = CqlSession(spark)
    withConf("tables_warn_threshold", "100") {
      val names = s.execute("SELECT name, value FROM system_views.settings")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(names.get("spark.graft.guardrails.tables_warn_threshold")
        .contains("100"))
    }
  }
}
