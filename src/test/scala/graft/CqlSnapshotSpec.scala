package graft

import graft.cql.{CqlInvalidQueryException, CqlSession}

/** Snapshots [U service/SnapshotManager, db/virtual/SnapshotsTable 4.1,
  * cassandra.yaml auto_snapshot]: `SNAPSHOT [TABLE] t [AS name]` /
  * `CLEAR SNAPSHOT name` admin verbs, the auto_snapshot safety net on
  * TRUNCATE / DROP TABLE, and the `system_views.snapshots` listing. */
class CqlSnapshotSpec extends SparkSpec {

  test("manual snapshot, listing, duplicate rejection, clear") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE sn (k bigint PRIMARY KEY, v text)")
    s.execute("INSERT INTO sn (k, v) VALUES (1, 'a')")
    s.execute("INSERT INTO sn (k, v) VALUES (2, 'b')")
    val res = s.execute("SNAPSHOT sn AS pre_migration").head()
    assert(res.getString(0) === "pre_migration")
    assert(res.getString(2) === "sn")
    assert(res.getLong(4) > 0L) // real bytes on disk
    val listed = s.execute("SELECT name, keyspace_name, table_name FROM " +
      "system_views.snapshots").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(listed === Seq(("pre_migration", "default", "sn")))
    intercept[CqlInvalidQueryException] {
      s.execute("SNAPSHOT TABLE sn AS pre_migration") // duplicate name
    }
    s.execute("CLEAR SNAPSHOT pre_migration")
    assert(s.execute("SELECT * FROM system_views.snapshots").count() === 0L)
    intercept[CqlInvalidQueryException] {
      s.execute("CLEAR SNAPSHOT pre_migration")
    }
  }

  test("auto_snapshot: TRUNCATE and DROP TABLE snapshot first; the conf " +
    "flag disables it") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE asn (k bigint PRIMARY KEY, v bigint)")
    s.execute("INSERT INTO asn (k, v) VALUES (1, 10)")
    s.execute("TRUNCATE asn")
    s.execute("INSERT INTO asn (k, v) VALUES (2, 20)")
    s.execute("DROP TABLE asn")
    val names = s.execute("SELECT name, table_name FROM " +
      "system_views.snapshots").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(names.exists(n => n._1.startsWith("truncated-") && n._2 == "asn"),
      names.toString)
    assert(names.exists(n => n._1.startsWith("dropped-") && n._2 == "asn"),
      names.toString)
    // flag off → no snapshot taken (upstream auto_snapshot: false)
    spark.conf.set("spark.graft.auto_snapshot", "false")
    try {
      s.execute("CREATE TABLE asn2 (k bigint PRIMARY KEY)")
      s.execute("INSERT INTO asn2 (k) VALUES (1)")
      s.execute("TRUNCATE asn2")
      assert(!s.execute("SELECT table_name FROM system_views.snapshots")
        .collect().map(_.getString(0)).contains("asn2"))
    } finally spark.conf.unset("spark.graft.auto_snapshot")
  }

  test("r9 review fix: back-to-back TRUNCATEs and DROP/re-CREATE/DROP " +
    "never collide on auto-snapshot names") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE tw (k bigint PRIMARY KEY)")
    s.execute("TRUNCATE tw") // no writes between: clock unchanged —
    s.execute("TRUNCATE tw") // the sequence tag keeps names unique
    s.execute("DROP TABLE tw")
    s.execute("CREATE TABLE tw (k bigint PRIMARY KEY)")
    s.execute("DROP TABLE tw")
    val names = s.execute("SELECT name FROM system_views.snapshots")
      .collect().map(_.getString(0)).toSeq
    assert(names.count(_.startsWith("truncated-")) === 2)
    assert(names.count(_.startsWith("dropped-")) === 2)
    assert(names.distinct.size === names.size)
  }

  test("unnamed snapshots carry session-unique sequence tags and " +
    "SNAPSHOT requires MODIFY") {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE pn (k bigint PRIMARY KEY, v bigint)")
    s.execute("INSERT INTO pn (k, v) VALUES (1, 1)")
    val unnamed = s.execute("SNAPSHOT pn").head().getString(0)
    assert(unnamed.startsWith("snapshot-"), unnamed)
    s.execute("CREATE ROLE snapless WITH LOGIN = true")
    s.execute("GRANT SELECT ON pn TO snapless")
    s.login("snapless")
    intercept[CqlInvalidQueryException] { s.execute("SNAPSHOT pn AS x") }
    intercept[CqlInvalidQueryException] { s.execute("CLEAR SNAPSHOT y") }
    s.login("cassandra", "cassandra")
  }
}
