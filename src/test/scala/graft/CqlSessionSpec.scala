package graft

import graft.cql.{CqlInvalidQueryException, CqlSession}
import org.apache.spark.sql.types._

/** The Cassandra write-path semantics, end-to-end through CQL text:
  * upserts, per-cell reconcile, tombstone shadowing, timestamp tie-breaks.
  * (Harry-style scenario tests — SURVEY §5.) */
class CqlSessionSpec extends SparkSpec {

  private def freshSession = CqlSession.emptyTable(spark, "users",
    StructType(Seq(
      StructField("user_id", LongType),
      StructField("name", StringType),
      StructField("age", LongType))),
    partitionKeys = Seq("user_id"))

  private def rows(s: CqlSession) =
    s.execute("SELECT user_id, name, age FROM users WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))

  test("INSERT then SELECT: the row is visible with all cells") {
    val s = freshSession
    s.execute("INSERT INTO users (user_id, name, age) VALUES (1, 'ada', 36)")
    assert(rows(s) === Seq((1L, Some("ada"), Some(36L))))
  }

  test("partial UPDATE merges per cell — untouched columns survive") {
    val s = freshSession
    s.execute("INSERT INTO users (user_id, name, age) VALUES (1, 'ada', 36)")
    s.execute("UPDATE users SET name = 'grace' WHERE user_id = 1")
    assert(rows(s) === Seq((1L, Some("grace"), Some(36L))))
  }

  test("an older USING TIMESTAMP write loses to a newer cell") {
    val s = freshSession
    s.execute("INSERT INTO users (user_id, name) VALUES (1, 'new') USING TIMESTAMP 100")
    s.execute("UPDATE users USING TIMESTAMP 50 SET name = 'old' WHERE user_id = 1")
    assert(rows(s).head._2 === Some("new"))
  }

  test("tombstone shadows older cells but NOT newer timestamps (zombie rule)") {
    val s = freshSession
    s.execute("INSERT INTO users (user_id, name) VALUES (1, 'a') USING TIMESTAMP 5")
    s.execute("DELETE FROM users USING TIMESTAMP 10 WHERE user_id = 1")
    assert(rows(s).isEmpty, "delete at ts=10 hides the ts=5 insert")
    s.execute("INSERT INTO users (user_id, name) VALUES (1, 'b') USING TIMESTAMP 8")
    assert(rows(s).isEmpty, "ts=8 write is still shadowed by the ts=10 delete")
    s.execute("INSERT INTO users (user_id, name) VALUES (1, 'c') USING TIMESTAMP 11")
    assert(rows(s).head._2 === Some("c"), "ts=11 write survives the ts=10 delete")
  }

  test("equal-timestamp conflict resolves to the greater value (reconcile tie-break)") {
    val s = freshSession
    s.execute("INSERT INTO users (user_id, name) VALUES (1, 'bb') USING TIMESTAMP 7")
    s.execute("INSERT INTO users (user_id, name) VALUES (1, 'aa') USING TIMESTAMP 7")
    assert(rows(s).head._2 === Some("bb"))
  }

  test("writes must address the full primary key") {
    val s = freshSession
    val e = intercept[CqlInvalidQueryException] {
      s.execute("INSERT INTO users (name) VALUES ('nobody')")
    }
    assert(e.getMessage.contains("PRIMARY KEY"))
  }

  test("USING TTL expires individual cells, not the whole row") {
    val s = freshSession
    // name written at t=1000s with 60s TTL; age written without TTL
    s.execute("INSERT INTO users (user_id, name) VALUES (1, 'fading') " +
      "USING TIMESTAMP 1000000000 AND TTL 60")
    s.execute("INSERT INTO users (user_id, age) VALUES (1, 99) " +
      "USING TIMESTAMP 1000000001")
    def at(nowUs: Long) = s.view("users", Some(nowUs))
      .collect().map(r => (Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    // before expiry (t=1030s): both cells live
    assert(at(1030L * 1000000) === Seq((Some("fading"), Some(99L))))
    // after expiry (t=1061s): name gone, age survives — row still exists
    assert(at(1061L * 1000000) === Seq((None, Some(99L))))
  }

  test("writetime(c) is per CELL: each column reports its own write's timestamp") {
    val s = freshSession
    s.execute("INSERT INTO users (user_id, name, age) VALUES (1, 'x', 1) USING TIMESTAMP 100")
    s.execute("UPDATE users USING TIMESTAMP 200 SET name = 'y' WHERE user_id = 1")
    val r = s.execute(
      "SELECT writetime(name) AS wn, writetime(age) AS wa FROM users WHERE user_id = 1")
      .head()
    assert(r.getLong(0) === 200L && r.getLong(1) === 100L)
  }

  test("INSERT and UPDATE are the same upsert operation") {
    val s = freshSession
    s.execute("UPDATE users SET name = 'upserted' WHERE user_id = 1")
    assert(rows(s) === Seq((1L, Some("upserted"), None)))
  }
}
