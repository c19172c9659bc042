package graft

import graft.cql.{CqlInvalidQueryException, CqlSession}

/** Upstream-rejection fidelity: statements Cassandra refuses must raise
  * CqlInvalidQueryException with the upstream meaning — never leak a Spark
  * analysis stack, never silently compute something else
  * [U cql3/statements/SelectStatement, StatementRestrictions]. */
class CqlFidelitySpec extends SparkSpec {

  private lazy val s = {
    val sess = CqlSession(spark)
    sess.execute("CREATE TABLE ft (pk bigint, ck bigint, v text, " +
      "tags list<text>, props map<text, bigint>, PRIMARY KEY (pk, ck))")
    sess.execute("INSERT INTO ft (pk, ck, v, tags, props) VALUES " +
      "(1, 1, 'a', ['x'], {'k': 1})")
    sess
  }

  private def rejects(cql: String, fragment: String): Unit = {
    val e = intercept[CqlInvalidQueryException] { s.execute(cql).collect() }
    assert(e.getMessage.contains(fragment), s"$cql → ${e.getMessage}")
  }

  test("limits must be strictly positive") {
    rejects("SELECT v FROM ft WHERE pk = 1 LIMIT 0", "strictly positive")
    rejects("SELECT v FROM ft PER PARTITION LIMIT 0", "strictly positive")
  }

  test("token() applies to the partition key with slice/EQ relations only") {
    rejects("SELECT v FROM ft WHERE token(ck) > 0 ALLOW FILTERING",
      "partition key")
    rejects("SELECT v FROM ft WHERE token(pk) IN (1, 2) ALLOW FILTERING",
      "EQ and slice")
  }

  test("writetime/ttl reject PRIMARY KEY parts and non-frozen collections") {
    rejects("SELECT writetime(pk) FROM ft WHERE pk = 1", "PRIMARY KEY part")
    rejects("SELECT ttl(ck) FROM ft WHERE pk = 1", "PRIMARY KEY part")
    rejects("SELECT writetime(tags) FROM ft WHERE pk = 1",
      "non-frozen collection")
  }

  test("CONTAINS family type-checks; map CONTAINS matches values") {
    rejects("SELECT v FROM ft WHERE v CONTAINS 'a' ALLOW FILTERING",
      "non-collection")
    rejects("SELECT v FROM ft WHERE tags CONTAINS KEY 'x' ALLOW FILTERING",
      "non-map")
    assert(s.execute("SELECT v FROM ft WHERE props CONTAINS 1 " +
      "ALLOW FILTERING").count() === 1L, "map CONTAINS matches a value")
    assert(s.execute("SELECT v FROM ft WHERE props CONTAINS KEY 'k' " +
      "ALLOW FILTERING").count() === 1L)
  }

  test("unknown columns answer 'Undefined column name', not a Spark stack") {
    rejects("SELECT v FROM ft WHERE nope = 1 ALLOW FILTERING",
      "Undefined column name nope")
    rejects("SELECT nope FROM ft WHERE pk = 1", "Undefined column name nope")
  }

  test("IN () is valid and matches nothing, as upstream") {
    assert(s.execute("SELECT v FROM ft WHERE pk IN ()").count() === 0L)
  }

  test("writes reject null keys, unknown and duplicated columns") {
    rejects("INSERT INTO ft (pk, ck, v) VALUES (null, 1, 'x')",
      "Invalid null value for PRIMARY KEY part pk")
    rejects("INSERT INTO ft (pk, ck, v) VALUES (1, null, 'x')",
      "Invalid null value for PRIMARY KEY part ck")
    rejects("DELETE FROM ft WHERE pk = null",
      "Invalid null value for PRIMARY KEY part pk")
    rejects("INSERT INTO ft (pk, ck, nope) VALUES (1, 1, 'x')",
      "Undefined column name nope")
    rejects("UPDATE ft SET nope = 2 WHERE pk = 1 AND ck = 1",
      "Undefined column name nope")
    rejects("INSERT INTO ft (pk, pk, ck, v) VALUES (1, 1, 1, 'x')",
      "contains duplicates")
  }

  test("CREATE TABLE rejects duplicate column names up front") {
    rejects("CREATE TABLE dup_t (pk bigint PRIMARY KEY, v text, v bigint)",
      "duplicate column names")
  }
}
