package graft

import graft.cql.{CqlInvalidQueryException, CqlSession}

/** Cassandra 5.0 dynamic data masking (CEP-20 [U schema/ColumnMetadata.mask,
  * cql3/functions/masking/, auth/Permission UNMASK + SELECT_MASKED]):
  * attached column masks declared in DDL, applied at SELECT rendering for
  * roles without UNMASK; restricting on a masked column needs
  * SELECT_MASKED; superusers always see clear values. */
class CqlMaskingSpec extends SparkSpec {

  private def fresh(): CqlSession = {
    val s = CqlSession(spark)
    s.execute("CREATE TABLE pii (k bigint PRIMARY KEY, " +
      "name text MASKED WITH mask_inner(2, 2), " +
      "ssn text MASKED WITH mask_replace('REDACTED'), bal bigint)")
    s.execute("INSERT INTO pii (k, name, ssn, bal) VALUES (1, 'alice smith', '111-22-3333', 100)")
    s.execute("INSERT INTO pii (k, name, ssn, bal) VALUES (2, 'bob', '444-55-6666', 200)")
    s.execute("CREATE ROLE clerk WITH LOGIN = true")
    s.execute("GRANT SELECT ON pii TO clerk")
    s
  }

  test("superuser sees clear values; unprivileged role sees masks") {
    val s = fresh()
    val clear = s.execute("SELECT k, name, ssn FROM pii WHERE k = 1").head()
    assert(clear.getString(1) === "alice smith")
    assert(clear.getString(2) === "111-22-3333")
    s.login("clerk")
    val masked = s.execute("SELECT k, name, ssn, bal FROM pii WHERE k = 1").head()
    // mask_inner(2,2): first 2 + last 2 kept, middle padded with '*'
    assert(masked.getString(1) === "al*******th")
    assert(masked.getString(2) === "REDACTED")
    assert(masked.getLong(3) === 100L) // unmasked column untouched
    // short value (len <= begin+end) passes through unchanged
    assert(s.execute("SELECT name FROM pii WHERE k = 2").head()
      .getString(0) === "bob")
  }

  test("UNMASK permission reveals clear values; aliases still mask") {
    val s = fresh()
    s.execute("CREATE ROLE auditor WITH LOGIN = true")
    s.execute("GRANT SELECT ON pii TO auditor")
    s.execute("GRANT UNMASK ON pii TO auditor")
    s.login("auditor")
    assert(s.execute("SELECT name FROM pii WHERE k = 1").head()
      .getString(0) === "alice smith")
    s.login("clerk")
    // an alias must not dodge the mask (output name != source name)
    assert(s.execute("SELECT name AS n FROM pii WHERE k = 1").head()
      .getString(0) === "al*******th")
    assert(s.execute("SELECT * FROM pii WHERE k = 1").head()
      .getString(1) === "al*******th")
  }

  test("restricting a masked column needs SELECT_MASKED; predicate runs " +
    "on clear data, output stays masked") {
    val s = fresh()
    s.login("clerk")
    val e = intercept[CqlInvalidQueryException] {
      s.execute("SELECT k FROM pii WHERE name = 'alice smith' ALLOW FILTERING")
    }
    assert(e.getMessage.contains("SELECT_MASKED"))
    s.login("cassandra", "cassandra")
    s.execute("GRANT SELECT_MASKED ON pii TO clerk")
    s.login("clerk")
    val r = s.execute(
      "SELECT k, name FROM pii WHERE name = 'alice smith' ALLOW FILTERING")
      .head()
    assert(r.getLong(0) === 1L)          // matched on the CLEAR value
    assert(r.getString(1) === "al*******th") // rendered masked
  }

  test("functions/CAST over a masked column require UNMASK (leak-free " +
    "strictness); SELECT JSON likewise") {
    val s = fresh()
    s.login("clerk")
    intercept[CqlInvalidQueryException] {
      s.execute("SELECT max(name) FROM pii")
    }
    intercept[CqlInvalidQueryException] {
      s.execute("SELECT CAST(ssn AS text) FROM pii WHERE k = 1")
    }
    intercept[CqlInvalidQueryException] {
      s.execute("SELECT JSON k, name FROM pii WHERE k = 1")
    }
    // JSON without masked columns is fine
    assert(s.execute("SELECT JSON k, bal FROM pii WHERE k = 1").count() === 1L)
  }

  test("ALTER col MASKED WITH / DROP MASKED lifecycle; DESCRIBE renders") {
    val s = fresh()
    val ddl = s.execute("DESCRIBE TABLE pii").collect()
      .map(_.getAs[String]("create_statement")).mkString("\n")
    assert(ddl.contains("MASKED WITH mask_inner(2, 2)"))
    assert(ddl.contains("MASKED WITH mask_replace('REDACTED')"))
    s.execute("ALTER TABLE pii ALTER ssn DROP MASKED")
    s.execute("ALTER TABLE pii ALTER bal MASKED WITH mask_default()")
    s.login("clerk")
    val r = s.execute("SELECT ssn, bal FROM pii WHERE k = 1").head()
    assert(r.getString(0) === "111-22-3333") // mask dropped → clear
    assert(r.getLong(1) === 0L)              // numeric default mask
    s.login("cassandra", "cassandra")
    intercept[CqlInvalidQueryException] {
      s.execute("ALTER TABLE pii ALTER ssn DROP MASKED") // not masked
    }
    intercept[CqlInvalidQueryException] {
      s.execute("ALTER TABLE pii ALTER ghost MASKED WITH mask_null()")
    }
  }

  test("mask function validation: inner/outer text-only, arg shapes, " +
    "hash algorithms; MASKED WITH DEFAULT sugar") {
    val s = CqlSession(spark)
    intercept[CqlInvalidQueryException] { // inner on bigint
      s.execute("CREATE TABLE mv1 (k bigint PRIMARY KEY, " +
        "v bigint MASKED WITH mask_inner(1, 1))")
    }
    intercept[CqlInvalidQueryException] { // bad arity
      s.execute("CREATE TABLE mv2 (k bigint PRIMARY KEY, " +
        "v text MASKED WITH mask_replace())")
    }
    intercept[CqlInvalidQueryException] { // unknown mask fn at parse time
      s.execute("CREATE TABLE mv3 (k bigint PRIMARY KEY, " +
        "v text MASKED WITH mask_nope())")
    }
    intercept[CqlInvalidQueryException] { // bad hash algorithm
      s.execute("CREATE TABLE mv4 (k bigint PRIMARY KEY, " +
        "v text MASKED WITH mask_hash('crc32'))")
    }
    s.execute("CREATE TABLE mv5 (k bigint PRIMARY KEY, " +
      "v text MASKED WITH DEFAULT, " +
      "w text MASKED WITH mask_outer(1, 1, '#'), " +
      "h text MASKED WITH mask_hash())")
    s.execute("INSERT INTO mv5 (k, v, w, h) VALUES (1, 'secret', 'secret', 'x')")
    s.execute("CREATE ROLE viewer5 WITH LOGIN = true")
    s.execute("GRANT SELECT ON mv5 TO viewer5")
    s.login("viewer5")
    val r = s.execute("SELECT v, w, h FROM mv5 WHERE k = 1").head()
    assert(r.getString(0) === "****")
    assert(r.getString(1) === "#ecre#")
    // sha-256 of 'x' (default algorithm)
    assert(r.getString(2) ===
      "2d711642b726b04401627ca9fbac32f5c8530fb1903cc4db02258717921a4881")
  }

  test("DSv2 catalog read path honors masks: clear for superuser and " +
    "UNMASK, masked for clerk, snapshot cache keyed by rendering") {
    // r10 VERDICT item 8: a Spark-side SELECT through the catalog must not
    // bypass a mask an unprivileged session would see — and because role
    // switches don't bump the mutation epoch, the clear snapshot cached
    // for the superuser must never serve the clerk (or vice versa).
    val s = fresh()
    s.exposeAsCatalog("maskcat")
    val clear = spark.sql(
      "SELECT name, ssn FROM maskcat.default.pii WHERE k = 1").head()
    assert(clear.getString(0) === "alice smith")
    assert(clear.getString(1) === "111-22-3333")
    s.login("clerk")
    val masked = spark.sql(
      "SELECT name, ssn, bal FROM maskcat.default.pii WHERE k = 1").head()
    assert(masked.getString(0) === "al*******th")
    assert(masked.getString(1) === "REDACTED")
    assert(masked.getLong(2) === 100L) // unmasked column untouched
    // switch BACK: the masked snapshot must not leak into the clear view
    s.login("cassandra", "cassandra")
    assert(spark.sql("SELECT ssn FROM maskcat.default.pii WHERE k = 1")
      .head().getString(0) === "111-22-3333")
    // a role granted UNMASK reads clear through the catalog too
    s.execute("CREATE ROLE catauditor WITH LOGIN = true")
    s.execute("GRANT SELECT ON pii TO catauditor")
    s.execute("GRANT UNMASK ON pii TO catauditor")
    s.login("catauditor")
    assert(spark.sql("SELECT name FROM maskcat.default.pii WHERE k = 2")
      .head().getString(0) === "bob")
  }

  test("REPLAY AUDIT reproduces a masked session: mask DDL, role switch, " +
    "masked SELECT and the leak-free denial all replay; state equal") {
    val s = CqlSession(spark)
    s.execute("AUDIT ON")
    s.execute("CREATE TABLE rpii (k bigint PRIMARY KEY, " +
      "name text MASKED WITH mask_inner(2, 2))")
    s.execute("INSERT INTO rpii (k, name) VALUES (1, 'alice smith')")
    s.execute("CREATE ROLE rclerk WITH LOGIN = true")
    s.execute("GRANT SELECT ON rpii TO rclerk")
    s.login("rclerk")
    assert(s.execute("SELECT name FROM rpii WHERE k = 1").head()
      .getString(0) === "al*******th")
    intercept[CqlInvalidQueryException] { // must REPLAY as a failure too
      s.execute("SELECT max(name) FROM rpii")
    }
    s.login("cassandra", "cassandra")
    val rep = s.execute("REPLAY AUDIT").collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    val Array(matched, total) = rep("outcome_match").split("/")
    assert(matched === total, s"replay diverged: $rep")
    assert(total.toInt >= 6)
    assert(rep("state_equal") === "true")
  }

  test("system_schema.column_masks lists attached masks; COPY TO honors " +
    "masks for unprivileged roles") {
    val s = fresh()
    val masks = s.execute(
      "SELECT column_name, function_name FROM system_schema.column_masks")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(masks.contains(("name", "mask_inner")))
    assert(masks.contains(("ssn", "mask_replace")))
    // ALTER ADD with a mask registers too
    s.execute("ALTER TABLE pii ADD note text MASKED WITH mask_null()")
    assert(s.execute("SELECT column_name FROM system_schema.column_masks")
      .collect().map(_.getString(0)).contains("note"))
    // COPY TO as clerk exports masked bytes
    s.execute("GRANT MODIFY ON pii TO clerk") // not needed for TO; SELECT is
    s.login("clerk")
    val dir = graft.Tables.tempRoot("graft-mask-copy")
    s.execute(s"COPY pii (k, name) TO '$dir/out.csv' WITH HEADER = true")
    val csv = spark.read.option("header", "true").csv(s"$dir/out.csv")
    val names = csv.collect().map(_.getString(1)).toSet
    assert(names === Set("al*******th", "bob"))
    s.login("cassandra", "cassandra")
    // DROP TABLE purges the mask registry
    s.execute("DROP TABLE pii")
    assert(s.execute("SELECT column_name FROM system_schema.column_masks")
      .count() === 0L)
  }
}
