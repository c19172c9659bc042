package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.3 / SCALE.md skew path — salted equi-join for hot keys.
  *
  * AQE's skew-join split handles most skew at runtime, but it only splits
  * SHUFFLE partitions; a single key hotter than one task's memory still
  * lands in one stream-side group. Salting is the declarative fix: spread
  * the big side's hot key over `salts` sub-keys with a deterministic salt,
  * replicate the small side once per salt value, join on (key, salt). The
  * join is exactly equivalent (proved by the `j8_salted_skew` oracle entry:
  * same SQL twin as the unsalted join).
  */
object SkewJoin {

  /** Salted inner equi-join: `big ⋈ small` on `key`, with the big side's
    * rows spread across `salts` sub-partitions. `saltOf` must be a
    * deterministic function of the big side's row (default: xxhash64 of the
    * key and all non-key columns would be ideal; callers pass an explicit
    * column to keep the contract visible). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      saltOf: Column): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(saltOf, lit(salts)).cast("int"))
    val expandedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(expandedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** J8 (skew variant): revenue per order-priority through a deliberately
    * hot join key (l_orderkey % 5 — five keys own the whole fact table).
    * The salt spreads each hot key over 8 sub-keys, so no task sees more
    * than ~1/40th of the table. The salt hashes HIGH-cardinality row
    * attributes — hashing l_linenumber alone (7 distinct values) left at
    * least one of the 8 sub-keys always empty and the spread collapsed to
    * ~5 uneven groups, exactly the imbalance salting exists to remove.
    * Oracle = the plain unsalted join SQL: result equality IS the proof
    * that salting preserves semantics. */
  def j8_salted_skew(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .select((col("l_orderkey") % 5L).as("hot"),
        col("l_extendedprice"), col("l_linenumber"),
        col("l_orderkey"))
    val dim = s.range(0, 5).toDF("hot")
      .select(col("hot"), concat(lit("class-"), col("hot")).as("klass"))
    saltedJoin(big, dim, "hot", 8,
      xxhash64(col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("klass"))
      .agg(count(lit(1)).as("n"),
        graft.Q.dbl(graft.Q.dec6(sum(graft.Q.dec6(col("l_extendedprice")))))
          .as("sum_price"))
      .orderBy("klass")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j8_salted_skew" -> (j8_salted_skew _),
  )

  val oracle: Map[String, String] = Map(
    "j8_salted_skew" ->
      """SELECT 'class-' || (l_orderkey % 5) AS klass, count(*) AS n,
        |  cast(cast(sum(cast(l_extendedprice AS decimal(38,6))) AS decimal(38,6)) AS double) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY klass""".stripMargin,
  )
}
