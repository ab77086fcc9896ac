package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-mitigation patterns (SURVEY §2 B4 scale notes / the 100 TB
  * design): salting for hot keys, demonstrated as a drop-in equi-join
  * replacement whose OUTPUT is provably identical to the plain join (the
  * DuckDB oracle runs the unsalted SQL).
  *
  * AQE's skew-join splitting handles sort-merge skew automatically; manual
  * salting remains the tool when a single key overwhelms even a split
  * partition (e.g. one user with 10^9 events joined to its profile row).
  */
object SkewOps {

  val Salts = 8

  /** Equi-join `big ⋈ small` on `key`, salted: the big side gets a
    * deterministic salt from secondary columns, the small side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — spreading one hot key over `Salts` reducers. No rand():
    * the salt must be deterministic for retries/speculation to be safe. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltSource: Column): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(saltSource), lit(Salts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(Salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Salted orders ⋈ customer — same rows as the plain equi-join.
    "join_salted" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey").as("custkey"), col("o_totalprice"))
      val customer = Tables.customer(s, dir)
        .select(col("c_custkey").as("custkey"), col("c_name"))
      saltedEquiJoin(orders, customer, "custkey", col("o_orderkey"))
        .select(col("o_orderkey"), col("custkey").as("c_custkey"),
          col("c_name"), col("o_totalprice"))
        .orderBy("o_orderkey")
    })
  )

  def oracles: Map[String, String] = Map(
    // the oracle is the UNSALTED join — salting must not change results
    "join_salted" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey"""
  )
}
