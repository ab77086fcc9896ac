package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture table readers (TESTDATA.md). One parquet file per table.
  *
  * All declared queries read through here so that scan behavior is uniform:
  * plain `spark.read.parquet` — Catalyst pushes predicates/projections into
  * the scan (verified via `.explain` in the test suite). At cluster scale the
  * same call reads a partitioned directory tree unchanged.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
  def events(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
}
