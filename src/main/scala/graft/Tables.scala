package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture table readers (TESTDATA.md). One parquet file per table.
  *
  * All declared queries read through here so that scan behavior is uniform:
  * plain `spark.read.parquet` — Catalyst pushes predicates/projections into
  * the scan (asserted on the physical plan in PlanSpec). At cluster scale
  * the same call reads a partitioned directory tree unchanged.
  */
object Tables {
  /** Resolved-scan cache, keyed per session — the catalog role. Each
    * `spark.read.parquet` pays a file listing plus a footer-read job for
    * schema inference; a warehouse resolves tables from cached catalog
    * metadata instead of re-listing storage per query, so we do too (the
    * fixture files are immutable). The cached value is just the analyzed
    * scan relation — every query still plans its own filters/projections
    * on top. */
  private val resolved =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    resolved.computeIfAbsent((spark, dir, name), { _ =>
      // Fixture timestamps are Parquet TIMESTAMP(isAdjustedToUTC=false);
      // read them as session-zone TimestampType (sessions run UTC), not
      // TIMESTAMP_NTZ, so timestamp arithmetic/casts below stay uniform.
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      spark.read.parquet(s"$dir/$name.parquet")
    })

  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** `events.ts` has shifted Parquet physical types across fixture
    * generations (INT64 TIMESTAMP(NANOS), then TIMESTAMP(MICROS)); accept
    * either. The NANOS form is unmappable to TimestampType in Spark 4
    * (PARQUET_TYPE_ILLEGAL) — read it as a raw nanosecond Long (legacy
    * flag) and truncate to µs, which is exact because the fixture's ns
    * fractions are zero (see FIXTURES.md). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
}
