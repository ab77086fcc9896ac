package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
      // Fixture timestamps are Parquet TIMESTAMP(isAdjustedToUTC=false),
      // inferred as TIMESTAMP_NTZ in Spark 4. Every consumer (and the
      // UTC-pinned DuckDB oracle) expects session-zone TimestampType, so
      // cast NTZ columns back — wall-clock preserving under the UTC
      // sessions. A projection, not a session conf: flipping
      // spark.sql.parquet.inferTimestampNTZ.enabled would leak into a
      // live session that installs graft (and there is no per-read
      // parquet option for it in Spark 4.1).
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val ntz = raw.schema.fields.collect {
        case f if f.dataType == TimestampNTZType => f.name
      }
      if (ntz.isEmpty) raw
      else raw.withColumns(ntz.map(c => c -> col(c).cast(TimestampType)).toMap)
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
    val raw =
      try apply(spark, dir, "events")
      catch {
        // legacy-generation fixtures only: TIMESTAMP(NANOS) is unmappable
        // in Spark 4 without the nanos-as-long legacy flag. The flag must
        // stay set for the DataFrame's LIFETIME, not just this resolution:
        // the read is lazy, ParquetFileFormat re-reads the session conf at
        // every action's physical planning (and ships it to executors), so
        // a set-and-restore here would cache a frame that throws
        // PARQUET_TYPE_ILLEGAL at first use. The flip only happens when a
        // NANOS fixture is actually present, and it is additive — MICROS/
        // MILLIS files read identically under it.
        case e: Exception if e.getMessage != null &&
            e.getMessage.contains("PARQUET_TYPE_ILLEGAL") =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          apply(spark, dir, "events")
      }
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
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
