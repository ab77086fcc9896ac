package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declared-key surface for the DSv2 source family (r18, r17 verdict
  * item 6). Until now `sources/` was spec-only (SourceSpec/PlanSpec);
  * this module puts the connector path — catalog resolution
  * (`graft.docs.docs_<rows>_<parts>` via [[GraftCatalog]]), planning-time
  * doc_id range pruning, reader-side lang filter pushdown, and column
  * pruning — under the driver's DAILY DuckDB hash gate, oracled by
  * [[DocsOracleSql]]'s engine-exact replay of the generator.
  *
  * Reference surface: the reference reads its corpus through a managed
  * connector (`/root/reference/streamlit_app.py:31-32` delegates the scan
  * to MongoDB Atlas); this family is that capability rebuilt as a Spark
  * DSv2 connector with explicit pushdown contracts.
  */
object SourceOps {

  /** Generated-table geometry for the declared key: big enough that a
    * missed range-pushdown would be visible in the scan (2,000 ids, 8
    * planned partitions), small enough that the DuckDB twin replays in
    * milliseconds. The query's doc_id span covers partitions 1-6 of 8,
    * so BOTH edge partitions must be pruned at planning time for the
    * SourceSpec pin to hold. */
  val DocsRows = 2000L
  val DocsParts = 8

  /** The declared query text, shared verbatim by the oracle (modulo the
    * table reference: catalog table on Spark, generated CTE in DuckDB).
    * Exercises: doc_id range (accepted at PLANNING time — input
    * partitions outside [128, 1664) are never created), lang equality
    * (accepted, evaluated reader-side before other columns synthesize),
    * column pruning (text is generated only because n_chars needs it),
    * and an ordinary Spark-side grouped aggregate (aggregate pushdown
    * correctly declines under the reader-side filter). sum() is an
    * exact integer fold — no rounding pin needed; the CASTs keep DuckDB
    * (HUGEINT sum) on Spark's BIGINT. */
  private def selectSql(table: String): String = s"""
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM $table
    WHERE doc_id >= 128 AND doc_id < 1664 AND lang = 'en'
    GROUP BY source
    ORDER BY source"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The fixture dir is unused: the table is GENERATED (deterministic,
    // dir-independent), which is the point — the oracle replays the
    // generator, not a parquet file. Catalog registration is idempotent
    // (the GraftSession.install contract); Verify/Bench sessions don't
    // pre-configure it.
    "src_docs_pushdown" -> ((s, _) => {
      if (s.conf.getOption("spark.sql.catalog.graft").isEmpty)
        s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.sql(selectSql(s"graft.docs.docs_${DocsRows}_$DocsParts"))
    }))

  def oracles: Map[String, String] = Map(
    "src_docs_pushdown" ->
      s"WITH ${DocsOracleSql.docsGenCte(DocsRows)} ${selectSql("docs_gen")}")
}
