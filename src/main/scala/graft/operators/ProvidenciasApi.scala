package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference app's query dispatch, as a callable facade (SURVEY §2 A7).
  *
  * streamlit_app.py:137-148 applies EXACTLY ONE predicate per search —
  * an if/elif chain with precedence providencia → tipo → anio → texto —
  * and never a conjunction; :39 then drops the Mongo `_id` from every
  * result row, and :41 returns an empty 1-column table when nothing
  * matches (A10 — Spark preserves the full schema instead, strictly more
  * information). This object reproduces that contract over the fixture's
  * documents table (facets: lang ↔ providencia, source ↔ tipo,
  * n_chars ↔ anio, texto ↔ $text), so a user of the reference's `buscar`
  * can call the same shape here; the engine-level building blocks stay
  * independently exposed as the declared `filter_eq_* / text_search*`
  * queries.
  */
object ProvidenciasApi {

  /** First-match-wins faceted search; `None` everywhere = full scan
    * (`collection.find({})`, reference :31-32). */
  def buscar(s: SparkSession, dir: String,
             lang: Option[String] = None,
             source: Option[String] = None,
             nChars: Option[Long] = None,
             texto: Option[String] = None): DataFrame = {
    val d = Tables.documents(s, dir)
    val filtered =
      if (lang.isDefined) d.filter(col("lang") === lang.get)
      else if (source.isDefined) d.filter(col("source") === source.get)
      else if (nChars.isDefined) d.filter(col("n_chars") === nChars.get)
      else if (texto.isDefined)
        d.filter(arrays_overlap(split(col("text"), " "),
          split(lower(lit(texto.get)), " ")))
      else d
    // reference :39: df.drop(columns=["_id"]) — doc_id is our _id
    filtered.drop("doc_id")
  }
}
