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
        // Mongo's $text is diacritic-insensitive (the reference forwards
        // raw Spanish input, streamlit_app.py:146-148), so the facade
        // folds both sides like text_search_unaccent does
        d.filter(ProvidenciasOps.unaccentMatch(col("text"),
          texto.get.trim.split("\\s+").toSeq))
      else d
    // reference :39: df.drop(columns=["_id"]) — doc_id is our _id
    filtered.drop("doc_id")
  }

  /** The third reference page ("Filtrar por Similitudes",
    * streamlit_app.py:55-71): pick a providencia, bound the similarity
    * slider, list its SIMILAR neighbors in range. The edge table is
    * DERIVED on demand — the probe row broadcasts against the embeddings
    * table (one linear scan, no O(n²) edge materialization), which is
    * the same plan the declared `similar_range` query pins; this facade
    * just parameterizes (docId, lo, hi) the way the app's widgets do. */
  def similares(s: SparkSession, dir: String, docId: Long,
                lo: Double, hi: Double): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val probe = e.filter(col("vec_id") === docId)
      .select(col("vec_id").as("origen"), col("embedding").as("qv"))
    e.filter(col("vec_id") =!= docId)
      .select(col("vec_id").as("destino"), col("embedding"))
      .crossJoin(broadcast(probe))
      .withColumn("similitud",
        graft.functions.Vectors.similitud(col("qv"), col("embedding")))
      .filter(col("similitud").between(lo, hi))
      .select("origen", "destino", "similitud")
      .orderBy("destino")
  }
}
