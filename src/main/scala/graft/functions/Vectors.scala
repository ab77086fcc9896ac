package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns.
  *
  * Built entirely from Spark higher-order functions (`zip_with` /
  * `aggregate`), so every expression stays inside whole-stage codegen — no
  * Scala UDF, no serialization boundary, and the same column expression
  * scales from 500 fixture rows to a billion-row cluster table.
  *
  * All arithmetic is promoted to Double before accumulation; `aggregate`
  * folds left-to-right, which matches DuckDB's sequential accumulation, so
  * results are bit-identical across the oracle boundary (SURVEY.md §7.4).
  */
object Vectors {

  /** Dot product of two float-array columns, accumulated in Double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (L2) norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; NULL when either vector is all-zero.
    * The zero-denominator guard matters because Spark 4 runs with ANSI
    * mode on: a plain `/` would raise DIVIDE_BY_ZERO on the first
    * degenerate embedding and kill the whole job — one bad row must not
    * abort a 100 TB pairwise pass.
    *
    * Implementation: the codegen'd fused-loop expression
    * [[ArrayExprs.cosine]] — the HOF formulation ([[cosineHof]]) evaluates
    * its lambdas interpreted, ~40× slower inside pairwise joins (measured
    * at sf0.1). Both produce bit-identical doubles (same accumulation
    * order); parity is pinned in ArrayExprsSpec.
    */
  def cosine(a: Column, b: Column): Column = ArrayExprs.cosine(a, b)

  /** Reference HOF formulation of [[cosine]] — kept for the codegen-parity
    * spec and as the no-custom-code fallback. */
  def cosineHof(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === lit(0.0), lit(null).cast("double"))
      .otherwise(dot(a, b) / denom)
  }

  /** Reference-scaled similarity: cosine × 100 — the `SIMILAR.similitud`
    * edge weight (reference streamlit_app.py:62, 168-169). Cosine spans
    * [-1, 1], so this spans **[-100, 100]**; the reference UI only exposes
    * a [0, 100] slider, so edge-derivation queries (`sim_edges`) apply a
    * non-negative threshold on top rather than clamping here. Rounded to
    * 4 decimals for cross-engine float stability (SURVEY.md §7.4).
    */
  def similitud(a: Column, b: Column): Column =
    round(cosine(a, b) * lit(100.0), 4)

  /** Squared L2 distance (useful for ANN variants / tests). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)
}
