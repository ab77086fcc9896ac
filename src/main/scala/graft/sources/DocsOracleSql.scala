package graft.sources

/** DuckDB twin of the [[DocsSource]] row generator — the SQL that makes a
  * `graft.docs.docs_<n>` query fully ORACLED (r17 verdict item 6): the
  * generator is a pure function of doc_id (splitmix64 mixing,
  * `DocsSource.mix`), so DuckDB can synthesize the SAME rows with 64-bit
  * modular arithmetic and the driver's daily hash gate then covers the
  * DSv2 scan path (catalog resolution, partition planning, filter
  * pushdown, column pruning) end to end — not just SourceSpec.
  *
  * Replay discipline (the HexSql/ann_lsh school, adapted to splitmix64):
  *  - Java `long` wraps mod 2^64; DuckDB BIGINT ERRORS on overflow. All
  *    mix state therefore lives in HUGEINT as the UNSIGNED value in
  *    [0, 2^64), reduced `% 2^64` after every add/multiply.
  *  - The two 64×64-bit multiplies cannot run directly even in HUGEINT
  *    (2^64 · 2^64 = 2^128 overflows its 2^127 max): each splits into
  *    32-bit halves — lo·lo + ((lo·hi + hi·lo) % 2^32)·2^32, every term
  *    < 2^96 — the standard word-split modular product.
  *  - Java `>>>` (unsigned shift) = `// 2^k` on the unsigned HUGEINT;
  *    `^` = DuckDB `xor`, closed over [0, 2^64) for non-negative inputs.
  *  - `math.floorMod(signedMix, L)` sees the SIGNED value: re-sign as
  *    u - 2^64 when u >= 2^63, then apply the (x % L + L) % L fold.
  *  - Each mix stage is one chained CTE (`SELECT * REPLACE(... AS v)`),
  *    never one inlined expression: stages reference `v` up to 4 times,
  *    so textual inlining would blow up ~4^6 while the staged form stays
  *    linear (the r17 giant-expression-tree lesson).
  *
  * Verified cell-for-cell against `DocsSource.textOf/langOf` for the
  * first 300 ids before landing (prototype in BASELINE.md r18 notes).
  */
object DocsOracleSql {

  private val T = "18446744073709551616" // 2^64
  private val H = "9223372036854775808"  // 2^63
  private val B = "4294967296"           // 2^32
  private val Golden = "11400714819323198485" // 0x9E3779B97F4A7C15 unsigned

  /** One word-split modular multiply: (v * (hi·2^32 + lo)) % 2^64. */
  private def mulmod(v: String, hi: Long, lo: Long): String =
    s"((($v % $B) * $lo + ((($v // $B) * $lo + ($v % $B) * $hi) % $B) * $B) % $T)"

  /** The six splitmix64 stages as chained CTEs over relation `src`
    * carrying HUGEINT column `v` (other columns ride along). */
  private def mixChain(src: String, prefix: String): String = Seq(
    s"${prefix}1 AS (SELECT * REPLACE(((v + $Golden) % $T) AS v) FROM $src)",
    s"${prefix}2 AS (SELECT * REPLACE(xor(v, v // 1073741824) AS v) FROM ${prefix}1)",
    s"${prefix}3 AS (SELECT * REPLACE(${mulmod("v", 0xBF58476DL, 0x1CE4E5B9L)} AS v) FROM ${prefix}2)",
    s"${prefix}4 AS (SELECT * REPLACE(xor(v, v // 134217728) AS v) FROM ${prefix}3)",
    s"${prefix}5 AS (SELECT * REPLACE(${mulmod("v", 0x94D049BBL, 0x133111EBL)} AS v) FROM ${prefix}4)",
    s"${prefix}6 AS (SELECT * REPLACE(xor(v, v // 2147483648) AS v) FROM ${prefix}5)"
  ).mkString(",\n")

  /** Java floorMod over the signed reading of unsigned HUGEINT `v`. */
  private def floorMod(v: String, l: Int): String =
    s"CAST((((CASE WHEN $v >= $H THEN $v - $T ELSE $v END) % $l) + $l) % $l AS INT)"

  private def sqlList(xs: Seq[String]): String =
    xs.map(w => s"'$w'").mkString("[", ",", "]")

  /** CTE prelude generating `docs_gen(doc_id, text, lang, source,
    * n_chars)` = the first `rows` rows of the graft-docs source. */
  def docsGenCte(rows: Long): String = s"""
    ids AS (SELECT CAST(unnest(range(0, $rows)) AS HUGEINT) AS doc_id),
    pseeds AS (
      SELECT doc_id, 'lang' AS tag, (doc_id + 7) % $T AS v FROM ids
      UNION ALL SELECT doc_id, 'src', (doc_id + 13) % $T FROM ids
      UNION ALL SELECT doc_id, 'len', doc_id FROM ids),
    ${mixChain("pseeds", "p")},
    attrs AS (
      SELECT doc_id,
        max(CASE WHEN tag = 'lang' THEN
          list_extract(${sqlList(DocsSource.Langs)}, 1 + ${floorMod("v", DocsSource.Langs.length)}) END) AS lang,
        max(CASE WHEN tag = 'src' THEN
          list_extract(${sqlList(DocsSource.Sources)}, 1 + ${floorMod("v", DocsSource.Sources.length)}) END) AS source,
        max(CASE WHEN tag = 'len' THEN 20 + ${floorMod("v", 30)} END) AS n_toks
      FROM p6 GROUP BY doc_id),
    tseeds AS (
      SELECT doc_id, CAST(j AS HUGEINT) AS j,
             (doc_id * 31 + CAST(j AS HUGEINT)) % $T AS v
      FROM attrs, unnest(range(0, n_toks)) AS u(j)),
    ${mixChain("tseeds", "t")},
    texts AS (
      SELECT doc_id,
        string_agg(list_extract(${sqlList(DocsSource.Vocab.toSeq)},
          1 + ${floorMod("v", DocsSource.Vocab.length)}), ' ' ORDER BY j) AS text
      FROM t6 GROUP BY doc_id),
    docs_gen AS (
      SELECT CAST(a.doc_id AS BIGINT) AS doc_id, t.text AS text,
             a.lang AS lang, a.source AS source,
             CAST(length(t.text) AS BIGINT) AS n_chars
      FROM attrs a JOIN texts t USING (doc_id))"""
}
