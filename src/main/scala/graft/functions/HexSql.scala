package graft.functions

/** Engine-portable hex-slice parsing — the ONE definition behind every
  * oracled sketch's bit/slot positions (`agg_bloom_members` 3-char slots,
  * `dedup_simhash` 8-char token hashes, `text_countmin` 2-char cells).
  *
  * The emitted SQL text uses only `instr`/`substring`/`CAST`, which
  * behave identically in Spark SQL and DuckDB, and the SAME builder
  * output is pasted into both the Spark plan (via `expr`) and the oracle
  * SQL — so the parsed integers, and every bit and bucket derived from
  * them, replay exactly across engines. md5's lowercase-hex string form
  * is the cross-engine hash this discipline rides on.
  */
object HexSql {

  /** Parse `chars` hex characters of `hcol` starting at 1-based `off` as
    * a BIGINT in [0, 16^chars). `chars ≤ 15` keeps the value exact. */
  def intAt(hcol: String, off: Int, chars: Int): String = {
    require(chars >= 1 && chars <= 15, s"hex slice out of range: $chars")
    def d(o: Int) = s"(instr('0123456789abcdef', substring($hcol, $o, 1)) - 1)"
    (0 until chars)
      .map(i => s"CAST(${d(off + i)} AS BIGINT) * ${1L << (4 * (chars - 1 - i))}")
      .mkString("(", " + ", ")")
  }
}
