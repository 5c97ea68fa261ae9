package graft.ops

/** The ONE tokenization shared by every document operator and its oracle
  * SQL. The Spark and DuckDB expressions must stay byte-equivalent: the
  * shared shingle index, the dedup family, the text-analysis features and
  * curate's gates all join on values derived from them, so a tokenization
  * tweak applied to a single copy would silently desynchronize them.
  */
private[ops] object Tokens {
  val toksExpr = "split(lower(text), ' ')"
  val toksSql = "string_split(lower(text), ' ')"
}
