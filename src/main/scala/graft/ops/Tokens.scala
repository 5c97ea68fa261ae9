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

  /** Stopword set behind the quality score — shared by
    * [[TextAnalysis.textQuality]], [[Curation.curate]]'s folded features
    * and both oracles, so the gate can never drift from the feature op.
    */
  val stopTokens: Seq[String] = Seq("a", "the")

  /** `t = 'a' OR t = 'the'` — valid in both Spark SQL and DuckDB. */
  def stopPred(t: String): String =
    stopTokens.map(w => s"$t = '$w'").mkString(" OR ")

  /** First-byte bucket (0–255) of a hex digest column — the ONE shared
    * hash→bucket arithmetic behind [[graft.ops.Curation.splitAssign]],
    * its leakage-safe twin and the DSIR feature hash. Spark and DuckDB
    * spell string-search differently (`position(needle, hay)` vs
    * `strpos(hay, needle)`), so each engine gets its own rendering of
    * the SAME nibble formula; keeping both here is what stops an
    * arithmetic tweak from silently desynchronizing an op from its
    * oracle (or one consumer from another — split assignments and
    * feature buckets must stay stable across rounds).
    */
  def byteBucketExpr(h: String): String =
    s"(position(substring($h, 1, 1), '0123456789abcdef') - 1) * 16 + " +
      s"(position(substring($h, 2, 1), '0123456789abcdef') - 1)"

  def byteBucketSql(h: String): String =
    s"(strpos('0123456789abcdef', substr($h, 1, 1)) - 1) * 16 + " +
      s"(strpos('0123456789abcdef', substr($h, 2, 1)) - 1)"
}
