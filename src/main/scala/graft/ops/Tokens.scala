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
}
