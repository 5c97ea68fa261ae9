package graft.ops

/** The ONE tokenization shared by every document operator and its oracle
  * SQL. The Spark and DuckDB expressions must stay byte-equivalent: the
  * shared shingle index, the dedup family, the text-analysis features and
  * curate's gates all join on values derived from them, so a tokenization
  * tweak applied to a single copy would silently desynchronize them.
  */
private[graft] object Tokens {
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
  def byteBucketExpr(h: String): String = hexPrefixExpr(h, 2)

  def byteBucketSql(h: String): String = hexPrefixSql(h, 2)

  /** The general form: the first `digits` hex chars of `h` as an
    * integer, via the same nibble ladder ([[byteBucketExpr]] is the
    * 2-digit instance; the HLL sketch uses 8). Spark terms past 2 digits
    * carry `L` suffixes — the positional sums exceed Int range at 8
    * digits and Spark's non-ANSI int arithmetic would wrap silently;
    * DuckDB promotes on its own.
    */
  def hexPrefixExpr(h: String, digits: Int): String =
    (1 to digits).map { i =>
      val w = 1L << (4 * (digits - i))
      val term = s"(position(substring($h, $i, 1), '0123456789abcdef') - 1)"
      if (w == 1) term
      else if (digits <= 2) s"$term * $w"
      else s"$term * ${w}L"
    }.mkString(" + ")

  def hexPrefixSql(h: String, digits: Int): String =
    (1 to digits).map { i =>
      val w = 1L << (4 * (digits - i))
      val term = s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1)"
      if (w == 1) term else s"$term * $w"
    }.mkString(" + ")
}
