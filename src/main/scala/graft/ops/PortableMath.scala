package graft.ops

/** Cross-engine bit-deterministic `ln` (SURVEY.md §4.4 trap 7, the
  * `dsir_weight` r10-r12 hash-miss class).
  *
  * `ln()` in Spark lowers to JVM `Math.log` and in DuckDB to the host
  * libm's `log` — both are faithful to ≤1 ulp but NOT required by IEEE
  * 754 to be correctly rounded, so the two engines may disagree in the
  * last bit on the SAME input. A value whose ×1e6 then sits within that
  * ulp of a `.5` midpoint flips under [[Buckets.round6]] per engine —
  * and an upstream model table (DSIR's 256 bucket weights) amplifies one
  * flipped weight into every downstream per-document mean. Three rounds
  * of dialect fixes could not close that class because the hazard is in
  * libm, not the dialect.
  *
  * The fix is structural: compute `ln` as a FIXED SEQUENCE of IEEE
  * double ops (`+ - * /`, comparisons) that both engines are REQUIRED to
  * evaluate identically — correctly-rounded arithmetic on identical
  * operands in an identical tree is bit-identical everywhere. The same
  * SQL text runs under Spark `expr(...)` and DuckDB verbatim, so engine
  * and oracle cannot diverge even by 1 ulp.
  *
  * Algorithm (classic libm shape, fixed-depth, branch-free per row
  * beyond CASE selection):
  *  1. invert: `x0 = q < 1 ? 1/q : q`, remember the sign — division is
  *     correctly rounded, so both engines see the same `x0`;
  *  2. range-reduce by an EXACT power of two selected with a CASE
  *     ladder over exact power-of-two literals: `m0 = x0 · 2^-e0 ∈ [1,2)`
  *     (multiplying a double by a power of two is exact);
  *  3. fold `[1.5, 2) → [0.75, 1.5)`: one more halving so `|z| ≤ 0.2`;
  *  4. `ln(m) = 2·atanh(z)`, `z = (m-1)/(m+1)`, via a 7-term odd Horner
  *     series — truncation error ≤ 2·0.2¹⁵/15 ≈ 5e-12, far inside the
  *     1e-6 output grid;
  *  5. `ln(q) = sign · (e·LN2 + series)`, `LN2` a double literal.
  *
  * All literals are exponent-form (`…e…` is DOUBLE in both dialects —
  * OracleDialectSpec's allowed class) and all powers of two are emitted
  * as EXACT decimal expansions (`2^-j = 5^j·10^-j`), so parsing cannot
  * round. Cost per evaluation: ~2·7 comparisons (the balanced exponent
  * CASE tree) plus ~25 double ops — cheap enough that `text_entropy`
  * runs the chain inline per (doc, term) corpus row; model-table
  * callers (dsir, the bigram LM) evaluate it once per model row and
  * amortize further.
  */
object PortableMath {

  /** Exact double literal for 2^k, valid and DOUBLE-typed in both
    * dialects: `2^k = 2^k·e0` for k ≥ 0, `2^-j = 5^j e-j` for k < 0
    * (powers of two have terminating decimal expansions).
    */
  def pow2Literal(k: Int): String =
    if (k >= 0) s"${BigInt(2).pow(k)}e0" else s"${BigInt(5).pow(-k)}e${k}"

  /** Highest supported exponent magnitude: q outside
    * [2^-64, 2^65) is clamped to the edge branch (our probability
    * ratios live in ~[1e-9, 1e9]; the edge is unreachable but total).
    */
  val MaxExp = 64

  /** Balanced CASE tree over the exponent range: `floor(log2(x))` for
    * `x ≥ 1` resolves in ⌈log2(MaxExp + 1)⌉ = 7 comparisons instead of
    * a linear ladder's ~MaxExp (the r13 `text_entropy` finding: the
    * ladder runs per corpus row there, and small inputs walked ~60
    * dead branches). `leaf(k)` renders the selected value.
    */
  private def expTree(x: String, leaf: Int => String): String = {
    def tree(lo: Int, hi: Int): String =
      if (lo == hi) leaf(lo)
      else {
        val mid = (lo + hi + 1) / 2
        s"(CASE WHEN $x >= ${pow2Literal(mid)} THEN ${tree(mid, hi)} " +
          s"ELSE ${tree(lo, mid - 1)} END)"
      }
    tree(0, MaxExp)
  }

  /** floor(log2(x)) for a positive double `x ≥ 1` (the caller inverts
    * first), as an INT-typed expression.
    */
  private def expCase(x: String): String = expTree(x, _.toString)

  /** The EXACT literal 2^-floor(log2(x)) for a positive double `x ≥ 1`,
    * as a DOUBLE-typed expression.
    */
  private def scaleCase(x: String): String = expTree(x, k => pow2Literal(-k))

  /** Step texts for the chained (withColumn / CTE) form. The caller
    * binds each step to a named column so no CASE is ever duplicated:
    *
    *  - `sgn`  from `q`:  −1 if q < 1 else +1 (DOUBLE)
    *  - `x0`   from `q`:  q < 1 ? 1/q : q     (x0 ≥ 1)
    *  - `e0`   from `x0`: floor(log2(x0))     (INT)
    *  - `m0`   from `x0`: x0 · 2^−e0 ∈ [1,2)
    *  - `e1`   from `e0,m0`: +1 when m0 ≥ 1.5
    *  - `m1`   from `m0`:  halved when m0 ≥ 1.5 → [0.75, 1.5)
    *  - `z`    from `m1`:  (m1−1)/(m1+1), |z| ≤ 0.2
    *  - result from `sgn,e1,z`: sign·(e·LN2 + 2z·Horner(z²))
    */
  def sgnSql(q: String): String = s"(CASE WHEN $q < 1e0 THEN -1e0 ELSE 1e0 END)"
  def x0Sql(q: String): String = s"(CASE WHEN $q < 1e0 THEN 1e0 / $q ELSE $q END)"
  def e0Sql(x0: String): String = expCase(x0)
  def m0Sql(x0: String): String = s"($x0 * ${scaleCase(x0)})"
  def e1Sql(e0: String, m0: String): String =
    s"(CASE WHEN $m0 >= 15e-1 THEN $e0 + 1 ELSE $e0 END)"
  def m1Sql(m0: String): String =
    s"(CASE WHEN $m0 >= 15e-1 THEN $m0 * 5e-1 ELSE $m0 END)"
  def zSql(m1: String): String = s"(($m1 - 1e0) / ($m1 + 1e0))"

  /** ln(2) to the nearest double, as the shared literal. */
  val Ln2Literal = "6.931471805599453e-1"

  /** Final assembly: `sgn · (CAST(e AS DOUBLE)·LN2 + 2z·p(z²))` with the
    * odd-atanh Horner polynomial `p(u) = 1 + u(1/3 + u(1/5 + … + u/15))`
    * — every coefficient an exact-operand division both engines
    * constant-fold identically. Truncation ≤ 2·0.2¹⁷/17 ≈ 1.5e-13.
    */
  def lnFromPartsSql(sgn: String, e1: String, z: String): String = {
    val u = s"($z * $z)"
    val p = s"(1e0 + $u * (1e0/3e0 + $u * (1e0/5e0 + $u * (1e0/7e0 + " +
      s"$u * (1e0/9e0 + $u * (1e0/11e0 + $u * (1e0/13e0 + " +
      s"$u * (1e0/15e0))))))))"
    s"($sgn * (CAST($e1 AS DOUBLE) * $Ln2Literal + 2e0 * $z * $p))"
  }

  /** DataFrame form: bind each step to a column (no CASE duplication)
    * and emit `out = portable_ln(qExpr)`; the scratch columns are
    * dropped. `qExpr` must be a DOUBLE-typed deterministic expression
    * over the frame's columns with identical text in the oracle twin.
    */
  def lnColumn(df: org.apache.spark.sql.DataFrame,
      qExpr: String, out: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.expr
    df.withColumn("pm_q", expr(qExpr))
      .withColumn("pm_sgn", expr(sgnSql("pm_q")))
      .withColumn("pm_x0", expr(x0Sql("pm_q")))
      .withColumn("pm_e0", expr(e0Sql("pm_x0")))
      .withColumn("pm_m0", expr(m0Sql("pm_x0")))
      .withColumn("pm_e1", expr(e1Sql("pm_e0", "pm_m0")))
      .withColumn("pm_m1", expr(m1Sql("pm_m0")))
      .withColumn("pm_z", expr(zSql("pm_m1")))
      .withColumn(out, expr(lnFromPartsSql("pm_sgn", "pm_e1", "pm_z")))
      .drop("pm_q", "pm_sgn", "pm_x0", "pm_e0", "pm_m0", "pm_e1",
        "pm_m1", "pm_z")
  }

  /** Oracle-CTE form: the chain of CTE definitions computing
    * `out = portable_ln(qExpr)` FROM the `from` CTE, carrying the
    * `carry` columns through every step; the final CTE is named
    * `${prefix}ln`. Each step text is the IDENTICAL string the Spark
    * side evaluates via [[lnColumn]], just bound to CTE columns instead
    * of withColumn names.
    */
  def lnCtesSql(from: String, carry: Seq[String], qExpr: String,
      out: String, prefix: String): String = {
    val c = carry.mkString(", ")
    s"""${prefix}q AS (SELECT $c, $qExpr AS pm_q FROM $from),
       |${prefix}l1 AS (SELECT $c, ${sgnSql("pm_q")} AS pm_sgn,
       |                ${x0Sql("pm_q")} AS pm_x0 FROM ${prefix}q),
       |${prefix}l2 AS (SELECT $c, pm_sgn, ${e0Sql("pm_x0")} AS pm_e0,
       |                ${m0Sql("pm_x0")} AS pm_m0 FROM ${prefix}l1),
       |${prefix}l3 AS (SELECT $c, pm_sgn,
       |                ${e1Sql("pm_e0", "pm_m0")} AS pm_e1,
       |                ${m1Sql("pm_m0")} AS pm_m1 FROM ${prefix}l2),
       |${prefix}l4 AS (SELECT $c, pm_sgn, pm_e1,
       |                ${zSql("pm_m1")} AS pm_z FROM ${prefix}l3),
       |${prefix}ln AS (SELECT $c,
       |  ${lnFromPartsSql("pm_sgn", "pm_e1", "pm_z")} AS $out
       |  FROM ${prefix}l4)""".stripMargin
  }

  /** The shared micro-unit quantization text: `floor(x·1e6 + 0.5)` —
    * [[graft.ops.Buckets.round6]]'s floor form BEFORE the /1e6, so the
    * stored integer IS the 1e-6 grid coordinate.
    */
  def microUnitsSql(x: String): String =
    s"CAST(floor($x * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT)"

  /** Portable BIGINT floor division `⌊a / b⌋` for a POSITIVE divisor,
    * one shared text in both dialects with zero float hazard:
    * `(a − pmod(a, b)) / b` where `pmod = ((a % b) + b) % b` lifts the
    * dividend-sign remainder (identical C-style `%` in Spark/JVM and
    * DuckDB, verified against DuckDB 1.0.0) to the positive residue.
    * The interior `/` types as DOUBLE in both dialects but its operand
    * is an EXACT multiple of `b` with quotient far inside 2^53, so the
    * division is exact and the final CAST is lossless.
    *
    * Main client: `dsir_weight`'s half-up integer mean
    * `⌊(2S + n) / (2n)⌋ = ⌊S/n + 1/2⌋` — the r14 close of the four-round
    * driver hash miss: after r13 proved the weight TABLE bit-identical
    * (`dsir_model` green), this removes the last engine-evaluated
    * doubles from the serving edge; the emitted weight becomes ONE
    * correctly-rounded `CAST(int AS DOUBLE)/1e6` of an exact integer.
    */
  def floorDivSql(a: String, b: String): String =
    s"CAST(((($a)) - (((($a) % ($b)) + ($b)) % ($b))) / ($b) AS BIGINT)"

  /** Half-up integer division `⌊s/n + 1/2⌋` (positive n) — [[Buckets
    * .round6]]'s half-toward-+∞ midpoint spec in pure BIGINT arithmetic.
    */
  def halfUpDivSql(s: String, n: String): String =
    floorDivSql(s"2 * ($s) + ($n)", s"2 * ($n)")
}
