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
  * round. Cost: one ~130-branch CASE pair per call — this is for tiny
  * model tables (≤256 rows), never a corpus hot path.
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

  /** CASE ladder selecting floor(log2(x)) for a positive double `x`
    * already ≥ 1 (the caller inverts first), as an INT-typed expression.
    */
  private def expCase(x: String): String = {
    val whens = (MaxExp to 1 by -1)
      .map(k => s"WHEN $x >= ${pow2Literal(k)} THEN $k")
      .mkString(" ")
    s"(CASE $whens ELSE 0 END)"
  }

  /** CASE ladder selecting the EXACT literal 2^-floor(log2(x)) for a
    * positive double `x ≥ 1`, as a DOUBLE-typed expression.
    */
  private def scaleCase(x: String): String = {
    val whens = (MaxExp to 1 by -1)
      .map(k => s"WHEN $x >= ${pow2Literal(k)} THEN ${pow2Literal(-k)}")
      .mkString(" ")
    s"(CASE $whens ELSE 1e0 END)"
  }

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
}
