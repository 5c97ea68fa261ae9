package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-SQL dialect audit: every driver-facing oracle string must keep
  * float arithmetic in DOUBLE from the first operation.
  *
  * Why: a bare decimal literal (`1.0`, `0.75`) is DECIMAL in DuckDB, and
  * DECIMAL multiplication/division promotion rules are VERSION-dependent —
  * `x * 1.0 / y` can produce a differently-rounded quotient on the
  * driver's DuckDB than on the local one while Spark computes pure DOUBLE
  * throughout. That exact skew kept `dsir_weight` red at the driver for
  * two rounds while every local sweep passed (VERDICT r11 "What's wrong"
  * #1). Repo convention (bm25_search, token_pmi, Buckets.round6Sql):
  * every fractional constant that feeds arithmetic is spelled
  * `CAST(<lit> AS DOUBLE)`, and integer-ratio divisions cast an operand
  * with `CAST(... AS DOUBLE)` instead of multiplying by a bare `1.0`.
  *
  * The audit flags any dotted decimal literal that is a DIRECT operand of
  * `*` or `/` and is not CAST-wrapped. Comparisons (`>= 0.5`), string
  * literals, and exponent-form literals (`1e6` — already DOUBLE in both
  * dialects) are out of scope by construction.
  */
class OracleDialectSpec extends AnyFunSuite {

  // a dotted decimal literal token: not part of an identifier, a longer
  // number, a string ('1.0'), or an exponent form (0.5e0)
  private val bareDecimal = """(?<![\w.'])\d+\.\d+(?![\d\w.'])""".r

  test("no bare DECIMAL literal is an operand of * or / in any oracle SQL") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (key, sql) =>
        bareDecimal.findAllMatchIn(sql).flatMap { m =>
          val pre  = sql.substring(math.max(0, m.start - 32), m.start)
          val post = sql.substring(m.end, math.min(sql.length, m.end + 32))
          // the CAST(… AS DOUBLE) convention passes by construction:
          // wrapping the literal puts "CAST(" / " AS DOUBLE)" between it
          // and any operator, so the adjacency test below cannot fire.
          // + and - count too: `(ct + 1.5) / nt` runs DECIMAL addition
          // and then version-dependent DECIMAL division even though the
          // literal never touches the `/` — the dsir bug class through a
          // parenthesis. Comparisons (`>= 0.5`) are preceded by =/<,> or
          // a comma and stay out of scope.
          val isArithOperand =
            pre.matches("(?s).*(?<![<>=!])[*/+-]\\s*") ||
            post.matches("(?s)\\s*[*/+-].*")
          if (isArithOperand)
            Some(s"$key: …${pre.takeRight(20)}⟦${m.matched}⟧${post.take(20)}…")
          else None
        }
    }
    assert(offenders.isEmpty,
      "bare DECIMAL literal in float arithmetic (wrap in CAST(… AS DOUBLE) " +
      "or cast the integer operand):\n" + offenders.mkString("\n"))
  }
}
