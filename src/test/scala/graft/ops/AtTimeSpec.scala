package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[AtTime]] — graphite's from/until grammar against a pinned `now`
  * (2024-01-31 12:30:00 UTC, a Wednesday, chosen off-midnight so the
  * day-anchored forms are distinguishable from `now` itself).
  */
class AtTimeSpec extends AnyFunSuite {

  // 2024-01-31T12:30:00Z — Wednesday
  private val Now = 1706704200L
  private val Midnight = 1706659200L
  private def p(s: String) = AtTime.parse(s, Now)

  test("references") {
    assert(p("now") == Now)
    assert(p("") == Now)
    assert(p("today") == Midnight)
    assert(p("midnight") == Midnight)
    assert(p("yesterday") == Midnight - 86400)
    assert(p("tomorrow") == Midnight + 86400)
    assert(p("noon") == Midnight + 12 * 3600)
    assert(p("teatime") == Midnight + 16 * 3600)
  }

  test("relative offsets, bare and chained") {
    assert(p("-1d") == Now - 86400)
    assert(p("-90min") == Now - 5400)
    assert(p("now-1h") == Now - 3600)
    assert(p("midnight+2h") == Midnight + 7200)
    assert(p("now-1d+1h") == Now - 86400 + 3600)
    assert(p(" now - 1h ") == Now - 3600)
  }

  test("absolute dates and epochs") {
    assert(p("20240131") == Midnight)
    assert(p("20240101") == Midnight - 30 * 86400)
    assert(p("01/31/24") == Midnight)
    assert(p("01/31/2024") == Midnight)
    assert(p("1706659200") == Midnight)
  }

  test("time-of-day, bare and date-anchored") {
    assert(p("09:15") == Midnight + 9 * 3600 + 15 * 60)
    assert(p("09:15_20240101") == Midnight - 30 * 86400 + 9 * 3600 + 15 * 60)
    assert(p("16:00_yesterday") == Midnight - 86400 + 16 * 3600)
    // the ':' branch must win over the '/' branch for anchored dates
    assert(p("16:00_01/31/24") == Midnight + 16 * 3600)
  }

  test("day names resolve to the most recent such midnight") {
    assert(p("wednesday") == Midnight)           // today IS wednesday
    assert(p("monday") == Midnight - 2 * 86400)
    assert(p("thursday") == Midnight - 6 * 86400) // last week's
    assert(p("sunday-1w") == Midnight - 3 * 86400 - 604800)
    // graphite's 3-letter weekday prefixes
    assert(p("wed") == Midnight)
    assert(p("tues") == Midnight - 1 * 86400)
  }

  test("calendar offsets and the 2-digit-year pivot") {
    assert(p("-1mon") == Now - 30 * 86400)
    assert(p("now-2y") == Now - 2 * 365 * 86400)
    assert(p("-90min") == Now - 5400) // 'min' stays minutes, not months
    // 70-99 → 1900s (graphite's pivot); 00-69 → 2000s
    assert(p("01/31/99") == p("01/31/1999"))
    assert(p("01/31/24") == p("01/31/2024"))
  }

  test("malformed strings fail loudly") {
    intercept[IllegalArgumentException](p("lastfullmoon"))
    intercept[IllegalArgumentException](p("now+"))
    intercept[IllegalArgumentException](p("now-1fortnight"))
  }

  test("offset arithmetic is exact for any magnitude and unit") {
    for (n <- Seq(1, 7, 59, 90, 600, 10079);
         (u, mult) <- Seq("s" -> 1L, "min" -> 60L, "h" -> 3600L,
           "d" -> 86400L, "w" -> 604800L)) {
      assert(p(s"-$n$u") == Now - n * mult, s"-$n$u")
      assert(p(s"now+$n$u") == Now + n * mult, s"+$n$u")
      assert(p(s"midnight-$n$u+$n$u") == Midnight, s"cancel $n$u")
    }
    // epoch round-trips verbatim
    for (e <- Seq(1000000000L, Now, 1999999999L))
      assert(p(e.toString) == e)
  }
}
