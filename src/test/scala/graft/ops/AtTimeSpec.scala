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

  test("compound offsets under one sign (attime's parseTimeOffset loop)") {
    // (number, unit) pairs chain: '-1d12h' is 36 h back, '-1mon2w' is
    // 30 + 14 days (the r13 review: the old single-pair parser silently
    // dropped the '2w' after a 'mon' unit and rejected '-1d12h')
    assert(p("now-1d12h") == Now - 36 * 3600)
    assert(p("now-1mon2w") == Now - (30 + 14) * 86400)
    assert(p("now+1h30min") == Now + 5400)
  }

  test("epoch is whole-string only — epoch+offset is attime's error") {
    // attime epoch-checks the FULL string before the grammar; graphite
    // raises for '123456-1d' (parseTimeReference('123456') has no day
    // shape) instead of inventing a 1970 window
    assert(p("123456") == 123456L)
    intercept[Exception] { p("123456-1d") }
    // the 8-digit date shape still composes with offsets
    assert(p("20240131-1d") == Midnight - 86400)
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

  test("am/pm time-of-day forms (graphite 1.1 attime)") {
    assert(p("8am") == Midnight + 8 * 3600)
    assert(p("8pm") == Midnight + 20 * 3600)
    assert(p("11am") == Midnight + 11 * 3600)
    assert(p("8:30pm") == Midnight + 20 * 3600 + 30 * 60)
    assert(p("9:15am") == Midnight + 9 * 3600 + 15 * 60)
    // attime's literal (hour+12)%24 arithmetic: 12pm wraps to 00:00 and
    // 12:30am stays 12:30 — bug-compatible on purpose
    assert(p("12pm") == Midnight)
    assert(p("12:30am") == Midnight + 12 * 3600 + 30 * 60)
    // time-of-day composes with day references
    assert(p("8am yesterday") == Midnight - 86400 + 8 * 3600)
    assert(p("8pm monday") == Midnight - 2 * 86400 + 20 * 3600)
    // the time-of-day alternatives are mutually exclusive (attime's
    // elif chain): a second suffix is garbage, not a silent overwrite
    intercept[IllegalArgumentException](p("8am8pm"))
    intercept[IllegalArgumentException](p("8:30am8pm"))
  }

  test("month-name dates (day required, current year, no year slot)") {
    val jan8 = Midnight - 23 * 86400 // 2024-01-08 00:00Z
    assert(p("jan8") == jan8)
    assert(p("january 8") == jan8)
    assert(p("8am jan 8") == jan8 + 8 * 3600)
    assert(p("december25") == p("12/25/24"))
    assert(p("jan 31") == Midnight)
    intercept[IllegalArgumentException](p("jan"))      // day required
    intercept[IllegalArgumentException](p("janx8"))    // typo'd month
    // a year after the day has no slot in this form; attime.py reads
    // int(ref[-2:]) and silently resolves 'january 8 2024' to Jan 24 —
    // we reject the misparse loudly instead of reproducing it
    intercept[IllegalArgumentException](p("january 8, 2024"))
    intercept[IllegalArgumentException](p("jan8x9"))   // garbage between
  }

  test("8-digit epoch falls back when the date shape is invalid") {
    // attime: only year>1900 / month<13 / day<32 reads as YYYYMMDD
    assert(p("99999999") == 99999999L)  // month 99 → epoch seconds
    assert(p("19000101") == 19000101L)  // year 1900 not > 1900 → epoch
    assert(p("20240131") == Midnight)   // valid shape stays a date
  }

  test("malformed strings fail loudly") {
    intercept[IllegalArgumentException](p("lastfullmoon"))
    intercept[IllegalArgumentException](p("now+"))
    intercept[IllegalArgumentException](p("now-1fortnight"))
    // attime's int(ref[i+1:i+3]) accepts a 1-char minute slice...
    assert(p("0:5") == Midnight + 5 * 60)
    assert(p("9:5-1h") == Midnight + 9 * 3600 + 5 * 60 - 3600)
    // ...but a non-digit inside the slice is its error
    intercept[IllegalArgumentException](p("0:5x"))
    // previously MatchErrors (ADVICE r9): arity/shape violations now
    // throw the grammar's IllegalArgumentException
    intercept[IllegalArgumentException](p("16:"))
    intercept[IllegalArgumentException](p("1/2"))
    intercept[IllegalArgumentException](p("1/2/3/4"))
    intercept[IllegalArgumentException](p("25:00"))
    intercept[IllegalArgumentException](p("12:75"))
  }

  // --- timezone threading (graphite's &tz=): references resolve in the
  // request zone, results stay epoch seconds ---

  private val Eastern = java.time.ZoneId.of("US/Eastern")
  private def pz(s: String, now: Long = Now) = AtTime.parse(s, now, Eastern)

  test("tz: midnight resolves in the caller's zone") {
    // Now = 2024-01-31T12:30Z = 07:30 EST same day → Eastern midnight
    // is 2024-01-31T00:00-05:00 = 05:00Z
    assert(pz("midnight") == Midnight + 5 * 3600)
    // At 2024-01-31T00:00Z it is still 19:00 of Jan 30 in EST: the
    // user's midnight is 19h earlier, not 24 or 5 — the exact window a
    // non-tz resolver gets wrong (and the fetch_relative_tz oracle)
    assert(pz("midnight", Midnight) == Midnight - 68400)
    assert(pz("yesterday", Midnight) == Midnight - 68400 - 86400)
    assert(pz("09:15", Midnight) == Midnight - 68400 + 9 * 3600 + 15 * 60)
    assert(pz("01/30/24", Midnight) == Midnight - 68400)
    assert(pz("20240130", Midnight) == Midnight - 68400)
    // UTC default unchanged
    assert(p("midnight") == Midnight)
  }

  test("tz: DST spring-forward day (US/Eastern 2024-03-10)") {
    val mar10utc = 1710028800L            // 2024-03-10T00:00:00Z
    val now = mar10utc + 18 * 3600        // 14:00 EDT, after the jump
    // midnight is still EST (UTC-5); the next midnight is EDT (UTC-4):
    // the calendar day is 23 real hours long
    val mid = AtTime.parse("midnight", now, Eastern)
    val tom = AtTime.parse("tomorrow", now, Eastern)
    assert(mid == mar10utc + 5 * 3600)
    assert(tom == mar10utc + 86400 + 4 * 3600)
    assert(tom - mid == 82800)            // 23h day
    // offsets are plain seconds (aware-datetime + timedelta, attime's
    // arithmetic): midnight+1d lands one REAL day later ≠ tomorrow
    assert(AtTime.parse("midnight+1d", now, Eastern) == mid + 86400)
    assert(AtTime.parse("midnight+1d", now, Eastern) != tom)
    // 02:30 does not exist on this day; java.time shifts forward by
    // the gap → 03:30 EDT
    assert(AtTime.parse("2:30am", now, Eastern) == mar10utc + 7 * 3600 + 1800)
  }

  test("tz: DST fall-back day picks the earlier offset (2024-11-03)") {
    val nov3utc = 1730592000L             // 2024-11-03T00:00:00Z
    val now = nov3utc + 18 * 3600
    // 01:30 occurs twice; java.time resolves the overlap to the
    // EARLIER offset (EDT, -04:00) = 05:30Z
    assert(AtTime.parse("1:30am", now, Eastern) == nov3utc + 5 * 3600 + 1800)
    // and the day is 25 real hours long
    val mid = AtTime.parse("midnight", now, Eastern)
    val tom = AtTime.parse("tomorrow", now, Eastern)
    assert(tom - mid == 90000)
  }

  test("offset arithmetic composes over every reference form, any zone") {
    val anchors = Seq("midnight", "8am", "8:30pm", "jan8", "monday",
      "20240131", "noon yesterday", "teatime", "01/31/24", "8pm jan 8")
    for (a <- anchors; n <- Seq(1, 90, 600);
         (u, mult) <- Seq("min" -> 60L, "h" -> 3600L, "d" -> 86400L)) {
      assert(p(s"$a-$n$u") == p(a) - n * mult, s"$a-$n$u")
      assert(p(s"$a+$n$u-$n$u") == p(a), s"cancel $a ±$n$u")
    }
    // offsets are plain seconds in ANY zone (attime's timedelta)
    for (a <- anchors)
      assert(pz(s"$a-1h") == pz(a) - 3600L, s"tz $a-1h")
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
