package graft.ops

import java.time.{DayOfWeek, Instant, LocalDate, LocalTime, ZonedDateTime,
  ZoneId, ZoneOffset}

/** Graphite's `from=`/`until=` time grammar (graphite-web
  * render/attime.py, reconstructed from the public render-API docs) —
  * the request layer above [[RenderTarget]]: a time string is a
  * REFERENCE optionally followed by signed OFFSETS.
  *
  * {{{
  *   time    := reference offset*      (whitespace, '_', ',' stripped —
  *                                      exactly attime.py's normalize)
  *   reference := epoch | [timeOfDay] [dayRef]
  *   epoch   := digits+                — unless EXACTLY the 8-digit
  *                                      YYYYMMDD shape (year>1900,
  *                                      month<13, day<32), which reads
  *                                      as a date (attime.py's check)
  *   timeOfDay :=
  *       'HH:MM' ['am'|'pm']           — 24h, or 12h with suffix
  *     | 'H'|'HH' ('am'|'pm')          — bare-hour 12h form ('8am')
  *     | 'noon' | 'midnight' | 'teatime'  — 12:00 / 00:00 / 16:00
  *   dayRef  :=
  *       '' | 'today'                  — today (in the request tz)
  *     | 'yesterday' | 'tomorrow'      — ± one calendar day
  *     | 'MM/DD/YY[YY]'                — attime's year pivot: y<1900 →
  *                                      +1900, then y<1970 → +100
  *     | 'YYYYMMDD'                    — ISO basic date
  *     | monthName dayNumber           — 'jan8', 'january 8'; month
  *                                      matched on its first 3 letters,
  *                                      day = trailing 1–2 digits, year
  *                                      = the current year (attime has
  *                                      no year slot in this form)
  *     | 'monday'..'sunday'            — most recent such day (prefix-
  *                                      matched, ≥3 letters)
  *   offset  := ('+'|'-') duration     — duration as in render targets
  *                                      (s/min/h/d/w; mon=30d, y=365d)
  * }}}
  *
  * '''Timezone:''' the reference resolves in the request `tz`
  * (graphite's `&tz=` parameter): 'midnight', weekday and date forms
  * mean that zone's wall-clock midnight; 'HH:MM' is wall-clock in that
  * zone. The RESULT is always epoch seconds, and offset arithmetic is
  * plain seconds on the epoch — exactly aware-datetime + timedelta in
  * attime.py, so `midnight+1d` on a DST-transition day differs from
  * `tomorrow` by the DST hour, in both engines. DST gap/overlap at a
  * resolved wall-clock time follows `java.time` (gap → shifted forward
  * by the gap, overlap → earlier offset). Default tz is UTC — the
  * engine's session zone — so un-threaded callers are unchanged.
  *
  * `now` is the caller's pinned render time, never the wall clock —
  * determinism is the whole point of threading it through.
  */
object AtTime {

  def parse(s: String, nowS: Long): Long = parse(s, nowS, ZoneOffset.UTC)

  def parse(s: String, nowS: Long, tz: ZoneId): Long = {
    // attime.py's normalize: strip whitespace, '_' and ',' — this is
    // what makes '04:00_20240101' and 'january 8'-style spacing parse:
    // the anchored-date '_' is cosmetic, not structural. (A year after
    // the month-name form — 'january 8, 2024' — is NOT a supported
    // shape; the month branch rejects it loudly, see `reference`.)
    val t = s.trim.toLowerCase.replaceAll("[\\s_,]+", "")
    if (t.isEmpty) return nowS // graphite: an absent bound is `now`
    // epoch seconds: attime checks this on the WHOLE string before the
    // grammar splits anything — '123456' is an epoch, but '123456-1d'
    // is NOT (its reference '123456' must then parse as a day reference
    // and fails loudly, exactly attime's behavior); the 8-digit
    // YYYYMMDD shape stays a date either way
    if (t.forall(_.isDigit) && !looksLikeDate(t)) return t.toLong
    // split off trailing signed offsets (the reference itself contains
    // no '+', and '-' only inside MM/DD/YY never follows a letter/digit
    // boundary we'd cut: offsets are scanned from the LEFT edge of the
    // first sign that begins a valid duration tail)
    val firstSign = t.indexWhere(c => c == '+' || c == '-')
    val (refStr, offStr) =
      if (firstSign < 0) (t, "") else t.splitAt(firstSign)
    var ts = reference(refStr, nowS, tz)
    var rest = offStr
    while (rest.nonEmpty) {
      val sign = rest.head match {
        case '+' => 1L
        case '-' => -1L
        case c => throw new IllegalArgumentException(
          s"expected sign at '$rest' in time '$s'")
      }
      val body = rest.drop(1)
      val tok = body.takeWhile(c => c.isLetterOrDigit)
      require(tok.nonEmpty, s"dangling sign in time '$s'")
      ts += sign * offsetS(tok)
      rest = body.drop(tok.length)
    }
    ts
  }

  /** attime offset units: the render-duration table plus graphite's
    * calendar approximations — months are 30 days, years 365 (exactly
    * attime.py's constants). 'mon…' must be checked before the
    * delegation or it would be rejected ('min' stays minutes).
    *
    * attime's `parseTimeOffset` consumes (number, unit) PAIRS in a loop
    * under one sign — '-1d12h' is 36 hours back and '-1mon2w' is
    * 30 + 14 days (the r13 review: the single-pair form silently
    * swallowed everything after a 'mon' unit and rejected other legal
    * compounds).
    */
  private def offsetS(tok: String): Long = {
    var rest = tok
    var total = 0L
    require(rest.nonEmpty && rest.head.isDigit, s"invalid offset '$tok'")
    while (rest.nonEmpty) {
      val digits = rest.takeWhile(_.isDigit)
      require(digits.nonEmpty, s"invalid offset '$tok'")
      rest = rest.drop(digits.length)
      val unit = rest.takeWhile(_.isLetter)
      rest = rest.drop(unit.length)
      val n = digits.toLong
      total += (unit match {
        case u if u.startsWith("mon") => n * 30L * 86400L
        case "y" | "year" | "years" => n * 365L * 86400L
        case _ => RenderTarget.durationS(s"$digits$unit")
      })
    }
    total
  }

  /** attime.py's timestamp-vs-YYYYMMDD disambiguation for an all-digit
    * string: only the exact 8-digit shape with year>1900, month<13,
    * day<32 reads as a date; every other pure integer — including a
    * "legal" 8-digit epoch like 99999999 — is epoch seconds. A shape
    * match with an invalid calendar day (month 00, day 00) then fails
    * loudly in LocalDate.of, as attime's datetime() does.
    */
  private def looksLikeDate(d: String): Boolean =
    d.length == 8 && d.forall(_.isDigit) &&
      d.take(4).toInt > 1900 && d.substring(4, 6).toInt < 13 &&
      d.substring(6, 8).toInt < 32

  private def reference(r: String, nowS: Long, tz: ZoneId): Long = {
    if (r == "" || r == "now") return nowS
    // NOT an epoch branch: epochs are recognized on the WHOLE input
    // string in [[parse]], before the offset split — an all-digit
    // reference reaching here is either a YYYYMMDD date (below) or
    // attime's "Unknown day reference" error (e.g. '123456-1d', which
    // graphite rejects rather than inventing 1970 semantics)

    var ref = r
    var hour = 0
    var minute = 0
    // --- time-of-day prefix (attime.py order: ':' form, bare am/pm,
    // then the named times) ---
    // the alternatives are MUTUALLY EXCLUSIVE (attime.py's elif chain):
    // at most one time-of-day form is consumed, so a second suffix like
    // '8am8pm' stays in `ref` and fails the date match loudly instead
    // of silently overwriting the hour
    val ci = ref.indexOf(':')
    val bareAm = ref.indexOf("am")
    val barePm = ref.indexOf("pm")
    if (ci > 0 && ci < 3) {
      val h = ref.take(ci)
      // minute = the next up-to-2 characters, exactly attime.py's
      // int(ref[i+1:i+3]) — a 1-char slice ('0:5') is legal, a slice
      // with a non-digit ('0:5x') is the grammar's error
      val mstr = ref.substring(ci + 1).take(2)
      require(h.forall(_.isDigit) && mstr.nonEmpty &&
        mstr.forall(_.isDigit),
        s"malformed time-of-day in '$r'")
      hour = h.toInt
      minute = mstr.toInt
      ref = ref.substring(ci + 1 + mstr.length)
      if (ref.startsWith("am")) ref = ref.drop(2)
      else if (ref.startsWith("pm")) { hour = (hour + 12) % 24; ref = ref.drop(2) }
    } else if (bareAm > 0 && bareAm < 3 && ref.take(bareAm).forall(_.isDigit)) {
      // 'Xam'/'XXam' bare-hour form
      hour = ref.take(bareAm).toInt; minute = 0; ref = ref.drop(bareAm + 2)
    } else if (barePm > 0 && barePm < 3 && ref.take(barePm).forall(_.isDigit)) {
      // 'Xpm'/'XXpm'
      hour = (ref.take(barePm).toInt + 12) % 24; minute = 0; ref = ref.drop(barePm + 2)
    } else if (ref.startsWith("noon")) { hour = 12; minute = 0; ref = ref.drop(4) }
    else if (ref.startsWith("midnight")) { hour = 0; minute = 0; ref = ref.drop(8) }
    else if (ref.startsWith("teatime")) { hour = 16; minute = 0; ref = ref.drop(7) }
    require(hour < 24 && minute < 60, s"time-of-day out of range in '$r'")

    // --- day reference, resolved as a calendar date in the request tz ---
    val today = LocalDate.ofInstant(Instant.ofEpochSecond(nowS), tz)
    val date: LocalDate = ref match {
      case "" | "today" => today
      case "yesterday" => today.minusDays(1)
      case "tomorrow" => today.plusDays(1)
      case d if d.contains("/") =>
        // MM/DD/YY[YY] with attime's exact year pivot: y<1900 → +1900,
        // then y<1970 → +100 (so 2-digit 70-99 → 1970s-90s, 00-69 →
        // 2000s — and bug-compatibly, a 4-digit year <1970 shifts too)
        val parts = d.split("/", -1)
        if (parts.length != 3 ||
          parts.exists(p => p.isEmpty || !p.forall(_.isDigit)))
          throw new IllegalArgumentException(s"malformed date '$d'")
        var y = parts(2).toInt
        if (y < 1900) y += 1900
        if (y < 1970) y += 100
        LocalDate.of(y, parts(0).toInt, parts(1).toInt)
      case d if looksLikeDate(d) =>
        LocalDate.of(d.take(4).toInt, d.substring(4, 6).toInt,
          d.substring(6, 8).toInt)
      case d if d.length >= 3 && MonthNames.contains(d.take(3)) =>
        // monthName dayNumber ('jan8', 'january 8'): day = trailing 1-2
        // digits, year = the CURRENT year — attime has no year slot in
        // this form (attime.py reads int(ref[-2:]), so 'january 8 2024'
        // there silently resolves to Jan 24). We reject a longer digit
        // suffix loudly rather than reproduce that misparse, and
        // require the letters to keep spelling the month so typos fail
        // instead of silently resolving.
        val letters = d.takeWhile(_.isLetter)
        val digits = d.drop(letters.length)
        if (!digits.forall(_.isDigit) || digits.isEmpty)
          throw new IllegalArgumentException(
            s"day of month required after month name in '$d'")
        require(digits.length <= 2,
          s"month-name dates carry no year slot in attime; got '$d'")
        require(MonthFull(d.take(3)).startsWith(letters),
          s"unparseable month name in '$d'")
        LocalDate.of(today.getYear, MonthNames(d.take(3)), digits.toInt)
      case d if dayOf(d).isDefined =>
        // most recent such day (today qualifies); graphite matches
        // weekday names by their first three letters
        val back = (today.getDayOfWeek.getValue -
          dayOf(d).get.getValue + 7) % 7
        today.minusDays(back)
      case other =>
        throw new IllegalArgumentException(s"unparseable time '$other'")
    }
    ZonedDateTime.of(date, LocalTime.of(hour, minute), tz).toEpochSecond
  }

  /** Weekday reference: graphite's attime matches the first THREE
    * letters ('mon', 'tues', 'monday' all work). Only in reference
    * position — in an offset, 'mon' is months ([[offsetS]]).
    */
  private def dayOf(d: String): Option[DayOfWeek] =
    if (d.length < 3) None
    else DayNames.collectFirst {
      case (name, dow) if name.startsWith(d) => dow
    }

  private val DayNames: Map[String, DayOfWeek] = Map(
    "monday" -> DayOfWeek.MONDAY, "tuesday" -> DayOfWeek.TUESDAY,
    "wednesday" -> DayOfWeek.WEDNESDAY, "thursday" -> DayOfWeek.THURSDAY,
    "friday" -> DayOfWeek.FRIDAY, "saturday" -> DayOfWeek.SATURDAY,
    "sunday" -> DayOfWeek.SUNDAY)

  private val MonthFull: Map[String, String] = Map(
    "jan" -> "january", "feb" -> "february", "mar" -> "march",
    "apr" -> "april", "may" -> "may", "jun" -> "june", "jul" -> "july",
    "aug" -> "august", "sep" -> "september", "oct" -> "october",
    "nov" -> "november", "dec" -> "december")

  private val MonthNames: Map[String, Int] = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5,
    "jun" -> 6, "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10,
    "nov" -> 11, "dec" -> 12)
}
