package graft.ops

import java.time.{DayOfWeek, Instant, LocalDate, LocalTime, ZoneOffset}

/** Graphite's `from=`/`until=` time grammar (graphite-web
  * render/attime.py, reconstructed from the public render-API docs) —
  * the request layer above [[RenderTarget]]: a time string is a
  * REFERENCE optionally followed by signed OFFSETS.
  *
  * {{{
  *   time    := reference offset*            (whitespace ignored)
  *   reference :=
  *       '' | 'now'                          — the pinned render time
  *     | 'today' | 'midnight'                — 00:00 today
  *     | 'yesterday' | 'tomorrow'            — 00:00 ± one day
  *     | 'noon' | 'teatime'                  — 12:00 / 16:00 today
  *     | 'monday'..'sunday'                  — most recent such 00:00
  *     | 'HH:MM' [ '_' date ]                — time-of-day (today, or
  *                                             anchored to the date)
  *     | 'YYYYMMDD' | 'MM/DD/YY[YY]'         — 00:00 of that date
  *     | epoch seconds (9+ digits)
  *   offset  := ('+'|'-') duration           — duration as in render
  *                                             targets (s/min/h/d/w)
  * }}}
  *
  * All arithmetic is UTC (the engine's session timezone); `now` is the
  * caller's pinned render time, never the wall clock — determinism is
  * the whole point of threading it through.
  */
object AtTime {

  def parse(s: String, nowS: Long): Long = {
    val t = s.trim.toLowerCase.replaceAll("\\s+", "")
    if (t.isEmpty) return nowS // graphite: an absent bound is `now`
    // split off trailing signed offsets (the reference itself contains
    // no '+', and '-' only inside MM/DD/YY never follows a letter/digit
    // boundary we'd cut: offsets are scanned from the LEFT edge of the
    // first sign that begins a valid duration tail)
    val firstSign = t.indexWhere(c => c == '+' || c == '-')
    val (refStr, offStr) =
      if (firstSign < 0) (t, "") else t.splitAt(firstSign)
    var ts = reference(refStr, nowS)
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
    */
  private def offsetS(tok: String): Long = {
    val digits = tok.takeWhile(_.isDigit)
    require(digits.nonEmpty, s"invalid offset '$tok'")
    val n = digits.toLong
    tok.drop(digits.length) match {
      case u if u.startsWith("mon") => n * 30L * 86400L
      case "y" | "year" | "years" => n * 365L * 86400L
      case _ => RenderTarget.durationS(tok)
    }
  }

  private def midnight(nowS: Long): Long =
    Math.floorDiv(nowS, 86400L) * 86400L

  private def reference(r: String, nowS: Long): Long = r match {
    case "" | "now" => nowS
    case "today" | "midnight" => midnight(nowS)
    case "yesterday" => midnight(nowS) - 86400L
    case "tomorrow" => midnight(nowS) + 86400L
    case "noon" => midnight(nowS) + 12 * 3600L
    case "teatime" => midnight(nowS) + 16 * 3600L
    // ':' BEFORE '/': a date-anchored time-of-day ('16:00_01/31/24')
    // contains both, and the time branch owns the '_' split
    case d if d.contains(":") =>
      // HH:MM optionally anchored '_date'
      val (hm, anchor) = d.indexOf('_') match {
        case -1 => (d, midnight(nowS))
        case i => (d.substring(0, i), reference(d.substring(i + 1), nowS))
      }
      val Array(h, m) = hm.split(":")
      anchor + LocalTime.of(h.toInt, m.toInt).toSecondOfDay
    case d if dayOf(d).isDefined =>
      // most recent such day's midnight (today qualifies); graphite
      // matches weekday names by their first three letters
      val today = LocalDate.ofInstant(Instant.ofEpochSecond(nowS),
        ZoneOffset.UTC)
      val back = (today.getDayOfWeek.getValue -
        dayOf(d).get.getValue + 7) % 7
      midnight(nowS) - back * 86400L
    case d if d.length == 8 && d.forall(_.isDigit) =>
      LocalDate.parse(d, java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
        .atStartOfDay(ZoneOffset.UTC).toEpochSecond
    case d if d.forall(_.isDigit) =>
      // graphite: ANY other pure integer is epoch seconds (only the
      // exact 8-digit shape reads as YYYYMMDD)
      d.toLong
    case d if d.contains("/") =>
      // MM/DD/YY: graphite's pivot maps 2-digit years 70-99 to the
      // 1900s, 00-69 to the 2000s
      val Array(m, dd, y) = d.split("/")
      val year =
        if (y.length == 2) { val v = y.toInt; if (v >= 70) 1900 + v else 2000 + v }
        else y.toInt
      LocalDate.of(year, m.toInt, dd.toInt)
        .atStartOfDay(ZoneOffset.UTC).toEpochSecond
    case other =>
      throw new IllegalArgumentException(s"unparseable time '$other'")
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
}
