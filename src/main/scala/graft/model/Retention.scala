package graft.model

/** Whisper-style retention / archive configuration.
  *
  * Re-expresses the configuration surface of robyoung/go-whisper
  * (reference: whisper.go → `type Retention struct`, `ParseRetentionDef`,
  * `validateRetentions` — see SURVEY.md §1.2; /root/reference was empty at
  * build time, so anchors are grep-anchors, not file:line).
  *
  * A [[Retention]] describes one archive level: a resolution
  * (`secondsPerPoint`) and a point count (`numberOfPoints`). In the
  * reference these define a fixed-size ring buffer; in this engine they
  * define a rollup DataFrame (`points_<spp>s`) plus a retention filter
  * `bucket_ts >= now - maxRetentionSeconds` (SURVEY.md §2.5 R3). Config
  * only — never data.
  */
final case class Retention(secondsPerPoint: Int, numberOfPoints: Int) {
  require(secondsPerPoint > 0, s"secondsPerPoint must be positive: $secondsPerPoint")
  require(numberOfPoints > 0, s"numberOfPoints must be positive: $numberOfPoints")

  /** Total time span covered by this archive, in seconds. */
  def maxRetentionSeconds: Long = secondsPerPoint.toLong * numberOfPoints

  /** Whisper interval alignment: floor a unix-seconds timestamp to this
    * archive's resolution (reference: whisper.go → `Interval`, modular
    * `interval - (interval mod secondsPerPoint)`).
    */
  def align(tsSeconds: Long): Long =
    tsSeconds - math.floorMod(tsSeconds, secondsPerPoint.toLong)

  override def toString: String = s"${secondsPerPoint}s:${numberOfPoints}pts"
}

/** Consolidation functions (reference: whisper.go → `AggregationMethod`
  * iota enum Average=1, Sum, Last, Max, Min — on-disk values shared with
  * graphite-project/whisper). Spark mappings per SURVEY.md §2.4.
  *
  * The Go reference implements ids 1–5 only; graphite's whisper.py
  * additionally defines AvgZero=6, AbsMax=7, AbsMin=8 (whisper.py →
  * `aggregationMethodToType` / `aggregate`). Trees written by graphite
  * with those header ids are valid `.wsp` files, so the codec accepts
  * and consolidates all eight — refusing them would make real archives
  * unreadable.
  */
sealed abstract class AggregationMethod(val id: Int, val name: String)
object AggregationMethod {
  case object Average extends AggregationMethod(1, "average")
  case object Sum     extends AggregationMethod(2, "sum")
  case object Last    extends AggregationMethod(3, "last")
  case object Max     extends AggregationMethod(4, "max")
  case object Min     extends AggregationMethod(5, "min")
  case object AvgZero extends AggregationMethod(6, "avg_zero")
  case object AbsMax  extends AggregationMethod(7, "absmax")
  case object AbsMin  extends AggregationMethod(8, "absmin")

  val all: Seq[AggregationMethod] =
    Seq(Average, Sum, Last, Max, Min, AvgZero, AbsMax, AbsMin)

  def fromId(id: Int): AggregationMethod =
    all.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"unknown aggregation method id $id"))

  def fromName(n: String): AggregationMethod =
    all.find(_.name == n.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown aggregation method '$n'"))
}

/** A validated, finest-to-coarsest ordered archive list plus the file-level
  * metadata whisper bakes into its header (aggregation method +
  * xFilesFactor). One WhisperSchema ≡ one `.wsp` header (SURVEY.md §1.1).
  */
final case class WhisperSchema(
    retentions: Seq[Retention],
    method: AggregationMethod,
    xFilesFactor: Double) {
  require(xFilesFactor >= 0.0 && xFilesFactor <= 1.0,
    s"xFilesFactor must be in [0,1]: $xFilesFactor")
  Retentions.validate(retentions)

  def maxRetentionSeconds: Long = retentions.map(_.maxRetentionSeconds).max

  /** U3 archive selection: the finest archive whose retention covers a
    * point of age `ageSeconds`, or None if older than every archive
    * (reference: whisper.go → Update's archive loop; SURVEY.md §2.6 U3).
    * Archives are finest→coarsest, so the first match is the finest.
    */
  def archiveFor(ageSeconds: Long): Option[Int] = {
    if (ageSeconds < 0) None // future timestamps are rejected (F3)
    else retentions.indexWhere(_.maxRetentionSeconds > ageSeconds) match {
      case -1 => None
      case i  => Some(i)
    }
  }
}

object Retentions {

  /** Render retentions back to the whisper DSL in its base
    * seconds:points form (`"60s:1440,300s:8640"`) — the inverse of
    * [[parseRetentionDefs]] up to unit sugar, so config derived FROM a
    * schema (e.g. the DSv2 write's `retentions` option) can never
    * drift from it.
    */
  def render(rets: Seq[Retention]): String =
    rets.map(r => s"${r.secondsPerPoint}s:${r.numberOfPoints}").mkString(",")

  /** Unit suffix multipliers (reference: whisper.go → `unitMultiplier`;
    * same table as graphite's retention DSL).
    */
  val unitMultiplier: Map[Char, Long] = Map(
    's' -> 1L, 'm' -> 60L, 'h' -> 3600L, 'd' -> 86400L,
    'w' -> 604800L, 'y' -> 31536000L)

  private def parseQuantity(s: String, what: String): Long = {
    val t = s.trim
    if (t.isEmpty) throw new IllegalArgumentException(s"empty $what in retention def")
    val (digits, unit) =
      if (t.last.isDigit) (t, None) else (t.dropRight(1), Some(t.last.toLower))
    val n =
      try digits.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"invalid $what '$s' in retention def")
      }
    if (n <= 0) throw new IllegalArgumentException(s"$what must be positive: '$s'")
    unit match {
      case None => n
      case Some(u) => unitMultiplier.get(u) match {
        case Some(mult) => n * mult
        case None => throw new IllegalArgumentException(s"unknown unit '$u' in '$s'")
      }
    }
  }

  /** Parse one `precision:duration` pair (reference: whisper.go →
    * `ParseRetentionDef`). Left side: seconds-per-point, unit-suffixed.
    * Right side: with a unit suffix it is a duration (point count =
    * duration / precision); a bare integer is a point count.
    */
  def parseRetentionDef(def_ : String): Retention = {
    val parts = def_.split(":", -1)
    if (parts.length != 2)
      throw new IllegalArgumentException(
        s"retention def must be precision:duration, got '${def_}'")
    val precision = parseQuantity(parts(0), "precision")
    if (precision > Int.MaxValue)
      throw new IllegalArgumentException(s"precision overflows: '${def_}'")
    val right = parts(1).trim
    val points =
      if (right.nonEmpty && right.last.isDigit) parseQuantity(right, "points")
      else {
        val duration = parseQuantity(right, "duration")
        if (duration % precision != 0)
          throw new IllegalArgumentException(
            s"duration $right not a multiple of precision ${parts(0)} in '${def_}'")
        duration / precision
      }
    if (points > Int.MaxValue)
      throw new IllegalArgumentException(s"point count overflows: '${def_}'")
    Retention(precision.toInt, points.toInt)
  }

  /** Parse a comma-separated list, e.g. `"1s:1d,1m:30d,1h:5y"`
    * (reference: whisper.go → `ParseRetentionDefs`). Does NOT validate the
    * list — callers compose with [[validate]] (whisper validates in
    * `Create`, not in the parser).
    */
  def parseRetentionDefs(defs: String): Seq[Retention] =
    defs.split(",").toSeq.map(d => parseRetentionDef(d.trim))

  /** The five validation rules (reference: whisper.go →
    * `validateRetentions`, mirroring python whisper's
    * `validateArchiveList`; SURVEY.md §1.2):
    *   1. at least one retention;
    *   2. no two archives share a secondsPerPoint;
    *   3. strictly finest→coarsest, each coarser spp an integer multiple
    *      of every finer spp;
    *   4. strictly increasing time span per archive;
    *   5. each finer archive holds ≥ one full consolidation window of the
    *      next coarser archive.
    */
  def validate(rs: Seq[Retention]): Seq[Retention] = {
    if (rs.isEmpty)
      throw new IllegalArgumentException("retention list must not be empty") // rule 1
    rs.sliding(2).foreach {
      case Seq(finer, coarser) =>
        if (coarser.secondsPerPoint == finer.secondsPerPoint)
          throw new IllegalArgumentException( // rule 2
            s"duplicate archive resolution ${finer.secondsPerPoint}s")
        if (coarser.secondsPerPoint < finer.secondsPerPoint)
          throw new IllegalArgumentException( // rule 3 (ordering)
            s"archives must be ordered finest to coarsest: $finer before $coarser")
        if (coarser.secondsPerPoint % finer.secondsPerPoint != 0)
          throw new IllegalArgumentException( // rule 3 (divisibility)
            s"coarser resolution ${coarser.secondsPerPoint}s is not a multiple " +
              s"of finer ${finer.secondsPerPoint}s")
        if (coarser.maxRetentionSeconds <= finer.maxRetentionSeconds)
          throw new IllegalArgumentException( // rule 4
            s"coarser archive $coarser must cover a longer span than $finer")
        val window = coarser.secondsPerPoint / finer.secondsPerPoint
        if (finer.numberOfPoints < window)
          throw new IllegalArgumentException( // rule 5
            s"archive $finer holds fewer points than one consolidation window " +
              s"($window) of $coarser")
      case _ => () // single element: nothing pairwise to check
    }
    // rule 3 requires every coarser spp divisible by every finer spp, not
    // just adjacent pairs; adjacent divisibility chains transitively, so
    // pairwise checking suffices.
    rs
  }

  /** Canonical fixture configs (FIXTURES.md §1). */
  val std: WhisperSchema = WhisperSchema(
    parseRetentionDefs("1m:1d,5m:7d,1h:30d"), AggregationMethod.Average, 0.5)
  val tight: WhisperSchema = WhisperSchema(
    parseRetentionDefs("1s:120,10s:1h"), AggregationMethod.Sum, 0.0)
  val gate: WhisperSchema = WhisperSchema(
    parseRetentionDefs("1m:1h,10m:6h"), AggregationMethod.Max, 0.9)
  val lww: WhisperSchema = WhisperSchema(
    parseRetentionDefs("1m:1d"), AggregationMethod.Last, 0.5)
}
