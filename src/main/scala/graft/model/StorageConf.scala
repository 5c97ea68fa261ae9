package graft.model

import scala.util.matching.Regex

/** Carbon's `storage-schemas.conf` / `storage-aggregation.conf` — the
  * public graphite config pair that decides which whisper schema a metric
  * gets at creation time (graphite-project/carbon docs, "Configuring
  * Carbon"). The reference library itself takes an explicit retention
  * list, but every real graphite deployment carries these two files, so a
  * migrating user needs them resolved to [[WhisperSchema]]s to rebuild or
  * extend a tree with this engine.
  *
  * Format (python ConfigParser subset, as carbon reads it):
  *
  * {{{
  * [carbon]                      # section name — documentation only
  * pattern = ^carbon\.           # regex, matched with re.search semantics
  * retentions = 60:90d,1h:5y     # whisper retention DSL (schemas file)
  *
  * [all_min]
  * pattern = \.min$
  * xFilesFactor = 0.1            # aggregation file
  * aggregationMethod = min
  * }}}
  *
  * Rules are ordered; the FIRST section whose pattern matches the metric
  * wins, independently per file. A metric with no schema match cannot be
  * created (carbon errors likewise); a metric with no aggregation match
  * takes carbon's documented defaults: `average` / `xFilesFactor = 0.5`.
  */
object StorageConf {

  final case class SchemaRule(
      name: String, pattern: Regex, retentions: Seq[Retention])

  final case class AggRule(
      name: String, pattern: Regex,
      xFilesFactor: Option[Double], method: Option[AggregationMethod])

  /** Carbon's defaults when no aggregation rule matches (carbon.conf.example). */
  val DefaultMethod: AggregationMethod = AggregationMethod.Average
  val DefaultXff: Double = 0.5

  private final case class Section(name: String, entries: Map[String, String])

  /** Minimal ConfigParser subset: `[section]` headers, `key = value`
    * (first `=` splits; keys lowercased — ConfigParser is
    * case-insensitive on option names), full-line `#`/`;` comments.
    */
  private def parseSections(text: String): Seq[Section] = {
    val out = Seq.newBuilder[Section]
    var name: Option[String] = None
    var entries = Map.newBuilder[String, String]
    def flush(): Unit = name.foreach { n =>
      out += Section(n, entries.result()); entries = Map.newBuilder
    }
    for (raw <- text.linesIterator) {
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#") || line.startsWith(";")) ()
      else if (line.startsWith("[") && line.endsWith("]")) {
        flush(); name = Some(line.substring(1, line.length - 1).trim)
      } else line.indexOf('=') match {
        case -1 =>
          throw new IllegalArgumentException(
            s"storage conf: not a 'key = value' line: '$line'")
        case i =>
          if (name.isEmpty)
            throw new IllegalArgumentException(
              s"storage conf: entry before any [section]: '$line'")
          entries += (line.substring(0, i).trim.toLowerCase ->
            line.substring(i + 1).trim)
      }
    }
    flush()
    out.result()
  }

  private def patternOf(s: Section): Regex =
    s.entries.getOrElse("pattern", throw new IllegalArgumentException(
      s"storage conf: section [${s.name}] has no pattern")).r

  /** Parse a `storage-schemas.conf`. Every section needs `pattern` and
    * `retentions`; the retention list is validated with whisper's 5-rule
    * validator (a carbon deployment would have refused invalid lists at
    * create time too).
    */
  def parseSchemas(text: String): Seq[SchemaRule] =
    parseSections(text).map { s =>
      val rets = Retentions.parseRetentionDefs(s.entries.getOrElse(
        "retentions", throw new IllegalArgumentException(
          s"storage-schemas: section [${s.name}] has no retentions")))
      Retentions.validate(rets)
      SchemaRule(s.name, patternOf(s), rets)
    }

  /** Parse a `storage-aggregation.conf`. `xFilesFactor` and
    * `aggregationMethod` are each optional per section (carbon falls back
    * to the defaults for whichever is absent).
    */
  def parseAggregation(text: String): Seq[AggRule] =
    parseSections(text).map { s =>
      AggRule(s.name, patternOf(s),
        s.entries.get("xfilesfactor").map { v =>
          val x = v.toDouble
          require(x >= 0.0 && x <= 1.0,
            s"storage-aggregation: xFilesFactor out of [0,1] in [${s.name}]: $v")
          x
        },
        s.entries.get("aggregationmethod").map(AggregationMethod.fromName))
    }

  /** Both files resolved together: first-match-wins per file, carbon
    * defaults for a missing aggregation match.
    */
  final case class Resolver(schemas: Seq[SchemaRule], aggs: Seq[AggRule]) {

    /** re.search semantics: an unanchored regex matches anywhere. */
    private def hits(r: Regex, metric: String): Boolean =
      r.findFirstIn(metric).isDefined

    def schemaRuleFor(metric: String): Option[SchemaRule] =
      schemas.find(r => hits(r.pattern, metric))

    /** The full whisper header a carbon deployment would create `metric`
      * with, or None when no schema rule matches (carbon refuses the
      * metric in that case).
      */
    def schemaFor(metric: String): Option[WhisperSchema] =
      schemaRuleFor(metric).map { s =>
        val agg = aggs.find(r => hits(r.pattern, metric))
        WhisperSchema(s.retentions,
          agg.flatMap(_.method).getOrElse(DefaultMethod),
          agg.flatMap(_.xFilesFactor).getOrElse(DefaultXff))
      }
  }

  def resolver(schemasText: String, aggregationText: String = ""): Resolver =
    Resolver(parseSchemas(schemasText), parseAggregation(aggregationText))

  /** First-matching-schema-rule index as a Catalyst expression: a
    * `when(rlike, i)` chain in file order, NULL when no rule matches.
    * This is the distributed form of [[Resolver.schemaRuleFor]] — rule
    * lists are small (tens), metric sets at 100 TB are millions, so the
    * regex scan belongs executor-side: the chain is whole-stage-codegen'd
    * per row, no UDF, no driver loop. (Spark `rlike` is Java regex vs
    * carbon's Python `re` — identical on the documented conf subset;
    * both are unanchored search.)
    */
  def schemaRuleIndex(rules: Seq[SchemaRule], metric: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    ruleIndex(rules.map(_.pattern), metric)

  /** The same first-match chain over any ordered pattern list (the
    * aggregation file resolves independently with its own patterns).
    */
  def ruleIndex(patterns: Seq[Regex], metric: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, when}
    patterns.zipWithIndex.foldRight(
      lit(null).cast("int")) { case ((p, i), rest) =>
      when(metric.rlike(p.regex), lit(i)).otherwise(rest)
    }
  }
}
