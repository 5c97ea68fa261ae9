package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** carbon storage-schemas/-aggregation resolution (StorageConf scaladoc;
  * format per graphite-project/carbon's documented examples).
  */
class StorageConfSpec extends AnyFunSuite {

  private val schemas =
    """# carbon's own metrics first — order matters
      |[carbon]
      |pattern = ^carbon\.
      |retentions = 60:90d
      |
      |; high-frequency app metrics
      |[apps]
      |pattern = ^app\.
      |retentions = 10s:6h,1m:7d,10m:5y
      |
      |[default]
      |pattern = .*
      |retentions = 1m:1d
      |""".stripMargin

  private val aggregation =
    """[min]
      |pattern = \.min$
      |xFilesFactor = 0.1
      |aggregationMethod = min
      |
      |[counts]
      |pattern = \.count$
      |aggregationMethod = sum
      |
      |[gauge_zero]
      |pattern = \.gauge$
      |xFilesFactor = 0
      |aggregationMethod = avg_zero
      |""".stripMargin

  private val r = StorageConf.resolver(schemas, aggregation)

  test("first matching schema section wins, in file order") {
    assert(r.schemaRuleFor("carbon.agents.cpu").get.name == "carbon")
    assert(r.schemaRuleFor("app.web.latency.min").get.name == "apps")
    assert(r.schemaRuleFor("misc.anything").get.name == "default")
  }

  test("retention DSL parses with duration and point-count forms") {
    val apps = r.schemaRuleFor("app.x").get.retentions
    assert(apps == Seq(Retention(10, 2160), Retention(60, 10080),
      Retention(600, 262800)))
    // bare `60:90d` — precision without unit suffix is seconds
    assert(r.schemaRuleFor("carbon.x").get.retentions ==
      Seq(Retention(60, 129600)))
  }

  test("aggregation file resolves independently; carbon defaults fill gaps") {
    // both files match → full header from the two rules
    val m = r.schemaFor("app.web.latency.min").get
    assert(m.method == AggregationMethod.Min && m.xFilesFactor == 0.1)
    // aggregation section without xFilesFactor → default 0.5 with its method
    val c = r.schemaFor("app.req.count").get
    assert(c.method == AggregationMethod.Sum && c.xFilesFactor == 0.5)
    // graphite-only method names resolve (avg_zero = on-disk id 6)
    val g = r.schemaFor("misc.temp.gauge").get
    assert(g.method == AggregationMethod.AvgZero && g.xFilesFactor == 0.0)
    // no aggregation match at all → average / 0.5
    val d = r.schemaFor("misc.anything").get
    assert(d.method == AggregationMethod.Average && d.xFilesFactor == 0.5)
  }

  test("patterns use re.search semantics — unanchored matches anywhere") {
    val conf = StorageConf.resolver(
      "[mid]\npattern = latency\nretentions = 1m:1h")
    assert(conf.schemaFor("app.latency.p99").isDefined)
    assert(conf.schemaFor("app.errors").isEmpty) // carbon refuses: no rule
  }

  test("malformed confs are refused loudly") {
    intercept[IllegalArgumentException](
      StorageConf.parseSchemas("[a]\nretentions = 1m:1d")) // no pattern
    intercept[IllegalArgumentException](
      StorageConf.parseSchemas("[a]\npattern = .*")) // no retentions
    intercept[IllegalArgumentException](
      StorageConf.parseSchemas("pattern = .*")) // entry before any section
    intercept[IllegalArgumentException](
      StorageConf.parseSchemas("[a]\npattern = .*\njunk line")) // not k = v
    intercept[IllegalArgumentException]( // whisper rule: undivisible levels
      StorageConf.parseSchemas("[a]\npattern = .*\nretentions = 7s:1h,10s:1d"))
    intercept[IllegalArgumentException](
      StorageConf.parseAggregation("[a]\npattern = .*\nxFilesFactor = 1.5"))
  }

  test("schemaRuleIndex (distributed when/rlike chain) agrees with the driver rule") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val metrics = Seq("carbon.agents.cpu", "app.web.latency.min",
      "app.req.count", "misc.anything", "carbon.app.mix")
    val got = metrics.toDF("metric")
      .withColumn("rule",
        StorageConf.schemaRuleIndex(r.schemas, org.apache.spark.sql.functions.col("metric")))
      .collect().map(row => row.getString(0) ->
        (if (row.isNullAt(1)) None else Some(row.getInt(1)))).toMap
    metrics.foreach { m =>
      val want = r.schemaRuleFor(m).map(rule => r.schemas.indexWhere(_.name == rule.name))
      assert(got(m) == want, s"metric $m: distributed=${got(m)} driver=$want")
    }
    // and no rule at all → NULL, mirroring the driver's None
    val none = Seq("zzz").toDF("metric")
      .withColumn("rule", StorageConf.schemaRuleIndex(
        StorageConf.parseSchemas("[a]\npattern = ^q\nretentions = 1m:1h"),
        org.apache.spark.sql.functions.col("metric")))
      .collect().head
    assert(none.isNullAt(1))
  }

  test("whisper validation applies to every parsed retention list") {
    // rule 5: a finer archive must hold at least one full consolidation
    // window of the next level — 10s:30s cannot feed 60s buckets
    intercept[IllegalArgumentException](
      StorageConf.parseSchemas("[a]\npattern = .*\nretentions = 10s:30s,60s:1h"))
  }
}
