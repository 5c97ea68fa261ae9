package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Carbon]] — the plaintext line protocol's tolerances: `-1`
  * timestamps resolve to the pinned receive time, malformed lines drop
  * (and are countable), and parse ∘ format is the identity.
  */
class CarbonSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def lines(ls: String*) = {
    import spark.implicits._
    ls.toDF("value")
  }

  test("well-formed lines parse; -1 means receive time") {
    val df = Carbon.parse(lines(
      "servers.web1.cpu 0.45 1706659200",
      "  servers.web1.cpu   1.5e-3   1706659260  ", // extra whitespace
      "\tservers.web1.cpu\t0.5\t1706659320\r",      // tabs + CRLF tail
      "servers.web2.load 7 -1"), nowS = 999L)
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      ("servers.web1.cpu", 1706659200L, 0.45),
      ("servers.web1.cpu", 1706659260L, 0.0015),
      ("servers.web1.cpu", 1706659320L, 0.5),
      ("servers.web2.load", 999L, 7.0)))
  }

  test("malformed lines drop and are counted in a single observed pass") {
    val (pts, obs) = Carbon.parsedObserved(lines(
      "a.b 1.0 1706659200",
      "only.two.fields 42",            // missing ts
      "a.b not_a_number 1706659200",   // bad value
      "a.b 2.0 tomorrow",              // bad ts
      "   ",                           // blank — not counted as a line
      "a.b 3.0 1706659260 extra"),     // four fields
      nowS = 0L)
    // the caller's own action populates the metrics — no extra scan
    assert(pts.count() == 1)
    assert(obs.get("dropped") == 4L)
    assert(obs.get("accepted") == 1L)
    // the observed frame parses identically to the plain parse path
    assert(pts.columns.toSeq == Seq("metric", "ts_s", "value"))
    // a zero-row input must observe 0, not NULL (sum over an empty
    // frame is NULL; count(when) is not) — empty micro-batches are
    // routine in the streaming ingest this API serves (review r10)
    val (nonePts, noneObs) = Carbon.parsedObserved(lines(), nowS = 0L)
    assert(nonePts.count() == 0)
    assert(noneObs.get("dropped") == 0L)
    assert(noneObs.get("accepted") == 0L)
  }

  test("format fails loudly on null fields instead of leaking 2-token lines") {
    import spark.implicits._
    val withNull = Seq(("m.a", Some(100L), Some(1.0)), ("m.b", Some(200L), None))
      .toDF("metric", "ts_s", "value")
    val e = intercept[Exception](Carbon.format(withNull).collect())
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("null metric/ts_s/value"), chain)
  }

  test("parseArrival stamps -1 with the processing clock, not a pinned now") {
    val before = System.currentTimeMillis() / 1000
    val got = Carbon.parseArrival(lines("m.a 7 -1", "m.b 8 12345"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val after = System.currentTimeMillis() / 1000
    assert(got("m.b") == 12345L)
    assert(got("m.a") >= before && got("m.a") <= after + 1,
      s"arrival stamp ${got("m.a")} outside [$before, $after]")
  }

  test("parse ∘ format is the identity, including hostile doubles") {
    import spark.implicits._
    val pts = Seq(
      ("m.a", 100L, 0.1 + 0.2),            // classic non-exact decimal
      ("m.b", 200L, 1.0e-300),             // scientific round-trip
      ("m.c", 300L, -12345.678901234567))
      .toDF("metric", "ts_s", "value")
    val back = Carbon.parse(Carbon.format(pts), nowS = 0L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(back == Set(("m.a", 100L, 0.1 + 0.2), ("m.b", 200L, 1.0e-300),
      ("m.c", 300L, -12345.678901234567)))
  }

  test("carbon daemon loop: protocol lines stream into a live wsp tree") {
    // the ecosystem's actual deployment shape, end to end: line
    // protocol in, .wsp files out — readStream → parse → wspWriter
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val nowS = 1000000L
    val schema = graft.model.Retentions.tight
    val dir = java.nio.file.Files.createTempDirectory("carbon_wsp").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val points = Carbon.parse(mem.toDF(), nowS)
    val writer = graft.streaming.StreamIngest
      .wspWriter(points, dir, schema, nowS)
    mem.addData(s"servers.web1.cpu 0.5 ${nowS - 10}",
      "servers.web1.cpu 0.75 -1", "garbage line")
    writer.start().awaitTermination()
    val back = spark.read.format("wsp").load(dir)
      .select("metric", "ts_s", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(back == Set(("servers.web1.cpu", nowS - 10, 0.5),
      ("servers.web1.cpu", nowS, 0.75)))
  }

  test("parse is streaming-compatible (pure projection)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val q = Carbon.parse(mem.toDF(), nowS = 7L)
      .writeStream.format("memory").queryName("carbon_out")
      .outputMode("append").start()
    mem.addData("x.y 5 -1", "junk")
    q.processAllAvailable()
    val rows = spark.table("carbon_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    q.stop()
    assert(rows == Seq(("x.y", 7L, 5.0)))
  }
}
