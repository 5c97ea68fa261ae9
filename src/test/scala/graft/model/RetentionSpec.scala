package graft.model

import org.scalatest.funsuite.AnyFunSuite

class RetentionSpec extends AnyFunSuite {
  import Retentions._

  test("parseRetentionDef: bare point count on the right") {
    assert(parseRetentionDef("1s:120") == Retention(1, 120))
    assert(parseRetentionDef("60:1440") == Retention(60, 1440))
  }

  test("parseRetentionDef: unit suffixes on both sides") {
    assert(parseRetentionDef("1m:1d") == Retention(60, 1440))
    assert(parseRetentionDef("5m:7d") == Retention(300, 2016))
    assert(parseRetentionDef("1h:30d") == Retention(3600, 720))
    assert(parseRetentionDef("1h:5y") == Retention(3600, 43800))
    assert(parseRetentionDef("15s:10m") == Retention(15, 40))
    assert(parseRetentionDef("1w:52w") == Retention(604800, 52))
  }

  test("parseRetentionDef: case-insensitive units, whitespace tolerated") {
    assert(parseRetentionDef("1M:1D") == Retention(60, 1440))
    assert(parseRetentionDef(" 1m : 1d ") == Retention(60, 1440))
  }

  test("parseRetentionDef: invalid inputs rejected") {
    for (bad <- Seq("", "1m", "1m:1d:1h", "0s:100", "1s:0", "x:1d",
                    "1s:-5", "-1s:5", "1q:1d", "1s:1q", "7s:1m"))
      assertThrows[IllegalArgumentException](parseRetentionDef(bad))
  }

  test("parseRetentionDefs: comma list") {
    assert(parseRetentionDefs("1s:1d,1m:30d") ==
      Seq(Retention(1, 86400), Retention(60, 43200)))
  }

  test("render is parse's inverse (schema-derived options cannot drift)") {
    for (defs <- Seq("1s:1d,1m:30d", "10s:6,60s:5", "1m:1d")) {
      val rets = parseRetentionDefs(defs)
      assert(parseRetentionDefs(Retentions.render(rets)) == rets, defs)
    }
  }

  test("validate rule 1: empty list rejected") {
    assertThrows[IllegalArgumentException](validate(Seq.empty))
  }

  test("validate rule 2: duplicate resolution rejected") {
    assertThrows[IllegalArgumentException](
      validate(Seq(Retention(60, 100), Retention(60, 200))))
  }

  test("validate rule 3: ordering and divisibility") {
    assertThrows[IllegalArgumentException]( // coarser first
      validate(Seq(Retention(300, 100), Retention(60, 1000))))
    assertThrows[IllegalArgumentException]( // 90 not a multiple of 60
      validate(Seq(Retention(60, 100), Retention(90, 100))))
  }

  test("validate rule 4: coarser must cover a longer span") {
    // 60*600=36000 vs 300*100=30000 → coarser covers less → invalid
    assertThrows[IllegalArgumentException](
      validate(Seq(Retention(60, 600), Retention(300, 100))))
    // equal spans also invalid (strictly increasing)
    assertThrows[IllegalArgumentException](
      validate(Seq(Retention(60, 500), Retention(300, 100))))
  }

  test("validate rule 5: finer must hold one full consolidation window") {
    // window = 300/60 = 5 > 4 points held → invalid (span ok: 240 < 30000)
    assertThrows[IllegalArgumentException](
      validate(Seq(Retention(60, 4), Retention(300, 100))))
  }

  test("validate accepts the canonical fixtures") {
    assert(std.retentions == Seq(Retention(60, 1440), Retention(300, 2016),
      Retention(3600, 720)))
    assert(tight.retentions.nonEmpty && gate.retentions.nonEmpty &&
      lww.retentions.nonEmpty)
    assert(validate(Seq(Retention(60, 100))) == Seq(Retention(60, 100)))
  }

  test("align floors to archive resolution") {
    val r = Retention(60, 1440)
    assert(r.align(125) == 120)
    assert(r.align(120) == 120)
    assert(r.align(119) == 60)
    assert(Retention(1, 10).align(7) == 7)
  }

  test("maxRetentionSeconds") {
    assert(Retention(3600, 720).maxRetentionSeconds == 2592000L)
    assert(std.maxRetentionSeconds == 2592000L)
  }

  test("archiveFor selects finest covering archive (U3)") {
    // std: 1m:1d (86400s), 5m:7d (604800s), 1h:30d (2592000s)
    assert(std.archiveFor(0) == Some(0))
    assert(std.archiveFor(86399) == Some(0))
    assert(std.archiveFor(86400) == Some(1)) // whisper: retention must EXCEED age
    assert(std.archiveFor(604800) == Some(2))
    assert(std.archiveFor(2592000) == None) // older than every archive (F3)
    assert(std.archiveFor(-1) == None)      // future timestamp rejected
  }

  test("aggregation method enum round-trips") {
    for (m <- AggregationMethod.all) {
      assert(AggregationMethod.fromId(m.id) == m)
      assert(AggregationMethod.fromName(m.name) == m)
    }
    assertThrows[IllegalArgumentException](AggregationMethod.fromId(0))
    assertThrows[IllegalArgumentException](AggregationMethod.fromName("p99"))
  }

  test("WhisperSchema rejects invalid xFilesFactor") {
    assertThrows[IllegalArgumentException](
      WhisperSchema(Seq(Retention(60, 10)), AggregationMethod.Sum, 1.5))
  }
}
