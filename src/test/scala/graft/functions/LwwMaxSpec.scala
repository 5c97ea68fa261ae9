package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the hash-aggregable LWW argmax. */
class LwwMaxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("winner is the lexicographic (ts, value) max; ties break on value") {
    import spark.implicits._
    val df = Seq(
      ("m", 10L, 1.0), ("m", 20L, 2.0), ("m", 20L, 5.0), ("m", 15L, 9.0),
      ("n", 7L, -1.0))
      .toDF("metric", "ts_s", "value")
    val got = df.groupBy($"metric")
      .agg(LwwMax.lwwMax($"ts_s", $"value").as("w"))
      .select($"metric", $"w.ts_s", $"w.value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("m", 20L, 5.0), ("n", 7L, -1.0)))
  }

  test("narrower input types coerce instead of failing analysis (r13 review)") {
    // max_by accepted any orderable pair; lww_max must not regress the
    // entry points' accepted types — ExpectsInputTypes upcasts INT ts /
    // FLOAT value
    import spark.implicits._
    val df = Seq(("m", 10, 1.0f), ("m", 20, 2.0f))
      .toDF("metric", "ts_s", "value")
    val got = graft.ops.Ingest.lwwAlign(df, 60)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("m", 0L, 2.0)))
  }

  test("null-valued rows never displace a real winner (documented contract)") {
    import spark.implicits._
    val df = Seq(("m", Some(5L), Some(1.0)), ("m", Some(10L), None),
        ("o", Option.empty[Long], Option.empty[Double]))
      .toDF("metric", "ts_s", "value")
    val got = df.groupBy($"metric")
      .agg(LwwMax.lwwMax($"ts_s", $"value").as("w"))
      .select($"metric", $"w.value")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // the (10, null) row is IGNORED — deliberately unlike max_by, whose
    // non-null struct key would let it win and emit null
    assert(got("m") == Some(1.0))
    // an all-null group evaluates to null
    assert(got("o") == None)
  }
}
