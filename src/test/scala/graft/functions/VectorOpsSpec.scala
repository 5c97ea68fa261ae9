package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorOpsSpec extends AnyFunSuite {

  // dedicated session: extensions only apply at session construction
  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("dot_f Column API computes the double dot product of float arrays") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val got = df.select(VectorOps.dot_f(col("a"), col("b"))).as[Double].head()
    assert(got == 32.0)
  }

  test("dot_f is registered for SQL via GraftExtensions") {
    val got = spark.sql(
      """SELECT dot_f(CAST(array(1.0, 2.0) AS array<float>),
        |             CAST(array(3.0, 4.0) AS array<float>)) AS d""".stripMargin)
      .collect().head.getDouble(0)
    assert(got == 11.0)
  }

  test("dot_f handles nulls and length mismatch (min-length semantics)") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f))),
      (None: Option[Array[Float]], Some(Array(1.0f))))
      .toDF("a", "b")
    val rows = df.select(VectorOps.dot_f(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) == 3.0) // truncates to shorter side
    assert(rows(1).isNullAt(0))         // null-intolerant
  }

  test("dot_f rejects non-float-array inputs at analysis time") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b") // double[]
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(VectorOps.dot_f(col("a"), col("b"))).collect()
    }
  }

  test("norm_f and cosine_f are registered for SQL") {
    val r = spark.sql(
      """SELECT norm_f(CAST(array(3.0, 4.0) AS array<float>)) AS n,
        |       cosine_f(CAST(array(1.0, 0.0) AS array<float>),
        |                CAST(array(1.0, 0.0) AS array<float>)) AS self,
        |       cosine_f(CAST(array(1.0, 0.0) AS array<float>),
        |                CAST(array(0.0, 1.0) AS array<float>)) AS orth""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 5.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 0.0)
  }

  test("parse_retention parses whisper's DSL to archive structs in SQL") {
    val rows = spark.sql(
      "SELECT explode(parse_retention('1s:1d,1m:30d,1h:5y')) AS r")
      .select("r.seconds_per_point", "r.number_of_points")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == Seq((1, 86400), (60, 43200), (3600, 43800)))
    // bare integer on the right is a point COUNT, not a duration
    val bare = spark.sql("SELECT parse_retention('10:14')[0] AS r").collect().head
      .getStruct(0)
    assert((bare.getInt(0), bare.getInt(1)) == ((10, 14)))
  }

  test("parse_retention raises whisper's parser error on malformed defs") {
    val ex = intercept[Exception] {
      spark.sql("SELECT parse_retention('1m')").collect()
    }
    assert(ex.getMessage.contains("precision:duration"))
  }
}
