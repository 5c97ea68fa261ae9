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
}
