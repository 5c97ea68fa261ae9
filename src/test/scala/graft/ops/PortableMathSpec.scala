package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[PortableMath]]'s fixed-op-sequence ln must be (a) faithful to real
  * ln well inside the 1e-6 output grid and (b) made only of portable
  * ops — its whole point is bit-identical Spark/DuckDB evaluation, so
  * here we pin the Spark half against `Math.log` and the structural
  * invariants; the DuckDB half is textually the same string
  * (tools/check_oracle.py exercises it end-to-end via `dsir_model`).
  */
class PortableMathSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def lnPortable(qs: Seq[Double]): Seq[(Double, Double)] = {
    val s = spark
    import s.implicits._
    qs.toDF("q")
      .withColumn("sgn", expr(PortableMath.sgnSql("q")))
      .withColumn("x0", expr(PortableMath.x0Sql("q")))
      .withColumn("e0", expr(PortableMath.e0Sql("x0")))
      .withColumn("m0", expr(PortableMath.m0Sql("x0")))
      .withColumn("e1", expr(PortableMath.e1Sql("e0", "m0")))
      .withColumn("m1", expr(PortableMath.m1Sql("m0")))
      .withColumn("z", expr(PortableMath.zSql("m1")))
      .select(col("q"),
        expr(PortableMath.lnFromPartsSql("sgn", "e1", "z")).as("lnq"))
      .collect().toSeq.map(r => (r.getDouble(0), r.getDouble(1)))
  }

  test("portable ln matches Math.log to 1e-11 relative over 12 decades") {
    val qs = (for {
      exp <- -6 to 6
      m <- Seq(1.0, 1.17, 1.4999999, 1.5, 1.9999, 2.0, 3.14159)
    } yield m * math.pow(10.0, exp)) ++
      Seq(1.0, 0.9999999999, 1.0000000001, 2.0, 0.5, 0.75, 1.5,
        math.E, 1.0 / math.E)
    lnPortable(qs).foreach { case (q, got) =>
      val want = math.log(q)
      val tol = math.max(1e-13, math.abs(want) * 1e-11)
      assert(math.abs(got - want) <= tol,
        s"ln($q): portable=$got libm=$want")
    }
  }

  test("pow2Literal is the exact decimal expansion of 2^k") {
    for (k <- Seq(-64, -13, -1, 0, 1, 13, 64)) {
      val lit = PortableMath.pow2Literal(k)
      // exactness via multiplication (BigDecimal division would round):
      // lit · 2^max(0,−k) must equal 2^max(0,k) exactly
      assert(BigDecimal(lit) * BigDecimal(BigInt(2).pow((-k).max(0))) ==
        BigDecimal(BigInt(2).pow(k.max(0))), s"k=$k -> $lit")
      // and the nearest double IS 2^k (powers of two are representable)
      assert(lit.toDouble == math.pow(2.0, k), s"k=$k parses inexactly")
    }
  }

  test("ln(1) is exactly zero and sign is symmetric") {
    val r = lnPortable(Seq(1.0)).head._2
    assert(r == 0.0)
    val Seq((_, a), (_, b)) = lnPortable(Seq(4.0, 0.25))
    // ln(1/q) goes through the same x0 ladder with the sign flipped, so
    // the two results are EXACT negations (q=0.25 inverts to exactly 4)
    assert(a == -b)
  }

  test("the shared step texts contain no libm function") {
    val texts = Seq(
      PortableMath.sgnSql("q"), PortableMath.x0Sql("q"),
      PortableMath.e0Sql("x0"), PortableMath.m0Sql("x0"),
      PortableMath.e1Sql("e0", "m0"), PortableMath.m1Sql("m0"),
      PortableMath.zSql("m1"), PortableMath.lnFromPartsSql("sgn", "e1", "z"))
    val banned = Seq("ln(", "log(", "log2(", "log10(", "exp(", "pow(",
      "power(", "sqrt(")
    for (t <- texts; b <- banned)
      assert(!t.toLowerCase.contains(b), s"$b in $t")
  }
}
