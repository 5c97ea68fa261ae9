package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck roundtrip for the render-target grammar: print a random
  * expression tree in graphite surface syntax, parse it back, and the
  * trees must be identical. This fuzzes exactly the ambiguities the
  * hand cases in RenderTargetSpec pin one-by-one — digit-leading
  * metrics vs numeric literals, quoted vs bare arguments, nested
  * braces/classes in globs, scientific notation — across arbitrary
  * compositions.
  */
object RenderGrammarProps extends Properties("renderGrammar") {
  import RenderTarget.{Call, Expr, Leaf}

  private val plainNode: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9'))))
  // nodes that exercise the grammar's hard edges: digit-leading,
  // dashed (reversed-IP shape), glob syntax with nesting
  private val edgeNode: Gen[String] = Gen.oneOf(
    "2xx", "10-0-0-1", "v?ew", "disk[0-9]", "{a,b}", "*", "_tmp")
  private val nodeGen: Gen[String] = Gen.frequency(3 -> plainNode, 2 -> edgeNode)
  // an ALL-numeric glob ("42", "42.5") in a non-first series slot is
  // graphite's own genuine ambiguity (it reads as a number) — the
  // generator keeps at least one letter/glob char per name, as real
  // metric names do
  private def globOf(node: Gen[String]): Gen[Expr] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, node))
      .map(ns => Leaf(ns.mkString(".")))
      .suchThat(_.glob.exists(c => c.isLetter || "*?{[_-".contains(c)))
  private val globGen: Gen[Expr] = globOf(nodeGen)
  // globs safe under whitespace injection around ','/'(' — no braces
  // (a brace glob contains commas of its own)
  private val plainGlobGen: Gen[Expr] =
    globOf(Gen.frequency(3 -> plainNode, 1 -> Gen.oneOf("2xx", "v?ew", "_tmp")))

  private val numArg: Gen[String] = Gen.oneOf(
    Gen.chooseNum(1, 99).map(_.toString),
    Gen.chooseNum(1, 99).map(n => s"$n.5"),
    Gen.oneOf("1e3", "1.5e-2", "2E4"))
  private val quotedArg: Gen[String] =
    Gen.oneOf("10min", "1h", "sum", "avg", "a name", "re.*gex")

  // (function name, series-child count, literal args as SOURCE text).
  // Literal args print as-is; quoted args print wrapped in quotes and
  // parse back UNQUOTED, so the expected tree carries the bare text.
  private case class Shape(name: String, children: Int,
      args: Gen[List[(String, String)]])
  private def lit(g: Gen[String]): Gen[(String, String)] = g.map(a => (a, a))
  private def qlit(g: Gen[String]): Gen[(String, String)] =
    g.map(a => (s"'$a'", a))

  private val shapes: Gen[Shape] = Gen.oneOf(
    Shape("absolute", 1, Gen.const(Nil)),
    Shape("derivative", 1, Gen.const(Nil)),
    Shape("integral", 1, Gen.const(Nil)),
    Shape("scale", 1, lit(numArg).map(List(_))),
    Shape("offset", 1, lit(numArg).map(List(_))),
    Shape("movingAverage", 1, lit(Gen.chooseNum(2, 30).map(_.toString)).map(List(_))),
    Shape("keepLastValue", 1, lit(Gen.chooseNum(1, 9).map(_.toString)).map(List(_))),
    Shape("alias", 1, qlit(quotedArg).map(List(_))),
    Shape("summarize", 1,
      for (i <- qlit(Gen.oneOf("10min", "1h")); f <- qlit(Gen.oneOf("sum", "avg")))
        yield List(i, f)),
    Shape("sumSeries", 2, Gen.const(Nil)),
    Shape("averageSeries", 3, Gen.const(Nil)),
    Shape("maxSeries", 1, Gen.const(Nil)),
    Shape("group", 2, Gen.const(Nil)),
    Shape("compressPeriodicGaps", 1, Gen.const(Nil)),
    Shape("aliasQuery", 1,
      for (s <- qlit(quotedArg); r <- qlit(quotedArg);
           n <- qlit(Gen.oneOf("v %d", "c=%.1f pct", "now %s")))
        yield List(s, r, n)))

  /** A random tree (depth-bounded) paired with its printed source. */
  private def treeGen(depth: Int, leaves: Gen[Expr],
      shapePool: Gen[Shape] = shapes): Gen[(Expr, String)] =
    if (depth <= 0) leaves.map(l => (l, l.asInstanceOf[Leaf].glob))
    else Gen.frequency(
      1 -> leaves.map(l => (l, l.asInstanceOf[Leaf].glob)),
      2 -> (for {
        s <- shapePool
        kids <- Gen.listOfN(s.children, treeGen(depth - 1, leaves, shapePool))
        args <- s.args
      } yield {
        val expr = Call(s.name, kids.map(_._1), args.map(_._2))
        val src = s.name + "(" +
          (kids.map(_._2) ++ args.map(_._1)).mkString(", ") + ")"
        (expr, src)
      }))

  property("print → parse roundtrips the tree") =
    forAll(treeGen(3, globGen)) { case (expr, src) =>
      RenderTarget.parse(src) == expr
    }

  property("whitespace around separators is insignificant") =
    forAll(treeGen(2, plainGlobGen)) { case (expr, src) =>
      RenderTarget.parse(src.replace(",", " , ").replace("(", "( ")) == expr
    }

  /** Hook for the evaluator-fuzz sibling below: random step-safe
    * trees (no summarize — a coarsened step under a combine would
    * demand agreement the generator can't see) over a WIDER pool that
    * includes the umbrella forms.
    */
  private[ops] def evalTreeGen: Gen[(Expr, String)] = {
    val umbrella: Gen[Shape] = Gen.oneOf(
      Shape("aggregate", 1,
        qlit(Gen.oneOf("sum", "median", "stddev", "multiply", "diff"))
          .map(List(_))),
      Shape("movingWindow", 1,
        for (n <- lit(Gen.chooseNum(2, 5).map(_.toString));
             f <- qlit(Gen.oneOf("max", "last", "count")))
          yield List(n, f)),
      Shape("aggregateLine", 1, qlit(Gen.oneOf("avg", "min")).map(List(_))),
      Shape("unique", 2, Gen.const(Nil)),
      Shape("powSeries", 2, Gen.const(Nil)),
      Shape("sortBy", 1, qlit(Gen.oneOf("average", "range")).map(List(_))),
      Shape("removeEmptySeries", 1, Gen.const(Nil)),
      Shape("interpolate", 1, Gen.const(Nil)),
      Shape("isNonNull", 1, Gen.const(Nil)),
      Shape("linearRegression", 1, Gen.const(Nil)),
      Shape("logit", 1, Gen.const(Nil)),
      Shape("asPercent", 1, Gen.const(Nil)),
      Shape("diffSeries", 2, Gen.const(Nil)),
      Shape("multiplySeries", 2, Gen.const(Nil)),
      Shape("percentileOfSeries", 1,
        lit(Gen.chooseNum(5, 95).map(_.toString)).map(List(_))),
      Shape("nPercentile", 1,
        lit(Gen.chooseNum(5, 95).map(_.toString)).map(List(_))),
      Shape("filterSeries", 1,
        for (f <- qlit(Gen.oneOf("max", "sum", "median", "stddev"));
             o <- qlit(Gen.oneOf(">", "<=", "!="));
             t <- lit(Gen.chooseNum(0, 5).map(_.toString)))
          yield List(f, o, t)),
      Shape("highest", 1,
        for (n <- lit(Gen.chooseNum(1, 3).map(_.toString));
             f <- qlit(Gen.oneOf("sum", "stddev", "last")))
          yield List(n, f)),
      Shape("offsetToZero", 1, Gen.const(Nil)),
      Shape("transformNull", 1,
        lit(Gen.chooseNum(0, 9).map(_.toString)).map(List(_))),
      Shape("changed", 1, Gen.const(Nil)),
      Shape("exclude", 1, qlit(Gen.oneOf("zz", "xx")).map(List(_))))
    val evalShapes =
      Gen.frequency(2 -> shapes.suchThat(_.name != "summarize"),
        1 -> umbrella)
    val evalLeaves: Gen[Expr] =
      Gen.oneOf(Leaf("m.*"), Leaf("m.a"), Leaf("m2xx.*"), Leaf("zz.none"))
    treeGen(3, evalLeaves, evalShapes)
  }
}

/** Evaluator fuzz — every random composition the grammar accepts must
  * EVALUATE: canonical (metric, bucket_ts, value) columns, every
  * bucket on the requested grid (history extensions trimmed). Fewer
  * samples than the parse-only fuzz: each check runs a Spark job.
  */
object RenderEvalProps extends Properties("renderEval") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(40)

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val fixture = {
    import spark.implicits._
    (for (m <- Seq("m.a", "m.b", "m2xx.c"); i <- 0 to 4 if (i + m.length) % 4 != 0)
      yield (m, i * 60L + 5, i * 1.5 - 2)).toDF("metric", "ts_s", "value")
  }

  property("random targets evaluate to the canonical frame on the grid") =
    forAll(RenderGrammarProps.evalTreeGen) { case (_, src) =>
      val df = RenderTarget.evaluate(spark, fixture, src, 0L, 240L, 60)
      df.columns.toSeq == Seq("metric", "bucket_ts", "value") && {
        val ts = df.collect().map(_.getLong(1))
        ts.forall(t => t >= 60L && t <= 240L)
      }
    }
}
