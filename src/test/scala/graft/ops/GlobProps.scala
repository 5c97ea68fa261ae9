package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the graphite-glob → regex translation
  * ([[Fetch.globToRegex]]) — the table of hand cases lives in
  * CoreOpsSpec; these fuzz the two load-bearing invariants over random
  * metric names, including names full of regex metacharacters.
  */
object GlobProps extends Properties("globToRegex") {

  private val segGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9'))))
  private val nameGen: Gen[String] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, segGen)).map(_.mkString("."))
  // names whose characters are regex metachars — the translator must
  // treat a glob with no glob-syntax as a LITERAL
  private val hostileGen: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf("ab(+)^$|\\".toSeq)))

  property("a glob with no glob-syntax matches exactly itself") =
    forAll(nameGen, nameGen) { (a, b) =>
      val rx = Fetch.globToRegex(a)
      a.matches(rx) && (b.matches(rx) == (a == b))
    }

  property("regex metachars in a glob are literal, never operators") =
    forAll(hostileGen, hostileGen) { (a, b) =>
      val rx = Fetch.globToRegex(a)
      a.matches(rx) && (b.matches(rx) == (a == b))
    }

  property("parent.* matches exactly the one-level children") =
    forAll(segGen, segGen, segGen) { (p, c1, c2) =>
      val rx = Fetch.globToRegex(s"$p.*")
      s"$p.$c1".matches(rx) &&
        !s"$p.$c1.$c2".matches(rx) && // star never crosses a dot
        (s"$c1.$c2".matches(rx) == (c1 == p))
    }

  property("a star glob accepts every name a braces-of-children glob accepts") =
    forAll(segGen, Gen.nonEmptyListOf(segGen)) { (p, kids) =>
      val star = Fetch.globToRegex(s"$p.*")
      val brace = Fetch.globToRegex(s"$p.{${kids.mkString(",")}}")
      kids.forall(k => s"$p.$k".matches(brace) && s"$p.$k".matches(star))
    }
}
