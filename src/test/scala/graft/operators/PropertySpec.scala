package graft.operators

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextNorm

/** ScalaCheck property tests (SURVEY §5: our addition on top of the
  * reference's example-based suite). Pure-JVM kernels are property-tested
  * directly; DataFrame invariants are asserted in SparkSpec suites.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = test(name) {
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  private val czechish: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    3 -> Gen.oneOf("áčďéěíňóřšťúůýž ".toSeq),
    1 -> Gen.oneOf("ÁČĎÉĚÍŇÓŘŠŤÚŮÝŽ".toSeq))).map(_.mkString)

  check("stripDiacritics output is ASCII-letter-stable and idempotent",
    forAll(czechish) { s =>
      val once = TextNorm.stripDiacritics(s)
      TextNorm.stripDiacritics(once) == once
    })

  check("normalizeSearch is case/diacritic canonical",
    forAll(czechish) { s =>
      TextNorm.normalizeSearch(s) ==
        TextNorm.normalizeSearch(TextNorm.stripDiacritics(s).toUpperCase(java.util.Locale.ROOT))
    })

  check("sequenceMatcherRatio within [0,1] and 1.0 on self",
    forAll(czechish, czechish) { (a, b) =>
      val r = TextNorm.sequenceMatcherRatio(a, b)
      r >= 0.0 && r <= 1.0 && TextNorm.sequenceMatcherRatio(a, a) == (if (a.isEmpty) 1.0 else 1.0)
    })

  check("ratio of disjoint alphabets is 0",
    forAll(Gen.nonEmptyListOf(Gen.oneOf("abc".toSeq)).map(_.mkString),
      Gen.nonEmptyListOf(Gen.oneOf("xyz".toSeq)).map(_.mkString)) { (a, b) =>
      TextNorm.sequenceMatcherRatio(a, b) == 0.0
    })
}
