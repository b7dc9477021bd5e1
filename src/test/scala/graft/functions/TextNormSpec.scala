package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextNormSpec extends AnyFunSuite {

  test("diacritic strip on Czech text (reference utils/text.py parity)") {
    assert(TextNorm.normalizeSearch("Dvořák") == "dvorak")
    assert(TextNorm.normalizeSearch("Černý") == "cerny")
    assert(TextNorm.normalizeSearch("řžůěšč") == "rzuesc")
    assert(TextNorm.normalizeSearch("no accents") == "no accents")
    assert(TextNorm.normalizeSearch(null) == null)
  }

  test("sequenceMatcherRatio matches python difflib exactly") {
    def r(a: String, b: String) = TextNorm.sequenceMatcherRatio(a, b)
    assert(r("Novák", "Novákovi") == 0.7692307692307693)
    assert(r("Dvořák", "Dvořáka") == 0.9230769230769231)
    assert(r("kalousek", "kalousková") == 0.7777777777777778)
    assert(r("abc", "xyz") == 0.0)
    assert(r("Schwarzenberg", "Svarcenberk") == 0.6666666666666666)
    assert(r("", "x") == 0.0)
    assert(r("same", "same") == 1.0)
  }

  test("ratio is symmetric-ish bounds: within [0,1]") {
    val samples = Seq("a", "ab", "ba", "hello", "world", "Dvořák", "")
    for (a <- samples; b <- samples) {
      val v = TextNorm.sequenceMatcherRatio(a, b)
      assert(v >= 0.0 && v <= 1.0)
    }
  }
}
