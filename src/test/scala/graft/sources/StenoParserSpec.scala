package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import StenoParser._

/** Mirrors the reference's `tests/unit/services/test_steno_parser.py` —
  * same fixture HTML snippets, same expected letters/stances/flags, so
  * the port is assertion-for-assertion comparable.
  */
class StenoParserSpec extends AnyFunSuite {

  private val StenoSimple = """
<html><body>
<p>Předsedající řekl: Nyní přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Nejprve budeme hlasovat o pozměňovacím návrhu označeném písmenem A.
Stanovisko výboru je doporučující. Předkladatel? (Souhlas.)</p>
<p>Hlasování číslo 42. Kdo je pro? Kdo je proti?
Přijato. Pro 120, proti 30.</p>
<p>Dále pozměňovací návrh pod označením B1.
Stanovisko výboru je nedoporučující. Předkladatel? (Nesouhlas.)</p>
<p>Hlasování číslo 43. Kdo je pro? Kdo je proti?
Zamítnuto. Pro 50, proti 100.</p>
<p>Nyní budeme hlasovat o návrhu zákona jako celku.</p>
<p>Hlasování číslo 44. Kdo je pro? Kdo je proti?
Přijato. Pro 130, proti 20.</p>
</body></html>
"""

  private val StenoChallenge = """
<html><body>
<p>Nyní přikročíme k hlasování o pozměňovacích návrzích k tomuto tisku.</p>
<p>Pozměňovací návrh písmenem C. Stanovisko výboru je doporučující.</p>
<p>Hlasování číslo 50. Přijato.</p>
<p>Poslanec Novák: zpochybňuji hlasování.</p>
<p>Hlasování číslo 51. Zamítnuto.</p>
</body></html>
"""

  private val StenoWithdrawal = """
<html><body>
<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Pozměňovací návrh označeným písmenem D.</p>
<p>Poslankyně Nová stahuji pozměňovací návrh.</p>
<p>Pozměňovací návrh pod označením E.</p>
<p>Hlasování číslo 60. Přijato.</p>
</body></html>
"""

  private val StenoGrouped = """
<html><body>
<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Budeme hlasovat o pozměňovacím návrhu označeným písmenem E1 a F2.
Stanovisko výboru je bez stanoviska.</p>
<p>Hlasování číslo 70. Návrh byl přijat.</p>
</body></html>
"""

  private val StenoLegTech = """
<html><body>
<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Nejprve budeme hlasovat o legislativně-technických úpravách podle §&nbsp;95.</p>
<p>Hlasování číslo 80. Přijato.</p>
</body></html>
"""

  private val StenoNoSection = """
<html><body>
<p>Toto je pouze diskuse bez hlasování.</p>
<p>Pan poslanec Novák hovořil o novele zákona.</p>
</body></html>
"""

  // ── text plumbing ──────────────────────────────────────────────────────

  test("cleanHtml strips tags, decodes entities, normalizes whitespace") {
    assert(cleanHtml("<p>Hello <b>world</b></p>") == "Hello world")
    val decoded = cleanHtml("A&amp;B &lt;C&gt; &quot;D&quot;")
    assert(decoded.contains("A&B") && decoded.contains("<C>"))
    assert(cleanHtml("  foo   bar  \n  baz  ") == "foo bar baz")
    assert(cleanHtml("§&nbsp;95").contains("§ 95"))
    assert(cleanHtml("§ 95").contains("§ 95"))
  }

  test("extractSection finds the amendment section; absent section is empty") {
    val section = extractSection(cleanHtml(StenoSimple))
    assert(section.nonEmpty)
    assert(section.toLowerCase.contains("pozměňovac"))
    assert(extractSection(cleanHtml(StenoNoSection)) == "")
  }

  test("normalizeResult maps Czech result phrases") {
    assert(normalizeResult("Přijato") == "accepted")
    assert(normalizeResult("Návrh byl přijat") == "accepted")
    assert(normalizeResult("Zamítnuto") == "rejected")
    assert(normalizeResult("Něco jiného") == "unknown")
  }

  test("parseLetterGroups splits grouped letters") {
    assert(parseLetterGroups("A") == ("A", Nil))
    assert(parseLetterGroups("E1 a F2") == ("E1", Seq("F2")))
    assert(parseLetterGroups("A, B") == ("A", Seq("B")))
  }

  test("splitIntoBlocks splits after each vote result") {
    val blocks = splitIntoBlocks(
      "Návrh A. Hlasování číslo 1. Přijato. Návrh B. Hlasování číslo 2. Zamítnuto.")
    assert(blocks.length >= 2)
    assert(splitIntoBlocks("Hlasování číslo 5. Přijato.").nonEmpty)
  }

  // ── block classification ───────────────────────────────────────────────

  test("parseBlock extracts letter, stances, vote number/result, flags") {
    assert(parseBlock(
      "pozměňovacím návrhu označeným písmenem A Hlasování číslo 10. Přijato.")
      .letter == "A")
    assert(parseBlock(
      "Stanovisko výboru je doporučující. Hlasování číslo 10. Přijato.")
      .committeeStance.contains("doporucujici"))
    assert(parseBlock(
      "Předkladatel? (Souhlas.) Hlasování číslo 10. Přijato.")
      .proposerStance.contains("souhlas"))
    val vb = parseBlock("Hlasování číslo 42. Přijato.")
    assert(vb.voteNumber.contains(42) && vb.result == "accepted")
    assert(parseBlock("Hlasování číslo 43. Zamítnuto.").result == "rejected")
    assert(parseBlock(
      "návrhu zákona jako celku Hlasování číslo 44. Přijato.").isFinal)
    assert(parseBlock(
      "zpochybňuji hlasování Hlasování číslo 51. Zamítnuto.").isChallenge)
    assert(parseBlock("stahuji pozměňovací návrh.").isWithdrawal)
    assert(parseBlock(
      "legislativně-technických úprav § 95 Hlasování číslo 80. Přijato.").isLegTech)
  }

  // ── full parse ─────────────────────────────────────────────────────────

  test("simple steno: two amendments + final vote, stances and results") {
    val ParseResult(amendments, confidence, _) = parseStenoAmendments(StenoSimple)
    val letters = amendments.map(_.letter)
    assert(letters.contains("A") && letters.contains("B1"))
    assert(amendments.exists(_.isFinalVote))
    assert(confidence >= 0.5)
    val a = amendments.find(a => a.letter == "A" && !a.isFinalVote).get
    assert(a.result == "accepted" && a.voteNumber == 42)
    assert(a.committeeStance.contains("doporucujici"))
    assert(a.proposerStance.contains("souhlas"))
    assert(a.submitterNames.isEmpty)
    val b1 = amendments.find(_.letter == "B1").get
    assert(b1.result == "rejected")
  }

  test("challenge creates a revote inheriting the challenged letter") {
    val ParseResult(amendments, _, _) = parseStenoAmendments(StenoChallenge)
    val revotes = amendments.filter(_.isRevote)
    assert(revotes.nonEmpty)
    assert(revotes.head.voteNumber == 51)
    assert(revotes.head.letter == "C")
    assert(revotes.head.originalVoteNumber.contains(50))
  }

  test("withdrawal is recorded with its letter") {
    val ParseResult(amendments, _, _) = parseStenoAmendments(StenoWithdrawal)
    val withdrawn = amendments.filter(_.isWithdrawn)
    assert(withdrawn.nonEmpty)
    assert(withdrawn.head.letter == "D")
  }

  test("grouped letters: E1 primary with F2 grouped") {
    val ParseResult(amendments, _, _) = parseStenoAmendments(StenoGrouped)
    val e1 = amendments.filter(_.letter == "E1")
    assert(e1.nonEmpty)
    assert(e1.head.groupedWith.contains("F2"))
  }

  test("leg-tech §95 block detected (nbsp-entity form)") {
    val ParseResult(amendments, _, _) = parseStenoAmendments(StenoLegTech)
    assert(amendments.exists(_.isLegTech))
  }

  test("no amendment section → empty result, reduced confidence, warning") {
    val ParseResult(amendments, confidence, warns) =
      parseStenoAmendments(StenoNoSection)
    assert(amendments.isEmpty && confidence < 1.0 && warns.nonEmpty)
    val ParseResult(none, conf2, _) = parseStenoAmendments("")
    assert(none.isEmpty && conf2 < 1.0)
  }

  // ── submitter patterns ─────────────────────────────────────────────────

  test("submitter pattern A: letter + genitive name") {
    val html = """<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Pozměňovací návrh písmenem A pana poslance Bartoše.
Stanovisko výboru je doporučující. Předkladatel? (Souhlas.)</p>
<p>Hlasování číslo 90. Přijato.</p>"""
    val ParseResult(amendments, _, _) = parseStenoAmendments(html)
    assert(amendments.find(_.letter == "A").get.submitterNames == Seq("Bartoše"))
  }

  test("submitter pattern B: 'předloženy paní poslankyní Richterovou'") {
    val html = """<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Pozměňovací návrh označeným písmenem B předloženy paní poslankyní Richterovou.
Stanovisko výboru je nedoporučující.</p>
<p>Hlasování číslo 91. Zamítnuto.</p>"""
    val ParseResult(amendments, _, _) = parseStenoAmendments(html)
    assert(amendments.find(_.letter == "B").get.submitterNames == Seq("Richterovou"))
  }

  test("submitter pattern A with academic title") {
    val html = """<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Pozměňovací návrh písmenem C pana poslance Mgr. Nováka.
Stanovisko výboru je doporučující.</p>
<p>Hlasování číslo 92. Přijato.</p>"""
    val ParseResult(amendments, _, _) = parseStenoAmendments(html)
    assert(amendments.find(_.letter == "C").get.submitterNames.head.contains("Nováka"))
  }

  test("submitter pattern C: 'návrhu pana kolegy poslance Šafránkové'") {
    val html = """<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Budeme hlasovat o návrhu pana kolegy poslance Šafránkové
označeným písmenem D.</p>
<p>Hlasování číslo 13. Zamítnuto.</p>"""
    val ParseResult(amendments, _, _) = parseStenoAmendments(html)
    assert(amendments.find(_.letter == "D").get.submitterNames.head.contains("Šafránkové"))
  }

  test("submitter first+last name: 'poslance Jana Kuchaře'") {
    val html = """<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Budeme hlasovat o pozměňovacím návrhu pana poslance Jana Kuchaře
označeným písmenem E.</p>
<p>Hlasování číslo 14. Přijato.</p>"""
    val ParseResult(amendments, _, _) = parseStenoAmendments(html)
    assert(amendments.find(_.letter == "E").get.submitterNames.head.contains("Kuchaře"))
  }

  // ── parenthesized stances, vote formats, letter fallback ───────────────

  test("parenthesized proposer stances normalize (Souhlasné/Ministr/Kladné)") {
    def proposerOf(body: String): Option[String] = {
      val html = s"""<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>$body</p><p>Hlasování číslo 10. Přijato.</p>"""
      parseStenoAmendments(html).amendments.headOption.flatMap(_.proposerStance)
    }
    assert(proposerOf("Pozměňovací návrh označeným písmenem A. " +
      "Stanovisko výboru je doporučující. " +
      "Stanovisko předkladatele? (Souhlasné.)").contains("souhlas"))
    assert(proposerOf("Pozměňovací návrh označeným písmenem B. " +
      "Stanovisko výboru je nedoporučující. " +
      "Stanovisko navrhovatele? (Ministr: Nesouhlas.)").contains("nesouhlas"))
    assert(proposerOf("Pozměňovací návrh označeným písmenem G. " +
      "Stanovisko výboru je doporučující. (Souhlas.)").contains("souhlas"))
    assert(proposerOf("Pozměňovací návrh označeným písmenem H. " +
      "Stanovisko výboru je doporučující. " +
      "Stanovisko předkladatele? (Kladné.)").contains("souhlas"))
  }

  test("parenthesized committee stance coexists with proposer stance") {
    val html = """<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Pozměňovací návrh označeným písmenem C.
Stanovisko výboru? (Zpravodajka: Bez stanoviska.)
Předkladatel? (Souhlas.)</p>
<p>Hlasování číslo 12. Přijato.</p>"""
    val c = parseStenoAmendments(html).amendments.find(_.letter == "C").get
    assert(c.committeeStance.contains("bez_stanoviska"))
    assert(c.proposerStance.contains("souhlas"))
  }

  test("'Hlasování (číslo 42)' paren format parses the vote number") {
    val html = """<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Pozměňovací návrh označeným písmenem F.
Stanovisko výboru je doporučující.</p>
<p>Hlasování (číslo 42). Přijato.</p>"""
    val f = parseStenoAmendments(html).amendments.find(_.letter == "F").get
    assert(f.voteNumber == 42 && f.result == "accepted")
  }

  test("letter fallback catches 'návrh A pan poslanec' without 'písmenem'") {
    val html = """<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Budeme hlasovat o pozměňovacím návrh A pan poslanec Nacher.
Stanovisko výboru je doporučující.</p>
<p>Hlasování číslo 10. Přijato.</p>
<p>Dalším je pozměňovací návrh B. Stanovisko výboru je nedoporučující.</p>
<p>Hlasování číslo 11. Zamítnuto.</p>"""
    val letters = parseStenoAmendments(html).amendments
      .filterNot(_.isFinalVote).map(_.letter)
    assert(letters.contains("A") && letters.contains("B"))
  }

  test("blocks without letters get '' (no inheritance), challenges inherit") {
    val html = """<p>Přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Pozměňovací návrh označeným písmenem A.
Stanovisko výboru je doporučující.</p>
<p>Hlasování číslo 10. Přijato.</p>
<p>Nyní budeme hlasovat o dalším.
Stanovisko výboru je nedoporučující.</p>
<p>Hlasování číslo 11. Zamítnuto.</p>
<p>Pozměňovací návrh označeným písmenem C.
Stanovisko výboru je doporučující.</p>
<p>Hlasování číslo 12. Přijato.</p>"""
    val letters = parseStenoAmendments(html).amendments
      .filterNot(_.isFinalVote).map(_.letter)
    assert(letters == Seq("A", "", "C"))
    // direct unit parity with the reference's _blocks_to_amendments tests
    val direct = blocksToAmendments(Seq(
      ParseBlock(text = "first", letter = "A", voteNumber = Some(1), result = "accepted"),
      ParseBlock(text = "second", letter = "", voteNumber = Some(2), result = "rejected")))
    assert(direct.map(_.letter) == Seq("A", ""))
    val challenge = blocksToAmendments(Seq(
      ParseBlock(text = "first", letter = "B", voteNumber = Some(1), result = "accepted"),
      ParseBlock(text = "challenge", letter = "", voteNumber = Some(2),
        result = "rejected", isChallenge = true)))
    assert(challenge.map(_.letter) == Seq("B", "B"))
    assert(challenge(1).isRevote)
  }
}
