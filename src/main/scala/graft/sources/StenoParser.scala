package graft.sources

import java.util.regex.Pattern

/** Stenographic-record amendment parser (reference
  * `services/amendments/steno_parser.py:21-171,304-413`): classify the
  * highly standardized chair/rapporteur phrases in a psp.cz steno page
  * into amendment-vote facts. Pure text → records; the Spark corpus pass
  * and official-vote cross-validation live in [[StenoIngest]].
  *
  * Faithful port notes: pattern alternations, priority order (letter
  * primary → fallback; committee inline → parenthesized; proposer
  * dialogue → standalone paren; submitter patterns A → C → B → D), the
  * challenge-only letter inheritance rule, and the confidence bookkeeping
  * all match the reference, so its fixture expectations carry over
  * verbatim. Java regexes run with UNICODE_CHARACTER_CLASS so `\w`
  * covers Czech diacritics like Python's `str` patterns.
  */
object StenoParser {

  /** One parsed amendment vote (reference `models/amendment_models.py:11`). */
  case class AmendmentVote(
      letter: String,
      voteNumber: Int,
      result: String = "",
      committeeStance: Option[String] = None,
      proposerStance: Option[String] = None,
      isFinalVote: Boolean = false,
      isLegTech: Boolean = false,
      isRevote: Boolean = false,
      originalVoteNumber: Option[Int] = None,
      isWithdrawn: Boolean = false,
      groupedWith: Seq[String] = Nil,
      submitterNames: Seq[String] = Nil)

  case class ParseResult(
      amendments: Seq[AmendmentVote], confidence: Double, warnings: Seq[String])

  private[sources] case class ParseBlock(
      text: String,
      letter: String = "",
      committeeStance: Option[String] = None,
      proposerStance: Option[String] = None,
      voteNumber: Option[Int] = None,
      result: String = "",
      isFinal: Boolean = false,
      isChallenge: Boolean = false,
      isWithdrawal: Boolean = false,
      isLegTech: Boolean = false,
      groupedLetters: Seq[String] = Nil,
      submitterNames: Seq[String] = Nil)

  // ── compiled patterns (steno_parser.py:21-155) ─────────────────────────

  private val I = Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE |
    Pattern.UNICODE_CHARACTER_CLASS
  private val IS = I | Pattern.DOTALL

  private val StartRe = Pattern.compile(
    """přikročíme.*?k\s+hlasování\s+o\s+pozměňovac""", IS)

  private val LetterRe = Pattern.compile(
    """(?:označen[éý]m?\s+písmenem|pod\s+označením|""" +
      """pozměňovac\w+\s+návrh\w*\s+(?:pod\s+)?písmenem?)\s+""" +
      """([A-Z]\d?(?:(?:,\s*|\s+a\s+)[A-Z]\d?)*)""", I)

  private val LetterFallbackRe = Pattern.compile(
    """(?:pozměňovac\w+\s+)?návrh\w*\s+""" +
      """([A-Z]\d?(?:(?:,\s*|\s+a\s+)[A-Z]\d?)*)""" +
      """(?:\s+pan|\s+poslanc|\s*[,.]|\s+(?:Stanovisko|předložen))""", I)

  private val CommitteeInlineRe = Pattern.compile(
    """[Ss]tanovisko\s+(?:garančního\s+)?(?:výboru|zpravodaj\w*)\s+.*?""" +
      """(doporučující|nedoporučující|bez\s+stanovisk\w*|kladn\w*|záporn\w*)""", IS)

  private val CommitteeParenRe = Pattern.compile(
    """(?:[Ss]tanovisko\s+(?:garančního\s+)?(?:výboru|zpravodaj\w*)|""" +
      """[Zz]pravodaj\w*)\s*[^(]{0,80}""" +
      """\(([^)]+)\)""", IS)

  private val ProposerDialogueRe = Pattern.compile(
    """(?:předkladatel|navrhovatel|ministr)\w*\??\s*\(([^)]+)\)""", I)

  private val ParenStanceRe = Pattern.compile(
    """\((?:(?:Ministr\w*|Ministryně|Navrhovatel\w*|Předkladatel\w*""" +
      """|Pan\w?\s+ministr\w*)\s*:\s*)?""" +
      """(Souhlas\w*|Nesouhlas\w*|Souhlasn\w*|Nesouhlasn\w*""" +
      """|Kladn\w*|Záporn\w*|Neutrální)""" +
      """[^)]*\)""", I)

  // case-sensitive on the result words, like the reference (DOTALL only)
  private val VoteResultRe = Pattern.compile(
    """[Hh]lasování\s+\(?(?:číslo|č\.)\s*(\d+)""" +
      """.*?""" +
      """(Přijato|Zamítnuto|Návrh\s+byl\s+přijat|Návrh\s+nebyl\s+přijat)""",
    Pattern.DOTALL | Pattern.UNICODE_CHARACTER_CLASS)

  private val FinalVoteRe = Pattern.compile(
    """návrhu?\s+zákona\s+jako\s+celku""", I)

  private val ChallengeRe = Pattern.compile(
    """zpochybňuji\s+hlasování""", I)

  private val WithdrawalRe = Pattern.compile(
    """(?:stah(?:uji|uje)|stažen[ío])\s+pozměňovac""", I)

  private val LegTechRe = Pattern.compile(
    """(?:§\s*95|legislativně[\s-]+technick)""", I)

  private val Titles = """(?:(?:Ing|Mgr|JUDr|MUDr|PhDr|RNDr|doc|prof|Bc|MBA|Ph\.D)\.\s+)*"""
  private val CapName = """[A-ZÁČĎÉĚÍŇÓŘŠŤÚŮÝŽ][a-záčďéěíňóřšťúůýž]+"""

  private val SubmitterAfterLetterRe = Pattern.compile(
    """pozměňovac\w+\s+návrh\w*\s+""" +
      """(?:pod\s+)?(?:písmenem?\s+|označen\w+\s+písmenem?\s+)?""" +
      """[A-Z]\d?(?:(?:,\s*|\s+a\s+)[A-Z]\d?)*\s+""" +
      """(?:pana\s+|paní\s+)?""" +
      """(?:poslanc\w+|poslankyně)\s+""" +
      s"""($Titles$CapName)""", I)

  private val SubmitterPredlozenyRe = Pattern.compile(
    """předložen[ýáy]\s+""" +
      """(?:panem\s+|paní\s+)?""" +
      """(?:poslancem|poslankyní)\s+""" +
      s"""($Titles$CapName)""", I)

  private val SubmitterPluralRe = Pattern.compile(
    """(?:návrh\w*|předložen\w*)\s+(?:pan\w+\s+)?""" +
      """(?:poslanců|poslankyň)\s+""" +
      s"""((?:$CapName(?:,\\s*|\\s+a\\s+)?)+)""", I)

  private val SubmitterNavrhRe = Pattern.compile(
    """návrh\w*\s+""" +
      """(?:pan\w+\s+)?(?:koleg\w+\s+)?""" +
      """(?:poslanc\w+|poslankyně)\s+""" +
      s"""($Titles(?:$CapName\\s+)?$CapName)""", I)

  // title patterns for the official-vote cross-validation (py:561-580)
  private[sources] val VoteTitleLetterRegex =
    """(?iU)pozm\w*\.?\s+n[aá]vrh\w*\s+([A-Z]\d?)"""
  private[sources] val VoteTitleFinalRegex = """(?iU)jako\s+celku"""
  private[sources] val VoteTitleProcedureRegex = """(?iU)procedur|postup"""

  // ── text plumbing (py:177-240) ─────────────────────────────────────────

  private val EntityMap = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")
  private val EntityRe = Pattern.compile("""&(#x?[0-9a-fA-F]+|\w+);""")

  private def unescapeEntities(s: String): String = {
    val m = EntityRe.matcher(s)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val body = m.group(1)
      val rep =
        if (body.startsWith("#x") || body.startsWith("#X"))
          try Character.toString(Integer.parseInt(body.drop(2), 16))
          catch { case _: Exception => m.group(0) }
        else if (body.startsWith("#"))
          try Character.toString(Integer.parseInt(body.drop(1)))
          catch { case _: Exception => m.group(0) }
        else EntityMap.getOrElse(body, m.group(0))
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** Strip tags, decode entities, normalize whitespace (py:177-186). */
  def cleanHtml(html: String): String = {
    val noTags = html.replaceAll("""<[^>]*>""", " ")
    unescapeEntities(noTags)
      .replace(0xa0.toChar, ' ')
      .replaceAll("""\s+""", " ")
      .trim
  }

  /** Amendment voting section, "" if absent (py:189-202). */
  def extractSection(text: String): String = {
    val m = StartRe.matcher(text)
    if (m.find()) text.substring(m.start()) else ""
  }

  /** Raw Czech result → accepted/rejected/unknown (py:205-218). */
  def normalizeResult(raw: String): String = {
    val lower = raw.toLowerCase(java.util.Locale.forLanguageTag("cs")).trim
    if (lower.contains("přijat")) "accepted"
    else if (lower.contains("zamítnut")) "rejected"
    else "unknown"
  }

  /** "E1 a F2" → ("E1", ["F2"]) (py:221-240). */
  def parseLetterGroups(letterStr: String): (String, Seq[String]) = {
    val parts = letterStr.trim.split("""\s+a\s+|,\s*""").map(_.trim).filter(_.nonEmpty)
    if (parts.isEmpty) (letterStr.trim, Nil)
    else (parts.head, parts.tail.toSeq)
  }

  /** Split the section at each vote result; trailing text is its own
    * block (py:243-273).
    */
  def splitIntoBlocks(section: String): Seq[String] = {
    val m = VoteResultRe.matcher(section)
    val blocks = Seq.newBuilder[String]
    var start = 0
    var any = false
    while (m.find()) {
      any = true
      val b = section.substring(start, m.end()).trim
      if (b.nonEmpty) blocks += b
      start = m.end()
    }
    if (!any) return if (section.trim.nonEmpty) Seq(section) else Nil
    if (start < section.length) {
      val trailing = section.substring(start).trim
      if (trailing.nonEmpty) blocks += trailing
    }
    blocks.result()
  }

  /** Parenthesized stance text → normalized key (py:276-301). */
  def normalizeParenStance(raw: String): Option[String] = {
    val lower = raw.toLowerCase(java.util.Locale.forLanguageTag("cs")).trim
    if (lower.contains("nesouhlas")) Some("nesouhlas")
    else if (lower.contains("souhlas")) Some("souhlas")
    else if (lower.contains("nedoporuč")) Some("nedoporucujici")
    else if (lower.contains("doporuč")) Some("doporucujici")
    else if (lower.contains("bez stanovis")) Some("bez_stanoviska")
    else if (lower.contains("neutrální")) Some("neutralni")
    else if (lower.contains("kladn")) Some("souhlas")
    else if (lower.contains("záporn")) Some("nesouhlas")
    else None
  }

  private def findFirst(p: Pattern, text: String): Option[java.util.regex.Matcher] = {
    val m = p.matcher(text)
    if (m.find()) Some(m) else None
  }

  private def findAllGroup1(p: Pattern, text: String): Seq[String] = {
    val m = p.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group(1)
    out.result()
  }

  /** Classify one block (py:304-413). */
  private[sources] def parseBlock(blockText: String): ParseBlock = {
    var pb = ParseBlock(text = blockText)

    findFirst(LetterRe, blockText)
      .orElse(findFirst(LetterFallbackRe, blockText))
      .foreach { m =>
        val (primary, grouped) = parseLetterGroups(m.group(1).trim)
        pb = pb.copy(letter = primary, groupedLetters = grouped)
      }

    // committee stance: inline first, then parenthesized
    findFirst(CommitteeInlineRe, blockText).foreach { m =>
      val raw = m.group(1).trim.toLowerCase(java.util.Locale.forLanguageTag("cs"))
      val stance =
        if (raw.contains("nedoporuč")) "nedoporucujici"
        else if (raw.contains("doporuč")) "doporucujici"
        else if (raw.contains("bez")) "bez_stanoviska"
        else if (raw.contains("kladn")) "doporucujici"
        else if (raw.contains("záporn")) "nedoporucujici"
        else raw
      pb = pb.copy(committeeStance = Some(stance))
    }
    if (pb.committeeStance.isEmpty) {
      findFirst(CommitteeParenRe, blockText).foreach { m =>
        normalizeParenStance(m.group(1)).foreach(s =>
          pb = pb.copy(committeeStance = Some(s)))
      }
    }

    // proposer stance: dialogue first, then standalone paren (skipping
    // committee-flavored stances)
    findFirst(ProposerDialogueRe, blockText).foreach { m =>
      normalizeParenStance(m.group(1)).foreach(s =>
        pb = pb.copy(proposerStance = Some(s)))
    }
    if (pb.proposerStance.isEmpty) {
      val it = ParenStanceRe.matcher(blockText)
      var done = false
      while (!done && it.find()) {
        normalizeParenStance(it.group(1)) match {
          case Some(s) if s != "doporucujici" && s != "nedoporucujici" &&
              s != "bez_stanoviska" =>
            pb = pb.copy(proposerStance = Some(s)); done = true
          case _ =>
        }
      }
    }

    findFirst(VoteResultRe, blockText).foreach { m =>
      pb = pb.copy(
        voteNumber = Some(m.group(1).toInt),
        result = normalizeResult(m.group(2)))
    }

    pb = pb.copy(
      isFinal = FinalVoteRe.matcher(blockText).find(),
      isChallenge = ChallengeRe.matcher(blockText).find(),
      isWithdrawal = WithdrawalRe.matcher(blockText).find(),
      isLegTech = LegTechRe.matcher(blockText).find())

    // submitters: A (letter+genitive) → C (návrh poslanc* Name) →
    // B (předložen* poslancem Name) → D (plural genitive list)
    val submitters = {
      val a = findAllGroup1(SubmitterAfterLetterRe, blockText).map(_.trim)
      if (a.nonEmpty) a
      else {
        val c = findAllGroup1(SubmitterNavrhRe, blockText).map(_.trim)
        if (c.nonEmpty) c
        else {
          val b = findAllGroup1(SubmitterPredlozenyRe, blockText).map(_.trim)
          if (b.nonEmpty) b
          else findFirst(SubmitterPluralRe, blockText).map { m =>
            m.group(1).split("""(?U),\s*|\s+a\s+""").map(_.trim)
              .filter(_.nonEmpty).toSeq
          }.getOrElse(Nil)
        }
      }
    }
    pb.copy(submitterNames = submitters)
  }

  /** Blocks → amendment votes; only challenges inherit the previous
    * letter (py:416-478).
    */
  private[sources] def blocksToAmendments(blocks: Seq[ParseBlock]): Seq[AmendmentVote] = {
    val out = Seq.newBuilder[AmendmentVote]
    var lastVoteNumber: Option[Int] = None
    var lastLetter = ""
    blocks.foreach { block =>
      if (block.isWithdrawal) {
        if (block.letter.nonEmpty)
          out += AmendmentVote(
            letter = block.letter, voteNumber = 0, isWithdrawn = true,
            groupedWith = block.groupedLetters,
            submitterNames = block.submitterNames)
      } else block.voteNumber.foreach { vn =>
        val isRevote = block.isChallenge && lastVoteNumber.isDefined
        val letter =
          if (block.letter.nonEmpty) block.letter
          else if (block.isChallenge && lastLetter.nonEmpty) lastLetter
          else ""
        out += AmendmentVote(
          letter = letter, voteNumber = vn, result = block.result,
          committeeStance = block.committeeStance,
          proposerStance = block.proposerStance,
          isFinalVote = block.isFinal, isLegTech = block.isLegTech,
          isRevote = isRevote,
          originalVoteNumber = if (isRevote) lastVoteNumber else None,
          groupedWith = block.groupedLetters,
          submitterNames = block.submitterNames)
        lastVoteNumber = Some(vn)
        if (block.letter.nonEmpty) lastLetter = block.letter
      }
    }
    out.result()
  }

  /** Full parse with the reference's confidence bookkeeping (py:481-555). */
  def parseStenoAmendments(html: String): ParseResult = {
    var confidence = 1.0
    val warnings = Seq.newBuilder[String]

    val section = extractSection(cleanHtml(html))
    if (section.isEmpty) {
      warnings += "No amendment voting section found in steno text"
      return ParseResult(Nil, math.max(0.0, confidence - 0.3), warnings.result())
    }
    val rawBlocks = splitIntoBlocks(section)
    if (rawBlocks.isEmpty) {
      warnings += "No vote blocks found in amendment section"
      return ParseResult(Nil, math.max(0.0, confidence - 0.2), warnings.result())
    }
    val parsed = rawBlocks.map(parseBlock)

    val unmatched = parsed.count(b => b.voteNumber.isEmpty && !b.isWithdrawal)
    if (unmatched > 0) {
      confidence -= 0.1 * math.min(unmatched, 3)
      warnings += s"$unmatched block(s) without vote numbers"
    }
    val noLetter = parsed.count(b =>
      b.letter.isEmpty && b.voteNumber.isDefined && !b.isFinal)
    if (noLetter > 0) {
      confidence -= 0.05 * math.min(noLetter, 3)
      warnings += s"$noLetter vote(s) without amendment letter"
    }
    ParseResult(
      blocksToAmendments(parsed),
      math.max(0.0, math.min(1.0, confidence)),
      warnings.result())
  }
}
