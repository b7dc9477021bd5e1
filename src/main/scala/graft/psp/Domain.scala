package graft.psp

/** Domain constants (reference `models/enums.py:6-37`,
  * `config.py:55-70`).
  */
object VoteResult {
  val Yes = "A"
  val No = "B"
  val Abstained = "C"
  val DidNotVote = "F"
  val Absent = "@"
  val Excused = "M"
  val BeforeOath = "W"
  val AbstainAlt = "K"
  val Active: Seq[String] = Seq(Yes, No, Abstained)
}

object VoteOutcome {
  val Passed = "A"
  val Rejected = "R"
  val InvalidX = "X"
  val InvalidQ = "Q"
  val InvalidK = "K"
}

object Periods {
  /** Electoral period number → id_obdobi organ id (config.py:57-68). */
  val organIds: Map[Int, Int] = Map(
    1 -> 165, 2 -> 166, 3 -> 167, 4 -> 168, 5 -> 169,
    6 -> 170, 7 -> 171, 8 -> 172, 9 -> 173, 10 -> 174)
  val default = 10
  /** Parliamentary club organ type (enums.py:37). */
  val clubOrganType = 1
}
