package graft.psp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Attendance analysis (reference `services/attendance_service.py:9-82`):
  * 7 conditional sums + total per MP, attendance_pct =
  * active / (total - excused) * 100, 10 selectable sort metrics.
  */
object Attendance {

  /** sort key → (column, descending) — attendance_service.py:55-67. */
  val sortConfig: Map[String, (String, Boolean)] = Map(
    "worst" -> ("attendance_pct", false),
    "best" -> ("attendance_pct", true),
    "most_active" -> ("active", true),
    "least_active" -> ("active", false),
    "most_abstained" -> ("abstained", true),
    "most_excused" -> ("excused", true),
    "most_passive" -> ("passive", true),
    "most_absent" -> ("absent", true),
    "most_yes" -> ("yes_votes", true),
    "most_no" -> ("no_votes", true))

  def computeAttendance(
      mpVotes: DataFrame,
      voidVotes: DataFrame,
      mpInfo: DataFrame,
      top: Int = 30,
      sort: String = "worst",
      partyFilter: Option[String] = None): DataFrame = {

    val valid = mpVotes.join(voidVotes, Seq("id_hlasovani"), "left_anti")

    def cnt(cond: Column): Column = sum(when(cond, 1).otherwise(0)).cast("long")
    val v = col("vysledek")

    val perMp = valid.groupBy("id_poslanec").agg(
      cnt(v.isin(VoteResult.Active: _*)).as("active"),
      cnt(v === VoteResult.Yes).as("yes_votes"),
      cnt(v === VoteResult.No).as("no_votes"),
      cnt(v === VoteResult.Abstained).as("abstained"),
      cnt(v === VoteResult.DidNotVote).as("passive"),
      cnt(v === VoteResult.Absent).as("absent"),
      cnt(v === VoteResult.Excused).as("excused"),
      count(lit(1)).as("total"))
      .withColumn("attendance_pct",
        col("active").cast("double") /
          (col("total") - col("excused")).cast("double") * 100.0)

    val joined = perMp.join(broadcast(mpInfo), Seq("id_poslanec"), "left")

    val filtered = partyFilter match {
      case Some(p) => joined.filter(upper(col("party")) === p.toUpperCase)
      case None => joined
    }

    val (sortCol, desc) = sortConfig.getOrElse(sort, ("attendance_pct", false))
    val order = if (desc) col(sortCol).desc else col(sortCol).asc

    filtered
      .orderBy(order, col("id_poslanec").asc)
      .limit(top)
      .select("jmeno", "prijmeni", "party", "active", "yes_votes", "no_votes",
        "abstained", "passive", "absent", "excused", "attendance_pct")
  }
}
