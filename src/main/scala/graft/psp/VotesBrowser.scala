package graft.psp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Browse, Profiles}
import graft.plans.GraftFunctions

/** Vote browser queries (reference `services/votes_service.py`):
  * diacritic-insensitive search (P7) over BOTH name columns, outcome
  * filter, topic semi-join (J9), deterministic clamped pagination (O3),
  * per-vote detail with party breakdown (A4).
  */
object VotesBrowser {

  private def searchNorm(c: Column): Column =
    lower(call_function("strip_diacritics", c))

  /** listVotes with the full paging envelope (total / clamped page /
    * total_pages — the reference's response shape).
    */
  def listVotesPaged(
      spark: SparkSession,
      votes: DataFrame,
      voidVotes: DataFrame,
      search: Option[String] = None,
      outcome: Option[String] = None,
      topicKeys: Option[DataFrame] = None,
      page: Int = 1,
      perPage: Int = 30): Browse.PagedResult = {
    GraftFunctions.ensure(spark)
    var df = votes
      .join(voidVotes, Seq("id_hlasovani"), "left_anti")
      .withColumn("nazev_dlouhy", coalesce(col("nazev_dlouhy"), lit("")))
      .withColumn("nazev_kratky", coalesce(col("nazev_kratky"), lit("")))
    search.filter(_.nonEmpty).foreach { q =>
      // reference matches the normalized needle against long OR short name
      // (votes_service.py:101-112)
      val needle = graft.functions.TextNorm.normalizeSearch(q)
      df = df.filter(
        searchNorm(col("nazev_dlouhy")).contains(needle) ||
          searchNorm(col("nazev_kratky")).contains(needle))
    }
    outcome.foreach { o => df = df.filter(col("vysledek") === o) }
    topicKeys.foreach { keys => df = df.join(keys, Seq("schuze", "bod"), "left_semi") }
    Browse.pageClamped(df, page, perPage, col("id_hlasovani").desc)
  }

  /** Paged vote listing (rows only — see [[listVotesPaged]] for totals). */
  def listVotes(
      spark: SparkSession,
      votes: DataFrame,
      voidVotes: DataFrame,
      search: Option[String] = None,
      outcome: Option[String] = None,
      topicKeys: Option[DataFrame] = None,
      page: Int = 1,
      perPage: Int = 30): DataFrame =
    listVotesPaged(spark, votes, voidVotes, search, outcome, topicKeys,
      page, perPage).rows

  /** Per-party breakdown for one vote (votes_service.py:265-280, A4). */
  def partyBreakdown(mpVotes: DataFrame, mpInfo: DataFrame, voteId: Long): DataFrame =
    Profiles.categoricalProfile(
        mpVotes.filter(col("id_hlasovani") === voteId)
          .join(broadcast(mpInfo.select("id_poslanec", "party")),
            Seq("id_poslanec"), "inner"),
        Seq("party"), "vysledek",
        Seq(VoteResult.Yes, VoteResult.No, VoteResult.Abstained,
          VoteResult.DidNotVote, VoteResult.Absent, VoteResult.Excused))
      .orderBy("party")

  /** Single-vote MP listing with names, multi-column sort (O2). */
  def voteMpVotes(mpVotes: DataFrame, mpInfo: DataFrame, voteId: Long): DataFrame =
    mpVotes.filter(col("id_hlasovani") === voteId)
      .join(broadcast(mpInfo), Seq("id_poslanec"), "inner")
      .select("party", "prijmeni", "jmeno", "vysledek")
      .orderBy("party", "prijmeni", "jmeno")
}
