package graft.psp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-entity detail queries behind the serving layer's
  * `/api/votes/{id}`, `/api/laws/{ct}` and
  * `/api/amendments/{schuze}/{bod}` routes (reference
  * `services/votes_service.py:303-319`, `services/law_service.py:247-312`,
  * `services/amendment_service.py:168-246`). Each is a bounded
  * single-key lookup: a pushed-down equality filter on the fact table
  * plus broadcast joins against the small dimensions, so a detail page
  * costs one partition-pruned scan regardless of corpus size.
  */
object Details {

  /** Vote outcome code → localized label (reference `_OUTCOME_KEYS`,
    * `votes_service.py:15-29`, resolved against
    * `i18n/translations.py:293-297,635-639`).
    */
  val OutcomeLabels: Map[String, Map[String, String]] = Map(
    "cs" -> Map(
      "A" -> "Schváleno", "R" -> "Zamítnuto", "Z" -> "Neplatné",
      "P" -> "Procedurální", "N" -> "Nerozhodnuto"),
    "en" -> Map(
      "A" -> "Passed", "R" -> "Rejected", "Z" -> "Void",
      "P" -> "Procedural", "N" -> "Not decided"))

  /** Per-MP vote code → label on the vote-detail page
    * (`votes_service.py:285-292` — language-invariant).
    */
  val MpVoteLabels: Map[String, String] = Map(
    VoteResult.Yes -> "YES", VoteResult.No -> "NO",
    VoteResult.Abstained -> "ABSTAINED", VoteResult.DidNotVote -> "Passive",
    VoteResult.Absent -> "Absent", VoteResult.Excused -> "Excused")

  /** Unknown code → the code itself; null/empty → "?" (reference
    * `_outcome_label` fallback).
    */
  private def labelCol(c: Column, labels: Map[String, String]): Column = {
    val mapped = labels.foldLeft(lit(null).cast("string")) {
      case (acc, (code, label)) => when(c === code, label).otherwise(acc)
    }
    coalesce(mapped, when(c.isNull || c === "", "?").otherwise(c))
  }

  def outcomeLabel(c: Column, lang: String): Column =
    labelCol(c, OutcomeLabels.getOrElse(lang, OutcomeLabels("cs")))

  def mpVoteLabel(c: Column): Column = labelCol(c, MpVoteLabels)

  /** Amendment pages label F as DID_NOT_VOTE, not Passive
    * (`amendment_service.py:249-273` vs `votes_service.py:285-292`).
    */
  val AmendmentVoteLabels: Map[String, String] =
    MpVoteLabels + (VoteResult.DidNotVote -> "DID_NOT_VOTE")

  def amendmentVoteLabel(c: Column): Column = labelCol(c, AmendmentVoteLabels)

  /** Per-MP listing for one amendment vote
    * (`amendment_service.py:275-339`): vote_code + amendment-style label.
    */
  def amendmentMpList(mpVotes: DataFrame, mpInfo: DataFrame,
      idHlasovani: Long): DataFrame =
    Amendments.amendmentMpVotes(mpVotes, mpInfo, idHlasovani)
      .withColumn("vote_code", col("vysledek"))
      .withColumn("vote_label", amendmentVoteLabel(col("vysledek")))

  /** Language-resolved topic column: `topic_en` when present AND lang=en,
    * else `topic` (reference `tisk.topics_en if lang == "en" and
    * tisk.topics_en else tisk.topics`).
    */
  private def langCol(df: DataFrame, cs: String, en: String,
      lang: String): Column =
    if (lang == "en" && df.columns.contains(en))
      // the reference treats "" as missing (`summary_en if ... and
      // summary_en else summary` — Python falsiness)
      when(col(en).isNotNull && col(en) =!= "", col(en)).otherwise(col(cs))
    else col(cs)

  /** Vote metadata for one `id_hlasovani` (`_build_vote_info`,
    * `votes_service.py:207-262` minus the scrape-side history matching):
    * null-filled names, localized outcome label, linked print name and
    * topics via the tisk lookup (only when `bod > 0`, like the
    * reference's guard). 0 rows = unknown vote (the route's 404).
    */
  def voteInfo(
      votes: DataFrame,
      tiskLookup: DataFrame,
      topics: Option[DataFrame],
      voteId: Long,
      lang: String = "cs"): DataFrame = {
    val base = votes
      .filter(col("id_hlasovani") === voteId)
      .withColumn("nazev_dlouhy", coalesce(col("nazev_dlouhy"), lit("")))
      .withColumn("nazev_kratky", coalesce(col("nazev_kratky"), lit("")))
      .withColumn("outcome_label", outcomeLabel(col("vysledek"), lang))
    val withTisk = base
      .join(broadcast(tiskLookup.select(col("schuze"), col("bod"),
        col("nazev").as("tisk_nazev"))), Seq("schuze", "bod"), "left")
      .withColumn("tisk_nazev",
        when(col("bod") > 0, col("tisk_nazev")))
    val withTopics = topics match {
      case Some(t) =>
        val perKey = t
          .groupBy("schuze", "bod")
          .agg(sort_array(collect_set(langCol(t, "topic", "topic_en", lang)))
            .as("tisk_topics"))
        withTisk.join(broadcast(perKey), Seq("schuze", "bod"), "left")
      case None => withTisk.withColumn("tisk_topics", lit(null).cast("array<string>"))
    }
    withTopics.withColumn("tisk_topics",
      when(col("bod") > 0, coalesce(col("tisk_topics"), array()))
        .otherwise(array()))
  }

  /** Per-MP listing for the vote-detail page (`_build_mp_breakdown`,
    * `votes_service.py:283-300`): names + party + label, sorted
    * (party, prijmeni, jmeno).
    */
  def voteMpList(mpVotes: DataFrame, mpInfo: DataFrame,
      voteId: Long): DataFrame =
    VotesBrowser.voteMpVotes(mpVotes, mpInfo, voteId)
      .withColumn("vote_label", mpVoteLabel(col("vysledek")))

  /** One bill's detail by print number (`law_service.py:247-312`):
    * language-resolved topics/summary, its amendment agenda entries from
    * the bills fact table, and `has_amendments`. 0 rows = unknown ct.
    * `laws` may carry optional `topics_en` / `summary` / `summary_en`
    * columns (TopicPipeline output, TopicPipeline.scala:69); absent
    * columns degrade to the Czech value / empty string.
    */
  def lawDetail(
      laws: DataFrame,
      bills: Option[DataFrame],
      ct: Int,
      lang: String = "cs"): DataFrame = {
    val summaryCol =
      if (laws.columns.contains("summary"))
        langCol(laws, "summary", "summary_en", lang)
      else lit("")
    val topicsCol =
      if (lang == "en" && laws.columns.contains("topics_en"))
        when(size(col("topics_en")) > 0, col("topics_en"))
          .otherwise(col("topics"))
      else col("topics")
    val law = LawsBrowser.dedupeLaws(laws)
      .filter(col("ct") === ct)
      .withColumn("topics", topicsCol)
      .withColumn("summary", summaryCol)
      .drop("topics_en", "summary_en")
    val entries = bills match {
      case Some(b) =>
        // bill agenda entries for this print (`amendment_entries` in the
        // reference's dict); ct arrives as string in the scraped fact
        // table, as int here — compare canonically
        b.filter(col("ct").cast("string") === lit(ct.toString))
          .groupBy(col("ct").cast("string").as("__ct"))
          .agg(sort_array(collect_list(struct(col("schuze"), col("bod"))))
            .as("amendment_entries"))
      case None =>
        law.sparkSession.emptyDataFrame
          .withColumn("__ct", lit(null).cast("string"))
          .withColumn("amendment_entries",
            lit(null).cast("array<struct<schuze:int,bod:int>>"))
    }
    law
      .join(broadcast(entries), col("ct").cast("string") === col("__ct"), "left")
      .drop("__ct")
      .withColumn("amendment_entries",
        coalesce(col("amendment_entries"),
          array().cast("array<struct<schuze:int,bod:int>>")))
      .withColumn("has_amendments", size(col("amendment_entries")) > 0)
  }

  /** One bill's amendment roll-up for `/api/amendments/{schuze}/{bod}`
    * (`amendment_service.py:168-246`): the flat fact rows for that agenda
    * item nested via [[Amendments.groupRevotes]], primaries in vote
    * order. 0 rows = unknown (schuze, bod).
    */
  def amendmentDetail(facts: DataFrame, schuze: Int, bod: Int): DataFrame =
    Amendments.groupRevotes(
        facts.filter(col("schuze") === schuze && col("bod") === bod))
      .orderBy(col("vote_number").asc)
}
