package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Spark side of steno amendment ingestion: run [[StenoParser]] over a
  * corpus of steno pages and cross-validate the result against the
  * official votes table (reference `steno_parser.py:593-680`).
  *
  * The per-page parse is a genuine per-row imperative state machine
  * (ordered blocks, challenge inheritance), so it runs as a flatMap over
  * the page rows — one pass, no shuffle; every page is independent, which
  * is exactly the 100 TB shape (pages partition freely). The
  * cross-validation, by contrast, is relational and stays in DataFrame
  * ops: two regexp_extract joins against the votes table.
  */
object StenoIngest {

  /** Parse a corpus of steno pages into the amendment fact table
    * (PspSchemas.amendments). Input rows: (period, schuze, bod, ct,
    * html). id_hlasovani is left null — resolve it with
    * [[graft.psp.Amendments.resolveVoteIds]] against the votes table.
    */
  def parse(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    val rdd = pages
      .select(
        col("period").cast("long"), col("schuze").cast("long"),
        col("bod").cast("long"), col("ct").cast("long"), col("html"))
      .rdd.flatMap { r =>
        val res = StenoParser.parseStenoAmendments(r.getString(4))
        res.amendments.map { a =>
          Row(
            r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            a.letter, a.voteNumber.toLong, null, a.result,
            a.isRevote, a.isWithdrawn, a.isFinalVote, a.isLegTech,
            a.submitterNames, Seq.empty[String], a.groupedWith,
            res.warnings, res.confidence)
        }
      }
    spark.createDataFrame(rdd, PspSchemas.amendments)
  }

  /** Cross-validate parsed amendments against the official votes table
    * (`steno_parser.py:593-680`), relationally:
    *
    *  - pass 1: join on (schuze, vote_number = cislo); fill a missing
    *    letter from the vote title's "pozm. návrh X" pattern and flip
    *    is_final_vote when the title says "jako celku", appending the
    *    reference's warning strings to parse_warnings;
    *  - pass 2: official votes with an extractable amendment letter that
    *    no parsed row claimed (anti-join) become minimal amendment rows —
    *    procedure and final-passage titles are skipped.
    *
    * Divergence noted: the reference runs per (schuze, bod) with the
    * bill's own bod; the relational pass takes (schuze, bod) from the
    * official vote row itself, which at whole-period scope is the same
    * join key the reference's caller used to slice `schuze_votes`.
    *
    * `votes` needs (id_hlasovani, schuze, bod, cislo, nazev_dlouhy).
    */
  def crossValidate(amendments: DataFrame, votes: DataFrame): DataFrame = {
    val titled = votes.select(
      col("schuze").cast("long").as("schuze"),
      col("bod").cast("long").as("v_bod"),
      col("cislo").cast("long").as("cislo"),
      coalesce(col("nazev_dlouhy"), lit("")).as("title"))
      .withColumn("title_letter",
        regexp_extract(col("title"), StenoParser.VoteTitleLetterRegex, 1))
      .withColumn("title_final", col("title").rlike(StenoParser.VoteTitleFinalRegex))
      .withColumn("title_procedure",
        col("title").rlike(StenoParser.VoteTitleProcedureRegex))

    // pass 1: enrich parsed rows from their official title
    val enriched = amendments.as("a")
      .join(broadcast(titled).as("t"),
        col("a.schuze") === col("t.schuze") &&
          col("a.vote_number") === col("t.cislo"),
        "left")
      .withColumn("fill_letter",
        col("a.letter") === "" && !col("a.is_final_vote") &&
          coalesce(col("t.title_letter"), lit("")) =!= "")
      .withColumn("flip_final",
        !col("a.is_final_vote") && coalesce(col("t.title_final"), lit(false)))
      .withColumn("new_letter",
        when(col("fill_letter"), col("t.title_letter")).otherwise(col("a.letter")))
      .withColumn("new_final", col("a.is_final_vote") || col("flip_final"))
      .withColumn("new_warnings",
        concat(
          col("a.parse_warnings"),
          when(col("fill_letter"), array(format_string(
            "Filled letter '%s' from vote title (vote %d, schuze=%d, bod=%d)",
            col("t.title_letter"), col("a.vote_number"), col("a.schuze"),
            col("a.bod")))).otherwise(array()),
          when(col("flip_final"), array(format_string(
            "Detected final vote from title (vote %d)", col("a.vote_number"))))
            .otherwise(array())))
      .select(
        col("a.period"), col("a.schuze"), col("a.bod"), col("a.ct"),
        col("new_letter").as("letter"), col("a.vote_number"),
        col("a.id_hlasovani"), col("a.result"), col("a.is_revote"),
        col("a.is_withdrawn"), col("new_final").as("is_final_vote"),
        col("a.is_leg_tech"), col("a.submitter_names"),
        col("a.submitter_parties"), col("a.grouped_with"),
        col("new_warnings").as("parse_warnings"), col("a.parse_confidence"))

    // pass 2: official amendment votes the parser missed → minimal rows.
    // period/ct for the created rows come from any parsed row of the same
    // schuze (the reference validates one bill at a time, so these are
    // constant within its slice).
    val claimed = amendments
      .filter(col("vote_number") > 0)
      .select(col("schuze"), col("vote_number").as("cislo"))
    val context = amendments
      .groupBy("schuze")
      .agg(min(col("period")).as("period"), min(col("ct")).as("ct"))
    val missed = titled
      .join(claimed, Seq("schuze", "cislo"), "left_anti")
      .filter(!col("title_procedure") && !col("title_final") &&
        col("title_letter") =!= "")
      .join(broadcast(context), Seq("schuze"), "inner")
      .select(
        col("period"), col("schuze"), col("v_bod").as("bod"), col("ct"),
        col("title_letter").as("letter"), col("cislo").as("vote_number"),
        lit(null).cast("long").as("id_hlasovani"), lit("").as("result"),
        lit(false).as("is_revote"), lit(false).as("is_withdrawn"),
        lit(false).as("is_final_vote"), lit(false).as("is_leg_tech"),
        array().cast("array<string>").as("submitter_names"),
        array().cast("array<string>").as("submitter_parties"),
        array().cast("array<string>").as("grouped_with"),
        array(format_string(
          "Created missing amendment '%s' from official vote %d (schuze=%d)",
          col("title_letter"), col("cislo"), col("schuze")))
          .as("parse_warnings"),
        lit(0.0).as("parse_confidence"))

    enriched.unionByName(missed)
  }

  /** [[ExternalIngestion.StenoAmendmentSource]] backed by the real parser
    * over in-memory pages — the production shape reads the scraped HTML
    * from a table/directory instead.
    */
  class ParsedStenoSource(pages: Seq[(Long, Long, Long, Long, String)])
      extends ExternalIngestion.StenoAmendmentSource {
    override def amendments(spark: SparkSession, period: Int): DataFrame = {
      import spark.implicits._
      parse(pages.toDF("period", "schuze", "bod", "ct", "html")
        .filter(col("period") === period))
    }
  }
}
