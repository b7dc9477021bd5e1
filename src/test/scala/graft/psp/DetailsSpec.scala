package graft.psp

import graft.SparkSpec

/** Detail-query semantics behind the detail routes: outcome/vote label
  * maps, lang resolution, tisk enrichment guards, unknown-key emptiness
  * (reference `votes_service.py:303-319`, `law_service.py:247-312`,
  * `amendment_service.py:168-246`).
  */
class DetailsSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  private def fixture() = {
    import spark.implicits._
    (Fixtures.makeVotes(spark), Fixtures.makeMpVotes(spark),
      Fixtures.makeMpInfo(spark),
      Seq((1, 1, "Návrh zákona o rozpočtu")).toDF("schuze", "bod", "nazev"))
  }

  test("voteInfo enriches one vote with localized outcome label, print " +
      "name and lang-resolved topics; unknown id is empty") {
    import spark.implicits._
    val (votes, _, _, tisk) = fixture()
    val topics = Seq((1, 1, "finance", "public finance"))
      .toDF("schuze", "bod", "topic", "topic_en")
    val voteId = votes.orderBy("id_hlasovani").head().getAs[Long]("id_hlasovani")

    val cs = Details.voteInfo(votes, tisk, Some(topics), voteId, "cs").head()
    assert(cs.getAs[String]("outcome_label") != null)
    val en = Details.voteInfo(votes, tisk, Some(topics), voteId, "en").head()
    assert(en.getAs[scala.collection.Seq[String]]("tisk_topics")
      == Seq("public finance"))
    assert(cs.getAs[scala.collection.Seq[String]]("tisk_topics")
      == Seq("finance"))
    // outcome labels localize: A -> Schváleno / Passed
    val csA = Details.outcomeLabel(org.apache.spark.sql.functions.lit("A"), "cs")
    val enA = Details.outcomeLabel(org.apache.spark.sql.functions.lit("A"), "en")
    val r = votes.limit(1).select(csA.as("cs"), enA.as("en")).head()
    assert(r.getString(0) == "Schváleno" && r.getString(1) == "Passed")

    assert(Details.voteInfo(votes, tisk, Some(topics), -1L, "cs").isEmpty)
  }

  test("voteInfo guards tisk enrichment on bod > 0 and falls back to " +
      "empty topics off the lookup") {
    import spark.implicits._
    val (votes, _, _, tisk) = fixture()
    // procedural votes have bod = 0 in psp data; synthesize one
    val procedural = votes.limit(1)
      .withColumn("bod", org.apache.spark.sql.functions.lit(0))
    val id = procedural.head().getAs[Long]("id_hlasovani")
    val row = Details.voteInfo(procedural, tisk, None, id, "cs").head()
    assert(row.getAs[String]("tisk_nazev") == null)
    assert(row.getAs[scala.collection.Seq[String]]("tisk_topics").isEmpty)
  }

  test("voteMpList labels each MP's code (A->YES, F->Passive, ?->code)") {
    val (_, mpVotes, mpInfo, _) = fixture()
    val voteId = mpVotes.head().getAs[Long]("id_hlasovani")
    val rows = Details.voteMpList(mpVotes, mpInfo, voteId).collect()
    assert(rows.nonEmpty)
    val byCode = rows.map(r =>
      r.getAs[String]("vysledek") -> r.getAs[String]("vote_label")).toMap
    byCode.get("A").foreach(l => assert(l == "YES"))
    byCode.get("F").foreach(l => assert(l == "Passive"))
    // sorted (party, prijmeni, jmeno)
    val keys = rows.map(r => (r.getAs[String]("party"),
      r.getAs[String]("prijmeni"), r.getAs[String]("jmeno"))).toSeq
    assert(keys == keys.sorted)
  }

  test("lawDetail resolves lang topics/summary, collects amendment " +
      "entries, and is empty for an unknown ct") {
    import spark.implicits._
    val laws = Seq(
      (410L, 100, "Návrh zákona", "in_progress", Seq("finance"),
        Seq("public finance"), "Shrnutí", "Summary"),
      (413L, 102, "Zákon o daních", "rejected", Seq("tax"),
        Seq.empty[String], "Daně", ""))
      .toDF("id_tisk", "ct", "nazev", "status", "topics",
        "topics_en", "summary", "summary_en")
    val bills = Seq((1, 5, 2, "100"), (1, 7, 1, "100"))
      .toDF("period", "schuze", "bod", "ct")

    val en = Details.lawDetail(laws, Some(bills), 100, "en").head()
    assert(en.getAs[scala.collection.Seq[String]]("topics") == Seq("public finance"))
    assert(en.getAs[String]("summary") == "Summary")
    assert(en.getAs[Boolean]("has_amendments"))
    val entries = en.getAs[scala.collection.Seq[Row]]("amendment_entries")
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(entries == Seq((5, 2), (7, 1)))

    // empty topics_en / summary_en degrade to the Czech value
    val fallback = Details.lawDetail(laws, Some(bills), 102, "en").head()
    assert(fallback.getAs[scala.collection.Seq[String]]("topics") == Seq("tax"))
    assert(fallback.getAs[String]("summary") == "Daně")
    assert(!fallback.getAs[Boolean]("has_amendments"))

    val cs = Details.lawDetail(laws, Some(bills), 100, "cs").head()
    assert(cs.getAs[scala.collection.Seq[String]]("topics") == Seq("finance"))
    assert(cs.getAs[String]("summary") == "Shrnutí")

    assert(Details.lawDetail(laws, Some(bills), 999, "cs").isEmpty)
    // laws without the optional columns still serve (summary = "")
    val bare = laws.select("id_tisk", "ct", "nazev", "status", "topics")
    assert(Details.lawDetail(bare, None, 100, "en").head()
      .getAs[String]("summary") == "")
  }

  test("amendmentDetail nests revotes for exactly the requested agenda " +
      "item; unknown (schuze, bod) is empty") {
    import spark.implicits._
    val facts = Seq(
      (1, 2, "A", 1L, 10L, false, "accepted"),
      (1, 2, "A", 3L, 30L, true, "rejected"),
      (1, 9, "B", 2L, 20L, false, "accepted"))
      .toDF("schuze", "bod", "letter", "vote_number", "id_hlasovani",
        "is_revote", "result")
    val rows = Details.amendmentDetail(facts, 1, 2).collect()
    assert(rows.map(_.getAs[Long]("vote_number")).toSeq == Seq(1L))
    assert(rows.head.getAs[scala.collection.Seq[Row]]("revotes").size == 1)
    assert(Details.amendmentDetail(facts, 1, 99).isEmpty)
  }
}
