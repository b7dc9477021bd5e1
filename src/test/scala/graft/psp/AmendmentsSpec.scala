package graft.psp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AmendmentsSpec extends SparkSpec {

  private def votes() = {
    import spark.implicits._
    // (schuze,bod)=(1,2): 3 votes; (1,3): 1 vote; (2,4): 2 votes
    Seq(
      (1L, 1, 2, 10), (2L, 1, 2, 11), (3L, 1, 2, 12),
      (4L, 1, 3, 13),
      (5L, 2, 4, 1), (6L, 2, 4, 2))
      .toDF("id_hlasovani", "schuze", "bod", "cislo")
  }

  private def lookup() = {
    import spark.implicits._
    Seq((1, 2, 100, "Rozpočet"), (1, 3, 101, "Danĕ"), (2, 4, 102, "Školství"))
      .toDF("schuze", "bod", "ct", "nazev")
  }

  private def histories() = {
    import spark.implicits._
    Seq((100, "1_cteni"), (100, "3_cteni"), (101, "3_cteni"), (102, "2_cteni"))
      .toDF("ct", "stage_type")
  }

  private def voids() = {
    import spark.implicits._
    Seq.empty[Long].toDF("id_hlasovani")
  }

  test("third-reading candidates: multi-vote AND 3_cteni history required") {
    val out = Amendments.thirdReadingCandidates(votes(), voids(), lookup(), histories())
      .collect()
    // (1,2): 3 votes + ct 100 has 3_cteni -> candidate
    // (1,3): only 1 vote -> out; (2,4): 2 votes but ct 102 has no 3_cteni -> out
    assert(out.length == 1)
    assert(out(0).getAs[Int]("ct") == 100)
    assert(out(0).getAs[Long]("n_votes") == 3L)
  }

  test("vote-number resolution is a single join, vote_number=0 untouched") {
    import spark.implicits._
    val amendments = Seq(
      (10, 1, "A", 11, None.asInstanceOf[Option[Long]]),
      (10, 1, "B", 99, None.asInstanceOf[Option[Long]]),  // unmatched
      (10, 1, "C", 0, Some(777L)))                        // 0 -> keep as-is
      .toDF("period", "schuze", "letter", "vote_number", "id_hlasovani")
    val resolved = Amendments.resolveVoteIds(amendments, votes())
      .collect().map(r => r.getAs[String]("letter") ->
        Option(r.getAs[java.lang.Long]("id_hlasovani")).map(_.toLong)).toMap
    assert(resolved("A") == Some(2L))   // schuze 1 cislo 11 -> id 2
    assert(resolved("B") == None)
    assert(resolved("C") == Some(777L))
  }

  test("collectBills nests amendments sorted by letter with final vote id") {
    import spark.implicits._
    val facts = Seq(
      (10L, 1L, 2L, 100L, "B", 11L, 2L, "rejected", false, false, false, false,
        Seq("Novák"), Seq.empty[String]),
      (10L, 1L, 2L, 100L, "A", 10L, 1L, "accepted", false, false, false, false,
        Seq("Dvořák"), Seq.empty[String]),
      (10L, 1L, 2L, 100L, "F", 12L, 3L, "passed", false, false, true, false,
        Seq.empty[String], Seq.empty[String]))
      .toDF("period", "schuze", "bod", "ct", "letter", "vote_number",
        "id_hlasovani", "result", "is_revote", "is_withdrawn",
        "is_final_vote", "is_leg_tech", "submitter_names", "grouped_with")
    val bills = Amendments.collectBills(facts).collect()
    assert(bills.length == 1)
    val b = bills(0)
    assert(b.getAs[Long]("amendment_count") == 3L)
    assert(b.getAs[Long]("final_vote_id") == 3L)
    val letters = b.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("amendments")
      .map(_.getAs[String]("letter"))
    assert(letters == Seq("A", "B", "F"))
  }

  test("amendment facts flow from the STENO PARSER, not hand-built " +
      "fixtures: parse → resolve vote ids → collect bills") {
    import spark.implicits._
    // votes for schuze 1: cislo 10/11/12 map to id 1/2/3 (see votes())
    val steno = """
<p>Nyní přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Pozměňovací návrh písmenem A pana poslance Dvořáka.
Stanovisko výboru je doporučující. Předkladatel? (Souhlas.)</p>
<p>Hlasování číslo 10. Přijato.</p>
<p>Dále pozměňovací návrh pod označením B.
Stanovisko výboru je nedoporučující.</p>
<p>Hlasování číslo 11. Zamítnuto.</p>
<p>Nyní budeme hlasovat o návrhu zákona jako celku.</p>
<p>Hlasování číslo 12. Přijato.</p>
"""
    val pages = Seq((10L, 1L, 2L, 100L, steno))
      .toDF("period", "schuze", "bod", "ct", "html")
    val parsed = graft.sources.StenoIngest.parse(pages)
    assert(parsed.count() == 3) // A, B, final

    val resolved = Amendments.resolveVoteIds(parsed, votes())
    val byLetter = resolved.collect()
      .map(r => r.getAs[String]("letter") -> r.getAs[Long]("id_hlasovani")).toMap
    assert(byLetter("A") == 1L && byLetter("B") == 2L && byLetter("") == 3L)

    val bills = Amendments.collectBills(resolved).collect()
    assert(bills.length == 1)
    assert(bills(0).getAs[Long]("amendment_count") == 3L)
    assert(bills(0).getAs[Long]("final_vote_id") == 3L)
    val amendA = bills(0)
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("amendments")
      .find(_.getAs[String]("letter") == "A").get
    assert(amendA.getAs[String]("result") == "accepted")
    assert(amendA.getAs[scala.collection.Seq[String]]("submitter_names") ==
      Seq("Dvořáka"))
  }

  test("listBills search is plain lowercase substring (reference parity: " +
      "no diacritic strip in the amendment browser)") {
    import spark.implicits._
    val bills = Amendments.collectBills(Seq(
      (10L, 1L, 2L, 100L, "A", 10L, 1L, "accepted", false, false, false, false,
        Seq.empty[String], Seq.empty[String]))
      .toDF("period", "schuze", "bod", "ct", "letter", "vote_number",
        "id_hlasovani", "result", "is_revote", "is_withdrawn",
        "is_final_vote", "is_leg_tech", "submitter_names", "grouped_with"))
    val hit = Amendments.listBills(bills,
      lookup().withColumn("schuze", col("schuze").cast("long"))
        .withColumn("bod", col("bod").cast("long")),
      Some("rozpočet"), page = 1)
    assert(hit.count() == 1)
    // diacritic-free query does NOT match (unlike the vote browser)
    val miss = Amendments.listBills(bills,
      lookup().withColumn("schuze", col("schuze").cast("long"))
        .withColumn("bod", col("bod").cast("long")),
      Some("rozpocet"), page = 1)
    assert(miss.count() == 0)
  }
}
