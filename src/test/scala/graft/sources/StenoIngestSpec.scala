package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Spark side of steno ingestion: corpus parse into the amendment fact
  * schema + relational cross-validation (mirrors the reference's
  * `TestCrossValidateAmendments`).
  */
class StenoIngestSpec extends SparkSpec {

  private val StenoSimple = """
<p>Nyní přikročíme k hlasování o pozměňovacích návrzích.</p>
<p>Nejprve budeme hlasovat o pozměňovacím návrhu označeném písmenem A.
Stanovisko výboru je doporučující. Předkladatel? (Souhlas.)</p>
<p>Hlasování číslo 42. Přijato.</p>
<p>Dále pozměňovací návrh pod označením B1.
Stanovisko výboru je nedoporučující.</p>
<p>Hlasování číslo 43. Zamítnuto.</p>
<p>Nyní budeme hlasovat o návrhu zákona jako celku.</p>
<p>Hlasování číslo 44. Přijato.</p>
"""

  test("corpus parse emits amendment fact rows in PspSchemas.amendments") {
    import spark.implicits._
    val pages = Seq((10L, 5L, 2L, 100L, StenoSimple))
      .toDF("period", "schuze", "bod", "ct", "html")
    val facts = StenoIngest.parse(pages)
    assert(facts.schema == PspSchemas.amendments)
    val rows = facts.orderBy("vote_number").collect()
    assert(rows.map(_.getAs[String]("letter")).toSeq == Seq("A", "B1", ""))
    assert(rows.map(_.getAs[Long]("vote_number")).toSeq == Seq(42L, 43L, 44L))
    assert(rows(0).getAs[String]("result") == "accepted")
    assert(rows(1).getAs[String]("result") == "rejected")
    assert(rows(2).getAs[Boolean]("is_final_vote"))
    assert(rows.forall(_.getAs[Double]("parse_confidence") >= 0.5))
  }

  test("cross-validation fills missing letters from official vote titles " +
      "(test_fills_missing_letters_from_vote_titles)") {
    import spark.implicits._
    val amendments = Seq(
      (10L, 5L, 1L, 100L, "A", 10L, "accepted"),
      (10L, 5L, 1L, 100L, "", 11L, "rejected"))
      .toDF("period", "schuze", "bod", "ct", "letter", "vote_number", "result")
      .transform(withFactDefaults)
    val votes = Seq(
      (1L, 5, 1, 10, "pozm. navrh A posl. Nacher"),
      (2L, 5, 1, 11, "pozm. navrh B posl. Vyborny"))
      .toDF("id_hlasovani", "schuze", "bod", "cislo", "nazev_dlouhy")
    val out = StenoIngest.crossValidate(amendments, votes)
    val letters = out.collect().map(_.getAs[String]("letter")).toSet
    assert(letters == Set("A", "B"))
    val bWarn = out.filter(col("letter") === "B")
      .select(explode(col("parse_warnings"))).collect().map(_.getString(0))
    assert(bWarn.exists(_.contains("Filled letter 'B'")))
  }

  test("cross-validation detects a final vote from 'jako celku' title " +
      "(test_detects_final_vote_from_title)") {
    import spark.implicits._
    val amendments = Seq((10L, 5L, 1L, 100L, "", 20L, "accepted"))
      .toDF("period", "schuze", "bod", "ct", "letter", "vote_number", "result")
      .transform(withFactDefaults)
    val votes = Seq((1L, 5, 1, 20, "navrhu zakona jako celku"))
      .toDF("id_hlasovani", "schuze", "bod", "cislo", "nazev_dlouhy")
    val out = StenoIngest.crossValidate(amendments, votes).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Boolean]("is_final_vote"))
  }

  test("cross-validation creates amendments the parser missed " +
      "(test_creates_missing_amendments); procedure votes skipped") {
    import spark.implicits._
    val amendments = Seq((10L, 5L, 1L, 100L, "A", 10L, "accepted"))
      .toDF("period", "schuze", "bod", "ct", "letter", "vote_number", "result")
      .transform(withFactDefaults)
    val votes = Seq(
      (1L, 5, 1, 10, "pozm. navrh A posl. Nacher"),
      (2L, 5, 1, 11, "pozm. navrh C posl. Novak"),
      (3L, 5, 1, 12, "procedurální návrh"))
      .toDF("id_hlasovani", "schuze", "bod", "cislo", "nazev_dlouhy")
    val out = StenoIngest.crossValidate(amendments, votes)
    val letters = out.collect().map(_.getAs[String]("letter")).toSet
    assert(letters == Set("A", "C"))
    val cRow = out.filter(col("letter") === "C").collect()(0)
    assert(cRow.getAs[Long]("vote_number") == 11L)
    assert(cRow.getAs[Long]("period") == 10L && cRow.getAs[Long]("ct") == 100L)
    val cWarn = cRow.getAs[scala.collection.Seq[String]]("parse_warnings")
    assert(cWarn.exists(_.contains("C")))
  }

  private def withFactDefaults(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("id_hlasovani", lit(null).cast("long"))
      .withColumn("is_revote", lit(false))
      .withColumn("is_withdrawn", lit(false))
      .withColumn("is_final_vote", lit(false))
      .withColumn("is_leg_tech", lit(false))
      .withColumn("submitter_names", array().cast("array<string>"))
      .withColumn("submitter_parties", array().cast("array<string>"))
      .withColumn("grouped_with", array().cast("array<string>"))
      .withColumn("parse_warnings", array().cast("array<string>"))
      .withColumn("parse_confidence", lit(1.0))
      .select(PspSchemas.amendments.fieldNames.map(col).toSeq: _*)
}
