package graft.psp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's synthetic fixtures (tests/fixtures/sample_data.py,
  * documented in /root/repo/FIXTURES.md) — same values, same expected
  * outputs, so the reference's assertion constants carry over verbatim.
  */
object Fixtures {

  /** 5 votes, ids 1..5 (make_votes). */
  def makeVotes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (1 to 5).map { i =>
      (i.toLong, 165, 1, i, i, "2024-01-01", "10:00:00",
        100, 50, 10, 20, 180, 90, "N", "A", s"Test vote $i", s"TV$i")
    }.toDF("id_hlasovani", "id_organ", "schuze", "cislo", "bod", "datum",
      "cas", "pro", "proti", "zdrzel", "nehlasoval", "prihlaseno", "kvorum",
      "druh_hlasovani", "vysledek", "nazev_dlouhy", "nazev_kratky")
  }

  /** MP votes (make_mp_votes): MPs 1,2 (ANO) YES on all; MP 3 (ODS) NO on
    * 1-3 + YES on 4-5 (the 60 % rebel); MPs 4,6 (ODS) YES on all; MP 5
    * (STAN) one of each attendance code A,@,M,F,C.
    */
  def makeMpVotes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows =
      (1 to 5).map(v => (1L, v.toLong, "A")) ++
        (1 to 5).map(v => (2L, v.toLong, "A")) ++
        Seq((3L, 1L, "B"), (3L, 2L, "B"), (3L, 3L, "B"), (3L, 4L, "A"), (3L, 5L, "A")) ++
        (1 to 5).map(v => (4L, v.toLong, "A")) ++
        Seq((5L, 1L, "A"), (5L, 2L, "@"), (5L, 3L, "M"), (5L, 4L, "F"), (5L, 5L, "C")) ++
        (1 to 5).map(v => (6L, v.toLong, "A"))
    rows.toDF("id_poslanec", "id_hlasovani", "vysledek")
  }

  /** make_mp_info: 6 MPs with Czech diacritics. */
  def makeMpInfo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 101L, "Jan", "Novák", "ANO"),
      (2L, 102L, "Petr", "Svoboda", "ANO"),
      (3L, 103L, "Karel", "Dvořák", "ODS"),
      (4L, 104L, "Ondřej", "Černý", "ODS"),
      (5L, 105L, "Marie", "Nová", "STAN"),
      (6L, 106L, "Tomáš", "Bílý", "ODS"))
      .toDF("id_poslanec", "id_osoba", "jmeno", "prijmeni", "party")
  }

  /** Empty void list (make_void_votes). */
  def makeVoidVotes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[Long].toDF("id_hlasovani")
  }

  /** Non-empty void variant — asserts exclusion actually removes vote 3. */
  def makeVoidVotesWith3(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(3L).toDF("id_hlasovani")
  }
}
