package graft.psp

import graft.SparkSpec

class TiskLookupSpec extends SparkSpec {

  private def sessions() = {
    import spark.implicits._
    Seq((900L, 174, 1), (901L, 174, 2), (950L, 165, 7))
      .toDF("id_schuze", "id_org", "schuze")
  }

  private def bodSchuze() = {
    import spark.implicits._
    // (id_bod, id_schuze, id_tisk, bod); id_tisk 0/null must be dropped
    Seq(
      (1L, 900L, Some(410L), Some(2)),
      (2L, 900L, Some(0L), Some(3)),
      (3L, 901L, None, Some(1)),
      (4L, 901L, Some(411L), Some(4)),
      (5L, 950L, Some(412L), Some(9))) // other period's session
      .toDF("id_bod", "id_schuze", "id_tisk", "bod")
  }

  private def tisky() = {
    import spark.implicits._
    Seq(
      (410L, Some(100), "Návrh zákona o státním rozpočtu", 174),
      (411L, Some(101), "Novela zákona o daních", 174),
      (412L, Some(102), "Jiný tisk", 165),
      (413L, None.asInstanceOf[Option[Int]], "Bez čísla", 174))
      .toDF("id_tisk", "ct", "nazev_tisku", "id_obdobi")
  }

  private def votes() = {
    import spark.implicits._
    Seq(
      (1L, 1, 2, "Návrh zákona o státním rozpočtu, hlasování o pozměňovacím návrhu"),
      (2L, 1, 3, "Procedurální hlasování"),
      (3L, 2, 4, "Novela zákona"), // prefix of "Novela zákona o daních"
      (4L, 2, 0, "Bod nula - ignorován"))
      .toDF("id_hlasovani", "schuze", "bod", "nazev_dlouhy")
  }

  test("schuze chain resolves (schuze,bod) -> print; filters bad id_tisk") {
    val lk = TiskLookup.viaSchuze(10, sessions(), bodSchuze(), tisky())
      .collect().map(r => (r.getAs[Int]("schuze"), r.getAs[Int]("bod")) ->
        r.getAs[Long]("id_tisk")).toMap
    assert(lk == Map((1, 2) -> 410L, (2, 4) -> 411L))
  }

  test("text fallback: greedy longest prefix match both directions") {
    val lk = TiskLookup.viaText(10, votes(), tisky())
      .collect().map(r => (r.getAs[Int]("schuze"), r.getAs[Int]("bod")) ->
        r.getAs[Long]("id_tisk")).toMap
    // vote 1 desc startswith print 410's name; print 411's name startswith
    // vote 3 desc; bod=0 and non-matching descs absent
    assert(lk == Map((1, 2) -> 410L, (2, 4) -> 411L))
  }

  test("build() picks schuze path when sessions exist, else text") {
    val viaSchuze = TiskLookup.build(10, votes(), sessions(), bodSchuze(), tisky())
    assert(viaSchuze.columns.contains("nazev"))
    assert(viaSchuze.count() == 2)
    val noSessions = sessions().limit(0)
    val viaText = TiskLookup.build(10, votes(), noSessions, bodSchuze(), tisky())
    assert(viaText.count() == 2)
  }
}
