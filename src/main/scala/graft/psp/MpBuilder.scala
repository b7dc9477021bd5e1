package graft.psp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Browse

/** MP dimension build (reference `services/mp_builder.py:8-48`):
  * mandate → person enrich (J1), membership → club (J2), latest club
  * membership per person (A11 window dedup), party-alias normalization
  * (F7). All dimension inputs are small — every join broadcasts.
  */
object MpBuilder {

  /** Party-name aliases (mp_builder.py:41-46). */
  val partyAliases: Map[String, String] =
    Map("ANO2011" -> "ANO", "Nezařaz" -> "Nezařazení")

  def buildMpInfo(
      period: Int,
      mps: DataFrame,
      persons: DataFrame,
      organs: DataFrame,
      memberships: DataFrame): DataFrame = {
    val organId = Periods.organIds(period)
    val periodMps = mps.filter(col("id_obdobi") === organId)

    val mpPersons = periodMps.join(
      broadcast(persons.select("id_osoba", "jmeno", "prijmeni")),
      Seq("id_osoba"), "left")

    val clubs = organs
      .filter(col("id_typ_organu") === Periods.clubOrganType)
      .select("id_organ", "zkratka")

    // latest club membership per person. The reference sorts the raw date
    // STRING descending with non-deterministic tie-keep; we add id_of as a
    // deterministic tiebreaker (documented divergence, SURVEY 7.4).
    val clubMemberships = Browse.keepFirst(
      memberships.join(broadcast(clubs), col("id_of") === col("id_organ"), "inner")
        .select("id_osoba", "zkratka", "od_o", "do_o", "id_of"),
      Seq("id_osoba"), col("od_o").desc, col("id_of").desc)

    val aliased = partyAliases.foldLeft(col("zkratka")) { case (c, (from, to)) =>
      when(c === from, lit(to)).otherwise(c)
    }

    mpPersons
      .join(
        broadcast(clubMemberships.select(col("id_osoba"), aliased.as("party"))),
        Seq("id_osoba"), "left")
      .select("id_poslanec", "id_osoba", "jmeno", "prijmeni", "party")
  }
}
