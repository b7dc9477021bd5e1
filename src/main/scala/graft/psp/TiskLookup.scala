package graft.psp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tisk (parliamentary print) lookup build (reference
  * `services/tisk/lookup_builder.py:11-207`): maps (schuze_num, bod_num) →
  * print metadata.
  *
  * Primary path: schuze → bod_schuze → tisky join chain (J11).
  * Fallback (no session data yet for a period): greedy longest-first
  * prefix text match between vote descriptions and print names (J14) —
  * the reference's O(bods × tisky) Python loop becomes a theta-join +
  * length-ranked window.
  */
object TiskLookup {

  /** Primary chain: one row per (schuze, bod) with the resolved print. */
  def viaSchuze(
      period: Int,
      sessions: DataFrame,
      bodSchuze: DataFrame,
      tisky: DataFrame): DataFrame = {
    val organId = Periods.organIds(period)
    val sess = sessions.filter(col("id_org") === organId)
      .select(col("id_schuze"), col("schuze").as("schuze_num"))
    val bods = bodSchuze
      .filter(col("id_tisk").isNotNull && col("id_tisk") =!= 0)
      .join(broadcast(sess), Seq("id_schuze"), "inner")
      .filter(col("bod").isNotNull)
    bods
      .join(broadcast(tisky.filter(col("ct").isNotNull)
        .select(col("id_tisk"), col("ct"),
          coalesce(col("nazev_tisku"), lit("")).as("nazev"))),
        Seq("id_tisk"), "inner")
      .select(col("schuze_num").as("schuze"), col("bod"), col("id_tisk"),
        col("ct"), col("nazev"))
      // one print per (schuze, bod) — deterministic keep-first
      .withColumn("__rn", row_number().over(
        Window.partitionBy("schuze", "bod").orderBy(col("id_tisk").asc)))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Fallback greedy prefix text match (J14): match each distinct
    * (schuze, bod) vote description against period print names where
    * either is a prefix of the other; keep the LONGEST print name
    * (reference iterates names longest-first and takes the first hit).
    */
  def viaText(period: Int, votes: DataFrame, tisky: DataFrame): DataFrame = {
    val organId = Periods.organIds(period)
    val prints = tisky
      .filter(col("id_obdobi") === organId && col("ct").isNotNull)
      .select(col("id_tisk"), col("ct"), trim(col("nazev_tisku")).as("nazev"))
      .filter(col("nazev") =!= "")
    val voteBods = votes
      .filter(col("nazev_dlouhy").isNotNull && col("bod") > 0)
      .select(col("schuze"), col("bod"), trim(col("nazev_dlouhy")).as("desc"))
      .filter(col("desc") =!= "")
      .dropDuplicates("schuze", "bod")
    voteBods
      .join(broadcast(prints),
        col("desc").startsWith(col("nazev")) || col("nazev").startsWith(col("desc")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("schuze", "bod")
          .orderBy(length(col("nazev")).desc, col("id_tisk").asc)))
      .filter(col("__rn") === 1).drop("__rn", "desc")
  }

  /** Primary if the period has session rows, else text fallback
    * (lookup_builder.py:36-62).
    */
  def build(
      period: Int,
      votes: DataFrame,
      sessions: DataFrame,
      bodSchuze: DataFrame,
      tisky: DataFrame): DataFrame = {
    val organId = Periods.organIds(period)
    val hasSessions = !sessions.filter(col("id_org") === organId).isEmpty
    if (hasSessions) viaSchuze(period, sessions, bodSchuze, tisky)
    else viaText(period, votes, tisky)
  }
}
