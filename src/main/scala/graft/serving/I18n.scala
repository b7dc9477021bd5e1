package graft.serving

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** UI-string localization beyond the nav/outcome labels: table headers
  * and law-status labels, resolved through the same `lang` plumbing the
  * routes already thread into every cache key.
  *
  * Source of truth is the reference's `i18n/translations.py` `th.*`
  * blocks (cs: lines 110-114, 230-256; en: 452-456, 572-598). Keys here
  * are OUR DataFrame column names, mapped onto the reference's header
  * strings; a column with no entry renders as its own name (the
  * reference's `gettext` falls back to the key the same way).
  *
  * Law STATUS VALUES are raw scraped-Czech strings in the reference
  * (`law_service.py:_tisk_status` — 'přijato'/'zamítnuto'/
  * 'projednáváno', rendered untranslated by `partials/laws_list.html`).
  * We keep the raw `status` column for reference parity and filter
  * compatibility, and additionally serve a localized `status_label` for
  * the canonical trio — a documented improvement, not a deviation: en
  * readers otherwise get untranslatable filter values.
  */
object I18n {

  /** Column name → (cs, en) header label. */
  val Headers: Map[String, (String, String)] = Map(
    // votes listing + vote detail (th.date/description/result/for/against)
    "datum" -> ("Datum", "Date"),
    "nazev_dlouhy" -> ("Popis", "Description"),
    "nazev_kratky" -> ("Krátký popis", "Short description"),
    "vysledek" -> ("Výsledek", "Result"),
    "outcome_label" -> ("Výsledek", "Result"),
    "pro" -> ("Pro", "For"),
    "proti" -> ("Proti", "Against"),
    "total" -> ("Celkem", "Total"),
    "vote_label" -> ("Hlas", "Vote"),
    "vote_code" -> ("Hlas", "Vote"),
    // loyalty (th.mp/party/active_votes/rebellions/rebellion_pct)
    "mp_name" -> ("Poslanec", "MP"),
    "jmeno" -> ("Jméno", "First name"),
    "prijmeni" -> ("Příjmení", "Last name"),
    "party" -> ("Strana", "Party"),
    "active_votes" -> ("Aktivní hlasy", "Active Votes"),
    "rebellions" -> ("Rebelie", "Rebellions"),
    "rebellion_pct" -> ("Rebelie %", "Rebellion %"),
    // attendance (th.active/yes/no/abstained/passive/absent/excused)
    "active" -> ("Aktivní", "Active"),
    "yes_votes" -> ("ANO", "YES"),
    "no_votes" -> ("NE", "NO"),
    "abstained" -> ("Zdržel se", "Abstained"),
    "passive" -> ("Pasivní", "Passive"),
    "absent" -> ("Nepřítomen", "Absent"),
    "excused" -> ("Omluven", "Excused"),
    "attendance_pct" -> ("Účast %", "Attendance %"),
    // similarity (th.mp1/mp2/similarity)
    "mp1_name" -> ("Poslanec 1", "MP 1"),
    "mp2_name" -> ("Poslanec 2", "MP 2"),
    "mp1_party" -> ("Strana 1", "Party 1"),
    "mp2_party" -> ("Strana 2", "Party 2"),
    "similarity" -> ("Podobnost", "Similarity"),
    // laws (th.tisk/submitter_col/status/law_number/topics)
    "ct" -> ("Tisk", "Bill"),
    "nazev" -> ("Název", "Title"),
    "submitter" -> ("Předkladatel", "Submitter"),
    "status" -> ("Stav", "Status"),
    "status_label" -> ("Stav", "Status"),
    "law_number" -> ("Zákon č.", "Law No."),
    "topics" -> ("Témata", "Topics"))

  /** Header label for a column; unknown columns fall back to their own
    * name (reference `gettext` key-fallback).
    */
  def headerLabel(column: String, lang: String): String =
    Headers.get(column) match {
      case Some((cs, en)) => if (lang == "en") en else cs
      case None => column
    }

  /** The reference's canonical status trio (`law_service.py:6-18`);
    * anything else is a scraped free-form string served as-is.
    */
  val LawStatusEn: Map[String, String] = Map(
    "přijato" -> "passed",
    "zamítnuto" -> "rejected",
    "projednáváno" -> "in progress")

  /** Localized status label column: cs = raw value; en = the canonical
    * trio translated, unknown statuses passed through unchanged.
    */
  def statusLabel(c: Column, lang: String): Column =
    if (lang != "en") c
    else LawStatusEn.foldLeft(c) { case (acc, (cs, en)) =>
      when(c === cs, lit(en)).otherwise(acc)
    }
}
