package graft.sources

import org.apache.spark.sql.types._

/** Externally-declared schemas for the psp.cz UNL dumps (headerless —
  * column order is authoritative). Column names follow the psp.cz docs
  * exactly, mirroring reference `models/schemas.py:18-247`; types per the
  * reference dtype maps (Int64→Long, Int32→Integer, everything else
  * string — dates stay strings at ingest, exactly like the reference).
  */
object PspSchemas {

  private def schemaOf(cols: Seq[String], typed: Map[String, DataType]): StructType =
    StructType(cols.map(c => StructField(c, typed.getOrElse(c, StringType), nullable = true)))

  /** hl{year}s.unl — one row per roll-call vote (schemas.py:18-50). */
  val hlHlasovani: StructType = schemaOf(
    Seq("id_hlasovani", "id_organ", "schuze", "cislo", "bod", "datum", "cas",
      "pro", "proti", "zdrzel", "nehlasoval", "prihlaseno", "kvorum",
      "druh_hlasovani", "vysledek", "nazev_dlouhy", "nazev_kratky"),
    Map("id_hlasovani" -> LongType, "id_organ" -> IntegerType,
      "schuze" -> IntegerType, "cislo" -> IntegerType, "bod" -> IntegerType,
      "pro" -> IntegerType, "proti" -> IntegerType, "zdrzel" -> IntegerType,
      "nehlasoval" -> IntegerType, "prihlaseno" -> IntegerType,
      "kvorum" -> IntegerType))

  /** hl{year}h*.unl — one row per (MP, vote) (schemas.py:54-63). */
  val hlPoslanec: StructType = schemaOf(
    Seq("id_poslanec", "id_hlasovani", "vysledek"),
    Map("id_poslanec" -> LongType, "id_hlasovani" -> LongType))

  /** zmatecne: void vote ids (schemas.py:151-157). */
  val zmatecne: StructType = schemaOf(
    Seq("id_hlasovani"), Map("id_hlasovani" -> LongType))

  /** osoby.unl — persons (schemas.py:67-81). */
  val osoby: StructType = schemaOf(
    Seq("id_osoba", "pred", "prijmeni", "jmeno", "za", "narozeni", "pohlavi",
      "zmena", "umrti"),
    Map("id_osoba" -> LongType))

  /** poslanec.unl — MP mandates (schemas.py:85-109); id_obdobi is an ORGAN
    * id (165-174), not a period number 1-10.
    */
  val poslanec: StructType = schemaOf(
    Seq("id_poslanec", "id_osoba", "id_kraj", "id_kandidatka", "id_obdobi",
      "web", "ulice", "obec", "psc", "email", "telefon", "fax",
      "psp_telefon", "foto", "facebook"),
    Map("id_poslanec" -> LongType, "id_osoba" -> LongType,
      "id_kraj" -> IntegerType, "id_kandidatka" -> IntegerType,
      "id_obdobi" -> IntegerType))

  /** organy.unl (schemas.py:113-130); id_typ_organu==1 ⇒ parliamentary club. */
  val organy: StructType = schemaOf(
    Seq("id_organ", "organ_id_organ", "id_typ_organu", "zkratka",
      "nazev_organu_cz", "nazev_organu_en", "od_organ", "do_organ",
      "priorita", "cl_organ_base"),
    Map("id_organ" -> IntegerType, "organ_id_organ" -> IntegerType,
      "id_typ_organu" -> IntegerType))

  /** zarazeni.unl — person↔organ memberships (schemas.py:134-147). */
  val zarazeni: StructType = schemaOf(
    Seq("id_osoba", "id_of", "cl_funkce", "od_o", "do_o", "od_f", "do_f"),
    Map("id_osoba" -> LongType, "id_of" -> IntegerType))

  /** schuze.unl — sessions (schemas.py:161-175). */
  val schuze: StructType = schemaOf(
    Seq("id_schuze", "id_org", "schuze", "od_schuze", "do_schuze",
      "aktualizace", "pozvanka"),
    Map("id_schuze" -> LongType, "id_org" -> IntegerType,
      "schuze" -> IntegerType))

  /** bod_schuze.unl — agenda items (schemas.py:179-205). */
  val bodSchuze: StructType = schemaOf(
    Seq("id_bod", "id_schuze", "id_tisk", "id_typ", "bod", "uplny_naz",
      "uplny_kon", "poznamka", "id_bod_stav", "pozvanka", "rj", "pozn2",
      "druh_bodu", "id_sd", "zkratka"),
    Map("id_bod" -> LongType, "id_schuze" -> LongType, "id_tisk" -> LongType,
      "id_typ" -> IntegerType, "bod" -> IntegerType,
      "id_bod_stav" -> IntegerType, "id_sd" -> LongType))

  /** tisky.unl — parliamentary prints (schemas.py:209-247). */
  val tisky: StructType = schemaOf(
    Seq("id_tisk", "id_druh", "id_typ_zakon", "ct", "id_navrh",
      "id_predkladatel", "id_org", "id_obdobi", "id_navrhovatele",
      "predkladatel", "nazev_tisku", "datum_doruceni", "datum_rozeslani",
      "cas_doruceni", "lhuta", "id_stav", "nazev_cast", "popis",
      "dalsi_cast", "id_navrh_typ", "id_session", "id_poznamka",
      "url_tisk", "id_eklep"),
    Map("id_tisk" -> LongType, "id_druh" -> IntegerType,
      "id_typ_zakon" -> IntegerType, "ct" -> IntegerType,
      "id_navrh" -> IntegerType, "id_predkladatel" -> IntegerType,
      "id_org" -> IntegerType, "id_obdobi" -> IntegerType,
      "id_navrhovatele" -> LongType, "id_stav" -> IntegerType))

  /** Amendment fact table (native arrays instead of the reference's
    * JSON-in-string shim — reference `amendments/cache_manager.py:14-47`).
    */
  val amendments: StructType = StructType(Seq(
    StructField("period", LongType), StructField("schuze", LongType),
    StructField("bod", LongType), StructField("ct", LongType),
    StructField("letter", StringType), StructField("vote_number", LongType),
    StructField("id_hlasovani", LongType), StructField("result", StringType),
    StructField("is_revote", BooleanType), StructField("is_withdrawn", BooleanType),
    StructField("is_final_vote", BooleanType), StructField("is_leg_tech", BooleanType),
    StructField("submitter_names", ArrayType(StringType)),
    StructField("submitter_parties", ArrayType(StringType)),
    StructField("grouped_with", ArrayType(StringType)),
    StructField("parse_warnings", ArrayType(StringType)),
    StructField("parse_confidence", DoubleType)))
}
