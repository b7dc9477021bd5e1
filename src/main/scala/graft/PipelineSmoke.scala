package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

import graft.psp._
import graft.sources.{PspSchemas, UnlReader}

/** End-to-end drive of the reference-parity slice: UNL bytes on disk →
  * UnlReader → MpBuilder → Loyalty/Attendance → results. Temporary
  * verification harness (SURVEY 7.2).
  */
object PipelineSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cp1250 = Charset.forName("windows-1250")
    val dir = Files.createTempDirectory("psp-unl")
    def write(name: String, lines: Seq[String]): Path = {
      val p = dir.resolve(name)
      Files.write(p, lines.mkString("\n").getBytes(cp1250)); p
    }
    // persons / mandates / organs / memberships (period 10 = organ 174)
    write("osoby.unl", Seq(
      "101||Novák|Jan||1970-01-01|M||",
      "103||Dvořák|Karel||1972-02-02|M||",
      "104||Černý|Ondřej||1974-03-03|M||",
      "106||Bílý|Tomáš||1976-04-04|M||"))
    write("poslanec.unl", Seq(
      "1|101|1|1|174|||||||||||",
      "3|103|1|1|174|||||||||||",
      "4|104|1|1|174|||||||||||",
      "6|106|1|1|174|||||||||||"))
    write("organy.unl", Seq(
      "200|0|1|ANO2011|Klub ANO||2021-01-01||1|0|",
      "201|0|1|ODS|Klub ODS||2021-01-01||1|0|",
      "999|0|5|VV|Výbor||2021-01-01||1|0|"))
    write("zarazeni.unl", Seq(
      "101|200|0|2021-01-01|||||",
      "103|201|0|2021-01-01|||||",
      "104|201|0|2021-01-01|||||",
      "106|201|0|2021-01-01|||||"))
    // 3 votes; ODS = MPs 3,4,6. Vote 1: MP3=B vs A,A -> MP3 rebels 1/3.
    write("hl10s.unl", Seq(
      "1|174|1|1|1|2024-01-10|10:00|2|1|0|0|3|2|N|A|První hlasování|PH1|",
      "2|174|1|2|2|2024-01-11|10:00|3|0|0|0|3|2|N|A|Druhé hlasování|PH2|",
      "3|174|1|3|3|2024-01-12|10:00|3|0|0|0|3|2|N|A|Třetí hlasování|PH3|"))
    write("hl10h1.unl", Seq(
      "1|1|A", "3|1|B", "4|1|A", "6|1|A",
      "1|2|A", "3|2|A", "4|2|A", "6|2|A"))
    write("hl10h2.unl", Seq(
      "1|3|A", "3|3|A", "4|3|A", "6|3|A"))
    write("zmatecne.unl", Seq.empty)

    val persons = UnlReader.read(spark, dir.resolve("osoby.unl").toString, PspSchemas.osoby)
    val mps = UnlReader.read(spark, dir.resolve("poslanec.unl").toString, PspSchemas.poslanec)
    val organs = UnlReader.read(spark, dir.resolve("organy.unl").toString, PspSchemas.organy)
    val member = UnlReader.read(spark, dir.resolve("zarazeni.unl").toString, PspSchemas.zarazeni)
    val votes = UnlReader.read(spark, dir.resolve("hl10s.unl").toString, PspSchemas.hlHlasovani)
    val mpVotes = UnlReader.read(spark, dir.toString + "/hl10h*.unl", PspSchemas.hlPoslanec)
    val voids = UnlReader.read(spark, dir.resolve("zmatecne.unl").toString, PspSchemas.zmatecne)

    val mpInfo = MpBuilder.buildMpInfo(10, mps, persons, organs, member)
    println("=== mp_info (note ANO2011 -> ANO alias) ===")
    mpInfo.show(false)

    println("=== loyalty (MP votes from a 2-file glob) ===")
    val loyalty = Loyalty.computeLoyalty(votes, mpVotes, voids, mpInfo, top = 10)
    loyalty.show(false)

    println("=== attendance ===")
    Attendance.computeAttendance(mpVotes, voids, mpInfo, top = 10).show(false)

    println("=== probe: party filter 'ods' (lowercase) ===")
    Loyalty.computeLoyalty(votes, mpVotes, voids, mpInfo, top = 10, Some("ods")).show(false)

    println("=== probe: void vote 1 excluded -> rebellion vanishes ===")
    import spark.implicits._
    val voids1 = Seq(1L).toDF("id_hlasovani")
    Loyalty.computeLoyalty(votes, mpVotes, voids1, mpInfo, top = 10).show(false)

    println("=== probe: diacritic search 'treti' matches 'Třetí' ===")
    VotesBrowser.listVotes(spark, votes, voids, search = Some("treti")).show(false)
    spark.stop()
  }
}
