package graft.psp

import java.nio.charset.Charset
import java.nio.file.{Files, Path}

import graft.SparkSpec

/** End-to-end facade test: extracted-UNL directory layout → PeriodLoader →
  * Analyzer catalog (the reference's DataReader + routes surface).
  */
class PeriodLoaderSpec extends SparkSpec {

  private lazy val root: Path = {
    val cp1250 = Charset.forName("windows-1250")
    val dir = Files.createTempDirectory("psp-root")
    def w(sub: String, name: String, lines: Seq[String]): Unit = {
      val d = dir.resolve(sub); Files.createDirectories(d)
      Files.write(d.resolve(name), lines.mkString("\n").getBytes(cp1250))
    }
    w("poslanci", "osoby.unl", Seq(
      "101||Novák|Jan||1970-01-01|M||",
      "103||Dvořák|Karel||1972-02-02|M||",
      "104||Černý|Ondřej||1974-03-03|M||",
      "106||Bílý|Tomáš||1976-04-04|M||"))
    w("poslanci", "poslanec.unl", Seq(
      "1|101|1|1|174|||||||||||", "3|103|1|1|174|||||||||||",
      "4|104|1|1|174|||||||||||", "6|106|1|1|174|||||||||||"))
    w("poslanci", "organy.unl", Seq(
      "200|0|1|ANO2011|Klub ANO||2021-01-01||1|0|",
      "201|0|1|ODS|Klub ODS||2021-01-01||1|0|"))
    w("poslanci", "zarazeni.unl", Seq(
      "101|200|0|2021-01-01|||||", "103|201|0|2021-01-01|||||",
      "104|201|0|2021-01-01|||||", "106|201|0|2021-01-01|||||"))
    w("hl-10", "hl10s.unl", Seq(
      "1|174|1|1|1|2024-01-10|10:00|2|1|0|0|3|2|N|A|První hlasování|PH1|",
      "2|174|1|2|1|2024-01-11|10:00|3|0|0|0|3|2|N|A|Druhé hlasování|PH2|"))
    w("hl-10", "hl10h1.unl", Seq(
      "1|1|A", "3|1|B", "4|1|A", "6|1|A",
      "1|2|A", "3|2|A", "4|2|A", "6|2|A"))
    w("hl-10", "zmatecne.unl", Seq.empty)
    w("schuze", "schuze.unl", Seq("900|174|1|2024-01-01|||"))
    w("schuze", "bod_schuze.unl", Seq(
      "1|900|410|1|1|Bod jedna||||||||5|"))
    w("tisky", "tisky.unl", Seq(
      "410|1|1|100|1|1|174|174|1|Vláda|Návrh zákona|2024-01-01||||1||||||||"))
    dir
  }

  test("load + full analyzer catalog over UNL files") {
    val data = PeriodLoader.load(spark, root.toString, 10)
    val an = new Analyzer(data)

    assert(data.mpInfo.count() == 4)
    val loyalty = an.loyalty().collect()
    assert(loyalty.head.getAs[String]("prijmeni") == "Dvořák")
    assert(an.attendance().count() == 4)
    assert(an.listVotes(search = Some("prvni")).count() == 1)
    assert(an.voteDetail(1L).count() == 2) // ANO + ODS rows
    val stats = an.periodStats().collect()(0)
    assert(stats.getAs[Long]("n_votes") == 2L)
    assert(stats.getAs[Long]("n_mp_records") == 8L)
    assert(stats.getAs[Long]("n_mps") == 4L)
    // tisk lookup resolved via schuze chain
    assert(data.tiskLookup.count() == 1)
  }

  test("parquet cache round trip through the loader") {
    val cache = Files.createTempDirectory("psp-cache")
    val d1 = PeriodLoader.load(spark, root.toString, 10, Some(cache.toString))
    assert(d1.votes.count() == 2)
    // second load serves from cache (directory now populated)
    val d2 = PeriodLoader.load(spark, root.toString, 10, Some(cache.toString))
    assert(d2.votes.count() == 2)
    assert(Files.list(cache).count() > 0)
  }
}
