package graft.sources

import java.nio.charset.Charset
import java.nio.file.{Files, Path}

import org.apache.spark.sql.types._

import graft.SparkSpec

/** UNL golden-byte tests mirroring reference tests/unit/test_parser.py
  * (cases catalogued in /root/repo/FIXTURES.md section 5).
  */
class UnlReaderSpec extends SparkSpec {

  private val cp1250 = Charset.forName("windows-1250")

  private def writeUnl(lines: Seq[String]): Path = {
    val f = Files.createTempFile("graft-unl", ".unl")
    Files.write(f, lines.mkString("\n").getBytes(cp1250))
    f
  }

  private def schema3(t1: DataType = StringType, t2: DataType = StringType,
      t3: DataType = StringType) = StructType(Seq(
    StructField("a", t1), StructField("b", t2), StructField("c", t3)))

  test("basic parse: 2 rows x 3 cols, trailing pipe dropped") {
    val f = writeUnl(Seq("1|Jan|Novák|", "2|Petr|Svoboda|"))
    val df = UnlReader.read(spark, f.toString, schema3())
    val rows = df.collect()
    assert(rows.length == 2)
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(rows(0).getString(2) == "Novák")
  }

  test("windows-1250 diacritics decode intact") {
    val f = writeUnl(Seq("1|Dvořák|Černý|", "řžůěšč|ýáí|ňťď|"))
    val rows = UnlReader.read(spark, f.toString, schema3()).collect()
    assert(rows.map(_.getString(1)).toSet == Set("Dvořák", "ýáí"))
    assert(rows.map(_.getString(0)).contains("řžůěšč"))
    assert(rows.map(_.getString(2)).contains("ňťď"))
  }

  test("dtype cast with whitespace strip") {
    val f = writeUnl(Seq(" 42 |  100  |text|"))
    val row = UnlReader.read(spark, f.toString,
      schema3(LongType, IntegerType, StringType)).collect()(0)
    assert(row.getLong(0) == 42L)
    assert(row.getInt(1) == 100)
    assert(row.getString(2) == "text")
  }

  test("bad cast yields null, not an error (strict=False parity)") {
    val f = writeUnl(Seq("oops|x|text|"))
    val row = UnlReader.read(spark, f.toString,
      schema3(LongType, IntegerType, StringType)).collect()(0)
    assert(row.isNullAt(0))
    assert(row.isNullAt(1))
    assert(row.getString(2) == "text")
  }

  test("empty file: 0 rows, declared columns present") {
    val f = writeUnl(Seq.empty)
    val df = UnlReader.read(spark, f.toString, schema3())
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 0)
  }

  test("literal quotes kept verbatim (no CSV quoting)") {
    val f = writeUnl(Seq("1|He said \"hello\"|done|"))
    val row = UnlReader.read(spark, f.toString, schema3()).collect()(0)
    assert(row.getString(1) == "He said \"hello\"")
  }

  test("multi-file glob unions by position") {
    val dir = Files.createTempDirectory("graft-unl-glob")
    Files.write(dir.resolve("h1.unl"), "1|x|y|".getBytes(cp1250))
    Files.write(dir.resolve("h2.unl"), "2|p|q|".getBytes(cp1250))
    val df = UnlReader.read(spark, dir.toString + "/h*.unl", schema3())
    assert(df.count() == 2)
  }

  test("real table schema: hl_hlasovani shape") {
    val f = writeUnl(Seq(
      "4001|165|1|10|3|2024-01-15|10:30|95|40|5|15|155|78|N|A|Vote about things|VAT|"))
    val df = UnlReader.read(spark, f.toString, PspSchemas.hlHlasovani)
    val r = df.collect()(0)
    assert(r.getAs[Long]("id_hlasovani") == 4001L)
    assert(r.getAs[Int]("pro") == 95)
    assert(r.getAs[String]("vysledek") == "A")
    assert(r.getAs[String]("nazev_kratky") == "VAT")
  }
}
