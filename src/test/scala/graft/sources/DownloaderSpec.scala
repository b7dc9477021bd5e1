package graft.sources

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

class DownloaderSpec extends AnyFunSuite {

  private def makeZip(dest: Path, entries: Map[String, String]): Path = {
    val zout = new ZipOutputStream(Files.newOutputStream(dest))
    try entries.foreach { case (name, content) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("windows-1250"))
      zout.closeEntry()
    } finally zout.close()
    dest
  }

  test("extractZip unpacks a fixture dump into the PeriodLoader layout " +
      "and is idempotent while the dir is newer than the zip") {
    val tmp = Files.createTempDirectory("dl")
    val zip = makeZip(tmp.resolve("poslanci.zip"), Map(
      "osoby.unl" -> "1|Novák|Jan|\n",
      "poslanec.unl" -> "1|1|165|\n"))
    val out = Downloader.extractZip(zip, tmp.resolve("extracted"), "poslanci")
    assert(Files.exists(out.resolve("osoby.unl")))
    assert(new String(Files.readAllBytes(out.resolve("osoby.unl")),
      "windows-1250").startsWith("1|Novák"))

    // marker file survives a second call (extracted dir is newer -> skip)
    Files.writeString(out.resolve("marker"), "x")
    val again = Downloader.extractZip(zip, tmp.resolve("extracted"), "poslanci")
    assert(Files.exists(again.resolve("marker")))

    // a NEWER zip forces re-extraction and touches the dir mtime
    Files.setLastModifiedTime(zip,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(out).toMillis + 10000))
    val before = Files.getLastModifiedTime(out).toMillis
    Downloader.extractZip(zip, tmp.resolve("extracted"), "poslanci")
    assert(Files.getLastModifiedTime(out).toMillis >= before)
  }

  test("zip-slip entries are rejected") {
    val tmp = Files.createTempDirectory("dl-slip")
    val zip = makeZip(tmp.resolve("evil.zip"), Map("../escape.txt" -> "x"))
    val err = intercept[java.io.IOException] {
      Downloader.extractZip(zip, tmp.resolve("extracted"), "evil")
    }
    assert(err.getMessage.contains("escapes"))
    assert(!Files.exists(tmp.resolve("escape.txt")))
  }

  test("downloadFile reuses a cached copy without touching the network") {
    val tmp = Files.createTempDirectory("dl-cache")
    val dest = tmp.resolve("raw").resolve("cached.zip")
    Files.createDirectories(dest.getParent)
    Files.writeString(dest, "cached-bytes")
    // an unroutable URL proves no request is made on the cache path
    val out = Downloader.downloadFile("http://127.0.0.1:9/none.zip", dest)
    assert(Files.readString(out) == "cached-bytes")
  }

  test("downloadPeriod fetches and lays out a real psp.cz dump " +
      "(integration; skipped offline)") {
    assume(sys.env.get("SPARK_GRAFT_ONLINE").contains("1"),
      "set SPARK_GRAFT_ONLINE=1 to run the network integration test")
    val tmp = Files.createTempDirectory("dl-online")
    val root = Downloader.downloadPeriod(9, tmp)
    assert(Files.exists(root.resolve("poslanci").resolve("osoby.unl")))
    assert(Files.exists(root.resolve("hl-9")))
    assert(Files.exists(root.resolve("schuze")))
    assert(Files.exists(root.resolve("tisky")))
  }
}
