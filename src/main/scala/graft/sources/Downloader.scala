package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.zip.ZipInputStream

/** S1/S2: psp.cz open-data ZIP fetch + extract (reference
  * `data/downloader.py:30-67`, `config.py:11-17`) — the driver utility
  * that makes [[graft.psp.PeriodLoader]] end-to-end runnable against a
  * real dump. Deliberately outside the engine: plain JDK HTTP + zip, no Spark.
  *
  * Cache protocol matches the reference: a raw/ ZIP is reused unless
  * `force`; an extracted/ dir is reused while it is newer than its ZIP;
  * extraction touches the dir mtime so the parquet-cache layer
  * ([[ParquetCache]]) sees fresh data.
  */
object Downloader {

  val PspBaseUrl = "https://www.psp.cz/eknih/cdrom/opendata"

  /** Reference `config.py` PERIOD_YEARS (ZIP filename year per period). */
  val PeriodYears: Map[Int, String] = graft.serving.GraftServer.PeriodYears

  private lazy val client = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(java.time.Duration.ofSeconds(30))
    .build()

  /** Download `url` to `dest` unless a cached copy exists (py:30-46). */
  def downloadFile(url: String, dest: Path, force: Boolean = false): Path = {
    if (Files.exists(dest) && !force) return dest
    Files.createDirectories(dest.getParent)
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(java.time.Duration.ofSeconds(120)).GET().build()
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".part")
    val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(tmp))
    if (resp.statusCode() / 100 != 2) {
      Files.deleteIfExists(tmp)
      throw new java.io.IOException(s"GET $url -> HTTP ${resp.statusCode()}")
    }
    Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING)
    dest
  }

  /** Extract a ZIP into `destDir/<name>` (py:49-67): skipped while the
    * extracted dir is newer than the ZIP; zip-slip entries are rejected;
    * the dir mtime is touched after extraction so mtime-based caches
    * invalidate.
    */
  def extractZip(zipPath: Path, destDir: Path, name: String): Path = {
    val extractTo = destDir.resolve(name)
    if (Files.exists(extractTo) &&
        Files.getLastModifiedTime(zipPath).compareTo(
          Files.getLastModifiedTime(extractTo)) <= 0)
      return extractTo
    Files.createDirectories(extractTo)
    val zin = new ZipInputStream(Files.newInputStream(zipPath))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        val target = extractTo.resolve(entry.getName).normalize()
        if (!target.startsWith(extractTo))
          throw new java.io.IOException(
            s"zip entry escapes extraction dir: ${entry.getName}")
        if (entry.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          Files.copy(zin, target, StandardCopyOption.REPLACE_EXISTING)
        }
        zin.closeEntry()
        entry = zin.getNextEntry
      }
    } finally zin.close()
    Files.setLastModifiedTime(extractTo,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    extractTo
  }

  private def fetchAndExtract(url: String, zipName: String, dirName: String,
      cacheDir: Path, force: Boolean): Path = {
    val zip = downloadFile(url, cacheDir.resolve("raw").resolve(zipName), force)
    extractZip(zip, cacheDir.resolve("extracted"), dirName)
  }

  /** Fetch every table family one period needs and lay it out exactly as
    * [[graft.psp.PeriodLoader.load]] expects (`<root>/poslanci`,
    * `<root>/hl-<period>`, `<root>/schuze`, `<root>/tisky`). Returns the
    * extracted root.
    */
  def downloadPeriod(period: Int, cacheDir: Path, force: Boolean = false): Path = {
    val year = PeriodYears.getOrElse(period,
      throw new IllegalArgumentException(s"Unknown period $period"))
    fetchAndExtract(s"$PspBaseUrl/poslanci.zip", "poslanci.zip", "poslanci",
      cacheDir, force)
    fetchAndExtract(s"$PspBaseUrl/hl-${year}ps.zip", s"hl-${year}ps.zip",
      s"hl-$period", cacheDir, force)
    fetchAndExtract(s"$PspBaseUrl/schuze.zip", "schuze.zip", "schuze",
      cacheDir, force)
    fetchAndExtract(s"$PspBaseUrl/tisky.zip", "tisky.zip", "tisky",
      cacheDir, force)
    cacheDir.resolve("extracted")
  }
}
