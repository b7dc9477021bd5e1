package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet materialization cache with mtime freshness (reference
  * `data/cache.py:18-61`, S5-S7): read the cached parquet iff it is newer
  * than every file under the source dir, else re-parse and overwrite.
  * At cluster scale this pattern becomes table-format (Delta/Iceberg)
  * overwrite semantics; the freshness contract is identical.
  */
object ParquetCache {

  private def newestMtime(p: Path): Long =
    if (!Files.exists(p)) -1L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_))
        .mapToLong(f => Files.getLastModifiedTime(f).toMillis).max.orElse(-1L)
      finally s.close()
    }

  def isFresh(cachePath: String, sourcePath: String): Boolean = {
    val c = newestMtime(Paths.get(cachePath))
    val s = newestMtime(Paths.get(sourcePath))
    c >= 0 && s >= 0 && c >= s
  }

  /** Load from cache when fresh, else parse + write + return. */
  def getOrParse(
      spark: SparkSession,
      cachePath: String,
      sourcePath: String)(parse: => DataFrame): DataFrame = {
    if (isFresh(cachePath, sourcePath)) spark.read.parquet(cachePath)
    else {
      parse.write.mode("overwrite").parquet(cachePath)
      spark.read.parquet(cachePath)
    }
  }

  /** S7 cache invalidation. */
  def invalidate(cachePath: String): Unit = {
    val p = Paths.get(cachePath)
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
  }
}
