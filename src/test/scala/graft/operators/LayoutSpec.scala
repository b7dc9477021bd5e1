package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("writeRangeSorted produces files with DISJOINT ordered key " +
      "ranges (footer-stats proof) and loses no rows") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    Layout.writeRangeSorted(docs, dir, numFiles = 4, "doc_id")
    val stats = Layout.fileStats(spark, dir, "doc_id")
    assert(stats.length == 4, stats.toString)
    assert(stats.map(_._4).sum == docs.count())
    // ranges sorted by min must not overlap: every file's min exceeds
    // the previous file's max — the property zone-map pruning needs
    val ordered = stats.sortBy(_._2)
    for (Seq(a, b) <- ordered.sliding(2))
      assert(a._3 < b._2, s"overlap: $a vs $b")
    // read-back parity
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.agg(sum(col("doc_id"))).head.getLong(0) ==
      docs.agg(sum(col("doc_id"))).head.getLong(0))
  }

  test("zone maps engage: a range predicate over the sorted layout " +
      "row-group-prunes the scan (scan emits only the matching file's " +
      "rows) while the same read over a round-robin layout emits " +
      "everything") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count()
    val sorted = java.nio.file.Files.createTempDirectory("layout-s").toString
    val shuffled = java.nio.file.Files.createTempDirectory("layout-r").toString
    Layout.writeRangeSorted(docs, sorted, numFiles = 4, "doc_id")
    // adversarial contrast: interleave ids across files (doc_id % 4),
    // so every file's [min, max] spans the whole domain
    docs.repartition(4, col("doc_id") % 4)
      .write.mode("overwrite").parquet(shuffled)

    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("doc_id") < 100)
      df.collect()
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty)
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val sortedRows = scanRows(sorted)
    val shuffledRows = scanRows(shuffled)
    // the sorted layout's scan emits at most one file's worth; the
    // interleaved layout cannot prune and emits the whole table
    assert(sortedRows <= n / 4 + 64, s"sorted scan emitted $sortedRows")
    assert(shuffledRows == n, s"interleaved scan emitted $shuffledRows")
  }
}
