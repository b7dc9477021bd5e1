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
    assert(stats.map(_.rows).sum == docs.count())
    assert(stats.forall(_.range.isDefined), stats.toString)
    // ranges sorted by min must not overlap: every file's min exceeds
    // the previous file's max — the property zone-map pruning needs
    val ordered = stats.sortBy(_.min)
    for (Seq(a, b) <- ordered.sliding(2))
      assert(a.max < b.min, s"overlap: $a vs $b")
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

  test("mortonCode matches a scalar bit-interleave replay") {
    val session = spark
    import session.implicits._
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (1023L, 17L),
      (1L << 20, 1L << 20), ((1L << 21) - 1L, (1L << 21) - 1L))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.mortonCode(col("a"), col("b"), 21).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    for ((a, b) <- rows)
      assert(got((a, b)) == ref(a, b, 21), s"($a, $b)")
    // the canonical small cases: (1,0)->1, (0,1)->2, (1,1)->3
    assert(ref(1, 1, 4) == 3L && got((1L, 0L)) == 1L && got((0L, 1L)) == 2L)
  }

  test("writeZOrderSorted bounds BOTH columns per file (footer-stats " +
      "proof on a dense grid) and a rectangle predicate prunes the scan " +
      "that an interleaved layout cannot") {
    val session = spark
    import session.implicits._
    // dense 32x32 grid: 16 z-range files of ~64 consecutive codes each
    // cover at most a couple of 8x8 curve cells -> both spans stay far
    // below the 31-value domain
    val grid = (0 until 1024).map(i => (i.toLong % 32, i.toLong / 32))
      .toDF("a", "b")
    val zdir = java.nio.file.Files.createTempDirectory("layout-z").toString
    Layout.writeZOrderSorted(grid, zdir, numFiles = 16, "a", "b", bits = 5)
    val aStats = Layout.fileStats(spark, zdir, "a")
    val bStats = Layout.fileStats(spark, zdir, "b")
    assert(aStats.map(_.rows).sum == 1024L)
    for (s <- aStats)
      assert(s.max - s.min <= 24, s"a-span not bounded: $s")
    for (s <- bStats)
      assert(s.max - s.min <= 24, s"b-span not bounded: $s")

    // interleaved baseline: every file spans the whole domain on both
    val flat = java.nio.file.Files.createTempDirectory("layout-f").toString
    grid.repartition(16) // round robin: every file spans both domains
      .write.mode("overwrite").parquet(flat)
    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("a") < 8 && col("b") < 8)
      assert(df.count() == 64L)
      df.collect()
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val zRows = scanRows(zdir)
    val flatRows = scanRows(flat)
    assert(zRows <= 256, s"z-order scan emitted $zRows of 1024")
    assert(flatRows == 1024L, s"interleaved scan emitted $flatRows")
  }

  test("writeBloomIndexed: an equality lookup on an UNSORTED " +
      "high-cardinality column skips the row groups that cannot hold " +
      "the key (measured), where the same layout without the filter " +
      "reads everything") {
    val session = spark
    import session.implicits._
    // every file spans the whole id domain -> stats prune nothing
    val ids = (0L until 4096L).map(i => (i, s"payload$i")).toDF("id", "p")
    val bdir = java.nio.file.Files.createTempDirectory("layout-b").toString
    val ndir = java.nio.file.Files.createTempDirectory("layout-n").toString
    Layout.writeBloomIndexed(ids, bdir, numFiles = 8, "id",
      expectedNdv = 4096L)
    ids.repartition(8).write.mode("overwrite").parquet(ndir)
    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("id") === 1234L)
      assert(df.count() == 1L)
      df.collect()
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val bloomRows = scanRows(bdir)
    val plainRows = scanRows(ndir)
    assert(plainRows >= 4096L / 8,
      s"baseline must read at least one whole file: $plainRows")
    assert(bloomRows < plainRows,
      s"bloom must skip row groups: bloom=$bloomRows plain=$plainRows")
  }

  test("bloom FPP sweep: per ladder point, filter bytes (cost) vs " +
      "measured skip rate on a planted NON-MEMBER probe set (quality) " +
      "— scanned rows non-increasing and bytes non-decreasing as fpp " +
      "tightens, strict between the ladder ends") {
    val session = spark
    import session.implicits._
    // same adversarial shape as the point-lookup test: every file
    // spans the whole id domain, so ONLY the bloom filter can skip.
    // Two experiment-design traps, both measured into this arm's shape:
    // (a) expectedNdv must be the PER-ROW-GROUP truth (4096/8 = 512),
    // not the table total — overstating it 8x oversizes the filter and
    // drives the real FP rate to ~fpp^8, silencing the knob under test;
    // (b) the planted non-members must sit INSIDE every row group's
    // [min, max] — out-of-domain probes are pruned by footer stats
    // before any bloom is consulted (both mis-designs measured ZERO
    // false positives at fpp=0.25). So: store even ids, probe odd.
    val ids = (0L until 4096L).map(i => (2 * i, s"payload$i"))
      .toDF("id", "p")
    val probes = (0 until 40).map(i => 2L * i * 100L + 1L)
    def dirBytes(path: String): Long =
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    def nonMemberScanRows(path: String): Long = probes.map { k =>
      val df = spark.read.parquet(path).filter(col("id") === k)
      assert(df.count() == 0L, s"probe $k must be a non-member")
      df.collect()
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      scans.map(_.metrics("numOutputRows").value).sum
    }.sum
    val ladder = Seq(0.25, 0.05, 0.01, 0.001)
    val sweep = ladder.map { fpp =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"layout-fpp").toString
      Layout.writeBloomIndexed(ids, dir, numFiles = 8, "id",
        expectedNdv = 512L, fpp = fpp)
      val bytes = dirBytes(dir)
      val scanned = nonMemberScanRows(dir)
      info(f"fpp=$fpp%.3f: $bytes bytes, $scanned false-positive rows " +
        f"over ${probes.size} non-member probes")
      (fpp, bytes, scanned)
    }
    // quality: skip rate improves (scanned rows never increase) as fpp
    // tightens down the ladder
    for (Seq((fa, _, sa), (fb, _, sb)) <- sweep.sliding(2))
      assert(sa >= sb, s"fpp $fa -> $fb: scanned rows rose $sa -> $sb")
    // cost: filter bytes never shrink as fpp tightens
    for (Seq((fa, ba, _), (fb, bb, _)) <- sweep.sliding(2))
      assert(bb >= ba, s"fpp $fa -> $fb: bytes shrank $ba -> $bb")
    // strict trade between the ladder ends: the loose end pays real
    // false-positive reads, the tight end pays real bytes
    assert(sweep.head._3 > sweep.last._3,
      s"loose fpp must show false positives: ${sweep.map(_._3)}")
    assert(sweep.last._2 > sweep.head._2,
      s"tight fpp must cost bytes: ${sweep.map(_._2)}")
  }

  test("writeZOrderBloom: rectangle pruning on the z-ordered pair AND " +
      "bloom point-lookup pruning on a third unsorted column both hold, " +
      "MEASURED on the same written files — the layouts compose rather " +
      "than interfere") {
    val session = spark
    import session.implicits._
    // dense 32x32 grid; id is a bijective scramble (odd multiplier mod
    // 2^10), so it is high-cardinality and UNSORTED relative to the
    // z-order — its per-file min/max spans the domain and only the
    // bloom filter can prune the point lookup
    val grid = (0 until 1024).map { i =>
      (i.toLong % 32, i.toLong / 32, (i.toLong * 769L) % 1024L)
    }.toDF("a", "b", "id")
    val both = java.nio.file.Files.createTempDirectory("layout-zb").toString
    val noBloom = java.nio.file.Files.createTempDirectory("layout-z0").toString
    Layout.writeZOrderBloom(grid, both, numFiles = 16, "a", "b", "id",
      expectedNdv = 1024L, bits = 5)
    Layout.writeZOrderSorted(grid, noBloom, numFiles = 16, "a", "b",
      bits = 5)
    def scanRows(path: String,
        pred: org.apache.spark.sql.Column, expect: Long): Long = {
      val df = spark.read.parquet(path).filter(pred)
      assert(df.count() == expect)
      df.collect()
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      scans.map(_.metrics("numOutputRows").value).sum
    }
    // rectangle scan: zone-map pruning unchanged by the bloom option
    val rect = scanRows(both, col("a") < 8 && col("b") < 8, 64L)
    assert(rect <= 256, s"z-order rectangle scan emitted $rect of 1024")
    // point lookup on id: the bloom filter skips non-containing row
    // groups; the same z-order layout without it cannot prune (every
    // file's id range spans the domain)
    val bloomRows = scanRows(both, col("id") === 777L, 1L)
    val plainRows = scanRows(noBloom, col("id") === 777L, 1L)
    assert(plainRows == 1024L,
      s"bloomless z-order must read everything: $plainRows")
    assert(bloomRows < plainRows && bloomRows <= 256,
      s"bloom must skip row groups on the combined layout: $bloomRows")
    // both file stats agree the id ranges are unprunable — the bloom,
    // not zone maps, did the point-lookup work
    val idStats = Layout.fileStats(spark, both, "id")
    assert(idStats.forall(s => s.max - s.min > 512),
      s"id must span the domain per file: $idStats")
  }

  test("fileStats reports range=None (not inverted sentinels) for a " +
      "column with no footer statistics, and the accessors fail loudly") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout-ns").toString
    (1L to 8L).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    val absent = Layout.fileStats(spark, dir, "no_such_column")
    assert(absent.nonEmpty && absent.forall(_.range.isEmpty), absent.toString)
    assert(absent.map(_.rows).sum == 8L)
    val e = intercept[RuntimeException] { absent.head.min }
    assert(e.getMessage.contains("no footer statistics"), e.getMessage)
    val present = Layout.fileStats(spark, dir, "id")
    assert(present.head.range.contains((1L, 8L)), present.toString)
  }
}
