package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-ONCE passes a 100 TB corpus runs so
  * that every later scan reads only the slice it needs (the layout
  * design the reference side-steps by holding one period in memory,
  * services/data_reader.py; at corpus scale the layout IS the index).
  *
  *  - [[writeRangeSorted]]: global range-partition + in-file sort on a
  *    key. Every output file then covers a (near-)disjoint key range,
  *    so parquet footer min/max statistics act as zone maps: a range
  *    predicate prunes whole row groups at read time — I/O follows the
  *    selected range, not the corpus. This composes with (not replaces)
  *    hash BUCKETING (plans/BucketedJoinSpec): bucketing co-locates
  *    equi-JOIN keys; range-sorting serves range SCANS.
  *  - [[fileStats]]: the auditing half — per-file footer min/max/rows
  *    for an INT64 column via the parquet-hadoop API, so a layout job
  *    can PROVE its ranges are disjoint (and a spec can pin it)
  *    instead of trusting the writer.
  */
object Layout {

  /** Write `df` as parquet range-sorted by `sortCol`: rows land in
    * `numFiles` range partitions (Spark samples range bounds — the
    * only full-data pass) and each file is internally sorted, so
    * footer min/max are tight and files overlap at most at sampled
    * boundary duplicates. Deterministic content given a deterministic
    * input ordering of equal keys (ties keep arrival order within a
    * partition; add a tiebreak column to `sortCol`s for total
    * determinism).
    */
  def writeRangeSorted(df: DataFrame, path: String, numFiles: Int,
      sortCols: String*): Unit = {
    require(numFiles > 0, s"numFiles=$numFiles must be positive")
    require(sortCols.nonEmpty, "writeRangeSorted needs at least one sort column")
    val cols = sortCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** The 2-D Morton (Z-order) code of two NON-NEGATIVE integer
    * columns: the low `bits` bits of `a` and `b` interleaved
    * (a → even positions, b → odd), a 2·bits-bit space-filling-curve
    * key. Values ≥ 2^bits fold onto their low bits — size `bits` to
    * cover the column domains (21 bits each stays inside 63-bit
    * longs with room to spare). Pure codegen'd shift/mask
    * arithmetic, exactly replayable in SQL on any engine with
    * integer division.
    */
  def mortonCode(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits=$bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** [[writeRangeSorted]] along the [[mortonCode]] curve — the
    * MULTI-column zone-map layout: range-partitioning one column
    * leaves the other's per-file min/max spanning the whole domain,
    * but z-ordering bounds BOTH (each file covers a rectangle-ish
    * cell of the (a, b) grid), so range predicates on EITHER column
    * — and especially rectangle predicates on both — prune files at
    * read time. This is the standard lakehouse multi-dimensional
    * clustering recipe (Delta/Iceberg `ZORDER BY`), built from the
    * same two Spark primitives as the sorted layout: one
    * `repartitionByRange` pass on the computed key + in-file sort.
    * The z column itself is dropped before the write — the layout,
    * not an extra column, carries the structure.
    */
  def writeZOrderSorted(df: DataFrame, path: String, numFiles: Int,
      colA: String, colB: String, bits: Int = 21): Unit =
    zOrderWriter(df, numFiles, colA, colB, bits)
      .write.mode("overwrite").parquet(path)

  /** The shared z-order write recipe (morton key → range partition →
    * in-file sort → key dropped) — ONE copy, so the plain and
    * bloom-indexed layouts can never drift apart.
    */
  private def zOrderWriter(df: DataFrame, numFiles: Int,
      colA: String, colB: String, bits: Int): DataFrame = {
    require(numFiles > 0, s"numFiles=$numFiles must be positive")
    df.withColumn("__z", mortonCode(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** [[writeZOrderSorted]] AND [[writeBloomIndexed]] in ONE write —
    * the combined layout a real corpus table wants: the z-order
    * clustering serves RECTANGLE scans on (colA, colB) via footer
    * min/max zone maps, while the bloom filter on a third, unsorted
    * high-cardinality column serves exact point lookups on the very
    * same files. The two mechanisms are independent parquet features
    * (partition/sort order vs per-row-group filter metadata), so
    * neither weakens the other — LayoutSpec MEASURES both prunings on
    * one written table.
    */
  def writeZOrderBloom(df: DataFrame, path: String, numFiles: Int,
      colA: String, colB: String, bloomCol: String, expectedNdv: Long,
      bits: Int = 21): Unit = {
    require(expectedNdv > 0, s"expectedNdv=$expectedNdv must be positive")
    zOrderWriter(df, numFiles, colA, colB, bits)
      .write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$bloomCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$bloomCol",
        expectedNdv.toString)
      .parquet(path)
  }

  /** Write parquet with a PER-ROW-GROUP BLOOM FILTER on `column` —
    * the point-lookup complement of the zone-map layouts: min/max
    * stats prune RANGE scans only when the layout is sorted, but a
    * high-cardinality column that arrives unsorted (ids in a
    * round-robin corpus) has every file spanning the whole domain and
    * stats prune nothing. The bloom filter answers "is this exact
    * value possibly here?" per row group, so an equality lookup skips
    * every file that doesn't contain the key — no re-sort, no second
    * copy of the data. `expectedNdv` sizes the filter (parquet-mr's
    * standard knob); reads need no configuration — Spark's parquet
    * filter pushdown consults the filters automatically
    * (spec-MEASURED in LayoutSpec, same discipline as the zone-map
    * and rectangle-pruning claims).
    *
    * `fpp` is the filter's false-positive probability — the ONE knob
    * that prices this layout: tighter fpp costs filter bytes per row
    * group (split-block bloom size ≈ -ndv·ln(fpp)/ln²2 bits) and buys
    * skip rate on non-member probes (a false positive reads a whole
    * row group for nothing). 0.01 is parquet-mr's default, stated
    * explicitly so the LayoutSpec FPP sweep and production calls share
    * one contract; the sweep (bytes-vs-measured-skip-rate per ladder
    * point, planted non-member probe set) is the knob's pricing read.
    */
  def writeBloomIndexed(df: DataFrame, path: String, numFiles: Int,
      column: String, expectedNdv: Long, fpp: Double = 0.01): Unit = {
    require(numFiles > 0, s"numFiles=$numFiles must be positive")
    require(expectedNdv > 0, s"expectedNdv=$expectedNdv must be positive")
    require(fpp > 0 && fpp < 1, s"fpp=$fpp must be in (0, 1)")
    df.repartition(numFiles)
      .write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$column", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$column",
        expectedNdv.toString)
      .option(s"parquet.bloom.filter.fpp#$column", fpp.toString)
      .parquet(path)
  }

  /** One file's footer statistics for a column: `range` is None when NO
    * row group in the file carries min/max statistics for it — distinct
    * from a real range, so a layout audit can never mistake the
    * untouched (Long.MaxValue, Long.MinValue) accumulator sentinels for
    * an (inverted) data range.
    */
  case class FileColStats(file: String, range: Option[(Long, Long)],
      rows: Long) {
    def min: Long = range.getOrElse(sys.error(
      s"$file has no footer statistics for the audited column"))._1
    def max: Long = range.getOrElse(sys.error(
      s"$file has no footer statistics for the audited column"))._2
  }

  /** Per-file parquet footer statistics for an INT64 column:
    * fileName-sorted [[FileColStats]]. Reads ONLY footers (metadata
    * I/O, no row decode) — cheap enough to audit a whole table after a
    * layout job.
    */
  def fileStats(spark: SparkSession, path: String,
      column: String): Seq[FileColStats] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val files = fs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    files.toSeq.map { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = reader.getFooter.getBlocks
        var lo = Long.MaxValue
        var hi = Long.MinValue
        var rows = 0L
        blocks.forEach { b =>
          rows += b.getRowCount
          b.getColumns.forEach { c =>
            if (c.getPath.toDotString == column && c.getStatistics != null &&
                !c.getStatistics.isEmpty) {
              c.getStatistics.genericGetMin match {
                case m: java.lang.Long => lo = math.min(lo, m.longValue())
                case m: java.lang.Integer => lo = math.min(lo, m.longValue())
                case _ => ()
              }
              c.getStatistics.genericGetMax match {
                case m: java.lang.Long => hi = math.max(hi, m.longValue())
                case m: java.lang.Integer => hi = math.max(hi, m.longValue())
                case _ => ()
              }
            }
          }
        }
        FileColStats(p.getName,
          if (lo <= hi) Some((lo, hi)) else None, rows)
      } finally reader.close()
    }
  }
}
