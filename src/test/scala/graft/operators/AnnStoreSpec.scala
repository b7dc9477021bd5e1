package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The write-side half of the IVF design: the index is a parquet table
  * partitioned by cell, so probing is partition-pruned I/O. This spec is
  * the 100 TB argument made checkable — the probe's scan must carry a
  * PartitionFilters entry on `cell` and read only the probed directories.
  */
class AnnStoreSpec extends SparkSpec {

  test("cell-partitioned ANN store: probe is partition-pruned and exact " +
      "within probed cells") {
    import spark.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(16)(j => ((i * 31 + j * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = Ann.sampleCentroids(vecs, "vec_id", "embedding", 8)
    val dir = Files.createTempDirectory("annstore").toString
    Ann.writeCellPartitioned(vecs, "vec_id", "embedding", cents, dir)

    // layout: one directory per cell
    val cellDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellDirs.nonEmpty && cellDirs.subsetOf(
      (0 until 8).map(c => s"cell=$c").toSet))

    val query = (0 until 16).map(j => ((5 * 31 + j * 7) % 13 - 6).toDouble)
    val probed = Ann.probeCellStore(
      spark, dir, "vec_id", "embedding", cents, query, 3, nprobe = 2)
    // collect() (not count()) so the metrics land on THIS queryExecution;
    // reused below for the exactness asserts (one job)
    val top = probed.collect()
    // REAL pruning proof (PeriodStoreSpec pattern): the cell predicate is
    // a partition filter and the scan touched only the probed cells' files
    val scan = probed.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.toString.contains("cell")),
      "cell predicate must be a partition filter, not a data filter")
    def parquetFiles(sub: String): Long = {
      val p = java.nio.file.Paths.get(dir, sub)
      if (!Files.exists(p)) 0L
      else {
        val s = Files.walk(p)
        try s.filter(q => q.toString.endsWith(".parquet")).count()
        finally s.close()
      }
    }
    val probedCells = cents.sortBy { case (_, c) =>
      -c.zip(query).map { case (x, y) => x * y }.sum /
        (math.sqrt(c.map(x => x * x).sum) * math.sqrt(query.map(x => x * x).sum))
    }.take(2).map(_._1)
    assert(scan.metrics("numFiles").value ==
      probedCells.map(c => parquetFiles(s"cell=$c")).sum,
      "scan must read exactly the probed cells' files")
    assert(cellDirs.size > 2, "pruning is only meaningful with unprobed cells present")
    // exactness within the probed cells: self vector lives in its own
    // nearest cell, which nprobe=2 always covers
    assert(top.head.getAs[Long]("vec_id") == 5L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-9)
  }
}
