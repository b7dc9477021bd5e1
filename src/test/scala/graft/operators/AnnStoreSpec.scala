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
    // partition pruning visible in the executed scan
    probed.collect()
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"),
      s"expected a cell partition filter in:\n$scan")
    // exactness within the probed cells: self vector lives in its own
    // nearest cell, which nprobe=2 always covers
    val top = probed.collect()
    assert(top.head.getAs[Long]("vec_id") == 5L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-9)
  }
}
