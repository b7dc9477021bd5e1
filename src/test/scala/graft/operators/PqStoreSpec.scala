package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The IVFADC store's 100 TB argument, made checkable (the AnnStoreSpec
  * pattern one level further): a probe must (a) partition-prune to the
  * probed cells' directories, (b) read CODES, never vectors — the store
  * has no vector column to read — and (c) rank identically to the
  * in-memory [[Pq.ivfAdcTopK]] on the same data.
  */
class PqStoreSpec extends SparkSpec {

  test("IVFADC store: probe is partition-pruned, reads codes only, and " +
      "equals ivfAdcTopK row-for-row") {
    import spark.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(j => (((i * 31 + j * 7) % 13 - 6) * 0.4f)))
    }.toDF("vec_id", "embedding")
    val cents = Ann.sampleCentroids(vecs, "vec_id", "embedding", 8)
    val assigned = Ann.assignCells(vecs, "embedding", cents)
    val model = Pq.fitResiduals(assigned, "vec_id", "embedding", "cell",
      cents, dim = 8, m = 4, k = 4, iters = 2)
    val dir = Files.createTempDirectory("ivfadcstore").toString
    Pq.writeIvfAdcIndex(vecs, "vec_id", "embedding", cents, model, dir)

    // layout: one directory per cell, codes only
    val cellDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellDirs.nonEmpty)
    val stored = spark.read.parquet(dir)
    assert(stored.columns.sorted.toSeq == Seq("cell", "code", "vec_id"),
      s"store must hold codes, not vectors: ${stored.columns.toSeq}")

    val query = (0 until 8).map(j => (((5 * 31 + j * 7) % 13 - 6) * 0.4))
      .toArray
    val probed = Pq.probeIvfAdcStore(spark, dir, "vec_id", cents, model,
      query, topK = 5, nprobe = 2)
    val got = probed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // pruning proof: cell predicate is a partition filter and the scan
    // touched only the probed cells' files (the probe plan ends in a
    // windowed rank, so AQE wraps it — descend into the adaptive plan)
    def findScan(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          Some(f)
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => findScan(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => findScan(q.plan)
        case other =>
          other.children.iterator.map(findScan)
            .collectFirst { case Some(f) => f }
      }
    val scan = findScan(probed.queryExecution.executedPlan).get
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
    val probes = Ann.probeCells(cents, query.toSeq, 2)
    assert(scan.metrics("numFiles").value ==
      probes.map(c => parquetFiles(s"cell=$c")).sum,
      "scan must read exactly the probed cells' files")
    assert(cellDirs.size > 2,
      "pruning is only meaningful with unprobed cells present")

    // ranking parity with the in-memory read path
    val want = Pq.ivfAdcTopK(assigned, "vec_id", "embedding", "cell",
        cents, model, query, topK = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty,
      s"store probe diverged from ivfAdcTopK:\n$got\nvs\n$want")
    CacheRegistry.drain()
  }
}
