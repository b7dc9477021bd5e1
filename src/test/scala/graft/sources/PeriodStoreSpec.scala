package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.SparkSpec

class PeriodStoreSpec extends SparkSpec {

  test("per-period read is partition-pruned (PartitionFilters, one dir)") {
    val session = spark
    import session.implicits._
    val dir = Files.createTempDirectory("pstore").resolve("votes")
    val p9 = (1L to 100L).map(i => (i, s"v9-$i")).toDF("id_hlasovani", "v")
    val p10 = (101L to 300L).map(i => (i, s"v10-$i")).toDF("id_hlasovani", "v")
    PeriodStore.write(Seq(9 -> p9, 10 -> p10), dir.toString)

    val one = PeriodStore.readPeriod(spark, dir.toString, 10)
    // collect() (not count()) so the metrics land on THIS queryExecution
    assert(one.collect().length == 200)

    val scan = one.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty,
      "period predicate must be a partition filter, not a data filter")
    // physical pruning: the scan's numFiles metric counts only the files
    // under period=10/ (inputFiles would list the unpruned relation)
    def parquetFiles(sub: String): Long = {
      val s = Files.walk(dir.resolve(sub))
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    assert(scan.metrics("numFiles").value == parquetFiles("period=10"))
    assert(parquetFiles("period=9") > 0) // the other partition exists
  }
}
