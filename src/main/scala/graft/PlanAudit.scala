package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints the formatted physical plan of selected
  * queries so pushdown / broadcast / top-k choices can be inspected
  * (`sbt "runMain graft.PlanAudit q01_scan_filter_project ..."`, no args =
  * a default set).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_scan_filter_project", "q03_topk", "q05_join_enrich",
        "q07_anti_join", "q09_majority_direction", "q10_rebellion_stats")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
