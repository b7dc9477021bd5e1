package graft.serving

import org.apache.spark.sql.SparkSession

import graft.psp.{Analyzer, PeriodLoader}

/** Runnable serving entry point (the reference's `main_frontend.py`):
  * load one or more periods from an extracted psp.cz dump directory and
  * serve the full /api surface.
  *
  * Usage: runMain graft.serving.ServeMain <dumpRoot> <period[,period...]> [port]
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ServeMain <dumpRoot> <period[,period...]> [port]")
    val root = args(0)
    val periodIds = args(1).split(',').map(_.trim.toInt).toSeq
    val port = if (args.length > 2) args(2).toInt else 8080
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // psp.cz UNL dumps are windows-1250 (Spark 4 charset allowlist)
      .config("spark.sql.legacy.javaCharsets", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val periods = periodIds.map { p =>
      p -> PeriodCatalog(new Analyzer(PeriodLoader.load(spark, root, p)))
    }.toMap
    val server = new GraftServer(periods, port).start()
    println(s"serving /api on 127.0.0.1:${server.boundPort} " +
      s"(periods ${periodIds.mkString(",")})")
    Thread.currentThread().join() // serve until killed
  }
}
