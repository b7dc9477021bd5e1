package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual catalog queries with repeats in ONE JVM, so
  * cold (codegen/JIT) and steady-state cost separate — the one-shot
  * numbers in Bench vary ±60% run-to-run on this box and bisecting a
  * regression from them alone is guesswork.
  *
  * Usage: runMain graft.BenchProbe <sfDir> <repeats> <query...>
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeats = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // static conf: hold the whole catalog's generated classes (default
      // 100 evicts/recompiles across a multi-query run)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to repeats).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        graft.operators.CacheRegistry.drain()
        secs
      }
      println(f"[probe] $name: ${times.map(t => f"$t%.2f").mkString(" ")} sec")
    }
    spark.stop()
  }
}
