package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: how much of a query's wall-clock is
  * DRIVER-side plan construction (analysis + optimization + physical
  * planning, before any job runs)? For each named query, times
  * (a) DataFrame construction + `executedPlan` forcing, and (b) the
  * subsequent `count()` action, over `repeats` rounds in one JVM.
  *
  * Usage: runMain graft.PlanCostProbe <sfDir> <repeats> <query...>
  */
object PlanCostProbe {
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
      .config("spark.sql.codegen.cache.maxEntries", "12000")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    names.foreach { n =>
      val plans = Array.ofDim[Double](repeats)
      val execs = Array.ofDim[Double](repeats)
      (0 until repeats).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.queryExecution.executedPlan // force planning
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        plans(i) = (t1 - t0) / 1e9
        execs(i) = (t2 - t1) / 1e9
        graft.operators.CacheRegistry.drain(blocking = true)
        System.gc()
      }
      def fmt(a: Array[Double]) = a.map(v => f"$v%.2f").mkString(" ")
      println(s"[plancost] $n plan: ${fmt(plans)}")
      println(s"[plancost] $n exec: ${fmt(execs)}")
    }
    spark.stop()
  }
}
