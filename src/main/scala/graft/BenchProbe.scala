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
      // SPARK_GRAFT_AQE=false runs the attribution experiment for
      // scatter suspected to track AQE runtime decisions (the r15 q192
      // order): same queries, adaptive re-planning off.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // static conf: hold the whole catalog's generated classes (default
      // 100 evicts/recompiles across a multi-query run)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    // same in-window hygiene split as Bench: how much of each repeat was
    // GC pause / JIT compiler time (bisecting an erratic repeat without
    // these is guesswork — the r10 q60 scatter was only attributable once
    // the 14 s repeats showed their jit share)
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
    def jitMillis(): Long =
      if (jitBean != null && jitBean.isCompilationTimeMonitoringSupported)
        jitBean.getTotalCompilationTime else 0L
    // janino source-compiles run synchronously ON THE DRIVER THREAD and
    // are invisible to both beans above (they are neither GC pause nor
    // JVM JIT) — a codegen-cache miss mid-repeat shows up as elapsed
    // time with gc≈0 and jit≈0, exactly the r12 q60 mystery-stall shape.
    // CodegenMetrics counts each generated-class compilation.
    def janinoCount(): Long = org.apache.spark.metrics.source
      .CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    // SPARK_PROBE_STACKDUMP=<sec>: if a repeat is still running after
    // <sec> seconds, dump every thread's top frames ONCE — the direct
    // read on a mystery stall (elapsed time with gc≈0, jit≈0, janino≈0
    // that none of the counters above attribute)
    val dumpAfterSec = sys.env.get("SPARK_PROBE_STACKDUMP").map(_.toInt)
    def withWatchdog[T](label: String)(f: => T): T = dumpAfterSec match {
      case None => f
      case Some(after) =>
        val timer = new java.util.Timer(true)
        timer.schedule(new java.util.TimerTask {
          def run(): Unit = {
            val dump = Thread.getAllStackTraces.asScala.toSeq
              .sortBy(_._1.getName)
              .map { case (t, frames) =>
                s"  ${t.getName} [${t.getState}]\n" +
                  frames.take(10).map(f => s"    at $f").mkString("\n")
              }.mkString("\n")
            System.err.println(
              s"[probe-watchdog] $label still running after ${after}s:\n" +
                dump)
          }
        }, after * 1000L)
        try f finally timer.cancel()
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to repeats).map { i =>
        val gc0 = gcMillis(); val jit0 = jitMillis()
        val jan0 = janinoCount()
        val t0 = System.nanoTime()
        withWatchdog(s"$name repeat $i")(fn(spark, sfDir).count())
        val secs = (System.nanoTime() - t0) / 1e9
        // blocking, like Bench: eviction must not bleed into the next
        // repeat's window
        graft.operators.CacheRegistry.drain(blocking = true)
        (secs, (gcMillis() - gc0) / 1e3, (jitMillis() - jit0) / 1e3,
          janinoCount() - jan0)
      }
      println(f"[probe] $name: ${times.map(_._1).map(t => f"$t%.2f").mkString(" ")} sec")
      println(f"[probe] $name gc:  ${times.map(_._2).map(t => f"$t%.2f").mkString(" ")}")
      println(f"[probe] $name jit: ${times.map(_._3).map(t => f"$t%.2f").mkString(" ")}")
      println(s"[probe] $name janino-compiles: ${times.map(_._4).mkString(" ")}")
    }
    spark.stop()
  }
}
