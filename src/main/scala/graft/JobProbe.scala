package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Optimization-round tooling: per-JOB wall-clock breakdown of one
  * catalog query — which of the many actions inside a composed pipeline
  * (persist materializations, driver collects, the final count) own the
  * elapsed time. Runs the query `repeats` times in one JVM; the LAST
  * repeat's job table is printed (steady-state shape, compile noise
  * drained), plus every repeat's total.
  *
  * Usage: runMain graft.JobProbe <sfDir> <repeats> <query...>
  */
object JobProbe {
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

    // job-id -> (start nanos-ish millis, description)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val stages = js.stageInfos.map(si =>
          s"${si.name.takeWhile(_ != '\n')}(${si.numTasks}t)").mkString(" | ")
        starts.put(js.jobId, (js.time, stages))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) rows.add((je.jobId, je.time - s._1, s._2))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to repeats).foreach { i =>
        rows.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        graft.operators.CacheRegistry.drain(blocking = true)
        // let the listener bus drain before reading the rows
        Thread.sleep(300)
        println(f"[jobprobe] $name repeat $i total $secs%.2f s")
        if (i == repeats) {
          import scala.jdk.CollectionConverters._
          val tbl = rows.asScala.toSeq.sortBy(_._1)
          val sum = tbl.map(_._2).sum / 1e3
          println(f"[jobprobe] $name: ${tbl.size} jobs, job-time sum $sum%.2f s")
          tbl.foreach { case (id, ms, desc) =>
            println(f"[jobprobe]   job $id%3d ${ms / 1e3}%6.2f s  $desc")
          }
        }
      }
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
