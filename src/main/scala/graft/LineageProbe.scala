package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the cost of a reliable-checkpoint [[graft.operators.Lineage.cut]]
  * against the default `localCheckpoint` cut — the number the
  * executor-loss note on Lineage.scala quotes from PERFORMANCE.md. The
  * probe runs the same fixed-point PageRank loop (one rank-relation cut
  * per iteration) in both modes over a synthetic ring-with-chords graph
  * and reports whole-loop seconds and the per-iteration quotient,
  * medians over `reps` runs.
  *
  * Usage: `runMain graft.LineageProbe [nodes] [iters] [reps]`.
  */
object LineageProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val iters = if (args.length > 1) args(1).toInt else 5
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{CacheRegistry, Lineage, PageRank}

    val ckpt = java.nio.file.Files.createTempDirectory("graft-lineage-probe")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    def graph() = {
      val nodes = spark.range(n).select(col("id").as("node"))
      // ring + two chord families: connected, mixed out-degrees
      val edges = spark.range(n).select(col("id").as("src"),
          ((col("id") + 1) % n).as("dst"))
        .unionAll(spark.range(n / 2).select((col("id") * 2).as("src"),
          ((col("id") * 7 + 3) % n).as("dst")))
      (edges, nodes)
    }
    def timeRun(): Double = {
      val (edges, nodes) = graph()
      val t0 = System.nanoTime()
      PageRank.run(edges, nodes, iters).count()
      val dt = (System.nanoTime() - t0) / 1e9
      CacheRegistry.drain()
      dt
    }
    // warm-up both modes (codegen/JIT)
    timeRun()
    spark.conf.set(Lineage.ReliableConf, "true")
    timeRun()
    spark.conf.unset(Lineage.ReliableConf)

    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    val local = med((1 to reps).map(_ => timeRun()))
    spark.conf.set(Lineage.ReliableConf, "true")
    val reliable = med((1 to reps).map(_ => timeRun()))
    spark.conf.unset(Lineage.ReliableConf)
    println(f"[lineage-probe] nodes=$n iters=$iters reps=$reps  " +
      f"local=$local%.2f s (${local / iters}%.2f s/iter)  " +
      f"reliable=$reliable%.2f s (${reliable / iters}%.2f s/iter)  " +
      f"ratio=${reliable / local}%.2f")
    spark.stop()
  }
}
