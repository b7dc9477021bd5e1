package graft
import org.apache.spark.sql.functions._
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // minimal: is raise_error / the decimal when-chain codegen-able at all?
    {
      val dir0 = java.nio.file.Files.createTempDirectory("cgp0").toString
      (1L to 100L).map(i => (i, i % 5)).toDF("id", "c").write.mode("overwrite").parquet(dir0)
      val d0 = spark.read.parquet(dir0)
      def wsc(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        df.count()
        val n = df.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }.size
        println(s"minimal $tag wsc=$n")
      }
      wsc(d0.select(col("id"), when(col("c") === 1, lit(1.0)).otherwise(lit(2.0)).as("v")), "plain-when")
      wsc(d0.select(col("id"), when(col("c") === 1, lit(new java.math.BigDecimal("0.5")).cast("decimal(30,24)")).otherwise(lit(new java.math.BigDecimal("0.25")).cast("decimal(30,24)")).as("v")), "decimal-when")
      wsc(d0.select(col("id"), when(col("c") <= 5, col("c")).otherwise(raise_error(lit("boom")).cast("long")).as("v")), "raise-error")
    }
    // flat-LUT sweep: the old when-chain fell out of codegen at
    // 8*8*64 = 4096 branches; the map-literal LUT should stay
    // compiled (wsc >= 1, bounded maxMethodCodeSize) at every k here
    for (k <- Seq(16, 64, 256, 1024)) {
      val m = 8
      // keep every codeword inside the scale-12 grid's |coord| < 10
      // domain at any k (j*0.01 would hit 10.23 at k=1024)
      val codebooks = Array.tabulate(m, k, 1)((_, j, _) => j * (8.0 / k))
      val model = graft.operators.Pq.Model(m, 1, codebooks)
      val centroids = (0 until 8).map(c => c -> Seq.fill(8)(c * 0.05))
      val dir = java.nio.file.Files.createTempDirectory("cgp").toString
      (1L to 200L).map(i => (i, Array.fill(8)((i % 7) * 0.04))).toDF("id", "vec")
        .write.mode("overwrite").parquet(dir)
      val rows = spark.read.parquet(dir)
      val assigned = graft.operators.Ann.assignCells(rows, "vec", centroids)
      val top = graft.operators.Pq.ivfAdcTopK(assigned, "id", "vec", "cell", centroids, model, Array.fill(8)(0.03), 5, 8)
      top.collect()
      // strip AQE wrappers: AdaptiveSparkPlanExec AND QueryStageExec
      // are leaf nodes — collect/exists never traverse into them
      def strip(p: org.apache.spark.sql.execution.SparkPlan):
          org.apache.spark.sql.execution.SparkPlan = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          strip(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          strip(q.plan)
        case other => other.withNewChildren(other.children.map(strip))
      }
      val plan = strip(top.queryExecution.executedPlan)
      val wsc = plan.collect { case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
      println(s"k=$k branches=${8*m*k} wsc_subtrees=${wsc.size}")
      if (wsc.isEmpty) println(plan.toString.linesIterator.take(25).mkString("\n"))
      else {
        val stats = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
        println("  maxMethodCodeSize per subtree: " + stats.map(_._3.maxMethodCodeSize).mkString(","))
      }
    }
    spark.stop()
  }
}
