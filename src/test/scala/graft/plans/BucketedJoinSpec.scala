package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located joins via bucketing: two tables bucketed by the join key
  * join WITHOUT a shuffle exchange — the write-time partitioning is the
  * 100 TB answer to repeated fact-fact joins on the same key.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    val session = spark
    import session.implicits._
    // warehouse.dir is a static conf — tables land in ./spark-warehouse
    // (gitignored); drop both before and after
    spark.sql("DROP TABLE IF EXISTS b_votes")
    spark.sql("DROP TABLE IF EXISTS b_majority")

    (1 to 1000).map(i => (i.toLong % 97, i.toLong, if (i % 3 == 0) "A" else "B"))
      .toDF("vote_id", "row_id", "code")
      .write.bucketBy(8, "vote_id").sortBy("vote_id").saveAsTable("b_votes")
    (0L until 97L).map(v => (v, if (v % 2 == 0) "A" else "B"))
      .toDF("vote_id", "majority_dir")
      .write.bucketBy(8, "vote_id").sortBy("vote_id").saveAsTable("b_majority")

    val joined = spark.table("b_votes")
      .join(spark.table("b_majority"), Seq("vote_id"))
      .withColumn("rebel", (col("code") =!= col("majority_dir")).cast("int"))
    joined.collect()
    // strip AQE wrappers first: today the zero-exchange plan is not
    // adaptive-wrapped, but the REGRESSION this test guards (a shuffle
    // appearing) WOULD wrap the plan in leaf-node AdaptiveSparkPlanExec/
    // QueryStageExec stages — an un-stripped collect would then see
    // nothing and pass vacuously, exactly when it must fail
    def strip(p: org.apache.spark.sql.execution.SparkPlan):
        org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        strip(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        strip(q.plan)
      case other => other.withNewChildren(other.children.map(strip))
    }
    val shuffles = strip(joined.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, s"expected no shuffle, got ${shuffles.size}")
    assert(joined.count() == 1000)
    spark.sql("DROP TABLE IF EXISTS b_votes")
    spark.sql("DROP TABLE IF EXISTS b_majority")
  }
}
