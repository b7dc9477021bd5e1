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
    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, s"expected no shuffle, got ${shuffles.size}")
    assert(joined.count() == 1000)
    spark.sql("DROP TABLE IF EXISTS b_votes")
    spark.sql("DROP TABLE IF EXISTS b_majority")
  }
}
