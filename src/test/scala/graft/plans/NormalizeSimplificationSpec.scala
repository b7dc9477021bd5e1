package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeSimplificationSpec extends SparkSpec {

  private def countStrips(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
    var n = 0
    plan.transformAllExpressions {
      case e: NormalizeDiacritics => n += 1; e
    }
    n
  }

  // parquet-backed source: a literal LocalRelation would be constant-
  // folded away entirely, leaving nothing to count
  private def src = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").select(col("lang"))

  test("double strip_diacritics collapses to one (injected optimizer rule)") {
    GraftFunctions.ensure(spark)
    val df = src.select(call_function("strip_diacritics",
      call_function("strip_diacritics", col("lang"))).as("t"))
    assert(countStrips(df.queryExecution.optimizedPlan) == 1)
    assert(df.limit(1).collect().nonEmpty)
  }

  test("strip(lower(strip(x))) simplifies to lower(strip(x))") {
    GraftFunctions.ensure(spark)
    val df = src.select(call_function("strip_diacritics",
      lower(call_function("strip_diacritics", col("lang")))).as("t"))
    assert(countStrips(df.queryExecution.optimizedPlan) == 1)
  }

  test("single application is untouched and evaluates correctly") {
    val session = spark
    import session.implicits._
    GraftFunctions.ensure(spark)
    // evaluation correctness via a real (non-folded) scan is covered by
    // q21; here the kernel semantics on Czech text
    assert(graft.functions.TextNorm.stripDiacritics("Dvořák") == "Dvorak")
  }
}
