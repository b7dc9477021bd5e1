package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Spark internals that the graft library needs:
  * wrapping a raw Catalyst [[Expression]] into a user-facing [[Column]] and
  * registering native (non-UDF, codegen-capable) functions on an existing
  * session. Lives in the `org.apache.spark.sql` package solely for access;
  * contains no logic of its own.
  */
object GraftShim {
  /** Wrap a Catalyst expression as a Column (classic, non-Connect sessions). */
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column. */
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register (or replace) a session-local native function backed by a raw
    * Catalyst expression builder — unlike `spark.udf.register` the resulting
    * function participates in codegen and constant folding.
    */
  def registerNative(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
