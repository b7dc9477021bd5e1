package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join/aggregation helpers. AQE's skew-join split handles
  * most cases at runtime (`spark.sql.adaptive.skewJoin.enabled`); these
  * are the explicit forms for when a key distribution is KNOWN to be
  * pathological (one vote with 10⁶ rows, a null-heavy key) and the plan
  * must not depend on runtime detection.
  */
object Skew {

  /** Salted equi-join of a skewed LEFT against a small-ish RIGHT: the left
    * side gets a deterministic salt in [0, factor) derived from a
    * row-distinguishing column set, the right side is replicated `factor`
    * times, and the join key becomes (key, salt) — splitting each hot key
    * across `factor` reducers. Result equals the plain inner join.
    *
    * @param leftDistinct columns of `left` that (together with the key)
    *        spread rows roughly uniformly — e.g. the fact table's line id.
    */
  def saltedInnerJoin(
      left: DataFrame, right: DataFrame, key: String, factor: Int,
      leftDistinct: Seq[String]): DataFrame = {
    require(factor > 0)
    val salted = left.withColumn(
      "__salt", pmod(hash(leftDistinct.map(col): _*), lit(factor)))
    val replicated = right
      .withColumn("__salt", explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase aggregation for a skewed groupBy with a non-algebraic
    * combine done at the caller: phase 1 aggregates on (key, salt), phase 2
    * merges the partials per key. For algebraic aggregates (sum/count/min/
    * max) Spark's partial aggregation already does this map-side — use this
    * only when the partial state is large (e.g. collect_set of a hot key).
    */
  def saltedDistinctCount(
      df: DataFrame, key: String, valueCol: String, factor: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("long").as("n_distinct"))
}
