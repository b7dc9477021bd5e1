package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's single most load-bearing aggregate: per-group "majority
  * direction" (reference `services/loyalty_service.py:37-52`, repeated
  * verbatim at `coalition_service.py:52-67,131-146,240-255` — implemented
  * once here, reused everywhere).
  *
  * Semantics (tie handling is the subtle part, SURVEY §7.4): per group,
  * count `yes` and `no` codes; direction is `yes` if strictly more yes than
  * no, `no` if strictly more no, otherwise the group is DROPPED (ties and
  * all-abstain groups contribute to neither numerator nor denominator
  * downstream).
  *
  * Scale notes: a single hash aggregation — partial (map-side) + final after
  * one shuffle on the group keys; no join, no window. At 100 TB the shuffle
  * keys (vote id × party) are high-cardinality and near-uniform, so this
  * parallelizes linearly; AQE coalesces the post-shuffle partitions.
  */
object Majority {

  /** @param df        long-form fact table (one row per member-vote)
    * @param groupCols  grouping keys, e.g. ("id_hlasovani", "party")
    * @param codeCol    the vote-code column
    * @param yesCode    code counted as "yes" (reference: "A")
    * @param noCode     code counted as "no"  (reference: "B")
    * @return one row per group that has a strict majority:
    *         groupCols :+ ("yes_cnt", "no_cnt", "majority_dir")
    */
  def majorityDirection(
      df: DataFrame,
      groupCols: Seq[String],
      codeCol: String,
      yesCode: String = "A",
      noCode: String = "B"): DataFrame = {
    val yes = sum(when(col(codeCol) === yesCode, 1).otherwise(0)).cast("long").as("yes_cnt")
    val no = sum(when(col(codeCol) === noCode, 1).otherwise(0)).cast("long").as("no_cnt")
    df.groupBy(groupCols.map(col): _*)
      .agg(yes, no)
      .withColumn(
        "majority_dir",
        when(col("yes_cnt") > col("no_cnt"), lit(yesCode))
          .when(col("no_cnt") > col("yes_cnt"), lit(noCode))
          .otherwise(lit(null)))
      .filter(col("majority_dir").isNotNull)
  }

  /** Join each fact row back to its group majority and flag rebellion
    * (reference `loyalty_service.py:55-66`): a row rebels when its code is
    * an active vote (yes/no) that differs from the group's majority.
    * Rows whose group had no strict majority drop out (inner join) —
    * exactly the reference's semantics.
    *
    * The join is a plain equi-join on the group keys; at scale both sides
    * are already partitioned by those keys from the aggregation, so the
    * shuffle is reused (Exchange reuse / AQE).
    */
  def withRebellion(
      df: DataFrame,
      groupCols: Seq[String],
      codeCol: String,
      yesCode: String = "A",
      noCode: String = "B"): DataFrame = {
    // computing the majority from the PRE-FILTERED active rows is
    // semantics-preserving (non-yes/no codes contribute 0 to both counts;
    // groups with no active rows tie at 0=0 and drop either way) and
    // makes both join inputs share one subtree — smaller aggregation
    // input, reusable broadcast exchanges
    val active = df.filter(col(codeCol).isin(yesCode, noCode))
    val maj = majorityDirection(active, groupCols, codeCol, yesCode, noCode)
      .select((groupCols.map(col) :+ col("majority_dir")): _*)
    active
      .join(maj, groupCols, "inner")
      .withColumn("is_rebellion", (col(codeCol) =!= col("majority_dir")).cast("int"))
  }

  /** Per-member rebellion stats (reference `loyalty_service.py:107-117`):
    * share of active votes cast against the member's group majority.
    * Percentage arithmetic: exact integer counts → one double division
    * (deterministic on any engine).
    */
  def rebellionStats(withReb: DataFrame, memberCols: Seq[String]): DataFrame =
    withReb
      .groupBy(memberCols.map(col): _*)
      .agg(
        sum(col("is_rebellion")).cast("long").as("rebellion_cnt"),
        count(lit(1)).as("total_votes"))
      .withColumn(
        "rebellion_pct",
        col("rebellion_cnt").cast("double") / col("total_votes").cast("double") * 100.0)

  /** Pairwise agreement between groups over their majority directions
    * (reference coalition analysis `coalition_service.py:70-87`): self-join
    * the majority table on the vote key with the triangular predicate
    * `a.group < b.group`, then agreement = matching directions / common
    * votes. At scale: the self-join shuffles once on the vote key; the
    * pair-level aggregation is tiny (|groups|²).
    */
  def pairwiseAgreement(
      majorities: DataFrame,
      voteCol: String,
      groupCol: String): DataFrame = {
    val a = majorities.select(
      col(voteCol), col(groupCol).as("group_a"), col("majority_dir").as("dir_a"))
    val b = majorities.select(
      col(voteCol), col(groupCol).as("group_b"), col("majority_dir").as("dir_b"))
    a.join(b, Seq(voteCol), "inner")
      .filter(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b")
      .agg(
        sum(when(col("dir_a") === col("dir_b"), 1).otherwise(0)).cast("long").as("agree_cnt"),
        count(lit(1)).as("common_cnt"))
      .withColumn(
        "agreement_rate",
        col("agree_cnt").cast("double") / col("common_cnt").cast("double"))
  }
}
