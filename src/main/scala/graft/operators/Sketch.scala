package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch (Cormode & Muthukrishnan 2005) as a RELATION — the
  * fixed-size mergeable frequency summary a 100 TB pipeline keeps when
  * exact per-value counts are too big to hold: `depth` hash rows ×
  * `width` counters, point-query estimate = min over rows of the
  * hashed-to counter, error one-sided (estimates only ever OVERCOUNT,
  * by at most ≈ 2N/width with probability 1 − 2⁻ᵈᵉᵖᵗʰ).
  *
  * Everything here is deterministic: row hashes are the repo's 48-bit
  * md5 integers (`'r:' || value` seeds row independence), so sketch
  * contents, estimates, and heavy-hitter sets replay exactly in the
  * DuckDB oracle — no RNG, no approximation that can't be re-derived.
  *
  * Scale shape: building the sketch is ONE `groupBy (row, bucket)`
  * aggregation — Spark's map-side partial aggregation collapses every
  * partition to ≤ depth·width rows before the shuffle, so shuffle
  * volume is bounded by depth·width·partitions REGARDLESS of corpus
  * size (the whole point of sketching). Sketches from different
  * corpora/stream batches merge by unioning the relations and
  * re-summing ([[cmsMerge]]) — counter arrays add. Estimation joins
  * candidates against the ≤ depth·width-row sketch (broadcast-sized by
  * construction).
  */
object Sketch {

  /** The row-`r` counter index of `value`: 48-bit md5 integer of
    * `"r:value"` mod `width` — cross-engine exact (DuckDB:
    * `CAST(('0x' || substr(md5(r || ':' || v), 1, 12)) AS BIGINT)`).
    */
  private def bucket(row: Column, value: Column, width: Int): Column =
    conv(substring(md5(concat(row.cast("string"), lit(":"),
      value.cast("string"))), 1, 12), 16, 10).cast("long") % width

  /** Build the sketch of a value stream: one row per touched
    * `(row, bucket)` counter (untouched counters are implicit zeros).
    */
  def cmsSketch(df: DataFrame, valueCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth > 0 && width > 0,
      s"depth=$depth width=$width must be positive")
    df.select(col(valueCol).cast("string").as("__v"),
        explode(array((0 until depth).map(lit(_)): _*)).as("row"))
      .select(col("row"), bucket(col("row"), col("__v"), width).as("bucket"))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge sketches built with the SAME (depth, width): counters add. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "cmsMerge needs at least one sketch")
    sketches.reduce(_ unionAll _)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("c")).as("c"))
  }

  /** Point-query estimates for a candidate relation: per candidate the
    * min over `depth` rows of its hashed-to counter (0 when the
    * counter was never touched — only possible for values absent from
    * the sketched stream). The sketch side is ≤ depth·width rows, so
    * the join broadcasts.
    */
  def cmsEstimate(sketch: DataFrame, items: DataFrame, valueCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0,
      s"depth=$depth width=$width must be positive")
    val probes = items
      .select(col("*"),
        explode(array((0 until depth).map(lit(_)): _*)).as("row"))
      .withColumn("bucket",
        bucket(col("row"), col(valueCol), width))
    probes.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(items.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))
  }

  /** Heavy hitters by CMS estimate: every candidate whose estimate
    * clears `threshold`, alongside its exact count for audit — the
    * one-sided guarantee means NO false negatives (est ≥ exact always)
    * but collision-inflated false positives can appear; callers that
    * need exactness re-count just the (small) emitted set.
    *
    * Candidates here are the stream's distinct values — fine when the
    * value domain is bounded (vocabularies). For an unbounded domain
    * at 100 TB, candidates come from per-partition local top-k
    * (Misra-Gries summaries) instead, and this estimate/threshold tail
    * is unchanged — the candidate generator is the only swap, same as
    * the ANN tiers.
    */
  def cmsHeavyHitters(df: DataFrame, valueCol: String, depth: Int,
      width: Int, threshold: Long): DataFrame = {
    val vals = df.select(col(valueCol).cast("string").as(valueCol))
    val sketch = cmsSketch(vals, valueCol, depth, width)
    val exact = vals.groupBy(col(valueCol))
      .agg(count(lit(1)).as("exact_n"))
    cmsEstimate(sketch, exact, valueCol, depth, width)
      .filter(col("est_n") >= threshold)
      .select(col(valueCol), col("exact_n"), col("est_n"))
  }
}
