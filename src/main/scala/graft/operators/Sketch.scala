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
    *
    * Candidate contract: `items` rows are treated as a SET — the
    * estimate re-groups by all of `items`' columns, so fully duplicate
    * candidate rows collapse to one output row (callers that need
    * per-occurrence rows must carry a distinguishing column). The
    * depth-probe plumbing lives in `__cms_`-prefixed columns so a
    * caller's own `row`/`bucket` columns pass through untouched; only
    * the reserved internal names themselves are refused.
    */
  def cmsEstimate(sketch: DataFrame, items: DataFrame, valueCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0,
      s"depth=$depth width=$width must be positive")
    require(!items.columns.exists(_.startsWith("__cms_")),
      s"items columns ${items.columns.mkString(",")} collide with the " +
        "reserved __cms_ internal prefix")
    val probes = items
      .select(col("*"),
        explode(array((0 until depth).map(lit(_)): _*)).as("__cms_row"))
      .withColumn("__cms_bucket",
        bucket(col("__cms_row"), col(valueCol), width))
    val sk = sketch.select(col("row").as("__cms_row"),
      col("bucket").as("__cms_bucket"), col("c").as("__cms_c"))
    probes.join(broadcast(sk), Seq("__cms_row", "__cms_bucket"), "left")
      .groupBy(items.columns.map(col): _*)
      .agg(min(coalesce(col("__cms_c"), lit(0L))).as("est_n"))
  }

  /** K-minimum-values distinct sketch (Bar-Yossef et al. 2002) as a
    * typed Aggregator — the DETERMINISTIC approximate-distinct the
    * HLL path (q43) can't oracle-check: the buffer is the k smallest
    * DISTINCT 48-bit md5 hashes of the values, a pure function of the
    * value SET (insertion order, partitioning, and duplication all
    * cancel), so sketch contents and estimates replay exactly in SQL
    * (`list_sort(list(DISTINCT h))[1:k]`). Mergeable by construction
    * (union, keep k smallest) — the Aggregator's `merge` IS the
    * map-side combine, so per-key shuffle state is ≤ k longs per
    * partition no matter how many values stream through.
    *
    * Estimate: exact when fewer than k distinct hashes were seen
    * (the buffer is simply all of them); otherwise the classic
    * `(k−1) / (v_k / 2⁴⁸)` — the k-th smallest of n uniform draws
    * sits near k/n of the range.
    */
  class KmvAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Long, Array[Long], Array[Long]] {
    require(k > 1, s"k=$k must exceed 1")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, h)
      if (pos >= 0) b // already present: set semantics
      else {
        val ins = -(pos + 1)
        if (b.length < k) {
          val out = new Array[Long](b.length + 1)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, b.length - ins)
          out
        } else if (ins < k) {
          val out = new Array[Long](k)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
          out
        } else b // h exceeds the current k-th smallest
      }
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)(reduce)
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The 48-bit md5 hash KMV draws from — shared by the sketch and
    * its oracle (DuckDB: `CAST(('0x' || substr(md5(v), 1, 12)) AS
    * BIGINT)`).
    */
  def kmvHash(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 12), 16, 10).cast("long")

  /** Per-group KMV sketches: one row per group, `kmv` = the k
    * smallest distinct value hashes (ascending). ONE aggregation with
    * bounded per-key state — never a distinct of the raw values.
    */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(udaf(new KmvAgg(k),
        org.apache.spark.sql.Encoders.scalaLong)(
        kmvHash(col(valueCol))).as("kmv"))

  /** Distinct-count estimates from a [[kmvSketch]] relation: exact
    * below k, `(k−1)·2⁴⁸ / v_k` at k. The scale constant folds on the
    * driver so the oracle can inline the identical literal.
    */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame = {
    val const = (k - 1).toDouble * 281474976710656.0
    sketch.withColumn("est_distinct",
      when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
        .otherwise(round(lit(const) /
          element_at(col("kmv"), k).cast("double"), 6)))
  }

  /** Portable HyperLogLog registers (Flajolet et al. 2007) as a
    * RELATION — the mergeable approximate-distinct analog of
    * [[cmsSketch]], and the ORACLE-CHECKABLE cousin of the engine-
    * internal HLL behind `approx_count_distinct` (q43): m = 2ᵖ
    * registers per group; a value routes to register = top p bits of
    * its 48-bit md5 hash ([[kmvHash]] — the repo's house uniform), and
    * the register keeps max ρ = 1 + leading-zero count of the
    * remaining w = 48−p bits (w+1 when they are all zero). Every piece
    * is integer md5 arithmetic — register contents AND estimates
    * replay exactly in DuckDB SQL, no engine internals, no RNG.
    *
    * ρ is a w-branch codegen comparison chain (no log2/libm); the
    * aggregation is ONE `groupBy (group, register)` max — partial
    * aggregation bounds shuffle volume at m rows per partition per
    * group regardless of stream size, and register relations from
    * different corpora/batches merge by union + re-max (max is the
    * HLL merge).
    */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
      p: Int): DataFrame = {
    require(p >= 2 && p <= 12, s"p=$p (m=2^p registers) must be 2..12")
    val w = 48 - p
    val h = kmvHash(col(valueCol))
    val rest = h.bitwiseAND(lit((1L << w) - 1))
    val rho = (1 to w).foldRight(lit(w + 1): Column) { (g, acc) =>
      when(rest >= lit(1L << (w - g)), lit(g)).otherwise(acc)
    }
    df.select(col(groupCol), shiftright(h, w).as("reg"), rho.as("rho"))
      .groupBy(col(groupCol), col("reg"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Published bias-correction constant α_m (Flajolet et al. 2007). */
  private def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Per-group estimates from a [[hllRegisters]] relation. The
    * harmonic sum Σ 2^−ρ runs in EXACT fixed point — each register
    * contributes the integer 2^(w+1−ρ) (an untouched register, ρ = 0,
    * contributes 2^(w+1)) — so `sum_fp` is order-free and
    * cross-engine exact; the estimate is one double division off it:
    * α_m·m²·2^(w+1)/sum_fp, with the standard small-range linear-
    * counting correction m·ln(m/V) when the raw estimate is ≤ 2.5m
    * and V > 0 registers are untouched (ln is the house-allowed libm
    * call — round-6 absorbs its ulp). Emits per group: `n_zero` (V),
    * `sum_fp`, `est_distinct` (round-6).
    */
  def hllEstimate(registers: DataFrame, groupCol: String,
      p: Int): DataFrame = {
    require(p >= 2 && p <= 12, s"p=$p must be 2..12")
    val m = 1 << p
    val w = 48 - p
    val full = 1L << (w + 1)
    val scale = hllAlpha(m) * m.toDouble * m.toDouble * full.toDouble
    registers.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - rho)"))
          .as("__sum_present"))
      .withColumn("n_zero", lit(m.toLong) - col("__present"))
      .withColumn("sum_fp",
        col("__sum_present") + col("n_zero") * lit(full))
      .withColumn("__raw", lit(scale) / col("sum_fp").cast("double"))
      .withColumn("est_distinct",
        round(when(col("__raw") <= lit(2.5 * m) && col("n_zero") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero").cast("double")))
          .otherwise(col("__raw")), 6))
      .select(col(groupCol), col("n_zero"), col("sum_fp"),
        col("est_distinct"))
  }

  /** Per-partition Misra-Gries candidate summaries (Misra & Gries
    * 1982) — the UNBOUNDED-domain candidate generator the
    * [[cmsHeavyHitters]] scaladoc promises: each partition keeps at
    * most `k` counters (admit while free; otherwise decrement all —
    * the classic frequent-items sweep), so driver/shuffle volume is
    * ≤ k·partitions regardless of how many distinct values exist.
    *
    * The summary itself depends on partitioning and arrival order
    * (NOT deterministic); what IS guaranteed is one-sided: any value
    * whose PARTITION-local count exceeds n_p/(k+1) survives that
    * partition, so any value with global count > N/(k+1) survives
    * somewhere. Consumers must re-count candidates exactly before
    * acting ([[mgHeavyHitters]]) — only the recounted output is a
    * deterministic function of the data.
    *
    * `mapPartitions` is the right tool here (the rare genuine case):
    * the algorithm is per-partition imperative state with
    * data-dependent eviction — no Catalyst expression expresses it,
    * and the whole point is that it runs BEFORE any shuffle.
    */
  def mgCandidates(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val session = df.sparkSession
    import session.implicits._
    df.select(col(valueCol).cast("string"))
      .filter(col(valueCol).isNotNull)
      .as[String]
      .mapPartitions { it =>
        val c = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { v =>
          c.get(v) match {
            case Some(x) => c.update(v, x + 1)
            case None if c.size < k => c.update(v, 1L)
            case None =>
              c.mapValuesInPlace((_, x) => x - 1)
              c.filterInPlace((_, x) => x > 0)
          }
        }
        c.keysIterator
      }
      .toDF(valueCol).distinct()
  }

  /** EXACT heavy hitters through the Misra-Gries funnel: values with
    * global count ≥ ⌈minFrac·N⌉, computed as per-partition candidate
    * summaries → exact re-count of just the candidates. `minFrac >
    * 1/(k+1)` is REQUIRED (checked): under it the candidate set
    * provably contains every qualifying value, so the recounted,
    * thresholded output equals the plain `GROUP BY … HAVING` answer —
    * deterministic even though the intermediate summaries are not —
    * while the full-domain aggregation is replaced by one bounded
    * candidate list (≤ k·partitions rows) plus a semi-joined
    * re-count.
    */
  def mgHeavyHitters(df: DataFrame, valueCol: String, k: Int,
      minFrac: Double): DataFrame = {
    require(minFrac > 1.0 / (k + 1) && minFrac <= 1,
      s"minFrac=$minFrac must exceed 1/(k+1)=${1.0 / (k + 1)} for the " +
        "no-false-negative guarantee (raise k or the threshold)")
    val vals = CacheRegistry.track(
      df.select(col(valueCol).cast("string").as(valueCol))
        .filter(col(valueCol).isNotNull).persist())
    val threshold = math.ceil(minFrac * vals.count()).toLong
    vals.groupBy(col(valueCol))
      .agg(count(lit(1)).as("exact_n"))
      .join(broadcast(mgCandidates(vals, valueCol, k)),
        Seq(valueCol), "left_semi")
      .filter(col("exact_n") >= threshold)
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
    // persisted (r19): the sketch pass and the exact-count pass both
    // consume `vals`, and un-persisted each re-ran the caller's
    // upstream (q160: the bigram explode over the corpus) — the
    // [[mgHeavyHitters]] pattern applied here
    val vals = CacheRegistry.track(
      df.select(col(valueCol).cast("string").as(valueCol)).persist())
    val sketch = cmsSketch(vals, valueCol, depth, width)
    val exact = vals.groupBy(col(valueCol))
      .agg(count(lit(1)).as("exact_n"))
    cmsEstimate(sketch, exact, valueCol, depth, width)
      .filter(col("est_n") >= threshold)
      .select(col(valueCol), col("exact_n"), col("est_n"))
  }
}
