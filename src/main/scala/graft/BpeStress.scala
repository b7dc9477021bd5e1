package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for BPE merge learning: per-iteration cost of the
  * incremental pair-count formulation vs the full-rescan reference, BY
  * MERGE RANK, as the DISTINCT-WORD vocabulary grows (table replication
  * cannot show this — it grows counts, not the vocabulary, and the
  * iteration loop runs on the distinct-word table).
  *
  * Why rank matters: the first few merges genuinely touch a large
  * fraction of the vocabulary — no formulation makes THEM sublinear —
  * but at a production tokenizer's 32k merges virtually every iteration
  * is high-rank, where the affected-word set is tiny. The incremental
  * path's per-iteration cost must DECAY toward the fixed job-latency
  * floor as rank grows and stay near-flat as the vocabulary grows; the
  * full rescan stays O(Σ|w|) at every rank, at every size.
  *
  * Corpus: one synthetic word per row, `translate(id % V, digits →
  * letters)` — deterministic, no RNG, vocabulary size exactly V with
  * word length growing ~log₁₀(V) like a natural vocabulary.
  * Usage: `runMain graft.BpeStress [numMerges] [vocabSizes,...]`.
  */
object BpeStress {
  def main(args: Array[String]): Unit = {
    val numMerges = args.headOption.map(_.toInt).getOrElse(192)
    val sizes = (if (args.length > 1) args(1) else "1000000,10000000")
      .split(",").map(_.trim.toLong).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Bpe, CacheRegistry}

    def corpus(v: Long) = spark.range(3 * v)
      .select(translate(col("id").mod(v).cast("string"),
        "0123456789", "abcdefghij").as("text"))

    // rank buckets: median per-iteration seconds inside each — medians,
    // not means, because the box has real run-to-run GC/CPU variance
    val buckets = Seq((1, 8), (9, 32), (33, 96), (97, numMerges))
      .filter { case (lo, _) => lo <= numMerges }
    def bucketed(times: Array[Double]): String =
      buckets.map { case (lo, hi) =>
        val xs = times.slice(lo - 1, math.min(hi, times.length)).sorted
        if (xs.isEmpty) f"${s"$lo-$hi"}%9s:    -  "
        else f"${s"$lo-$hi"}%9s:${xs(xs.length / 2)}%6.2f s"
      }.mkString("  ")

    // throwaway compile/JIT warm-up
    Bpe.learnMerges(corpus(sizes.head / 10 max 1000), "text", 4)
    CacheRegistry.drain()
    Bpe.learnMergesFullRescan(corpus(sizes.head / 10 max 1000), "text", 4)
    CacheRegistry.drain()

    println(s"[bpe-stress] median per-iteration seconds by merge-rank " +
      s"bucket ($numMerges merges)")
    for (v <- sizes) {
      val ti = new Array[Double](numMerges)
      Bpe.learnMergesTimed(corpus(v), "text", numMerges, 32,
        (k, s) => ti(k - 1) = s)
      CacheRegistry.drain()
      val tf = new Array[Double](numMerges)
      Bpe.learnMergesFullRescan(corpus(v), "text", numMerges,
        onIter = (k, s) => tf(k - 1) = s)
      CacheRegistry.drain()
      println(f"[bpe-stress] V=$v%10d  incremental  ${bucketed(ti)}")
      println(f"[bpe-stress] V=$v%10d  full-rescan  ${bucketed(tf)}")
    }
    spark.stop()
  }
}
