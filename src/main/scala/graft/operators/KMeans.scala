package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

/** Deterministic distributed k-means (Lloyd's) over an embedding column —
  * the clustering primitive behind SemDeDup-style semantic dedup and
  * corpus topic bucketing (ref: services/similarity_service.py clusters
  * MPs by vote vectors; this is the corpus-scale generalization).
  *
  * Every step is bit-deterministic ACROSS ENGINES, so the final
  * assignment is oracle-checkable cell-exact, not just "close":
  *
  *  - seeds: the k vectors with the smallest `md5(vec_id)` hex string
  *    (hash-derived randomness, no RNG), cluster ids 0..k-1 in that order;
  *  - distances: squared L2 on a scale-12 DECIMAL grid — each coordinate
  *    and centroid is rounded with exactly the double→DECIMAL(14,12) cast
  *    semantics, after which the diff/square/sum are pure integer math
  *    (exact and summation-order-free), so the argmin cannot flip between
  *    engines (fold order, SIMD, or partial-agg order never matter); ties
  *    break on the smaller cluster id. Since round 7 this runs as ONE
  *    native codegen expression (plans/GridArgmin.scala) — scale-12 longs
  *    and an unsigned 128-bit accumulator — replacing the interpreted
  *    `transform`/`zip_with`/`aggregate` decimal lambdas that dominated
  *    the cost; KMeansSpec pins bit-parity against an independent
  *    BigDecimal reference.
  *  - centroid update: the proven cross-engine mean shape (q65):
  *    `round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)/count, 9)` —
  *    a scale-9-rounded double re-enters the scale-12 grid exactly
  *    (nearest-double error ~1e-17 << 0.5e-12). Empty clusters keep
  *    their previous centroid.
  *
  * Scale shape (100 TB): assignment is a PER-ROW expression against k
  * broadcast centroid constants — no shuffle, no join; the update is a
  * partial-aggregated groupBy onto k·dims cells, and only those k·dims
  * rounded means (a few KB, independent of data size) ever reach the
  * driver between iterations — the same driver/executor split Lloyd's
  * has in any distributed implementation.
  */
object KMeans {

  /** Exact assignment tier: the codegen'd grid argmin. The centroid
    * rounding onto the grid happens on the driver inside `gridArgmin`
    * (same HALF_UP scale-12 semantics), so an out-of-grid SEED fails fast
    * at plan build with the domain named; out-of-grid DATA fails per-row
    * inside the expression with the same message.
    */
  private def assignment(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.plans.GraftFunctions.gridArgmin(vec.cast("array<double>"), centroids)

  /** Production assignment tier: squared-L2 via the native codegen'd dot
    * product — dist_j = v·v − 2·v·c_j + c_j·c_j, with the ‖c_j‖²
    * constants folded on the driver. Double math: deterministic within
    * Spark (fixed fold order) and fast (whole-stage codegen, no
    * per-element BigDecimal), but not bit-auditable against a second
    * engine — the exact tier exists for that. KMeansSpec proves the two
    * tiers assign identically on real-shaped data (they can only diverge
    * on sub-ulp distance ties).
    */
  private def fastAssignment(vec: Column, centroids: Array[Array[Double]]): Column = {
    val v = vec.cast("array<double>")
    val self = graft.plans.GraftFunctions.dotProduct(v, v)
    array_min(array(centroids.zipWithIndex.map { case (c, j) =>
      val c2 = c.map(x => x * x).sum
      struct(
        (self - lit(2.0) * graft.plans.GraftFunctions.dotProduct(v, lit(c))
          + lit(c2)).as("d"),
        lit(j).cast(IntegerType).as("j"))
    }: _*)).getField("j")
  }

  /** The k seed centroids: vectors of the k ids with the smallest
    * `md5(id)` hex, as raw doubles (floats widen exactly).
    */
  private def seeds(
      df: DataFrame, idCol: String, vecCol: String, k: Int): Array[Array[Double]] =
    df.select(col(vecCol).cast("array<double>").as("v"),
        md5(col(idCol).cast("string")).as("h"), col(idCol))
      .orderBy(col("h"), col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Double](0).toArray)

  private def withAssign(base: DataFrame, vecCol: String, outCol: String,
      cents: Array[Array[Double]], exact: Boolean): DataFrame =
    if (exact) base.withColumn(outCol, assignment(col(vecCol), cents))
    else base.withColumn(outCol, fastAssignment(col(vecCol), cents))

  /** The Lloyd's loop on an already-persisted source: seeds + `iters`
    * centroid updates, returning the final centroid matrix (k × dims,
    * each coordinate a scale-9-rounded double per the q65 mean shape —
    * except un-updated seed coordinates, which stay as given).
    * `private[operators]` so [[Pq.fit]] can run its m per-subspace
    * loops against cheap projections of ONE shared persisted source
    * instead of [[fitCentroids]]' per-call persist (m extra cached
    * copies of essentially the same data).
    */
  private[operators] def lloydCentroids(src: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, exact: Boolean): Array[Array[Double]] = {
    var centroids = seeds(src, idCol, vecCol, k)
    require(centroids.length == k,
      s"need at least k=$k rows to seed, got ${centroids.length}")
    for (_ <- 0 until iters) {
      val assigned = withAssign(src, vecCol, "__c", centroids, exact)
      // q65-shape decimal mean per (cluster, dim); only k*dims rounded
      // means come back to the driver
      val means = assigned
        .select(col("__c"), posexplode(col(vecCol)).as(Seq("__d", "__x")))
        .groupBy("__c", "__d")
        .agg(round(
          sum(col("__x").cast(DoubleType).cast(DecimalType(28, 12)))
            .cast(DoubleType) / count(lit(1)).cast(DoubleType), 9).as("m"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      centroids = centroids.zipWithIndex.map { case (prev, j) =>
        if (means.contains((j, 0))) prev.indices.map(d => means((j, d))).toArray
        else prev // empty cluster keeps its previous centroid
      }
    }
    centroids
  }

  /** The fitted centroid matrix alone — for callers that assign later,
    * elsewhere, or per-subspace ([[Pq]]): the identical deterministic
    * loop [[fitAssign]] runs, minus the final assignment projection.
    */
  def fitCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, exact: Boolean = true): Array[Array[Double]] = {
    require(k > 0, s"k=$k must be positive")
    require(iters >= 0, s"iters=$iters must be >= 0")
    val src = CacheRegistry.track(df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    lloydCentroids(src, idCol, vecCol, k, iters, exact)
  }

  /** Lloyd's iterations; returns (row*, cluster) — the input row with an
    * appended `cluster` int column from the final assignment. `iters` is
    * the number of centroid UPDATES (iters=0 assigns against the seeds).
    */
  def fitAssign(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, exact: Boolean = true): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(iters >= 0, s"iters=$iters must be >= 0")
    // Lloyd's re-scans the input iters+2 times (seeds, each update, the
    // final assignment) — persist it once, the standard k-means input
    // cache (MLlib does the same); MEMORY_AND_DISK so a corpus larger
    // than storage memory degrades to spill instead of OOM, and
    // CacheRegistry unpersists when the caller's query drains.
    val src = CacheRegistry.track(df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val centroids = lloydCentroids(src, idCol, vecCol, k, iters, exact)
    withAssign(src, vecCol, "cluster", centroids, exact)
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", 2023): cluster the
    * embeddings, then prune near-identical vectors WITHIN each cluster —
    * a row survives iff no smaller-id row in its cluster has cosine ≥
    * `threshold` with it. The clusters are what make this tractable: the
    * quadratic pair join runs per-cluster (one shuffle on the cluster
    * key), never across the corpus.
    *
    * Two layers bound the quadratic cost on degenerate corpora (nothing
    * is left unguarded — the repo rule that every quadratic tier carries
    * an explicit cap):
    *
    *  1. **Exact-duplicate collapse first** (the q72 precedent): rows
    *     sharing a bit-identical vector resolve against their group's
    *     min-id representative directly — a non-representative is killed
    *     iff the group's self-cosine `dot/(√dot·√dot)` clears the
    *     threshold (the identical formula the pair join would apply, so
    *     the kill set is unchanged; for any practical threshold that is
    *     simply "norm > 0"). Only representatives enter the pair join,
    *     so an adversarial all-identical corpus costs one group, not
    *     n²/2 pairs. Identical vectors always share a cluster (the
    *     assignment is a function of the vector), so collapsing globally
    *     is safe.
    *  2. **Oversized-cluster sub-bucketing**: clusters whose
    *     representative count exceeds `maxClusterSize` are hash-split on
    *     `xxhash64(vector)` into ⌈size/maxClusterSize⌉ sub-buckets and
    *     the pair join runs per (cluster, bucket). RECALL NOTE: near-dup
    *     pairs that straddle two sub-buckets of an oversized cluster are
    *     missed — this trades recall for a hard per-task pair bound, and
    *     only engages when k was picked too small for the corpus (the
    *     paper's contract is clusters of ~1-10k members). Exact
    *     duplicates are never affected: they were collapsed in layer 1,
    *     and layer 2 hashes the vector, not the id, so any residual
    *     identical vectors co-bucket anyway. Never engages below the
    *     cap — default 10000 leaves every in-contract corpus (and the
    *     q92 oracle query) byte-identical to the unguarded plan.
    *
    * Zero-norm rows can neither kill nor be killed (the cosine guard
    * requires both norms > 0), so they skip the join and always survive —
    * same outcome as the unguarded formulation, minus the wasted pairs.
    *
    * Returns the surviving rows with their `cluster` column.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, threshold: Double, exact: Boolean = true,
      maxClusterSize: Int = 10000): DataFrame = {
    require(threshold > 0 && threshold < 1,
      s"threshold=$threshold must be in (0,1)")
    require(maxClusterSize > 0, s"maxClusterSize=$maxClusterSize must be positive")
    // the final assignment feeds the pair join AND the anti-join base;
    // compute it once
    val assigned = CacheRegistry.track(
      fitAssign(df, idCol, vecCol, k, iters, exact).persist())
    val dot = graft.plans.GraftFunctions.dotProduct(_: Column, _: Column)
    // cosine as dot/(na*nb) with per-row cached norms — the SAME formula
    // association the SQL oracle uses (normalize-then-dot rounds
    // differently in the last ulp, and the kill set is a binary decision
    // with no cushion to absorb a near-threshold flip); also cheaper:
    // one dot per pair instead of two normalized array materializations
    val withNorm = assigned
      .withColumn("__v", col(vecCol).cast("array<double>"))
      .withColumn("__d", dot(col("__v"), col("__v")))
      .withColumn("__n", sqrt(col("__d")))
    // layer 1: exact-dup collapse — partial-aggregated groupBy on the
    // vector bytes (skew-safe: a hot identical vector combines map-side),
    // then a 1:n join back; `marked` feeds the dup kills and the reps
    val groups = withNorm.groupBy(col("__v")).agg(min(col(idCol)).as("__minId"))
    val marked = CacheRegistry.track(withNorm.join(groups, Seq("__v")).persist())
    val dupKill = col(idCol) > col("__minId") && col("__n") > lit(0.0) &&
      col("__d") / (col("__n") * col("__n")) >= lit(threshold)
    val exactKilled = marked.filter(dupKill).select(col(idCol))
    val reps = marked.filter(!dupKill && col("__n") > lit(0.0))
    // layer 2: per-cluster representative counts (k tiny rows) decide
    // sub-bucketing; the common case collects k rows and buckets nothing
    val oversized = reps.groupBy("cluster").agg(count(lit(1)).as("__cn"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1) + maxClusterSize - 1) / maxClusterSize))
      .filter(_._2 > 1).toMap
    val bucket = oversized.foldLeft(lit(0L)) { case (acc, (cid, nsub)) =>
      when(col("cluster") === lit(cid),
        pmod(xxhash64(col("__v")), lit(nsub))).otherwise(acc)
    }
    val sides = reps.withColumn("__b", bucket)
    val a = sides.select(col("cluster"), col("__b"), col(idCol).as("__id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = sides.select(col("cluster"), col("__b"), col(idCol).as("__id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    val joinKilled = a.join(b, Seq("cluster", "__b"))
      .filter(col("__id_a") < col("__id_b"))
      .filter(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))
        >= lit(threshold))
      .select(col("__id_b").as(idCol))
    val killed = joinKilled.unionAll(exactKilled).distinct()
    assigned.join(killed, Seq(idCol), "left_anti")
  }

  /** D4-style prototype-proximity filter (Tirumala et al., "D4:
    * Improving LLM Pretraining via Document De-Duplication and
    * Diversification", 2023): cluster the embeddings, then DROP the
    * `dropFrac` most PROTOTYPICAL rows of each cluster — the rows
    * closest to their centroid, i.e. the generic near-duplicates of
    * the cluster's center of mass. The complement of [[semanticDedup]]
    * (which prunes pairwise near-identical rows): together they are
    * the paper's dedup-then-diversify recipe.
    *
    * Exact tier end to end: the assignment is [[GridArgmin]]'s
    * scale-12 grid argmin, and the ranking distance is its per-row
    * companion `GridDistTo` — the SAME 128-bit integer fold the argmin
    * compared, surfaced as DECIMAL(38,24), so rank order is
    * bit-deterministic across engines and partitionings (ties break on
    * the smaller id). A row keeps iff its distance rank within the
    * cluster exceeds `floor(dropFrac · clusterSize)`.
    *
    * Returns every input row plus `cluster`, `dist` (the exact decimal
    * squared grid distance), `proto_rank` (1 = most prototypical), and
    * `keep`. Scale shape: one codegen expression per row for
    * assignment + distance (no join, no explode), then ONE shuffle on
    * `cluster` for the two window functions — the same partitioning
    * both windows reuse.
    */
  def prototypeFilter(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, dropFrac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dropFrac >= 0.0 && dropFrac < 1.0,
      s"dropFrac=$dropFrac must be in [0, 1)")
    require(k > 0, s"k=$k must be positive")
    require(iters >= 0, s"iters=$iters must be >= 0")
    val src = CacheRegistry.track(df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cents = lloydCentroids(src, idCol, vecCol, k, iters, exact = true)
    val assigned = withAssign(src, vecCol, "cluster", cents, exact = true)
    val distCol = graft.plans.GraftFunctions.gridDistTo(
      col(vecCol).cast("array<double>"), col("cluster"), cents)
    val byDist = Window.partitionBy(col("cluster"))
      .orderBy(col("dist").asc, col(idCol).asc)
    val cluster = Window.partitionBy(col("cluster"))
    assigned.withColumn("dist", distCol)
      .withColumn("proto_rank", row_number().over(byDist).cast("long"))
      .withColumn("__nc", count(lit(1)).over(cluster))
      .withColumn("keep", col("proto_rank") >
        floor(lit(dropFrac) * col("__nc").cast("double")).cast("long"))
      .drop("__nc")
  }
}
