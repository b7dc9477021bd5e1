package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the embedding-compression
  * layer a 100 TB-scale ANN index actually stores: split each vector
  * into `m` contiguous subspaces, k-means each subspace independently
  * ([[KMeans.fitCentroids]] — the same md5-seeded, decimal-grid
  * deterministic Lloyd's every clustering tier here uses), and encode a
  * vector as `m` small centroid ids. A 64-dim float vector (256 bytes)
  * becomes `m` bytes-ish of codes; distance queries run against the
  * codes via ADC (asymmetric distance computation) — per-subspace
  * lookup tables of the query's distance to each codeword, summed —
  * never touching the original vectors.
  *
  * Every stage is bit-deterministic across engines, so both the codes
  * AND the ADC ranking are oracle-checkable cell-exact:
  *
  *  - per-subspace training is [[KMeans.fitCentroids]] verbatim (the
  *    seeds depend only on `md5(id)`, so all subspaces seed from the
  *    same rows' sub-vectors — one orderBy, not m);
  *  - encoding is the [[graft.plans.GridArgmin]] codegen expression per
  *    subspace — scale-12 decimal grid, exact integer distance math,
  *    smallest-id tie-break;
  *  - ADC lookup tables are computed on the DRIVER in exact integer
  *    arithmetic over the same grid (BigInteger sums of squared
  *    scale-12 diffs → scale-24 BigDecimal constants), and the
  *    per-row distance is a sum of `m` exact DECIMAL literals chosen
  *    by code — no float summation anywhere, so the (dist, id) order
  *    the top-k sees is identical in any engine.
  *
  * Scale shape: fit touches only `k·dims` rounded means per iteration
  * (driver traffic independent of corpus size); encode is a per-row
  * codegen expression against `m · k` broadcast-constant codewords (no
  * shuffle, no join); ADC top-k is a per-row expression + one
  * `TakeOrderedAndProject` — the classic IVF-PQ read path minus the
  * (orthogonal) IVF routing, which [[Ann.ivfTopK]] already owns.
  */
object Pq {

  /** A fitted PQ model: `codebooks(s)(j)` is subspace `s`'s codeword
    * `j` (length `subDim`), coordinates on the scale-9-rounded-double
    * centroid form [[KMeans.fitCentroids]] emits.
    */
  final case class Model(m: Int, subDim: Int,
      codebooks: Array[Array[Array[Double]]])

  private def subSlice(vecCol: String, s: Int, subDim: Int): Column =
    slice(col(vecCol).cast("array<double>"), s * subDim + 1, subDim)

  /** Train one codebook per subspace. `dim` must be divisible by `m`;
    * every input vector must have exactly `dim` coordinates (the
    * encode expression fails fast per-row otherwise, the
    * [[graft.plans.GridArgmin]] convention).
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, k: Int, iters: Int): Model = {
    require(m > 0 && dim > 0 && dim % m == 0,
      s"dim=$dim must be a positive multiple of m=$m")
    val subDim = dim / m
    // one persist shared by all m training runs (each re-scans it)
    val src = CacheRegistry.track(
      df.select(col(idCol), col(vecCol)).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val codebooks = (0 until m).map { s =>
      // lloydCentroids, not fitCentroids: the projection re-reads the
      // ONE persisted src (slicing is map-side free) instead of
      // caching m additional sliced copies of the same vectors
      KMeans.lloydCentroids(
        src.select(col(idCol), subSlice(vecCol, s, subDim).as("__sub")),
        idCol, "__sub", k, iters, exact = true)
    }.toArray
    Model(m, subDim, codebooks)
  }

  /** Encode each vector as its `m` per-subspace codeword ids:
    * `(row*, code array<int>)`.
    */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("code", array((0 until model.m).map { s =>
      graft.plans.GraftFunctions.gridArgmin(
        subSlice(vecCol, s, model.subDim), model.codebooks(s))
    }: _*))

  /** The exact scale-24 squared distance between two scale-12 grid
    * points, as a BigDecimal constant (driver-side, BigInteger exact).
    */
  private def gridDist2(a: Array[Double], b: Array[Double]): java.math.BigDecimal = {
    var sum = java.math.BigInteger.ZERO
    var i = 0
    while (i < a.length) {
      val d = java.math.BigInteger.valueOf(
        graft.plans.GridArgmin.toGrid(a(i)) - graft.plans.GridArgmin.toGrid(b(i)))
      sum = sum.add(d.multiply(d))
      i += 1
    }
    new java.math.BigDecimal(sum, 24)
  }

  /** ADC top-k: the `k` ids nearest to `query` by the PQ-approximated
    * squared L2 — `Σ_s lut_s(code_s)` where `lut_s(j) = ‖query_s −
    * codebook_s(j)‖²` on the exact decimal grid. Ties (and the
    * approximation's frequent exact-distance collisions — every vector
    * sharing a code sequence shares a distance) break on the smaller
    * id, so the ranking is total and engine-independent. Returns
    * `(rank, idCol)`, rank 1-based.
    *
    * The LUT is inlined as a `when`-chain of `m · k` decimal
    * constants — exactly right for PQ's standard k ≤ 256 (≤ 1024
    * branches across 4 subspaces); a much larger k would want the
    * LUT as a broadcast array lookup instead, trading the exact
    * decimal literals for grid longs.
    */
  def adcTopK(codes: DataFrame, idCol: String, codeCol: String,
      model: Model, query: Array[Double], topK: Int): DataFrame = {
    require(query.length == model.m * model.subDim,
      s"query dim ${query.length} != model dim ${model.m * model.subDim}")
    require(topK > 0, s"topK=$topK must be positive")
    // DECIMAL(30,24), not (38,24): Spark widens an addition's precision
    // by one per step, and at 38 it would RE-SCALE (losing the exact
    // last digits); grid coords are < 10 so a subspace distance is
    // < 400·subDim — six integer digits of headroom keep all m-1
    // additions inside precision 38 with scale 24 intact, i.e. exact.
    val dist = (0 until model.m).map { s =>
      val qs = query.slice(s * model.subDim, (s + 1) * model.subDim)
      val c = col(codeCol).getItem(s)
      // fail FAST on a code outside this codebook (a codes table from
      // a different/older model, or corruption) — a null fall-through
      // would sort nulls-first and silently crown a garbage neighbor
      val outOfRange = raise_error(concat(
        lit(s"pq code out of range for subspace $s (k=" +
          s"${model.codebooks(s).length}): "), c.cast("string")))
        .cast("decimal(30,24)")
      (0 until model.codebooks(s).length).foldLeft(outOfRange) {
        (acc, j) => when(c === j, lit(gridDist2(qs, model.codebooks(s)(j)))
          .cast("decimal(30,24)")).otherwise(acc)
      }
    }.reduce(_ + _)
    val top = codes.select(col(idCol), dist.as("__adc"))
      .orderBy(col("__adc"), col(idCol))
      .limit(topK)
    top.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__adc"), col(idCol))).cast("long"))
      .select(col("rank"), col(idCol))
  }

  /** The IVF-PQ read path — the composition a 100 TB ANN serving layer
    * actually runs ([[Ann]] owns the routing, this file the scoring):
    * route the query to its `nprobe` nearest coarse cells
    * ([[Ann.probeCells]] — driver-side, `cells`-sized), PARTITION-PRUNE
    * to those cells' rows (over [[Ann.writeCellPartitioned]]'s layout
    * this is nprobe/cells of the I/O), then rank by ADC over the PQ
    * codes — so a query touches neither the full corpus nor any full
    * vector in the probed slice. Same exact-decimal ranking contract
    * as [[adcTopK]].
    */
  def ivfPqTopK(
      assigned: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])], model: Model,
      query: Array[Double], topK: Int, nprobe: Int): DataFrame =
    adcTopK(
      encode(assigned.filter(
        col("cell").isin(Ann.probeCells(centroids, query.toSeq, nprobe): _*)),
        vecCol, model),
      idCol, "code", model, query, topK)
}
