package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Value-level PCA gate (the q34 catalog entry is rows-only in the DuckDB
  * harness because SVD signs aren't portable): verify pca2's SCORES
  * against an independent local eigendecomposition on sf0.001 —
  * deterministic power iteration with deflation over the centered
  * Gramian, compared per row sign-invariantly. This pins the VALUES
  * (components, not just shapes) without relying on any engine's SVD
  * sign convention.
  */
class PcaOracleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Top eigenpair of symmetric matrix `m` by fixed-iteration power
    * method with a deterministic start vector.
    */
  private def powerIter(m: Array[Array[Double]], iters: Int = 2000)
      : (Double, Array[Double]) = {
    val n = m.length
    var v = Array.tabulate(n)(i => 1.0 / math.sqrt((i + 1).toDouble))
    var lambda = 0.0
    (0 until iters).foreach { _ =>
      val w = Array.tabulate(n)(i => {
        var s = 0.0; var j = 0
        while (j < n) { s += m(i)(j) * v(j); j += 1 }
        s
      })
      val norm = math.sqrt(w.map(x => x * x).sum)
      lambda = norm
      v = w.map(_ / norm)
    }
    (lambda, v)
  }

  test("pca2 scores match an independent local eigendecomposition " +
      "per row, sign-invariantly (values, not just row counts)") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val n = rows.length
    val dim = rows.head._2.length

    // center columns locally
    val means = new Array[Double](dim)
    rows.foreach { case (_, v) => var i = 0; while (i < dim) { means(i) += v(i); i += 1 } }
    (0 until dim).foreach(i => means(i) /= n)
    val centered = rows.map { case (id, v) =>
      id -> Array.tabulate(dim)(i => v(i) - means(i))
    }

    // Gramian XtX, top-2 eigenpairs via power iteration + deflation
    val g = Array.ofDim[Double](dim, dim)
    centered.foreach { case (_, c) =>
      var i = 0
      while (i < dim) {
        var j = 0
        val ci = c(i)
        while (j < dim) { g(i)(j) += ci * c(j); j += 1 }
        i += 1
      }
    }
    val (l1, v1) = powerIter(g)
    val deflated = Array.tabulate(dim, dim)((i, j) => g(i)(j) - l1 * v1(i) * v1(j))
    val (l2, v2) = powerIter(deflated)
    assert(l1 > l2 && l2 > 0, s"eigengap required for a stable check ($l1, $l2)")

    // expected scores: centered · v (reference semantics: U·S == X·V)
    val expected = centered.map { case (id, c) =>
      id -> ((0 until dim).map(i => c(i) * v1(i)).sum,
        (0 until dim).map(i => c(i) * v2(i)).sum)
    }.toMap

    val got = VectorOps.pca2(
        spark.read.parquet(s"$sf/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("features")),
        "vec_id", "features")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    assert(got.keySet == expected.keySet)
    val tol = 1e-6 * math.sqrt(l1) // relative to the component scale
    expected.foreach { case (id, (e1, e2)) =>
      val (g1, g2) = got(id)
      assert(math.abs(math.abs(g1) - math.abs(e1)) < tol,
        s"vec $id pc1: |$g1| vs |$e1|")
      assert(math.abs(math.abs(g2) - math.abs(e2)) < tol,
        s"vec $id pc2: |$g2| vs |$e2|")
    }

    // structural invariants of U·S scores: orthogonal components whose
    // energies are the top-2 eigenvalues
    val dot = got.values.map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6 * math.sqrt(l1 * l2), s"pc1 !⊥ pc2: $dot")
    val s1 = got.values.map { case (a, _) => a * a }.sum
    val s2 = got.values.map { case (_, b) => b * b }.sum
    assert(math.abs(s1 - l1) / l1 < 1e-9, s"energy(pc1)=$s1 != λ1=$l1")
    assert(math.abs(s2 - l2) / l2 < 1e-9, s"energy(pc2)=$s2 != λ2=$l2")
  }

  test("pcaInvariantAudit survives rank-deficient input as DIAGNOSTIC " +
      "rows (zero second axis, zero ratios) instead of crashing on the " +
      "pathology it exists to measure") {
    import spark.implicits._
    // dim = 1: the SVD can only return one component — the second axis
    // is structurally missing
    val df = (1L to 12L).map(i => (i, Array(i.toDouble)))
      .toDF("vec_id", "features")
    val got = VectorOps.pcaInvariantAudit(df, "vec_id", "features")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("v2_norm_defect") == 1.0,
      s"the missing second axis must READ as a defect: $got")
    assert(got("score_cross_corr") == 0.0 && !got.values.exists(_.isNaN),
      s"degenerate ratios must be 0, never NaN: $got")
    // constant vectors: total energy 0 — all ratios guard to 0
    val const = (1L to 8L).map(i => (i, Array(2.0, 2.0, 2.0, 2.0)))
      .toDF("vec_id", "features")
    val g2 = VectorOps.pcaInvariantAudit(const, "vec_id", "features")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(!g2.values.exists(v => v.isNaN || v.isInfinite), s"$g2")
    CacheRegistry.drain()
  }

  test("pcaInvariantAudit (q181): every defect row reads 0, the gate " +
      "rows read 1, and the decimal-path values match a scalar replay") {
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("features"))
    val got = VectorOps.pcaInvariantAudit(df, "vec_id", "features")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    for (m <- Seq("contraction_violations", "energy_defect_rel",
        "score_cross_corr", "v1_norm_defect", "v2_norm_defect",
        "v_orthogonality"))
      assert(got(m) == 0.0, s"$m = ${got(m)} must be exactly 0 at round-6")
    assert(got("pca_ge_axes") == 1.0)

    // scalar replay of the oracle's decimal formulation
    val rows = df.collect().map(_.getSeq[Double](1).toArray)
    val n = rows.length
    val dim = rows.head.length
    assert(got("n_rows") == n.toDouble && got("n_dims") == dim.toDouble)
    def dec(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val energies = (0 until dim).map { d =>
      val mean = rows.map(v => dec(v(d), 12)).sum.toDouble /
        n.toDouble // exact decimal sum, one double division
      rows.map(v => dec((v(d) - mean) * (v(d) - mean), 12)).sum
    }
    val total = energies.sum
    val top2 = energies.sorted.reverse.take(2).sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("total_ss") == r6(total.toDouble), s"total_ss ${got("total_ss")}")
    assert(got("axes_energy_rel") ==
      r6(top2.toDouble / total.toDouble), s"axes ${got("axes_energy_rel")}")
  }
}
