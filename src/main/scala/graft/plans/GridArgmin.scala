package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native codegen argmin over scale-12 decimal-grid squared L2 distances —
  * the exact-tier k-means assignment (graft.operators.KMeans) as ONE
  * expression instead of `transform` + k × (`zip_with` + `aggregate`)
  * interpreted decimal lambdas.
  *
  * Bit-equivalence to the decimal formulation: each coordinate is rounded
  * onto the scale-12 grid with EXACTLY Spark's double→DECIMAL(14,12) cast
  * semantics (`java.math.BigDecimal.valueOf` — i.e. `Double.toString`
  * binding — then HALF_UP at scale 12); from there every quantity is an
  * integer: grid values are scale-12 longs (|x| < 10 ⇒ |long| < 10¹³),
  * diffs fit a long, squares fit 128 bits (< 4·10²⁶ < 2⁸⁹), and the sum of
  * squares is accumulated in an unsigned 128-bit (hi, lo) pair — exact and
  * order-free, so the argmin (ties to the smaller cluster id) cannot
  * differ from the DECIMAL(30,24) fold the oracle replays.
  *
  * The centroids are plan-time constants (already on the grid as scale-12
  * longs); only the per-row coordinate rounding still touches BigDecimal —
  * once per element, not once per element per cluster. Out-of-grid
  * coordinates (|x| ≥ 10) fail with the domain named, matching the
  * decimal tier's raise_error contract.
  *
  * Dims are fixed per corpus; if a centroid and vector disagree in length
  * the common prefix is compared (callers guarantee equal dims, the
  * DotProduct convention). A null ELEMENT fails loudly with the position
  * named (the decimal tier's raise_error convention): this tier exists to
  * be auditable, and silently reading a null slot as 0.0 would poison the
  * argmin instead.
  */
case class GridArgmin(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "GridArgmin needs at least one centroid")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "grid_argmin"

  override protected def nullSafeEval(input: Any): Any =
    GridArgmin.argmin(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.GridArgmin.argmin($c, $cents);")
  }

  override protected def withNewChildInternal(newChild: Expression): GridArgmin =
    copy(child = newChild)
}

object GridArgmin {

  /** Spark's double→DECIMAL(14,12) cast as a scale-12 long: decimal
    * binding via `BigDecimal.valueOf` (Double.toString), HALF_UP — the
    * identical rounding the interpreted cast performs, so grid values
    * match the decimal tier bit-for-bit.
    */
  def toGrid(x: Double): Long = {
    if (!(math.abs(x) < 10.0)) throw new IllegalArgumentException(
      "KMeans exact tier requires |coordinate| < 10 (scale-12 decimal " +
        s"grid); got $x. Pre-scale the vectors or use exact = false.")
    java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  /** Static entry for both the interpreted eval and the generated code
    * (Scala emits a static forwarder on the companion class, so Janino
    * sees a plain `graft.plans.GridArgmin.argmin` static call).
    */
  def argmin(v: ArrayData, cents: Array[Array[Long]]): Int = {
    val n = v.numElements()
    val g = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) throw new IllegalArgumentException(
        s"KMeans exact tier requires dense vectors; null coordinate at index $i")
      g(i) = toGrid(v.getDouble(i)); i += 1
    }
    var best = -1
    var bestHi = 0L
    var bestLo = 0L
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val m = math.min(n, c.length)
      var hi = 0L
      var lo = 0L
      var idx = 0
      while (idx < m) {
        val d = g(idx) - c(idx)
        val p = d * d
        val nl = lo + p
        hi += Math.multiplyHigh(d, d) +
          (if (java.lang.Long.compareUnsigned(nl, lo) < 0) 1L else 0L)
        lo = nl
        idx += 1
      }
      if (best < 0 || hi < bestHi ||
          (hi == bestHi && java.lang.Long.compareUnsigned(lo, bestLo) < 0)) {
        best = j; bestHi = hi; bestLo = lo
      }
      j += 1
    }
    best
  }

  /** Exact squared grid distance from a vector to centroid `j`, as the
    * DECIMAL(38,24) the oracle's decimal fold produces: the same
    * scale-12 grid longs and unsigned-128 accumulation as [[argmin]],
    * re-expressed as `unscaled·10⁻²⁴` — order-free integer math end to
    * end, so the value (not just the argmin) is cross-engine exact.
    */
  def distTo(v: ArrayData, cents: Array[Array[Long]], j: Int)
      : org.apache.spark.sql.types.Decimal = {
    if (j < 0 || j >= cents.length) throw new IllegalArgumentException(
      s"cluster index $j outside the centroid table (k=${cents.length})")
    val c = cents(j)
    val n = v.numElements()
    val m = math.min(n, c.length)
    var hi = 0L
    var lo = 0L
    var idx = 0
    while (idx < m) {
      if (v.isNullAt(idx)) throw new IllegalArgumentException(
        s"KMeans exact tier requires dense vectors; null coordinate at index $idx")
      val d = toGrid(v.getDouble(idx)) - c(idx)
      val p = d * d
      val nl = lo + p
      hi += Math.multiplyHigh(d, d) +
        (if (java.lang.Long.compareUnsigned(nl, lo) < 0) 1L else 0L)
      lo = nl
      idx += 1
    }
    val unscaled = new java.math.BigInteger(java.lang.Long.toUnsignedString(hi))
      .shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(unscaled, 24), 38, 24)
  }
}

/** Squared grid distance to the row's ASSIGNED centroid (`cluster` is
  * the [[GridArgmin]] output or any 0-based centroid index) — the
  * per-row companion that lets prototype-proximity filters rank by the
  * exact distance the argmin compared, with no explode/join: one
  * codegen'd expression against the same plan-time centroid constants.
  */
case class GridDistTo(vec: Expression, cluster: Expression,
    centroids: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(centroids.nonEmpty, "GridDistTo needs at least one centroid")

  override def left: Expression = vec
  override def right: Expression = cluster
  override def dataType: DataType =
    org.apache.spark.sql.types.DecimalType(38, 24)
  override def prettyName: String = "grid_dist_to"

  override protected def nullSafeEval(v: Any, j: Any): Any =
    GridArgmin.distTo(v.asInstanceOf[ArrayData], centroids,
      j.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, (v, j) =>
      s"${ev.value} = graft.plans.GridArgmin.distTo($v, $cents, $j);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GridDistTo =
    copy(vec = newLeft, cluster = newRight)
}
