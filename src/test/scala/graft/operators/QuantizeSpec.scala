package graft.operators

import graft.SparkSpec

/** Int8 quantization invariants: range, round-trip error bound, zero
  * vector, determinism.
  */
class QuantizeSpec extends SparkSpec {

  test("quantized values stay in [-127, 127] and dequantize within " +
      "scale/2 of the original; zero vectors quantize to zeros") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.999f)),
      (2L, Array(100f, -50f, 0f, 12.5f)),
      (3L, Array(0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("scale"), r.getAs[scala.collection.Seq[Int]]("q"))))
      .toMap
    val in = Map(
      1L -> Array(0.5f, -1.0f, 0.25f, 0.999f),
      2L -> Array(100f, -50f, 0f, 12.5f))
    for ((id, (scale, q)) <- out if id != 3L) {
      assert(q.forall(v => v >= -127 && v <= 127), s"$id out of range: $q")
      // the max-|x| element hits ±127 exactly
      assert(q.exists(v => math.abs(v) == 127), s"$id never saturates")
      q.zip(in(id)).foreach { case (v, x) =>
        assert(math.abs(v * scale - x) <= scale / 2 + 1e-12,
          s"$id round-trip error: q=$v x=$x scale=$scale")
      }
    }
    assert(out(3L)._1 == 0.0)
    assert(out(3L)._2.forall(_ == 0))
  }

  test("int8-quantized vectors preserve cosine neighborhoods: the " +
      "quantized top-1 lands in the float top-1's CLUSTER (exact top-1 " +
      "can flip between near-tied same-cluster neighbors — that is the " +
      "quantization contract, not a defect)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // three well-separated unit-ish cluster centers in 16 dims
    val centers = Array.fill(3)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 60).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = VectorOps.quantizeInt8(df, "vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("scale"), r.getAs[scala.collection.Seq[Int]]("q").toArray)))
      .toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val float = vecs.toMap
    var agree = 0
    for ((id, v) <- vecs) {
      def top1(score: Long => Double): Long =
        vecs.map(_._1).filter(_ != id).maxBy(score)
      val fTop = top1(j => cos(v, float(j)))
      val qTop = top1 { j =>
        val (s, qa) = q(j)
        val deq = qa.map(x => (x * s).toFloat)
        val (si, qi) = q(id)
        cos(qi.map(x => (x * si).toFloat), deq)
      }
      if (fTop % 3 == qTop % 3) agree += 1
    }
    // same-cluster agreement is what ANN recall needs; int8 keeps it
    // perfect on separated clusters (exact top-1 agrees ~85% because
    // same-cluster neighbors are near-ties at 0.05 noise)
    assert(agree == 60, s"cluster agreement only $agree/60")
  }
}
