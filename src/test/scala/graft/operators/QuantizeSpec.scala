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
}
