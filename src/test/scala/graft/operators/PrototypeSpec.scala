package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrototypeSpec extends SparkSpec {

  private def grid(d: Double): JBD =
    JBD.valueOf(d).setScale(12, RoundingMode.HALF_UP)

  /** Exact BigDecimal replay of the squared grid distance (the KMeansSpec
    * reference convention — the operator must match bit-for-bit).
    */
  private def refDist(v: Array[Double], c: Array[Double]): JBD =
    v.indices.map { i =>
      val diff = grid(v(i)).subtract(grid(c(i)))
      diff.multiply(diff)
    }.foldLeft(JBD.ZERO)(_.add(_))

  private def toDf(data: Seq[(Long, Array[Double])]) = {
    val session = spark
    import session.implicits._
    data.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
  }

  test("GridDistTo returns the exact BigDecimal grid distance to the " +
      "assigned centroid (bit parity, scale 24)") {
    val cents = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    val data = Seq(
      1L -> Array(0.1, 0.2), 2L -> Array(0.9, 0.8), 3L -> Array(0.5, 0.5))
    val df = toDf(data)
      .withColumn("cluster", graft.plans.GraftFunctions.gridArgmin(
        col("embedding").cast("array<double>"), cents))
      .withColumn("dist", graft.plans.GraftFunctions.gridDistTo(
        col("embedding").cast("array<double>"), col("cluster"), cents))
    val rows = df.collect().map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Int]("cluster"), r.getAs[java.math.BigDecimal]("dist"))).toSeq
    for ((id, cl, got) <- rows) {
      val v = data.find(_._1 == id).get._2.map(_.toFloat.toDouble)
      val want = refDist(v, cents(cl)).setScale(24)
      assert(got.compareTo(want) == 0, s"id=$id cluster=$cl got=$got want=$want")
    }
  }

  test("prototypeFilter drops exactly the floor(dropFrac*n) closest rows " +
      "per cluster, ranks break distance ties on the smaller id") {
    // two tight blobs of 4; ids 10/11 are EQUIDISTANT duplicates so the
    // rank tie must resolve to the smaller id
    val data = Seq(
      10L -> Array(1.0, 0.0), 11L -> Array(1.0, 0.0),
      12L -> Array(1.02, 0.0), 13L -> Array(1.4, 0.0),
      20L -> Array(0.0, 1.0), 21L -> Array(0.0, 1.01),
      22L -> Array(0.0, 1.02), 23L -> Array(0.0, 1.4))
    val out = KMeans.prototypeFilter(toDf(data), "vec_id", "embedding",
        k = 2, iters = 1, dropFrac = 0.25)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    // per cluster of n members: exactly floor(0.25*n) drops, and the
    // dropped rows are the LOWEST-ranked (closest to the centroid)
    val clusters = out.values.groupBy(_.getAs[Int]("cluster"))
    for ((_, rows) <- clusters) {
      val n = rows.size
      val wantDrops = (0.25 * n).toInt
      val dropped = rows.filter(!_.getAs[Boolean]("keep"))
      assert(dropped.size == wantDrops, s"cluster of $n: ${dropped.size}")
      assert(dropped.map(_.getAs[Long]("proto_rank")).toSet ==
        (1L to wantDrops.toLong).toSet)
    }
    // the duplicate pair ties on distance: smaller id gets the lower rank
    val r10 = out(10L).getAs[Long]("proto_rank")
    val r11 = out(11L).getAs[Long]("proto_rank")
    assert(r10 < r11, s"tie must break to the smaller id: $r10 vs $r11")
  }

  test("dropFrac = 0 keeps everything; invalid dropFrac is refused") {
    val data = (0L until 6L).map(i => i -> Array(i * 0.1, 0.0))
    val out = KMeans.prototypeFilter(toDf(data), "vec_id", "embedding",
      k = 2, iters = 0, dropFrac = 0.0).collect()
    assert(out.forall(_.getAs[Boolean]("keep")))
    intercept[IllegalArgumentException] {
      KMeans.prototypeFilter(toDf(data), "vec_id", "embedding",
        k = 2, iters = 0, dropFrac = 1.0)
    }
  }
}
