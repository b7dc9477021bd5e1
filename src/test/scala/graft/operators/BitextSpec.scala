package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class BitextSpec extends SparkSpec {

  private def toDf(data: Seq[(Long, Array[Double])]) = {
    val session = spark
    import session.implicits._
    data.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
  }

  private val left = Seq(
    1L -> Array(1.0, 0.0, 0.0),
    2L -> Array(0.0, 1.0, 0.0),
    3L -> Array(0.0, 0.0, 1.0))
  private val right = Seq(
    11L -> Array(0.99, 0.1, 0.0),  // parallel to 1
    12L -> Array(0.1, 0.99, 0.0),  // parallel to 2
    13L -> Array(0.5, 0.5, 0.5))   // mild hub

  test("planted parallel pairs are mined mutually with margin > 1, and " +
      "mutual-top-1 makes both id columns unique") {
    val out = Ann.bitextMine(toDf(left), toDf(right), "vec_id",
        "embedding", k = 2, threshold = 1.0)
      .collect()
    val pairs = out.map(r =>
      r.getAs[Long]("id_left") -> r.getAs[Long]("id_right")).toSet
    assert(pairs.contains(1L -> 11L), pairs.toString)
    assert(pairs.contains(2L -> 12L), pairs.toString)
    assert(out.forall(_.getAs[Double]("margin") >= 1.0))
    val ls = out.map(_.getAs[Long]("id_left"))
    val rs = out.map(_.getAs[Long]("id_right"))
    assert(ls.distinct.length == ls.length)
    assert(rs.distinct.length == rs.length)
  }

  test("a higher threshold mines a subset; k may exceed the side size " +
      "(mean over available neighbors); invalid k refused") {
    val lo = Ann.bitextMine(toDf(left), toDf(right), "vec_id",
        "embedding", k = 2, threshold = 1.0).collect()
      .map(r => r.getAs[Long]("id_left") -> r.getAs[Long]("id_right")).toSet
    val hi = Ann.bitextMine(toDf(left), toDf(right), "vec_id",
        "embedding", k = 2, threshold = 1.3).collect()
      .map(r => r.getAs[Long]("id_left") -> r.getAs[Long]("id_right")).toSet
    assert(hi.subsetOf(lo), s"$hi not within $lo")
    val big = Ann.bitextMine(toDf(left), toDf(right), "vec_id",
      "embedding", k = 10, threshold = 0.0).collect()
    assert(big.nonEmpty)
    intercept[IllegalArgumentException] {
      Ann.bitextMine(toDf(left), toDf(right), "vec_id", "embedding",
        k = 0, threshold = 1.0)
    }
  }

  test("the ratio margin demotes a hub: a right vector that is the raw " +
      "cosine top-1 of MULTIPLE lefts can pair with at most one") {
    // hub 13 has decent cosine with every left; raw top-1 would let it
    // capture several — mutual top-1 + margin allows at most one
    val out = Ann.bitextMine(toDf(left), toDf(right), "vec_id",
        "embedding", k = 2, threshold = 0.0).collect()
    val hubPairs = out.count(_.getAs[Long]("id_right") == 13L)
    assert(hubPairs <= 1, out.mkString(","))
  }
}
