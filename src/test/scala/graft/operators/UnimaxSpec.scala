package graft.operators

import graft.SparkSpec

class UnimaxSpec extends SparkSpec {

  private def corpus(spec: (String, Int)*) = {
    val session = spark
    import session.implicits._
    spec.flatMap { case (g, n) =>
      (0 until n).map(i => (s"$g-$i".hashCode.toLong << 8 | i, g))
    }.toDF("doc_id", "grp")
  }

  private def allocs(df: org.apache.spark.sql.DataFrame, budget: Long) =
    Sampling.unimaxSample(df, "doc_id", "grp", budget)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("waterfill closed form: tail groups keep everything, the head " +
      "caps at the redistributed fair share") {
    // sorted (3, 5, 100), budget 20: A=3, B=5, C=floor(12/1)=12
    val out = allocs(corpus("A" -> 3, "B" -> 5, "C" -> 100), 20L)
    assert(out == Map("A" -> 3L, "B" -> 5L, "C" -> 12L), out.toString)
  }

  test("integer remainder distributes +1 apiece in sort order") {
    // three equal groups, budget 8: floor share 2, remainder 2 ->
    // first two groups in (count, name) order get 3, the last gets 2
    val out = allocs(corpus("A" -> 10, "B" -> 10, "C" -> 10), 8L)
    assert(out == Map("A" -> 3L, "B" -> 3L, "C" -> 2L), out.toString)
  }

  test("budget at or above the corpus keeps everything; the selection " +
      "is the md5-rank prefix (deterministic)") {
    val df = corpus("A" -> 4, "B" -> 2)
    val out = allocs(df, 100L)
    assert(out == Map("A" -> 4L, "B" -> 2L), out.toString)
    // determinism + prefix property: budget 3 -> A gets 1+? sorted
    // (B=2, A=4): t=floor(3/2)=1 < 2 -> pivot at B: both capped at 1,
    // remainder 1 -> B 2? no: rem = 3 - 1*2 = 1 -> first group (B) +1
    val small = allocs(df, 3L)
    assert(small == Map("B" -> 2L, "A" -> 1L), small.toString)
    // the kept A-doc is the smallest (md5(id), id) of A's ids
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val aIds = df.filter(org.apache.spark.sql.functions.col("grp") === "A")
      .collect().map(_.getLong(0))
    val expect = aIds.minBy(id => (md5hex(id.toString), id))
    val kept = Sampling.unimaxSample(df, "doc_id", "grp", 3L)
      .filter(org.apache.spark.sql.functions.col("grp") === "A")
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(kept == Seq(expect), s"$kept vs $expect")
  }

  test("invalid budget is refused") {
    intercept[IllegalArgumentException] {
      Sampling.unimaxSample(corpus("A" -> 1), "doc_id", "grp", 0L)
    }
  }
}
