package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PerplexityBucketsSpec extends SparkSpec {

  test("the SQL-standard tile rule per group: sizes differ by at most " +
      "one with larger buckets first, ordering is (score desc, id)") {
    val session = spark
    import session.implicits._
    // group A: 7 rows -> tiles 3/2/2; group B: 2 rows -> tiles 1/1/0
    val scored = (
      (1 to 7).map(i => (i.toLong, "A", -0.1 * i)) ++
      Seq((8L, "B", -0.5), (9L, "B", -0.2))
    ).toDF("doc_id", "grp", "score")
    val out = TextAnalysis.perplexityBuckets(scored, "grp", "doc_id",
        "score", buckets = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("grp"), r.getAs[Long]("bucket"))).toMap
    // A scores descend with doc_id ascending: -0.1 best ... -0.7 worst
    assert((1L to 3L).forall(out(_)._2 == 1L), out.toString)
    assert((4L to 5L).forall(out(_)._2 == 2L), out.toString)
    assert((6L to 7L).forall(out(_)._2 == 3L), out.toString)
    // B: best score -0.2 (doc 9) -> bucket 1, doc 8 -> bucket 2
    assert(out(9L)._2 == 1L && out(8L)._2 == 2L, out.toString)
  }

  test("score ties break on the smaller id (deterministic tiles) and " +
      "invalid buckets is refused") {
    val session = spark
    import session.implicits._
    val scored = Seq(
      (3L, "A", -0.5), (1L, "A", -0.5), (2L, "A", -0.5), (4L, "A", -0.9)
    ).toDF("doc_id", "grp", "score")
    val out = TextAnalysis.perplexityBuckets(scored, "grp", "doc_id",
        "score", buckets = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bucket"))
      .toMap
    // order: 1, 2, 3 (tied, id asc), 4 -> tiles of 2: {1,2} head, {3,4} tail
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L), out.toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.perplexityBuckets(scored, "grp", "doc_id", "score", 0)
    }
  }
}
