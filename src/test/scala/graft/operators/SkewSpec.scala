package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("salted inner join equals plain inner join") {
    val session = spark
    import session.implicits._
    // key 1 is hot: 900 of 1000 rows
    val left = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong + 1000)))
      .toDF("k", "row_id")
    val right = (1L to 9L).map(k => (k, s"dim$k")).toDF("k", "v")
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "row_id", "v").collect().map(_.toSeq).toSet
    val salted = Skew.saltedInnerJoin(left, right, "k", factor = 8,
      leftDistinct = Seq("row_id"))
      .select("k", "row_id", "v").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("salted distinct count equals exact countDistinct") {
    val session = spark
    import session.implicits._
    val df = (1 to 2000).map(i => (i % 3, s"v${i % 157}")).toDF("k", "v")
    val exact = df.groupBy("k").agg(
      org.apache.spark.sql.functions.countDistinct("v").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(df, "k", "v", factor = 16)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == exact)
  }
}
