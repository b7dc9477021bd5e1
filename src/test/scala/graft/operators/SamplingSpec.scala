package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("stableSample is deterministic, key-stable, and ~keepBuckets/16") {
    val session = spark
    import session.implicits._
    val df = (1L to 4000L).map(i => (i, s"row$i")).toDF("id", "v")
    val s1 = Sampling.stableSample(df, "id", 2).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.stableSample(df.repartition(7), "id", 2)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // partitioning-independent
    assert(math.abs(s1.size / 4000.0 - 2.0 / 16.0) < 0.03)
    // monotone: larger keepBuckets is a superset
    val s4 = Sampling.stableSample(df, "id", 4).collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s4))
  }

  test("trainTestSplit partitions every row exactly once") {
    val session = spark
    import session.implicits._
    val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
    val out = Sampling.trainTestSplit(df, "id", 3)
    assert(out.count() == 1000)
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "test"))
    assert(bySplit.values.sum == 1000L)
  }
}
