package graft.psp

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  test("cross-party similarity: identical voters across parties rank first") {
    val pairs = Similarity.crossPartySimilarity(
      Fixtures.makeMpVotes(spark), Fixtures.makeVoidVotes(spark),
      Fixtures.makeMpInfo(spark), top = 20).collect()
    assert(pairs.nonEmpty)
    // MPs 1,2 (ANO) and 4,6 (ODS) voted identically -> cross-party cosine 1.0
    val top = pairs.head
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-12)
    assert(top.getAs[String]("mp1_party") != top.getAs[String]("mp2_party"))
    // Dvořák (3 of 5 opposite) must not beat the perfect pairs
    val names = pairs.take(4).flatMap(r =>
      Seq(r.getAs[String]("mp1_name"), r.getAs[String]("mp2_name")))
    assert(!names.contains("Karel Dvořák"))
  }

  test("pca coords: 2 components per MP, parties attached") {
    val coords = Similarity.computePcaCoords(
      Fixtures.makeMpVotes(spark), Fixtures.makeVoidVotes(spark),
      Fixtures.makeMpInfo(spark)).collect()
    assert(coords.length == 6)
    // sign-invariant check: the rebel (Dvořák) must be the farthest from
    // the all-yes cluster on PC1
    val byName = coords.map(r => r.getAs[String]("mp_name") -> r.getAs[Double]("x")).toMap
    val rebelX = math.abs(byName("Karel Dvořák"))
    val loyalX = math.abs(byName("Jan Novák"))
    assert(rebelX > loyalX)
  }
}
