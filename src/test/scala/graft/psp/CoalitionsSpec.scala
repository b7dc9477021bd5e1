package graft.psp

import graft.SparkSpec

class CoalitionsSpec extends SparkSpec {

  private def amendIds(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id_hlasovani")
  }

  test("party agreement on amendment votes: ANO vs ODS agree everywhere") {
    // restrict to votes 4,5 where ODS majority = A (Dvořák back in line)
    val out = Coalitions.partyAgreement(
      Fixtures.makeMpVotes(spark), Fixtures.makeVoidVotes(spark),
      Fixtures.makeMpInfo(spark), amendIds(4L, 5L)).collect()
    val anoOds = out.find(r => r.getAs[String]("party_a") == "ANO" &&
      r.getAs[String]("party_b") == "ODS").get
    assert(anoOds.getAs[Double]("agreement_rate") == 1.0)
  }

  test("amendment rebels require min 5 amendment votes") {
    val out = Coalitions.amendmentRebels(
      Fixtures.makeMpVotes(spark), Fixtures.makeVoidVotes(spark),
      Fixtures.makeMpInfo(spark), amendIds(1L, 2L, 3L, 4L, 5L), topN = 20)
      .collect()
    // every active MP has 5 amendment votes here; Dvořák tops the diff=0 list
    assert(out.nonEmpty)
    val dvorak = out.find(_.getAs[String]("prijmeni") == "Dvořák").get
    assert(dvorak.getAs[Long]("amend_votes") == 5L)
    assert(dvorak.getAs[Double]("amend_rebellion_pct") == 60.0)
    assert(dvorak.getAs[Double]("rebellion_diff") == 0.0)

    // with a 4-vote amendment set nobody passes the >=5 filter
    val none = Coalitions.amendmentRebels(
      Fixtures.makeMpVotes(spark), Fixtures.makeVoidVotes(spark),
      Fixtures.makeMpInfo(spark), amendIds(1L, 2L, 3L, 4L), topN = 20)
    assert(none.count() == 0)
  }

  test("party cohesion: ODS pulled down by its rebel, ANO perfect") {
    val out = Coalitions.partyCohesion(
      Fixtures.makeMpVotes(spark), Fixtures.makeVoidVotes(spark),
      Fixtures.makeMpInfo(spark), amendIds(1L, 2L, 3L))
      .collect().map(r => r.getAs[String]("party") -> r).toMap
    assert(out("ANO").getAs[Double]("overall_cohesion") == 1.0)
    // ODS: 15 active votes (3 MPs x 5), 3 rebellions -> 12/15 = 0.8
    assert(out("ODS").getAs[Double]("overall_cohesion") == 0.8)
    // amendment votes 1-3: ODS 9 rows, 3 rebellions -> 6/9
    assert(math.abs(out("ODS").getAs[Double]("amend_cohesion") - 2.0 / 3.0) < 1e-12)
    assert(out("ODS").getAs[Long]("amend_votes") == 9L)
  }
}
