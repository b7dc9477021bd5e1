package graft.psp

import graft.SparkSpec

/** Mirrors reference tests/unit/services/test_loyalty.py. */
class LoyaltySpec extends SparkSpec {

  private def run(voidWith3: Boolean = false, top: Int = 30,
      party: Option[String] = None) = {
    val voids = if (voidWith3) Fixtures.makeVoidVotesWith3(spark)
      else Fixtures.makeVoidVotes(spark)
    Loyalty.computeLoyalty(
      Fixtures.makeVotes(spark), Fixtures.makeMpVotes(spark), voids,
      Fixtures.makeMpInfo(spark), top, party)
  }

  test("rebel MP detected with exactly 60 percent rebellion") {
    val rows = run().collect()
    val dvorak = rows.find(_.getAs[String]("prijmeni") == "Dvořák").get
    // MP 3 rebels on votes 1-3 (B vs ODS majority A): 3/5 = 60.0
    assert(dvorak.getAs[Double]("rebellion_pct") == 60.0)
    assert(dvorak.getAs[Long]("rebellions") == 3L)
    assert(dvorak.getAs[Long]("active_votes") == 5L)
    // sorted worst-first: Dvořák leads
    assert(rows.head.getAs[String]("prijmeni") == "Dvořák")
  }

  test("loyal MPs have zero rebellion") {
    val rows = run().collect()
    val novak = rows.find(_.getAs[String]("prijmeni") == "Novák").get
    assert(novak.getAs[Double]("rebellion_pct") == 0.0)
  }

  test("rebellion vote details are collected and sorted desc") {
    val rows = run().collect()
    val dvorak = rows.find(_.getAs[String]("prijmeni") == "Dvořák").get
    val detail = dvorak.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("rebellion_votes")
    assert(detail.map(_.getAs[Long]("id_hlasovani")) == Seq(3L, 2L, 1L))
    assert(detail.head.getAs[String]("mp_vote") == "B")
    assert(detail.head.getAs[String]("party_direction") == "A")
  }

  test("void vote exclusion removes vote 3 from every stat") {
    val rows = run(voidWith3 = true).collect()
    val dvorak = rows.find(_.getAs[String]("prijmeni") == "Dvořák").get
    // without vote 3: rebels on 1,2 of 4 active votes = 50 %
    assert(dvorak.getAs[Long]("active_votes") == 4L)
    assert(dvorak.getAs[Double]("rebellion_pct") == 50.0)
  }

  test("party filter is case-insensitive") {
    val rows = run(party = Some("ods")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("party") == "ODS"))
  }

  test("empty mp_votes yields empty result") {
    val empty = Fixtures.makeMpVotes(spark).limit(0)
    val out = Loyalty.computeLoyalty(
      Fixtures.makeVotes(spark), empty, Fixtures.makeVoidVotes(spark),
      Fixtures.makeMpInfo(spark))
    assert(out.count() == 0)
  }

  test("top clamps the row count") {
    assert(run(top = 2).collect().length == 2)
  }
}
