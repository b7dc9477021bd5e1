package graft.psp

import graft.SparkSpec

class RevoteGroupingSpec extends SparkSpec {

  test("revotes nest under the latest preceding primary of their letter") {
    import spark.implicits._
    // letter A: vote 1 primary, vote 3 revote -> nests under 1
    // letter A: vote 5 NON-revote -> new primary; vote 7 revote -> under 5
    // letter B: vote 2 is_revote but FIRST of its letter -> primary
    val facts = Seq(
      (1, 2, "A", 1L, 10L, false, "accepted"),
      (1, 2, "A", 3L, 30L, true, "rejected"),
      (1, 2, "A", 5L, 50L, false, "accepted"),
      (1, 2, "A", 7L, 70L, true, "accepted"),
      (1, 2, "B", 2L, 20L, true, "rejected"))
      .toDF("schuze", "bod", "letter", "vote_number", "id_hlasovani",
        "is_revote", "result")
    val out = Amendments.groupRevotes(facts).collect()
      .map(r => (r.getAs[String]("letter"), r.getAs[Long]("vote_number")) ->
        r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("revotes")
          .map(_.getAs[Long]("rv_vote_number"))).toMap
    assert(out.keySet == Set(("A", 1L), ("A", 5L), ("B", 2L)))
    assert(out(("A", 1L)) == Seq(3L))
    assert(out(("A", 5L)) == Seq(7L))
    assert(out(("B", 2L)) == Seq.empty)
  }
}
