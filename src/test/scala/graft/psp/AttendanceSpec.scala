package graft.psp

import graft.SparkSpec

/** Mirrors reference tests/unit/services/test_attendance.py. */
class AttendanceSpec extends SparkSpec {

  private def run(sort: String = "worst", top: Int = 30) =
    Attendance.computeAttendance(
      Fixtures.makeMpVotes(spark), Fixtures.makeVoidVotes(spark),
      Fixtures.makeMpInfo(spark), top, sort)

  test("MP 5 exercises all buckets: attendance 2/(5-1) = 50 percent") {
    val rows = run().collect()
    val nova = rows.find(_.getAs[String]("prijmeni") == "Nová").get
    assert(nova.getAs[Long]("active") == 2L)    // A + C
    assert(nova.getAs[Long]("yes_votes") == 1L)
    assert(nova.getAs[Long]("abstained") == 1L)
    assert(nova.getAs[Long]("passive") == 1L)   // F
    assert(nova.getAs[Long]("absent") == 1L)    // @
    assert(nova.getAs[Long]("excused") == 1L)   // M
    assert(nova.getAs[Double]("attendance_pct") == 50.0)
  }

  test("worst sorts ascending by attendance_pct") {
    val rows = run("worst").collect()
    assert(rows.head.getAs[String]("prijmeni") == "Nová")
  }

  test("best sorts descending; full attendees at 100 percent first") {
    val rows = run("best").collect()
    assert(rows.head.getAs[Double]("attendance_pct") == 100.0)
  }

  test("most_yes returns MPs with five yes votes on top") {
    val rows = run("most_yes").collect()
    assert(rows.head.getAs[Long]("yes_votes") == 5L)
  }

  test("unknown sort falls back to worst") {
    val rows = run("nonsense").collect()
    assert(rows.head.getAs[String]("prijmeni") == "Nová")
  }
}
