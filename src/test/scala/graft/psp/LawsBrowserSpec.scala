package graft.psp

import graft.SparkSpec

class LawsBrowserSpec extends SparkSpec {

  private def laws() = {
    import spark.implicits._
    Seq(
      (410L, 100, "Návrh zákona o rozpočtu", "in_progress", Seq("finance")),
      (411L, 100, "Duplikát rozpočtu", "in_progress", Seq("finance")),   // same ct -> dropped
      (412L, 101, "Novela školského zákona", "passed", Seq("education")),
      (413L, 102, "Zákon o daních", "rejected", Seq("finance", "tax")))
      .toDF("id_tisk", "ct", "nazev", "status", "topics")
  }

  test("dedupe by ct keeps smallest id_tisk; newest ct first") {
    val out = LawsBrowser.listLaws(laws()).collect()
    assert(out.map(_.getAs[Int]("ct")).toSeq == Seq(102, 101, 100))
    assert(out.find(_.getAs[Int]("ct") == 100).get.getAs[Long]("id_tisk") == 410L)
  }

  test("search is plain lowercase substring (reference parity: no strip)") {
    val hit = LawsBrowser.listLaws(laws(), search = Some("zákona"))
    assert(hit.count() == 2)
    // diacritic-free query does NOT match (the reference doesn't strip here)
    val miss = LawsBrowser.listLaws(laws(), search = Some("zakona"))
    assert(miss.count() == 0)
  }

  test("status and topic filters") {
    assert(LawsBrowser.listLaws(laws(), statusFilter = Some("passed")).count() == 1)
    assert(LawsBrowser.listLaws(laws(), statusFilter = Some("all")).count() == 3)
    assert(LawsBrowser.listLaws(laws(), topicFilter = Some("tax")).count() == 1)
  }

  test("allTopics explodes + dedups") {
    val topics = LawsBrowser.allTopics(laws()).collect().map(_.getString(0)).toSeq
    assert(topics == Seq("education", "finance", "tax"))
  }
}
