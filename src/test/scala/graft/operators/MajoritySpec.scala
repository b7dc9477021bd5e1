// (MajorityAgg's single-pass Aggregator is spec-proven equal to the
// sum(when) formulation at the bottom of this suite)
package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MajoritySpec extends SparkSpec {

  private def facts() = {
    import spark.implicits._
    // vote 1: party X 2A/1B -> A ; vote 2: party X 1A/1B -> tie (dropped)
    // vote 3: party X 0A/2B -> B ; vote 1: party Y 1B -> B
    Seq(
      (1L, "X", "A"), (1L, "X", "A"), (1L, "X", "B"),
      (2L, "X", "A"), (2L, "X", "B"),
      (3L, "X", "B"), (3L, "X", "B"),
      (1L, "Y", "B"))
      .toDF("vote", "party", "code")
  }

  test("strict majority only; ties dropped (reference tie semantics)") {
    val m = Majority.majorityDirection(facts(), Seq("vote", "party"), "code", "A", "B")
      .collect().map(r => (r.getAs[Long]("vote"), r.getAs[String]("party")) ->
        r.getAs[String]("majority_dir")).toMap
    assert(m((1L, "X")) == "A")
    assert(m((3L, "X")) == "B")
    assert(m((1L, "Y")) == "B")
    assert(!m.contains((2L, "X"))) // tie -> dropped entirely
  }

  test("rebellion excludes tie votes from numerator AND denominator") {
    val wr = Majority.withRebellion(facts(), Seq("vote", "party"), "code", "A", "B")
    // vote 2 rows must not appear at all
    assert(wr.filter(col("vote") === 2L).count() == 0)
    val stats = Majority.rebellionStats(wr, Seq("party")).collect()
      .map(r => r.getAs[String]("party") -> r).toMap
    // party X: 6 non-tie active rows, rebel rows: vote1 B (1)
    assert(stats("X").getAs[Long]("total_votes") == 5L)
    assert(stats("X").getAs[Long]("rebellion_cnt") == 1L)
    assert(stats("X").getAs[Double]("rebellion_pct") == 20.0)
  }

  test("single-pass Aggregator UDAF equals the sum(when) majority on a " +
      "random fact table (incl. ties and no-active groups)") {
    import org.apache.spark.sql.functions._
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(13)
    val codes = Seq("A", "B", "C", "@")
    val df = (0 until 2000).map { _ =>
      (rnd.nextInt(60).toLong, s"p${rnd.nextInt(4)}", codes(rnd.nextInt(codes.size)))
    }.toDF("vote", "party", "code").repartition(7)
    val viaUdaf = df.groupBy("vote", "party")
      .agg(MajorityAgg.majorityDirectionUdaf(col("code"), "A", "B").as("majority_dir"))
      .filter(col("majority_dir").isNotNull)
      .collect()
      .map(r => (r.getAs[Long]("vote"), r.getAs[String]("party")) ->
        r.getAs[String]("majority_dir")).toMap
    val viaSumWhen = Majority.majorityDirection(df, Seq("vote", "party"), "code", "A", "B")
      .collect()
      .map(r => (r.getAs[Long]("vote"), r.getAs[String]("party")) ->
        r.getAs[String]("majority_dir")).toMap
    assert(viaUdaf == viaSumWhen)
    assert(viaUdaf.nonEmpty)
  }

  test("pairwise agreement over majorities") {
    val maj = Majority.majorityDirection(facts(), Seq("vote", "party"), "code", "A", "B")
    val agg = Majority.pairwiseAgreement(maj, "vote", "party").collect()
    assert(agg.length == 1) // only vote 1 common to X and Y
    val r = agg(0)
    assert(r.getAs[String]("group_a") == "X")
    assert(r.getAs[String]("group_b") == "Y")
    assert(r.getAs[Long]("agree_cnt") == 0L) // A vs B
    assert(r.getAs[Double]("agreement_rate") == 0.0)
  }
}
