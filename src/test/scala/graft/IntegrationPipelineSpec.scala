package graft

import graft.psp.{Analyzer, PeriodLoader}
import graft.serving.{GraftServer, PeriodCatalog}
import graft.sources.Downloader

/** End-to-end pipeline over a REAL psp.cz dump (reference
  * `tests/integration/test_pipeline.py:25-60`): Downloader →
  * PeriodLoader → Analyzer → GraftServer, period 1. Network-gated the
  * same way as DownloaderSpec — set SPARK_GRAFT_ONLINE=1 to run; in the
  * offline build grid this reports as canceled, not passed.
  */
class IntegrationPipelineSpec extends SparkSpec {

  test("real-dump pipeline: download, load, analyze, serve (period 1)") {
    assume(sys.env.get("SPARK_GRAFT_ONLINE").contains("1"),
      "set SPARK_GRAFT_ONLINE=1 to run the network integration test")
    val cache = java.nio.file.Files.createTempDirectory("graft-e2e")
    val root = Downloader.downloadPeriod(1, cache)

    // test_period_loads / test_*_non_empty
    val data = PeriodLoader.load(spark, root.toString, 1)
    assert(data.period == 1)
    val nVotes = data.votes.count()
    assert(nVotes > 0, "votes table empty")
    assert(data.mpVotes.count() > 0, "mp_votes table empty")
    val nMps = data.mpInfo.count()
    assert(nMps > 0, "mp_info table empty")

    // test_mp_info_has_parties: at most 50 % null parties
    val nullParties = data.mpInfo
      .filter(org.apache.spark.sql.functions.col("party").isNull).count()
    assert(nullParties.toDouble / nMps < 0.5,
      s"$nullParties of $nMps MPs have no party")

    // test_loyalty_produces_results: rebellion_pct in [0, 100]
    val analyzer = new Analyzer(data)
    val loyalty = analyzer.loyalty(10).collect()
    assert(loyalty.nonEmpty)
    loyalty.foreach { r =>
      val pct = r.getAs[Double]("rebellion_pct")
      assert(pct >= 0.0 && pct <= 100.0, s"rebellion_pct $pct out of range")
    }

    // test_stats_output
    val stats = analyzer.periodStats().collect().head
    assert(stats.getAs[Long]("n_votes") > 0)
    assert(stats.getAs[Long]("n_mps") > 0)

    // one HTTP round-trip through the serving layer
    val server = new GraftServer(Map(1 -> PeriodCatalog(analyzer))).start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def get(path: String) = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"http://127.0.0.1:${server.boundPort}$path")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val list = get("/api/votes?period=1")
      assert(list.statusCode() == 200)
      assert(list.body().contains("\"total\":"))
      val someVote = data.votes
        .orderBy(org.apache.spark.sql.functions.col("id_hlasovani"))
        .limit(1).collect().head.getAs[Long]("id_hlasovani")
      val detail = get(s"/api/votes/$someVote?period=1")
      assert(detail.statusCode() == 200, detail.body())
      assert(detail.body().contains("\"party_breakdown\":["))
    } finally server.stop()
  }
}
