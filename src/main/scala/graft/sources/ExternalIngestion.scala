package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External enrichment stages (SURVEY S9/S10): PDF text extraction and
  * HTML scraping live OUTSIDE the engine (network + parser libraries);
  * the engine consumes their OUTPUT as tables. These traits define the
  * boundary; production wires real implementations, tests wire fixtures —
  * mirroring the reference's own LLM-unavailable fallback design
  * (`services/tisk/classifier.py:81-86`).
  */
object ExternalIngestion {

  /** S9: PDF → text (reference `services/tisk/version_service.py:123-143`).
    * Real impl would read `binaryFile`-sourced PDFs and extract page text.
    */
  trait TiskTextService {
    /** Extracted text per print, as a (period, ct, text) DataFrame. */
    def texts(spark: SparkSession, period: Int): DataFrame
    def hasText(period: Int, ct: Int): Boolean
  }

  /** S10: scraped print histories (reference
    * `services/tisk/io/history_scraper.py`): rows (ct, stage_type, date).
    */
  trait HistoryScraper {
    def histories(spark: SparkSession, period: Int): DataFrame
  }

  /** S10: stenoprotocol scrape + parse (reference
    * `services/amendments/steno_scraper.py` / `steno_parser.py`):
    * rows matching the amendment fact schema (PspSchemas.amendments).
    */
  trait StenoAmendmentSource {
    def amendments(spark: SparkSession, period: Int): DataFrame
  }

  /** Fixture-backed implementations for tests / offline runs. */
  class FixtureTexts(rows: Map[(Int, Int), String]) extends TiskTextService {
    override def texts(spark: SparkSession, period: Int): DataFrame = {
      import spark.implicits._
      rows.collect { case ((p, ct), t) if p == period => (p, ct, t) }
        .toSeq.toDF("period", "ct", "text")
    }
    override def hasText(period: Int, ct: Int): Boolean =
      rows.contains((period, ct))
  }

  class FixtureHistories(rows: Seq[(Int, String)]) extends HistoryScraper {
    override def histories(spark: SparkSession, period: Int): DataFrame = {
      import spark.implicits._
      rows.toDF("ct", "stage_type")
    }
  }

  /** No-op sources: empty outputs with the right schema (offline mode). */
  class NoopStenoSource extends StenoAmendmentSource {
    override def amendments(spark: SparkSession, period: Int): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        PspSchemas.amendments)
  }
}
