package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

/** S8: the reference's 30s parquet-mtime poll watcher replaced with a
  * Structured Streaming file source (Trigger.AvailableNow per pass).
  */
class WatcherSpec extends SparkSpec {

  test("file-source watcher refreshes the serving view as files arrive") {
    val session = spark
    import session.implicits._
    val dir = Files.createTempDirectory("watch")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))

    Seq((1L, "a")).toDF("id", "v").write.mode("append").parquet(dir.toString)
    val ckpt = Files.createTempDirectory("watch-ckpt")
    def runPass(): Unit = {
      val q = EventWindows.watchParquetDir(spark, dir.toString, schema, "watched")
        .option("checkpointLocation", ckpt.toString)
        .start()
      q.awaitTermination()
    }
    runPass()
    assert(spark.table("watched").count() == 1)

    Seq((2L, "b"), (3L, "c")).toDF("id", "v").write.mode("append").parquet(dir.toString)
    runPass()
    assert(spark.table("watched").count() == 3)
  }

  test("watcher refresh hook drops the serving cache (reference " +
      "data_reader.py:444 — new parquet invalidates analysis results)") {
    val session = spark
    import session.implicits._
    val dir = Files.createTempDirectory("watch-inv")
    val ckpt = Files.createTempDirectory("watch-inv-ckpt")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val cache = new graft.serving.AnalysisCache[String]()
    cache.getOrCompute("loyalty:1:30:")("stale-result")
    assert(cache.size == 1)

    Seq((1L, "a")).toDF("id", "v").write.mode("append").parquet(dir.toString)
    val q = EventWindows.watchParquetDir(
        spark, dir.toString, schema, "watched_inv",
        onRefresh = () => cache.invalidatePrefix(""))
      .option("checkpointLocation", ckpt.toString)
      .start()
    q.awaitTermination()
    assert(cache.size == 0, "refresh must invalidate cached analyses")
  }
}
