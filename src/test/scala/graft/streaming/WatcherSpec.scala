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
}
