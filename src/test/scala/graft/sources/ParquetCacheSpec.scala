package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class ParquetCacheSpec extends SparkSpec {

  test("cache round trip: parse once, reuse while fresh, reparse on touch") {
    val session = spark
    import session.implicits._
    val src = Files.createTempDirectory("pc-src")
    val cache = Files.createTempDirectory("pc-cache").resolve("t.parquet")
    Files.writeString(src.resolve("data.txt"), "one")

    var parses = 0
    def parse = { parses += 1; Seq((1, "a"), (2, "b")).toDF("id", "v") }

    val first = ParquetCache.getOrParse(spark, cache.toString, src.toString)(parse)
    assert(first.count() == 2 && parses == 1)

    val second = ParquetCache.getOrParse(spark, cache.toString, src.toString)(parse)
    assert(second.count() == 2 && parses == 1) // served from cache

    // touch source newer than cache -> reparse
    Thread.sleep(1100)
    Files.writeString(src.resolve("data.txt"), "two")
    ParquetCache.getOrParse(spark, cache.toString, src.toString)(parse)
    assert(parses == 2)

    ParquetCache.invalidate(cache.toString)
    assert(!Files.exists(cache))
    ParquetCache.getOrParse(spark, cache.toString, src.toString)(parse)
    assert(parses == 3)
  }
}
