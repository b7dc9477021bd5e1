package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BrowseSpec extends SparkSpec {

  private def nums() = {
    val session = spark
    import session.implicits._
    (1 to 45).map(i => (i.toLong, s"row$i")).toDF("id", "v")
  }

  test("pageClamped: counts, clamps overflow page, slices deterministically") {
    val r = Browse.pageClamped(nums(), pageNum = 3, perPage = 20, col("id").asc)
    assert(r.total == 45 && r.totalPages == 3 && r.page == 3)
    assert(r.rows.collect().map(_.getLong(0)).toSeq == (41L to 45L))

    val over = Browse.pageClamped(nums(), pageNum = 99, perPage = 20, col("id").asc)
    assert(over.page == 3) // clamped to last page, like the reference
    assert(over.rows.count() == 5)

    val under = Browse.pageClamped(nums(), pageNum = -2, perPage = 20, col("id").asc)
    assert(under.page == 1)
    assert(under.rows.collect().map(_.getLong(0)).toSeq == (1L to 20L))
  }

  test("pageClamped on empty relation: one empty page, no crash") {
    val r = Browse.pageClamped(nums().limit(0), 1, 20, col("id").asc)
    assert(r.total == 0 && r.totalPages == 1 && r.rows.count() == 0)
  }
}
