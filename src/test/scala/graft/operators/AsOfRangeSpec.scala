package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfRangeSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("asofBackward: latest-at-or-before, inclusive tie, null before first") {
    val session = spark
    import session.implicits._
    val clicks = Seq(
      (1L, t("2024-01-01 09:00:00"), 100L), // before any signup -> null
      (1L, t("2024-01-01 10:00:00"), 101L), // exactly at signup A -> A (inclusive)
      (1L, t("2024-01-01 12:30:00"), 102L), // after signup B -> B
      (2L, t("2024-01-01 11:00:00"), 200L)) // other user, no signups -> null
      .toDF("user_id", "ts", "event_id")
    val signups = Seq(
      (1L, t("2024-01-01 10:00:00")),
      (1L, t("2024-01-01 12:00:00")))
      .toDF("user_id", "ts")
    val out = AsOf.asofBackward(clicks, signups, Seq("user_id"), "ts", "ts",
        Map("ts" -> "signup_ts"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("signup_ts"))).toMap
    assert(out(100L).isEmpty)
    assert(out(101L).contains(t("2024-01-01 10:00:00")))
    assert(out(102L).contains(t("2024-01-01 12:00:00")))
    assert(out(200L).isEmpty)
  }

  test("asofBackward carries the whole latest row — NULL payload fields do " +
      "not fall through to older rows, multi-column payloads never mix") {
    val session = spark
    import session.implicits._
    val right = Seq(
      (1L, t("2024-01-01 01:00:00"), Some(10.0), Some(1L)),
      (1L, t("2024-01-01 02:00:00"), None, Some(5L)))
      .toDF("k", "ts", "price", "qty")
    val left = Seq((1L, t("2024-01-01 03:00:00"), 99L)).toDF("k", "ts", "ev")
    val out = AsOf.asofBackward(left, right, Seq("k"), "ts", "ts",
      Map("price" -> "price", "qty" -> "qty")).collect()(0)
    assert(out.isNullAt(out.fieldIndex("price"))) // t=2's real NULL, not t=1's 10.0
    assert(out.getAs[Long]("qty") == 5L)
  }

  test("asofBackward: tied right rows resolve deterministically (struct max)") {
    val session = spark
    import session.implicits._
    // three right rows at the SAME (key, ts) — the carried payload must be
    // the struct-wise max, independent of shuffle order
    val right = Seq(
      (1L, t("2024-01-01 01:00:00"), 10.0),
      (1L, t("2024-01-01 01:00:00"), 30.0),
      (1L, t("2024-01-01 01:00:00"), 20.0))
      .toDF("k", "ts", "price")
    val left = Seq((1L, t("2024-01-01 02:00:00"), 7L)).toDF("k", "ts", "ev")
    (1 to 3).foreach { _ =>
      val out = AsOf.asofBackward(
        left, right.repartition(4), Seq("k"), "ts", "ts",
        Map("price" -> "price")).collect()(0)
      assert(out.getAs[Double]("price") == 30.0)
    }
  }

  test("asofBackward rejects reserved __-prefixed input columns") {
    val session = spark
    import session.implicits._
    val bad = Seq((1L, t("2024-01-01 01:00:00"), 1.0)).toDF("k", "ts", "__p")
    val left = Seq((1L, t("2024-01-01 02:00:00"))).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      AsOf.asofBackward(left, bad, Seq("k"), "ts", "ts", Map("__p" -> "p"))
    }
  }

  test("binned range join equals the naive theta join") {
    val session = spark
    import session.implicits._
    val pts = (0L until 500L).map(i => (i, i * 13 % 1000)).toDF("id", "pt")
    val ivs = Seq((0L, 100L), (50L, 260L), (240L, 1000L), (990L, 995L))
      .toDF("istart", "iend")
    val naive = pts.join(ivs, col("pt") >= col("istart") && col("pt") < col("iend"))
      .select("id", "pt", "istart").collect().map(_.toSeq).toSet
    val binned = RangeJoin.pointInInterval(pts, "pt", ivs, "istart", "iend", 64)
      .select("id", "pt", "istart").collect().map(_.toSeq).toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
  }
}
