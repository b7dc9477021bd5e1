package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.SparkSpec

class SketchSpec extends SparkSpec {

  /** The operator's 48-bit md5 bucket, replayed on the JVM. */
  private def bucket(row: Int, v: String, width: Int): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$row:$v".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16) % width
  }

  test("cmsSketch + cmsEstimate replay the scalar CMS: estimates are " +
      "min-over-rows of hashed counters, one-sided (est >= exact), and " +
      "collision-free at large width (est == exact)") {
    val session = spark
    import session.implicits._
    val values = Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c") ++
      Seq("d")
    val df = values.toDF("v")
    for (width <- Seq(4, 1 << 20)) {
      val depth = 3
      // reference sketch: counter map from the same hash
      val counters = values.flatMap(v =>
          (0 until depth).map(r => (r, bucket(r, v, width))))
        .groupBy(identity).map { case (k, occ) => k -> occ.size.toLong }
      val exact = values.groupBy(identity).map { case (v, o) => v -> o.size }
      val want = exact.keys.map { v =>
        v -> (0 until depth)
          .map(r => counters.getOrElse((r, bucket(r, v, width)), 0L)).min
      }.toMap

      val sk = Sketch.cmsSketch(df, "v", depth, width)
      val got = Sketch.cmsEstimate(sk, df.distinct(), "v", depth, width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"width=$width: diverges from scalar replay")
      got.foreach { case (v, est) =>
        assert(est >= exact(v), s"width=$width $v: est $est < exact")
      }
      if (width == (1 << 20))
        assert(got == exact.map { case (v, n) => v -> n.toLong },
          "collision-free width must be exact")
    }
  }

  test("cmsEstimate passes a caller's own row/bucket columns through " +
      "untouched (collision-safe __cms_ internals) and refuses only " +
      "the reserved prefix itself") {
    val session = spark
    import session.implicits._
    val values = (Seq.fill(4)("a") ++ Seq.fill(2)("b")).toDF("v")
    val sk = Sketch.cmsSketch(values, "v", 3, 1 << 16)
    // items carrying their own `row` and `bucket` columns — before the
    // rename these collided with the probe plumbing's aliases
    val items = Seq(("a", 10L, 20L), ("b", 11L, 21L))
      .toDF("v", "row", "bucket")
    val got = Sketch.cmsEstimate(sk, items, "v", 3, 1 << 16)
      .collect().map(r => (r.getAs[String]("v"), r.getAs[Long]("row"),
        r.getAs[Long]("bucket"), r.getAs[Long]("est_n"))).toSet
    assert(got == Set(("a", 10L, 20L, 4L), ("b", 11L, 21L, 2L)), got)
    val e = intercept[IllegalArgumentException] {
      Sketch.cmsEstimate(sk,
        Seq(("a", 1L)).toDF("v", "__cms_row"), "v", 3, 1 << 16)
    }
    assert(e.getMessage.contains("__cms_"), e.getMessage)
  }

  test("cmsMerge of per-batch sketches equals the sketch of the union, " +
      "and cmsHeavyHitters has no false negatives at any width") {
    val session = spark
    import session.implicits._
    val a = (Seq.fill(6)("x") ++ Seq.fill(2)("y")).toDF("v")
    val b = (Seq.fill(5)("x") ++ Seq.fill(9)("z")).toDF("v")
    val merged = Sketch.cmsMerge(Seq(
        Sketch.cmsSketch(a, "v", 4, 8), Sketch.cmsSketch(b, "v", 4, 8)))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketch.cmsSketch(a.unionAll(b), "v", 4, 8)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole, "merged sketch must equal whole-stream sketch")

    for (width <- Seq(2, 64)) {
      val hh = Sketch.cmsHeavyHitters(a.unionAll(b), "v", 4, width, 9L)
        .collect().map(_.getString(0)).toSet
      assert(Set("x", "z").subsetOf(hh),
        s"width=$width: heavy values (x=11, z=9) must always appear")
    }
  }

  test("hllRegisters matches a scalar md5 replay, merges by union+max, " +
      "and hllEstimate tracks the exact distinct within HLL error") {
    val session = spark
    import session.implicits._
    def md5_48(v: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16)
    }
    val p = 6
    val w = 48 - p
    def scalarReg(v: String): (Long, Int) = {
      val h = md5_48(v)
      val rest = h & ((1L << w) - 1)
      val rho =
        if (rest == 0) w + 1
        else w - (63 - java.lang.Long.numberOfLeadingZeros(rest))
      (h >>> w, rho)
    }
    val values = (1 to 300).map(i => s"u${i % 170}") // dups collapse
    val df = values.map(("g", _)).toDF("grp", "v")
    val got = Sketch.hllRegisters(df, "grp", "v", p)
      .collect().map(r => r.getAs[Long]("reg") -> r.getAs[Int]("rho")).toMap
    val want = values.map(scalarReg).groupBy(_._1)
      .map { case (reg, rs) => reg -> rs.map(_._2).max }
    assert(got == want, "registers diverge from scalar replay")

    // merge = union + re-max equals the whole-stream registers
    val (a, b) = values.splitAt(140)
    val merged = Sketch.hllRegisters(a.map(("g", _)).toDF("grp", "v"), "grp", "v", p)
      .unionAll(Sketch.hllRegisters(b.map(("g", _)).toDF("grp", "v"), "grp", "v", p))
      .groupBy("grp", "reg")
      .agg(org.apache.spark.sql.functions.max("rho").as("rho"))
      .collect().map(r => r.getAs[Long]("reg") -> r.getAs[Int]("rho")).toMap
    assert(merged == got, "merged registers must equal whole-stream")

    val est = Sketch.hllEstimate(
        Sketch.hllRegisters(df, "grp", "v", p), "grp", p)
      .collect().head.getAs[Double]("est_distinct")
    val exact = values.distinct.size.toDouble
    assert(math.abs(est - exact) / exact < 0.25,
      s"est $est too far from exact $exact for m=64")
  }

  test("mgHeavyHitters equals the direct GROUP BY/HAVING answer under " +
      "EVERY partition layout when minFrac > 1/(k+1), with far more " +
      "distinct values than counters; the vacuous-guarantee config is " +
      "refused") {
    val session = spark
    import session.implicits._
    // 3 hot values (120 each) drowned in 600 singletons: N = 960,
    // k = 15 counters << 603 distinct, minFrac 0.1 > 1/16
    val values = (0 until 3).flatMap(h => Seq.fill(120)(s"hot$h")) ++
      (0 until 600).map(i => s"rare$i")
    val want = values.groupBy(identity).collect {
      case (v, o) if o.size >= math.ceil(0.1 * values.size) =>
        v -> o.size.toLong
    }.toMap
    assert(want.keySet == Set("hot0", "hot1", "hot2"))
    for (parts <- Seq(1, 4, 32)) {
      val df = values.toDF("v").repartition(parts)
      val got = Sketch.mgHeavyHitters(df, "v", k = 15, minFrac = 0.1)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"parts=$parts: $got")
      CacheRegistry.drain()
    }
    intercept[IllegalArgumentException] {
      Sketch.mgHeavyHitters(values.toDF("v"), "v", k = 15, minFrac = 0.1 / 10)
    }
  }

  test("KMV sketch is a pure function of the value SET: duplication " +
      "and partition layout cannot move it; below-k groups estimate " +
      "exactly; the at-k estimate replays the scalar formula") {
    val session = spark
    import session.implicits._
    def kmvHash(v: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(v.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }
    val k = 4
    // group A: 10 distinct values (> k) with heavy duplication;
    // group B: 2 distinct (< k -> exact)
    val base = (0 until 10).map(i => ("A", s"v$i")) ++
      Seq(("B", "x"), ("B", "y"))
    val rows = base ++ base ++ base.take(5) // duplicates
    val want = {
      val hs = (0 until 10).map(i => kmvHash(s"v$i")).sorted.take(k)
      Map("A" -> ((k.toLong,
          BigDecimal((k - 1).toDouble * 281474976710656.0 / hs.last.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)),
        "B" -> ((2L, 2.0)))
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val got = Sketch.kmvEstimate(
          Sketch.kmvSketch(df, "g", "v", k), k)
        .collect().map(r => r.getString(0) ->
          ((r.getAs[scala.collection.Seq[Long]]("kmv").size.toLong,
            r.getAs[Double]("est_distinct")))).toMap
      assert(got == want, s"parts=$parts: $got != $want")
    }
  }

  test("mgCandidates: a value exceeding n_p/(k+1) inside one partition " +
      "always survives that partition's summary") {
    val session = spark
    import session.implicits._
    // one partition, n = 80, k = 3: 'big' has 25 > 80/4 = 20
    val values = Seq.fill(25)("big") ++ (0 until 55).map(i => s"r$i")
    val cands = Sketch.mgCandidates(
        values.toDF("v").repartition(1), "v", k = 3)
      .collect().map(_.getString(0)).toSet
    assert(cands.contains("big"), s"got $cands")
    assert(cands.size <= 3, s"summary must stay bounded: $cands")
  }
}
