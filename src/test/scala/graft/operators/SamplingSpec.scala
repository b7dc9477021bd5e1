package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("deterministicShuffle equals the one-window definition, is " +
      "partitioning-invariant, dense, and seed-sensitive") {
    val session = spark
    import session.implicits._
    val df = (1L to 500L).map(i => (i, s"doc$i")).toDF("id", "v")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def want(seed: Long): Seq[Long] =
      (1L to 500L).sortBy(i => (md5hex(s"$seed:$i"), i))
    def got(d: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      Sampling.deterministicShuffle(d, "id", seed)
        .orderBy("shuffle_pos").collect().map(_.getAs[Long]("id")).toSeq
    val g7 = got(df, 7L)
    assert(g7 == want(7L))
    // dense positions 0..n-1
    val pos = Sampling.deterministicShuffle(df, "id", 7L)
      .select("shuffle_pos").collect().map(_.getLong(0)).sorted.toSeq
    assert(pos == (0L until 500L))
    // partitioning must not change the permutation
    assert(got(df.repartition(13), 7L) == g7)
    // a different seed is a genuinely different permutation
    assert(got(df, 8L) == want(8L) && want(8L) != want(7L))
    CacheRegistry.drain()
  }

  test("curriculumOrder: stages are strictly ordered, within-stage " +
      "order is the seeded shuffle, positions dense, partitioning " +
      "invariant") {
    val session = spark
    import session.implicits._
    val df = (1L to 300L).map(i => (i, (i % 3 + 1))).toDF("id", "stage")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = (1L to 300L)
      .sortBy(i => (i % 3 + 1, md5hex(s"7:$i"), i))
    def got(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      Sampling.curriculumOrder(d, "id", "stage", 7L)
        .orderBy("position").collect().map(_.getAs[Long]("id")).toSeq
    val g = got(df)
    assert(g == want, "must equal the one-window definition")
    assert(got(df.repartition(11)) == g, "partitioning moved positions")
    val out = Sampling.curriculumOrder(df, "id", "stage", 7L).collect()
    assert(out.map(_.getAs[Long]("position")).sorted.toSeq ==
      (0L until 300L), "positions must be dense 0..n-1")
    // stage boundary: max position of stage s < min position of s+1
    val byStage = out.groupBy(_.getAs[Long]("stage"))
      .view.mapValues(_.map(_.getAs[Long]("position"))).toMap
    assert(byStage(1L).max < byStage(2L).min &&
      byStage(2L).max < byStage(3L).min, "stages must not interleave")
    CacheRegistry.drain()
  }

  test("stableSample is deterministic, key-stable, and ~keepBuckets/16") {
    val session = spark
    import session.implicits._
    val df = (1L to 4000L).map(i => (i, s"row$i")).toDF("id", "v")
    val s1 = Sampling.stableSample(df, "id", 2).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.stableSample(df.repartition(7), "id", 2)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // partitioning-independent
    assert(math.abs(s1.size / 4000.0 - 2.0 / 16.0) < 0.03)
    // monotone: larger keepBuckets is a superset
    val s4 = Sampling.stableSample(df, "id", 4).collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s4))
  }

  test("stratifiedSample: per-stratum rates, default for unknown strata, " +
      "deterministic under repartitioning") {
    val session = spark
    import session.implicits._
    val df = (1L to 3000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 2, "de" -> 8), defaultBuckets = 16)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") / 1000.0 - 2.0 / 16.0) < 0.05)
    assert(math.abs(byLang("de") / 1000.0 - 8.0 / 16.0) < 0.05)
    assert(byLang("xx") == 1000L) // default 16/16 keeps everything
    val ids1 = kept.collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedSample(df.repartition(17), "id", "lang",
      Map("en" -> 2, "de" -> 8), defaultBuckets = 16)
      .collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("groupQuota caps every group at the quota, keeps small groups " +
      "whole, and selects by hash rank (not id order), " +
      "partitioning-independently") {
    val session = spark
    import session.implicits._
    val df = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 105L).map(i => (i, "small"))).toDF("id", "grp")
    val kept = Sampling.groupQuota(df, "id", "grp", quota = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byGrp = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byGrp("big").size == 10)
    assert(byGrp("small") == (101L to 105L).toSet) // under quota: all kept
    // hash order, not id order
    assert(byGrp("big") != (1L to 10L).toSet)
    // deterministic across partitionings
    val again = Sampling.groupQuota(df.repartition(7), "id", "grp", 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == kept.toSet)
  }

  test("trainTestSplit partitions every row exactly once") {
    val session = spark
    import session.implicits._
    val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
    val out = Sampling.trainTestSplit(df, "id", 3)
    assert(out.count() == 1000)
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "test"))
    assert(bySplit.values.sum == 1000L)
  }

  test("weightedSample: matches a driver-side replay of the " +
      "min-of-w-hashes keys, overrepresents heavy rows, is seed- and " +
      "partitioning-invariant, and refuses oversized weights") {
    val session = spark
    import session.implicits._
    val df = (1L to 400L).map(id => (id, (id % 10 + 1).toInt))
      .toDF("id", "wt")
    def run(d: org.apache.spark.sql.DataFrame, seed: Long) =
      Sampling.weightedSample(d, "id", "wt", k = 80, seed = seed)
        .collect().map(r => r.getLong(2) -> r.getLong(0)).sortBy(_._1)
        .map(_._2).toSeq
    val got = run(df, 7L)
    // driver-side replay of the exact key definition
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(
        s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = (1L to 400L).map { id =>
      val w = (id % 10 + 1).toInt
      val key = (1 to w).map(j => md5hex(s"7:$id:$j")).min
      (key, id)
    }.sorted.take(80).map(_._2)
    assert(got == want)
    // heavy rows (wt >= 8) should out-appear light rows (wt <= 3) by
    // roughly their weight ratio — a coarse bound, deterministic here
    val heavy = got.count(id => id % 10 + 1 >= 8)
    val light = got.count(id => id % 10 + 1 <= 3)
    assert(heavy > light,
      s"heavy=$heavy light=$light — weighting had no effect")
    // partitioning-invariance and seed-sensitivity
    assert(run(df.repartition(13), 7L) == got)
    assert(run(df, 8L) != got)
    // oversized weight fails fast, never builds the array
    val bad = Seq((1L, 20000)).toDF("id", "wt")
    val ex = intercept[Exception] {
      Sampling.weightedSample(bad, "id", "wt", k = 1, seed = 1L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("weightedSample")), s"got $ex")
    // null, sub-1, and fractional weights fail fast too — a mis-typed
    // weight column must not silently shrink the candidate pool
    def raises(df: org.apache.spark.sql.DataFrame): Unit = {
      val e = intercept[Exception] {
        Sampling.weightedSample(df, "id", "wt", k = 1, seed = 1L).count()
      }
      assert(msgs(e).exists(_.contains("weightedSample")), s"got $e")
    }
    raises(Seq((1L, Option.empty[Int]), (2L, Some(3)))
      .toDF("id", "wt"))
    raises(Seq((1L, 0), (2L, 3)).toDF("id", "wt"))
    raises(Seq((1L, -4), (2L, 3)).toDF("id", "wt"))
    raises(Seq((1L, 2.5), (2L, 3.0)).toDF("id", "wt"))
    CacheRegistry.drain()
  }

  test("temperatureMix: alpha=1 keeps everything (natural proportions), " +
      "alpha=0.5 matches a driver-side replay of the canceled sqrt " +
      "threshold, and the smallest source always keeps all rows") {
    import spark.implicits._
    // skewed sources: head 600, mid 120, tail 30
    val rows = (1L to 600L).map(i => (i, "head")) ++
      (601L to 720L).map(i => (i, "mid")) ++
      (721L to 750L).map(i => (i, "tail"))
    val df = rows.toDF("doc_id", "src")
    assert(Sampling.temperatureMix(df, "doc_id", "src", alpha = 1.0)
      .count() == 750L, "alpha=1 must keep natural proportions (all rows)")
    val kept = Sampling.temperatureMix(df, "doc_id", "src", alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // driver replay: th_s = floor(256*sqrt(minC/c)); bucket = first two
    // md5 hex digits of the key string
    val counts = rows.groupBy(_._2).map { case (s, g) => s -> g.size }
    val minC = counts.values.min.toDouble
    def bucket(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((md(0) & 0xff))
    }
    val want = rows.filter { case (id, s) =>
      bucket(id) < math.floor(256.0 * math.sqrt(minC / counts(s))).toInt
    }.toSet
    assert(kept == want, s"${kept.size} vs ${want.size}")
    // the smallest source's threshold is exactly 256: nothing dropped
    assert(kept.count(_._2 == "tail") == 30)
    // and the head genuinely downsampled toward sqrt proportions
    val headKept = kept.count(_._2 == "head")
    assert(headKept < 600 && headKept > 0, s"head kept $headKept")
    CacheRegistry.drain()
  }

  test("sqrtKeepThreshold (the published alpha=0.5 column formula) " +
      "equals temperatureMix's driver-side threshold bit-for-bit " +
      "across a count spread") {
    import spark.implicits._
    val counts = Seq(1L, 2L, 3L, 7L, 30L, 120L, 600L, 99991L)
    val minC = counts.min.toDouble
    import org.apache.spark.sql.functions.col
    val got = counts.map(c => (c, minC))
      .toDF("c", "mc")
      .select(col("c"), Sampling.sqrtKeepThreshold(col("mc"),
        col("c").cast("double")).as("th"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (c <- counts) {
      val driver = math.floor(256.0 * math.sqrt(minC / c)).toLong
      assert(got(c) == driver, s"c=$c: column ${got(c)} != driver $driver")
    }
  }

  test("temperatureSweep agrees with temperatureMix at every shared " +
      "alpha, keeps everything at alpha=1, equalizes thresholds at " +
      "alpha=0, and shares sum to 1 per alpha") {
    import spark.implicits._
    val rows = (1L to 600L).map(i => (i, "head")) ++
      (601L to 720L).map(i => (i, "mid")) ++
      (721L to 750L).map(i => (i, "tail"))
    val df = rows.toDF("doc_id", "src")
    val sweep = Sampling.temperatureSweep(df, "doc_id", "src",
        alphas = Seq(0.0, 0.25, 0.5, 0.75, 1.0))
      .collect()
      .map(r => (r.getAs[Double]("alpha"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("thr"),
          r.getAs[Long]("n_kept"), r.getAs[Double]("kept_share"))))
      .toMap
    assert(sweep.size == 15)
    // parity with the gate operator at every ladder point
    for (a <- Seq(0.0, 0.25, 0.5, 0.75, 1.0)) {
      val mixed = Sampling.temperatureMix(df, "doc_id", "src",
          alpha = if (a == 0.0) 1e-12 else a) // mix requires alpha > 0
        .groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      if (a > 0.0)
        for (s <- Seq("head", "mid", "tail"))
          assert(sweep((a, s))._3 == mixed.getOrElse(s, 0L),
            s"alpha=$a source=$s: sweep=${sweep((a, s))._3} mix=$mixed")
    }
    // alpha=1: thr 256 everywhere, everything kept
    for (s <- Seq("head", "mid", "tail")) {
      assert(sweep((1.0, s))._2 == 256L)
      assert(sweep((1.0, s))._3 == sweep((1.0, s))._1)
    }
    // alpha=0: thr = floor(256*minC/c) — full equalization pressure
    val counts = Map("head" -> 600L, "mid" -> 120L, "tail" -> 30L)
    for (s <- Seq("head", "mid", "tail"))
      assert(sweep((0.0, s))._2 ==
        math.floor(256.0 * (30.0 / counts(s))).toLong)
    // shares sum to ~1 per alpha (round-6 residue only)
    for (a <- Seq(0.0, 0.25, 0.5, 0.75, 1.0)) {
      val tot = Seq("head", "mid", "tail").map(s => sweep((a, s))._4).sum
      assert(math.abs(tot - 1.0) < 1e-5, s"alpha=$a shares sum to $tot")
    }
    CacheRegistry.drain()
  }

  test("temperatureSweepDiscounted derives thresholds from EFFECTIVE " +
      "counts while gating the actual corpus: a zero-effective source " +
      "keeps nothing at every alpha, a source absent from the mass " +
      "relation keeps its raw count, and undiscounted effectives " +
      "reproduce temperatureSweep exactly") {
    import spark.implicits._
    val rows = (1L to 600L).map(i => (i, "head")) ++
      (601L to 720L).map(i => (i, "mid")) ++
      (721L to 750L).map(i => (i, "tail"))
    val df = rows.toDF("doc_id", "src")
    val alphas = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    // head measured 50% removable, mid pure mirror mass, tail absent
    val eff = Seq(("head", 300L), ("mid", 0L))
      .toDF("source", "eff_docs")
    val got = Sampling.temperatureSweepDiscounted(df, "doc_id", "src",
        alphas, eff)
      .collect()
      .map(r => (r.getAs[Double]("alpha"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("eff_docs"),
          r.getAs[Long]("thr"), r.getAs[Long]("n_kept"))))
      .toMap
    assert(got.size == 15)
    for (a <- alphas) {
      // mirror source: threshold 0, kept 0, at EVERY alpha
      assert(got((a, "mid")) == ((120L, 0L, 0L, 0L)),
        s"alpha=$a mid: ${got((a, "mid"))}")
      // thresholds replay the driver formula over effective counts
      // (min positive effective = 30, tail's raw count)
      for ((s, e) <- Seq("head" -> 300L, "tail" -> 30L)) {
        val driver = math.floor(256.0 *
          Sampling.powExact(1.0 - a, 30.0 / e)).toLong
        assert(got((a, s))._3 == driver,
          s"alpha=$a $s: thr ${got((a, s))._3} != driver $driver")
      }
      // kept counts are measured over the UN-drained corpus: head
      // keeps its bucket mass under the discounted threshold, which
      // at alpha<1 is STRICTLY below its undiscounted keep
      assert(got((a, "tail"))._4 == 30L, s"alpha=$a tail keeps all")
    }
    // degenerate discount (eff = raw) reproduces the plain sweep
    val raw = Seq(("head", 600L), ("mid", 120L), ("tail", 30L))
      .toDF("source", "eff_docs")
    val viaDisc = Sampling.temperatureSweepDiscounted(df, "doc_id",
        "src", alphas, raw)
      .drop("eff_docs").collect().map(_.toSeq).toSet
    val viaPlain = Sampling.temperatureSweep(df, "doc_id", "src", alphas)
      .collect().map(_.toSeq).toSet
    assert(viaDisc == viaPlain,
      "eff=raw must reproduce temperatureSweep bit for bit")
    // ALL sources pure removable mass: every threshold 0, every kept
    // count 0 — and the share column must read 0.0 (the documented
    // contract), never the 0/0 NaN a bare division would produce
    val allZero = Seq(("head", 0L), ("mid", 0L), ("tail", -5L))
      .toDF("source", "eff_docs")
    val zeroRows = Sampling.temperatureSweepDiscounted(df, "doc_id",
        "src", alphas, allZero).collect()
    assert(zeroRows.length == 15)
    zeroRows.foreach { r =>
      assert(r.getAs[Long]("thr") == 0L && r.getAs[Long]("n_kept") == 0L)
      assert(r.getAs[Double]("kept_share") == 0.0,
        s"share must be 0.0 not NaN: $r")
    }
    CacheRegistry.drain()
  }

  test("epochPlan replays a hand-computed waterfill: whole layers fill " +
      "in (weight-discounted value, source) order, the boundary layer " +
      "takes the remainder, zero-weight sources fill last, and the " +
      "budget is conserved") {
    import spark.implicits._
    // values scaled by 2^(3-k) with maxEpochs=3:
    //   a: w=1000000 -> layers 4000000, 2000000, 1000000
    //   b: w=500000  -> layers 2000000, 1000000,  500000
    //   z: w=0       -> layers 0, 0, 0 (sorts last, source/epoch order)
    // strict fill order: a1(100), then a2 ties b1 at 2000000 -> a2(100)
    // then b1(200), then a3 ties b2 at 1000000 -> a3(100) then b2(200),
    // then b3(500000), then z1 z2 z3.
    val per = Seq(("a", 100L, 1000000L), ("b", 200L, 500000L),
      ("z", 50L, 0L)).toDF("source", "unique_tokens", "weight_ppm")
    def planMap(budget: Long) =
      Sampling.epochPlan(per, budget, maxEpochs = 3).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("tokens_alloc"), r.getAs[Long]("full_epochs"),
            r.getAs[Long]("frac_b256"))))
        .toMap
    // budget 450 = a1(100) + a2(100) + b1(200) + 50 into a3:
    // a: 250 alloc, 2 full, frac floor(256*50/100)=128; b: 200, 1, 0
    val p450 = planMap(450L)
    assert(p450("a") == ((250L, 2L, 128L)), s"got ${p450("a")}")
    assert(p450("b") == ((200L, 1L, 0L)), s"got ${p450("b")}")
    assert(p450("z") == ((0L, 0L, 0L)), s"got ${p450("z")}")
    // budget conservation: sum(alloc) = min(budget, total capacity)
    assert(p450.values.map(_._1).sum == 450L)
    // budget beyond all valued layers spills into the zero-weight
    // source; beyond EVERYTHING it caps at maxEpochs * capacity
    val p920 = planMap(920L)
    assert(p920("a") == ((300L, 3L, 0L)))
    assert(p920("b") == ((600L, 3L, 0L)))
    assert(p920("z") == ((20L, 0L, (256L * 20L) / 50L)))
    val pBig = planMap(5000L)
    assert(pBig("a") == ((300L, 3L, 0L)) && pBig("b") == ((600L, 3L, 0L))
      && pBig("z") == ((150L, 3L, 0L)))
    assert(planMap(0L).values.forall(_ == ((0L, 0L, 0L))))
    // the ppm contract fails BY NAME, not as a mid-job overflow: a
    // caller passing raw counts (or a negative) gets told what to fix
    val bad = Seq(("a", 100L, 10000000000000L))
      .toDF("source", "unique_tokens", "weight_ppm")
    val ex = intercept[Exception] {
      Sampling.epochPlan(bad, 100L, maxEpochs = 3).collect()
    }
    assert(ex.getMessage.contains("weight_ppm must be in [0, 1000000]"),
      ex.getMessage)
  }

  test("planCommitRule is a SUFFIX rule: a landing-1 coincidence that " +
      "flaps away has not settled, absence from an early plan is " +
      "unsettled, and commit_batches is the max settle over sources") {
    import spark.implicits._
    def plan(rows: (String, Long)*) =
      rows.toSeq.toDF("source", "full_epochs")
    val plans = Seq(
      1L -> plan("stable" -> 2L, "late" -> 1L, "flap" -> 2L,
        "never" -> 1L),
      2L -> plan("stable" -> 2L, "late" -> 2L, "flap" -> 1L,
        "missing" -> 3L, "never" -> 0L),
      3L -> plan("stable" -> 2L, "late" -> 2L, "flap" -> 2L,
        "missing" -> 3L, "never" -> 4L))
    val got = Sampling.planCommitRule(plans).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("settled_at_batches"), r.getAs[Long]("flapped"),
          r.getAs[Long]("full_epochs_final"),
          r.getAs[Long]("commit_batches"))))
      .toMap
    assert(got("stable") == ((1L, 0L, 2L, 3L)), s"${got("stable")}")
    assert(got("late") == ((2L, 0L, 2L, 3L)), s"${got("late")}")
    // agreed at 1, disagreed at 2: the coincidence does NOT settle it
    assert(got("flap") == ((3L, 1L, 2L, 3L)), s"${got("flap")}")
    // absent at landing 1 -> unsettled through it
    assert(got("missing") == ((2L, 0L, 3L, 3L)), s"${got("missing")}")
    assert(got("never") == ((3L, 0L, 4L, 3L)), s"${got("never")}")
    // a degenerate one-plan ladder settles everything at that landing
    val one = Sampling.planCommitRule(Seq(7L -> plan("a" -> 1L)))
      .collect()
    assert(one.length == 1 &&
      one(0).getAs[Long]("settled_at_batches") == 7L &&
      one(0).getAs[Long]("commit_batches") == 7L)
    intercept[IllegalArgumentException] {
      Sampling.planCommitRule(Seq(1L -> plan("a" -> 1L),
        1L -> plan("a" -> 1L)))
    }
    CacheRegistry.drain()
  }

  test("planCommitRule gateCol: gating realized tokens is strictly " +
      "stronger than gating full_epochs when the fractional pass " +
      "keeps moving under an identical plan shape") {
    import spark.implicits._
    // q215's caveat as a fixture: source 'frac' has full_epochs 2 at
    // every landing (plan-identity settles at 1) while its realized
    // tokens still move between landings 1 and 2 (the frac_b256
    // bucket drifting) — emission identity settles only at 2
    def rows(rs: (String, Long, Long)*) =
      rs.toSeq.toDF("source", "full_epochs", "realized_tokens")
    val plans = Seq(
      1L -> rows(("frac", 2L, 900L), ("solid", 1L, 500L)),
      2L -> rows(("frac", 2L, 950L), ("solid", 1L, 500L)),
      3L -> rows(("frac", 2L, 950L), ("solid", 1L, 500L)))
    val byPlan = Sampling.planCommitRule(plans).collect()
      .map(r => r.getAs[String]("source") ->
        r.getAs[Long]("settled_at_batches")).toMap
    val byTokens = Sampling
      .planCommitRule(plans, gateCol = "realized_tokens").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("settled_at_batches"),
          r.getAs[Long]("realized_tokens_final"),
          r.getAs[Long]("commit_batches"))))
      .toMap
    assert(byPlan("frac") == 1L && byPlan("solid") == 1L, s"$byPlan")
    assert(byTokens("frac") == ((2L, 950L, 2L)), s"$byTokens")
    assert(byTokens("solid") == ((1L, 500L, 2L)), s"$byTokens")
    CacheRegistry.drain()
  }

  test("epochPlanDiscounted generalizes the ladder: delta=1 ranks by " +
      "weight alone (source/epoch tiebreak), delta=1/4 steepens the " +
      "discount so first epochs fill across sources before any second, " +
      "delta=1/2 IS epochPlan, and an overflowing denominator fails " +
      "by name") {
    import spark.implicits._
    val per = Seq(("a", 100L, 1000000L), ("b", 200L, 500000L),
      ("z", 50L, 0L)).toDF("source", "unique_tokens", "weight_ppm")
    def planMap(numer: Long, denom: Long) =
      Sampling.epochPlanDiscounted(per, 450L, maxEpochs = 3,
          deltaNumer = numer, deltaDenom = denom).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("tokens_alloc"), r.getAs[Long]("full_epochs"),
            r.getAs[Long]("frac_b256"))))
        .toMap
    // delta=1: a's three layers all value 1e6 and precede b's (5e5) —
    // fill a1 a2 a3 (300), then 150 into b1
    val p1 = planMap(1L, 1L)
    assert(p1("a") == ((300L, 3L, 0L)), s"got ${p1("a")}")
    assert(p1("b") == ((150L, 0L, (256L * 150L) / 200L)), s"got ${p1("b")}")
    assert(p1("z") == ((0L, 0L, 0L)))
    // delta=1/4: values a(16e6, 4e6, 1e6), b(8e6, 2e6, 5e5) — strict
    // order a1 b1 a2 b2: 100+200+100 fills, 50 spills into b2
    val p4 = planMap(1L, 4L)
    assert(p4("a") == ((200L, 2L, 0L)), s"got ${p4("a")}")
    assert(p4("b") == ((250L, 1L, (256L * 50L) / 200L)), s"got ${p4("b")}")
    // delta=1/2 is the epochPlan entry point, value for value
    val viaPlan = Sampling.epochPlan(per, 450L, maxEpochs = 3).collect()
      .map(_.toSeq).toSet
    val viaDelta = planMap(1L, 2L)
    assert(Sampling.epochPlanDiscounted(per, 450L, 3, 1L, 2L).collect()
      .map(_.toSeq).toSet == viaPlan, s"delta=1/2 drifted: $viaDelta")
    // ladder overflow is a named require, not a mid-job ANSI error
    val ex = intercept[IllegalArgumentException] {
      Sampling.epochPlanDiscounted(per, 450L, maxEpochs = 32,
        deltaNumer = 1L, deltaDenom = 3L)
    }
    assert(ex.getMessage.contains("overflows the exact value ladder"),
      ex.getMessage)
  }

  test("epochRealize applies the plan's repeat rule: full_epochs " +
      "everywhere plus one md5-bucket-gated extra pass, matching a " +
      "driver replay doc by doc; unplanned sources drop") {
    import spark.implicits._
    val docsDf = ((1L to 300L).map(i => (i, "a")) ++
      (301L to 400L).map(i => (i, "b")) ++
      (401L to 420L).map(i => (i, "ghost"))).toDF("doc_id", "src")
    val plan = Seq(("a", 300L, 1000000L, 2L, 100L),
      ("b", 100L, 500000L, 1L, 0L))
      .toDF("source", "unique_tokens", "weight_ppm", "full_epochs",
        "frac_b256")
    val got = Sampling.epochRealize(docsDf, "doc_id", "src", plan)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("repeats")).toMap
    def bucket(id: Long): Int =
      Integer.parseInt(java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(1)
        .map("%02x".format(_)).mkString, 16)
    assert(got.size == 400, s"ghost rows leaked: ${got.size}")
    for (i <- 1L to 300L)
      assert(got(i) == 2L + (if (bucket(i) < 100) 1L else 0L),
        s"doc $i bucket ${bucket(i)}: got ${got(i)}")
    for (i <- 301L to 400L) assert(got(i) == 1L)
    // the fractional pass is a genuine partial subset
    val extras = (1L to 300L).count(i => got(i) == 3L)
    assert(extras > 0 && extras < 300, s"extras=$extras")
  }
}
