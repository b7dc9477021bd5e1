package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  test("chunkTokens windows overlap by `overlap`, keep the partial " +
      "final, and give empty docs one empty chunk") {
    import spark.implicits._
    // 10 tokens, size 4, overlap 1 -> step 3 -> ceil(9/3) = 3 chunks
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "a b"),   // shorter than one chunk
      (3L, ""))      // empty
      .toDF("doc_id", "text")
    val out = Packing.chunkTokens(docs, "doc_id", "text", 4, 1)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id")) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_text")))).toMap
    assert(out((1L, 0)) == ((4L, "t0 t1 t2 t3")))
    assert(out((1L, 1)) == ((4L, "t3 t4 t5 t6")))   // t3 overlaps
    assert(out((1L, 2)) == ((4L, "t6 t7 t8 t9")))
    assert(!out.contains((1L, 3)))
    assert(out((2L, 0)) == ((2L, "a b")))
    assert(out((3L, 0)) == ((0L, "")))
    intercept[IllegalArgumentException] {
      Packing.chunkTokens(docs, "doc_id", "text", 4, 4)
    }
  }
}

class PackingSpec extends SparkSpec {

  test("sequence offsets are the exact running total in id order, and " +
      "INVARIANT to the shard count (the distributed prefix sum is real)") {
    import spark.implicits._
    val docs = Seq((1L, 100L), (2L, 50L), (5L, 512L), (7L, 1L), (9L, 0L),
      (12L, 511L), (20L, 1024L)).toDF("doc_id", "n")
    def offsets(shards: Int) =
      Packing.sequenceOffsets(docs, "doc_id", "n", shards)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("offset"))
        .toMap
    val expected = Map(1L -> 0L, 2L -> 100L, 5L -> 150L, 7L -> 662L,
      9L -> 663L, 12L -> 663L, 20L -> 1174L)
    assert(offsets(shards = 1) == expected)
    assert(offsets(shards = 7) == expected, "sharding must not change offsets")
    assert(offsets(shards = 64) == expected)
  }

  test("packed blocks: spans, boundary exactness, empty docs occupy none") {
    import spark.implicits._
    val docs = Seq((1L, 512L), (2L, 1L), (3L, 0L), (4L, 1023L))
      .toDF("doc_id", "n")
    val rows = Packing.packedBlocks(docs, "doc_id", "n", blockSize = 512)
      .orderBy("doc_id").collect()
    // doc 1 fills block 0 exactly; doc 2 starts block 1; doc 3 empty;
    // doc 4 spans blocks 1-2 (tokens 513..1535)
    assert(rows.map(r => (r.getAs[Long]("first_block"), r.getAs[Long]("n_blocks")))
      .toSeq == Seq((0L, 1L), (1L, 1L), (1L, 0L), (1L, 2L)))
  }

  test("mixToTarget rebalances sources toward target proportions, drops " +
      "untargeted sources, and the scarcest source binds the total") {
    import spark.implicits._
    // en 600, de 200, zh 100 — targets en 50% / de 50%: de binds (N=400)
    val docs = ((1L to 600L).map(i => (i, "en")) ++
      (1001L to 1200L).map(i => (i, "de")) ++
      (2001L to 2100L).map(i => (i, "zh")))
      .toDF("doc_id", "lang")
    val kept = Sampling.mixToTarget(docs, "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.5))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("zh"), "untargeted source must be dropped")
    // de binds: keeps ~all of de, ~200 of en (hash-uniform, ±20%)
    assert(kept("de") > 160 && kept("de") <= 200, kept.toString)
    assert(math.abs(kept("en") - 200) < 40, kept.toString)
    // deterministic: a second run keeps the identical set
    val again = Sampling.mixToTarget(docs, "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.5))
      .agg(org.apache.spark.sql.functions.sum("doc_id")).collect()(0).getLong(0)
    val first = Sampling.mixToTarget(docs, "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.5))
      .agg(org.apache.spark.sql.functions.sum("doc_id")).collect()(0).getLong(0)
    assert(again == first)
  }

  test("leakage-safe split: paired docs ALWAYS share a split, unpaired " +
      "docs keep the plain content-hash split") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val split = Sampling.leakageSafeSplit(docs, "doc_id", pairs, "id_a", "id_b", 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // each cluster is uniform
    assert(Set(split(1L), split(2L), split(3L)).size == 1)
    assert(split(10L) == split(11L))
    assert(Set(split(20L), split(21L), split(22L)).size == 1)
    // unpaired docs match the plain split (same bucket function)
    val plain = Sampling.trainTestSplit(docs, "doc_id", 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val unpaired = (1L to 40L).toSet -- Set(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L)
    unpaired.foreach(id => assert(split(id) == plain(id), s"doc $id"))
    CacheRegistry.drain()
  }

  test("fimTransform: PSM rewrites round-trip to the original sequence " +
      "(prefix+middle+suffix reassemble), untransformed rows pass " +
      "through untouched, rate 0/1 are no-op/all, and the transform " +
      "is partitioning-invariant") {
    import spark.implicits._
    val docs = (1L to 80L)
      .map(i => (i, (0 until (i % 13).toInt + 2).map(k => i * 100 + k)))
      .toDF("doc_id", "token_ids")
    def run(rate: Double, df: org.apache.spark.sql.DataFrame = docs) =
      Packing.fimTransform(df, "doc_id", "token_ids", rate,
          preId = -1, sufId = -2, midId = -3)
        .collect()
        .map(r => (r.getLong(0),
          r.getSeq[Long](1).toVector, r.getBoolean(2)))
        .sortBy(_._1).toSeq
    val orig = docs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val out = run(0.5)
    assert(out.exists(_._3) && out.exists(!_._3),
      "rate 0.5 must transform some and spare some")
    for ((id, ids, fim) <- out) {
      if (!fim) assert(ids == orig(id), s"doc $id modified without fim")
      else {
        // [PRE] p [SUF] s [MID] m  — reassemble p ++ m ++ s == original
        assert(ids.head == -1L, s"doc $id: missing PRE")
        val (p, rest) = ids.tail.span(_ != -2L)
        val (sfx, rest2) = rest.tail.span(_ != -3L)
        val m = rest2.tail
        assert(p ++ m ++ sfx == orig(id),
          s"doc $id: PSM does not round-trip: $ids vs ${orig(id)}")
      }
    }
    assert(run(0.0).forall(!_._3), "rate 0 must be a no-op")
    assert(run(1.0).forall(_._3), "rate 1 must transform everything")
    // pure function of (seed, id, ids): repartitioning changes nothing
    assert(run(0.5, docs.repartition(7)) == out)
    CacheRegistry.drain()
  }

  test("firstFitBlocks EXACTLY matches a sequential first-fit reference " +
      "(oversized docs get dedicated overfull blocks, zero-length docs " +
      "join the open block, shard co-location resets state)") {
    import spark.implicits._
    // ids 0..199 with a length mix: oversized (>B), exact-fit halves,
    // zeros, and odd sizes; 40 shards over 32 partitions forces at least
    // one partition to hold >= 2 shards (state-reset path).
    val b = 50L
    val rows = (0L until 200L).map { id =>
      val len = (id % 9) match {
        case 0 => 0L            // zero-length
        case 1 => 60L           // oversized
        case 2 => 25L           // exact half
        case k => (k * 7) % 40  // odd sizes
      }
      (id, len)
    }
    val df = rows.toDF("doc_id", "n_tokens")
    val out = Packing.firstFitBlocks(df, "doc_id", "n_tokens", b, shards = 40)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("shard"),
          r.getAs[Long]("block")))).toMap
    // sequential reference with the same shard rule
    val lo = rows.map(_._1).min
    val width = math.max(1L, (rows.map(_._1).max - lo) / 40 + 1)
    val ref = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    rows.groupBy { case (id, _) => (id - lo) / width }.foreach {
      case (shard, docs0) =>
        var block = -1L; var fill = 0L
        docs0.sortBy(_._1).foreach { case (id, len) =>
          if (block == -1L) { block = 0L; fill = len }
          else if (fill + len <= b) fill += len
          else { block += 1; fill = len }
          ref(id) = (len, shard, block)
        }
    }
    assert(out == ref.toMap, {
      val diff = (out.keySet ++ ref.keySet)
        .filter(k => out.get(k) != ref.get(k)).take(5)
      s"first-fit mismatch at $diff: out=${diff.map(out.get)} " +
        s"ref=${diff.map(ref.get)}"
    })
    // the planted shapes actually occurred
    val blocks = out.values.groupBy(v => (v._2, v._3))
      .map { case (_, vs) => vs.map(_._1).sum }
    assert(blocks.exists(_ > b), "an overfull block must exist")
    assert(blocks.exists(u => u <= b && u > 0), "a padded block must exist")
    CacheRegistry.drain()
  }

  test("firstFitBlocks equals the sequential reference on SEEDED RANDOM " +
      "corpora across (blockSize, shards) configs, including sparse " +
      "non-contiguous ids") {
    import spark.implicits._
    val rnd = new scala.util.Random(15082026L)
    // sparse ids with gaps so the id-range shard rule sees ragged shards
    val rows = (0 until 150).map { i =>
      (i.toLong * (1 + rnd.nextInt(5)) + rnd.nextInt(3),
        rnd.nextInt(120).toLong)  // lengths 0..119, some over blockSize
    }.distinctBy(_._1)
    val df = rows.toDF("doc_id", "n_tokens")
    for ((b, sh) <- Seq((50L, 7), (100L, 13), (64L, 40))) {
      val out = Packing.firstFitBlocks(df, "doc_id", "n_tokens", b, sh)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("shard"), r.getAs[Long]("block")))).toMap
      val lo = rows.map(_._1).min
      val width = math.max(1L, (rows.map(_._1).max - lo) / sh + 1)
      val ref = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      rows.groupBy { case (id, _) => (id - lo) / width }.foreach {
        case (shard, docs0) =>
          var block = -1L; var fill = 0L
          docs0.sortBy(_._1).foreach { case (id, len) =>
            if (block == -1L) { block = 0L; fill = len }
            else if (fill + len <= b) fill += len
            else { block += 1; fill = len }
            ref(id) = (shard, block)
          }
      }
      assert(out == ref.toMap, s"config (b=$b, shards=$sh): mismatch")
    }
    CacheRegistry.drain()
  }

  test("firstFitBlocks lengthDescending packs each shard largest-first " +
      "(ties by id), matches the sequential reference, and assigns the " +
      "same doc set as arrival order") {
    import spark.implicits._
    val rnd = new scala.util.Random(16082026L)
    val rows = (0 until 180).map { i =>
      (i.toLong * (1 + rnd.nextInt(4)) + rnd.nextInt(2),
        rnd.nextInt(120).toLong)
    }.distinctBy(_._1)
    val df = rows.toDF("doc_id", "n_tokens")
    for ((b, sh) <- Seq((50L, 7), (64L, 13))) {
      val out = Packing.firstFitBlocks(df, "doc_id", "n_tokens", b, sh,
          lengthDescending = true)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("shard"), r.getAs[Long]("block")))).toMap
      val lo = rows.map(_._1).min
      val width = math.max(1L, (rows.map(_._1).max - lo) / sh + 1)
      val ref = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      rows.groupBy { case (id, _) => (id - lo) / width }.foreach {
        case (shard, docs0) =>
          var block = -1L; var fill = 0L
          docs0.sortBy { case (id, len) => (-len, id) }.foreach {
            case (id, len) =>
              if (block == -1L) { block = 0L; fill = len }
              else if (fill + len <= b) fill += len
              else { block += 1; fill = len }
              ref(id) = (shard, block)
          }
      }
      assert(out == ref.toMap, s"config (b=$b, shards=$sh): mismatch")
      // a caller-provided covering extent skips the stat pass without
      // changing a single assignment; a WIDER extent may move shard
      // ids but still packs every doc exactly once
      val lo2 = rows.map(_._1).min
      val hi2 = rows.map(_._1).max
      val withExtent = Packing.firstFitBlocks(df, "doc_id", "n_tokens",
          b, sh, lengthDescending = true, extent = Some((lo2, hi2)))
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("shard"), r.getAs[Long]("block")))).toMap
      assert(withExtent == out, "covering extent must be a no-op")
      val wider = Packing.firstFitBlocks(df, "doc_id", "n_tokens",
          b, sh, lengthDescending = true,
          extent = Some((lo2 - 1000L, hi2 + 1000L)))
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(wider == rows.map(_._1).toSet,
        "wider extent must still place every doc")
      // both policies place every doc exactly once, in the same shard
      // (the policy changes block assignment, never sharding) — note
      // a single-open-block fold gives NO universal block-count
      // dominance theorem (lengths 6,4,6,4 at capacity 10: arrival
      // packs 2 blocks, decreasing packs 3), which is exactly why
      // q199 MEASURES the contrast instead of assuming it
      val arrival = Packing.firstFitBlocks(df, "doc_id", "n_tokens", b,
          sh).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard"))
        .toMap
      assert(out.keySet == arrival.keySet)
      for ((id, (shard, _)) <- out)
        assert(shard == arrival(id), s"doc $id changed shard")
    }
    CacheRegistry.drain()
  }

  test("firstFitBlocksKeyed packs per explicit key exactly like the " +
      "sequential reference, never spans a block across keys, and " +
      "honors lengthDescending within each key") {
    import spark.implicits._
    val rnd = new scala.util.Random(17082026L)
    val keys = Seq("en", "de", "fr", "zh")
    val rows = (0 until 160).map { i =>
      (keys(rnd.nextInt(keys.size)), i.toLong, rnd.nextInt(90).toLong)
    }
    val df = rows.toDF("src", "doc_id", "n_tokens")
    val b = 64L
    for (desc <- Seq(false, true)) {
      val out = Packing.firstFitBlocksKeyed(df, "doc_id", "n_tokens",
          "src", b, lengthDescending = desc)
        .collect()
        .map(r => (r.getAs[String]("src"), r.getAs[Long]("doc_id")) ->
          r.getAs[Long]("block")).toMap
      val ref = scala.collection.mutable.Map.empty[(String, Long), Long]
      rows.groupBy(_._1).foreach { case (key, docs0) =>
        var block = -1L; var fill = 0L
        val ordered =
          if (desc) docs0.sortBy { case (_, id, len) => (-len, id) }
          else docs0.sortBy(_._2)
        ordered.foreach { case (_, id, len) =>
          if (block == -1L) { block = 0L; fill = len }
          else if (fill + len <= b) fill += len
          else { block += 1; fill = len }
          ref((key, id)) = block
        }
      }
      assert(out == ref.toMap, s"desc=$desc: keyed first-fit mismatch")
    }
    // every (key, block) holds docs of ONE key by construction of the
    // output schema; blocks respect capacity except DEDICATED overfull
    // singletons (lengths run to 89 > b, the firstFitBlocks contract)
    val blocks = Packing.firstFitBlocksKeyed(df, "doc_id", "n_tokens",
        "src", b).collect()
      .groupBy(r => (r.getAs[String]("src"), r.getAs[Long]("block")))
      .map { case (_, rs) => rs.map(_.getAs[Long]("n_tokens")).sum ->
        rs.length }
    assert(blocks.forall { case (used, n) => used <= b || n == 1 },
      "an over-capacity block must be a dedicated overfull singleton")
    assert(blocks.exists { case (used, n) => used > b && n == 1 },
      "the planted >b lengths must surface as overfull singletons")
    // null-key edge: a NULL key's first row must take the reset branch
    // (block 0) even when oversized — null != null is false, so a
    // null-sentinel fold would open at block 1
    val nullKeyed = Packing.firstFitBlocksKeyed(
        Seq((Option.empty[String], 1L, 100L), (Some("en"), 2L, 100L))
          .toDF("src", "doc_id", "n_tokens"),
        "doc_id", "n_tokens", "src", b).collect()
      .map(r => Option(r.getString(0)) -> r.getAs[Long]("block")).toMap
    assert(nullKeyed == Map(None -> 0L, Some("en") -> 0L),
      s"both first rows must open block 0: $nullKeyed")
    CacheRegistry.drain()
  }
}
