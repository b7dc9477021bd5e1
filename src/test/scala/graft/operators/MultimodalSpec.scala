package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("payload/meta plumbing: binary column + byte counts") {
    val session = spark
    import session.implicits._
    val docs = Seq((1L, "hello"), (2L, "český text")).toDF("doc_id", "text")
    val out = Multimodal.withPayloadMeta(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Array[Byte]]("payload"), r.getAs[Long]("n_bytes"))).toMap
    assert(out(1L)._2 == 5L)
    assert(new String(out(1L)._1, "UTF-8") == "hello")
    // non-ASCII: n_bytes counts UTF-8 bytes, not chars
    assert(out(2L)._2 > "český text".length)
  }

  test("typed feature extraction is deterministic and batch-shaped") {
    val session = spark
    import session.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "payload-one".getBytes("UTF-8"), "text/plain", 11L),
      Multimodal.Asset(2L, "payload-two".getBytes("UTF-8"), "text/plain", 11L))
      .toDS()
    val f1 = Multimodal.extractFeatures(assets, dim = 8).collect()
      .map(f => f.asset_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(assets, dim = 8).collect()
      .map(f => f.asset_id -> f.features.toSeq).toMap
    assert(f1 == f2) // deterministic stub
    assert(f1(1L).length == 8)
    assert(f1(1L) != f1(2L)) // content-sensitive
  }

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImages REALLY decodes PNG payloads (JDK ImageIO): " +
      "dimensions, channel means, thumbnail; junk payloads are dropped") {
    val session = spark
    import session.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, pngBytes(10, 6, 0xff0000), "image/png", 0L),
      Multimodal.Asset(2L, pngBytes(3, 3, 0x0000ff), "image/png", 0L),
      Multimodal.Asset(3L, "not an image".getBytes("UTF-8"), "text/plain", 12L))
      .toDS()
    val out = Multimodal.decodeImages(assets, thumbSize = 2).collect()
      .map(f => f.asset_id -> f).toMap
    assert(out.keySet == Set(1L, 2L)) // junk dropped, not thrown
    assert(out(1L).width == 10 && out(1L).height == 6)
    assert(out(1L).mean_r == 255.0 && out(1L).mean_g == 0.0 && out(1L).mean_b == 0.0)
    assert(out(2L).mean_b == 255.0)
    assert(out(1L).thumb.length == 4)
    // red's luma = 299/1000 of full scale
    assert(math.abs(out(1L).thumb(0) - 0.299f) < 1e-3)
  }

  private def wavBytes(sampleRate: Float, amplitude: Short, n: Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) { // constant-amplitude square of one polarity
      data(i * 2) = (amplitude & 0xff).toByte
      data(i * 2 + 1) = ((amplitude >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeWavs REALLY decodes PCM WAV (javax.sound): frames, " +
      "duration, RMS; non-audio payloads are dropped") {
    val session = spark
    import session.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, wavBytes(8000f, 16384, 800), "audio/wav", 0L),
      Multimodal.Asset(2L, "junk".getBytes("UTF-8"), "text/plain", 4L))
      .toDS()
    val out = Multimodal.decodeWavs(assets).collect()
      .map(f => f.asset_id -> f).toMap
    assert(out.keySet == Set(1L))
    val a = out(1L)
    assert(a.sample_rate == 8000.0 && a.channels == 1 && a.n_frames == 800L)
    assert(math.abs(a.duration_ms - 100.0) < 1e-9)
    // constant amplitude 16384 -> rms = 16384/32768 = 0.5 exactly
    assert(math.abs(a.rms - 0.5) < 1e-9)
  }

  test("resizeImages REALLY resizes (Graphics2D bilinear) and composes " +
      "with decodeImages; junk payloads are dropped") {
    val session = spark
    import session.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, pngBytes(16, 8, 0x336699), "image/png", 0L),
      Multimodal.Asset(2L, "junk".getBytes("UTF-8"), "text/plain", 4L))
      .toDS()
    val out = Multimodal.decodeImages(Multimodal.resizeImages(assets, 4, 2))
      .collect().map(f => f.asset_id -> f).toMap
    assert(out.keySet == Set(1L))
    val f = out(1L)
    assert(f.width == 4 && f.height == 2)
    // solid color survives bilinear resampling exactly
    assert(f.mean_r == 0x33.toDouble && f.mean_g == 0x66.toDouble &&
      f.mean_b == 0x99.toDouble)
  }

  test("imageDedup collapses the same pixels under DIFFERENT encodings " +
      "(PNG vs BMP) to one keeper — the decode-before-hash property a " +
      "payload hash cannot have") {
    val session = spark
    import session.implicits._
    def encode(rgb: Int, w: Int, h: Int, format: String): Array[Byte] = {
      javax.imageio.ImageIO.setUseCache(false)
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, format, bos)
      bos.toByteArray
    }
    val png = encode(0x336699, 6, 4, "png")
    val bmp = encode(0x336699, 6, 4, "bmp")
    val other = encode(0x112233, 6, 4, "png")
    assert(!png.sameElements(bmp)) // payload bytes differ...
    val assets = Seq(
      Multimodal.Asset(1L, png, "image/png", png.length.toLong),
      Multimodal.Asset(2L, bmp, "image/bmp", bmp.length.toLong),
      Multimodal.Asset(3L, other, "image/png", other.length.toLong)).toDS()
    val out = Multimodal.imageDedup(Multimodal.decodeImages(assets))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ...but the decoded content is identical: 1 and 2 collapse, 3 stays
    assert(out == Set((1L, 2L), (3L, 1L)), s"got $out")
  }

  test("audioDedup collapses identical decoded signals across distinct " +
      "asset ids and keeps distinct signals apart") {
    val session = spark
    import session.implicits._
    def asset(id: Long, srcId: Long) = {
      val wav = Multimodal.syntheticWav(srcId)
      Multimodal.Asset(id, wav, "audio/wav", wav.length.toLong)
    }
    // ids 1 and 2 carry the same signal (srcId 7); id 3 differs
    val assets = Seq(asset(1L, 7L), asset(2L, 7L), asset(3L, 8L)).toDS()
    val out = Multimodal.audioDedup(Multimodal.decodeWavs(assets))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (3L, 1L)), s"got $out")
  }

  test("sampleFrames explodes every Nth frame with index + timestamp " +
      "(plumbing real; decode is the labeled no-codec stub)") {
    val session = spark
    import session.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "video-bytes-a".getBytes("UTF-8"), "video/mp4", 13L),
      Multimodal.Asset(2L, "video-bytes-b".getBytes("UTF-8"), "video/mp4", 13L))
      .toDS()
    val all = Multimodal.sampleFrames(assets, everyNth = 1).collect()
    val sampled = Multimodal.sampleFrames(assets, everyNth = 3).collect()
    // deterministic per payload; sampling keeps exactly the i%3==0 frames
    val allIdx = all.filter(_.asset_id == 1L).map(_.frame_idx).sorted
    assert(allIdx.headOption.contains(0) && allIdx.length >= 4)
    assert(sampled.filter(_.asset_id == 1L).map(_.frame_idx).toSet ==
      allIdx.filter(_ % 3 == 0).toSet)
    // timestamps follow the fps grid
    val f3 = sampled.find(f => f.asset_id == 1L && f.frame_idx == 3)
    assert(f3.forall(f => math.abs(f.ts_ms - 120.0) < 1e-9)) // 3/25fps
    // same payload -> same frames (stub is deterministic)
    val again = Multimodal.sampleFrames(assets, everyNth = 3).collect()
    assert(again.map(f => (f.asset_id, f.frame_idx, f.frame.toSeq)).toSet ==
      sampled.map(f => (f.asset_id, f.frame_idx, f.frame.toSeq)).toSet)
  }

  test("synthetic PNG/WAV generators round-trip through the REAL decoders " +
      "to their closed-form oracle values (the q85/q86 contract)") {
    val session = spark
    import session.implicits._
    val ids = Seq(1L, 7L, 123L, 4096L)
    val pngAssets = ids.map { id =>
      val p = Multimodal.syntheticPng(id)
      Multimodal.Asset(id, p, "image/png", p.length.toLong)
    }.toDS()
    val imgs = Multimodal.decodeImages(pngAssets).collect()
      .map(f => f.asset_id -> f).toMap
    for (id <- ids) {
      val f = imgs(id)
      assert(f.width == 8 + (id % 8).toInt && f.height == 8 + ((id * 3) % 8).toInt)
      assert(f.mean_r == ((id * 37) % 256).toDouble, s"id=$id mean_r=${f.mean_r}")
      assert(f.mean_g == ((id * 59) % 256).toDouble)
      assert(f.mean_b == ((id * 83) % 256).toDouble)
    }
    val wavAssets = ids.map { id =>
      val w = Multimodal.syntheticWav(id)
      Multimodal.Asset(id, w, "audio/wav", w.length.toLong)
    }.toDS()
    val wavs = Multimodal.decodeWavs(wavAssets).collect()
      .map(f => f.asset_id -> f).toMap
    for (id <- ids) {
      val f = wavs(id)
      assert(f.sample_rate == 8000.0 && f.channels == 1)
      assert(f.n_frames == 800 + id % 100)
      // square wave: RMS is EXACTLY amp/32768 (power-of-two divisor)
      assert(f.rms == (1000 + id % 2000).toDouble / 32768.0, s"id=$id rms=${f.rms}")
      assert(f.duration_ms == (800 + id % 100) * 1000.0 / 8000.0)
    }
  }

  test("AVI demux round-trips the synthetic uncompressed container: " +
      "sampled DIB frames decode to their closed-form fills EXACTLY " +
      "(the q99 contract)") {
    val session = spark
    import session.implicits._
    val ids = Seq(0L, 1L, 7L, 123L)
    val assets = ids.map { id =>
      val avi = Multimodal.syntheticAvi(id)
      Multimodal.Asset(id, avi, "video/x-msvideo", avi.length.toLong)
    }.toDS()
    val stats = Multimodal.decodeVideoFrames(
        Multimodal.sampleAviFrames(assets, everyNth = 2)).collect()
      .map(f => (f.asset_id, f.frame_idx) -> f).toMap
    for (id <- ids) {
      val n = 3 + (id % 4).toInt
      val kept = (0 until n).filter(_ % 2 == 0)
      assert(stats.keys.count(_._1 == id) == kept.length, s"id=$id")
      for (f <- kept) {
        val s = stats((id, f))
        assert(s.width == 4 + (id % 4).toInt && s.height == 3 + (id % 3).toInt)
        assert(s.ts_ms == f * 40.0) // 25 fps from the container header
        assert(s.mean_r == ((id * 19 + f * 23) % 256).toDouble, s"id=$id f=$f")
        assert(s.mean_g == ((id * 13 + f * 17) % 256).toDouble)
        assert(s.mean_b == ((id * 11 + f * 7) % 256).toDouble)
      }
    }
  }

  test("MJPEG AVI frames are REAL JPEGs: demux + ImageIO decode gives " +
      "exact dimensions and near-fill means (codec tolerance), and " +
      "non-AVI / truncated payloads are dropped, not thrown") {
    val session = spark
    import session.implicits._
    val avi = Multimodal.syntheticMjpegAvi(5L)
    val assets = Seq(
      Multimodal.Asset(5L, avi, "video/x-msvideo", avi.length.toLong),
      Multimodal.Asset(6L, "not an avi".getBytes("UTF-8"), "video/mp4", 10L),
      Multimodal.Asset(7L, avi.take(40).toArray, "video/x-msvideo", 40L))
      .toDS()
    val stats = Multimodal.decodeVideoFrames(
      Multimodal.sampleAviFrames(assets, everyNth = 1)).collect()
    assert(stats.forall(_.asset_id == 5L), "broken payloads must drop")
    val n = 2 + (5L % 3).toInt
    assert(stats.length == n)
    for (s <- stats) {
      assert(s.width == 16 + (5 % 4) * 8 && s.height == 16 + (5 % 3) * 8)
      val gray = (40 + ((5L * 31 + s.frame_idx * 53) % 176)).toDouble
      for (m <- Seq(s.mean_r, s.mean_g, s.mean_b))
        assert(math.abs(m - gray) < 3.0, s"frame ${s.frame_idx}: $m vs $gray")
    }
    // the demuxer itself: structural garbage is None, never an exception
    assert(graft.sources.AviDemux.demux("RIFFxxxx".getBytes("UTF-8")).isEmpty)
    assert(graft.sources.AviDemux.demux(Array[Byte]()).isEmpty)
    // a crafted header whose stride*height overflows Int must fail the
    // bounds check (None), not ride the overflow into the pixel loop
    assert(graft.sources.AviDemux
      .dibChannelMeans(new Array[Byte](100), 50000, 50000).isEmpty)
  }

  /** The fixture's closed-form 64-bit dHash (syntheticBandPng doc). */
  private def refBandHash(id: Long): Long = {
    var hash = 0L
    for (r <- 0 until 8; i <- 0 until 8)
      if ((id * 31 + i * 17 + r * 57) % 200 < 183)
        hash |= 1L << (r * 8 + i)
    hash
  }

  test("dhashImages: decoded hash equals the fixture closed form for " +
      "every band-multiplier class, and is brightness/scale invariant") {
    val session = spark
    import session.implicits._
    // ids 0..11 cover every (id%3, id%2) multiplier class twice over;
    // brightness and scale perturb each — 3 assets per id
    val ids = (0L until 12L)
    val assets = ids.flatMap { id =>
      def a(aid: Long, p: Array[Byte]) =
        Multimodal.Asset(aid, p, "image/png", p.length.toLong)
      Seq(
        a(id, Multimodal.syntheticBandPng(id)),
        a(id + 100L, Multimodal.syntheticBandPng(id, brightness = 40)),
        a(id + 200L, Multimodal.syntheticBandPng(id, scaleStep = 1)))
    }.toDS()
    val got = Multimodal.dhashImages(assets).collect()
      .map(h => h.asset_id -> h.dhash).toMap
    assert(got.size == 36)
    for (id <- ids) {
      val want = refBandHash(id)
      assert(got(id) == want, s"id=$id base hash")
      assert(got(id + 100L) == want, s"id=$id brightness variant diverged")
      assert(got(id + 200L) == want, s"id=$id scale variant diverged")
    }
    // different band profiles produce different hashes (discriminative)
    assert(ids.map(got).distinct.size > 1)
  }

  test("canonicalDhashImages: invariant under every dihedral transform " +
      "(+brightness), where the plain dHash provably is not") {
    val session = spark
    import session.implicits._
    // ids 0..11 cover every (id%3, id%2) band-multiplier class twice;
    // per id: the base, all 8 dihedral transforms, and a transposed +
    // brightness-shifted composition
    val ids = (0L until 12L)
    val assets = ids.flatMap { id =>
      def a(aid: Long, p: Array[Byte]) =
        Multimodal.Asset(aid, p, "image/png", p.length.toLong)
      (0 to 7).map(t => a(id + 100L * (t + 1),
        Multimodal.syntheticBandPng(id, transform = t))) :+
        a(id + 1000L,
          Multimodal.syntheticBandPng(id, brightness = 40, transform = 5)) :+
        a(id, Multimodal.syntheticBandPng(id))
    }.toDS()
    val canon = Multimodal.canonicalDhashImages(assets).collect()
      .map(h => h.asset_id -> h.chash).toMap
    assert(canon.size == ids.size * 10)
    for (id <- ids; t <- 0 to 7)
      assert(canon(id + 100L * (t + 1)) == canon(id),
        s"id=$id transform=$t diverged from the base canonical hash")
    for (id <- ids)
      assert(canon(id + 1000L) == canon(id),
        s"id=$id transpose+brightness composition diverged")
    // discriminative across band profiles
    assert(ids.map(canon).distinct.size > 1)
    // the gap being closed: the PLAIN dHash of a rotated copy differs
    // from the base for at least one profile (rotation scrambles it)
    val plain = Multimodal.dhashImages(assets).collect()
      .map(h => h.asset_id -> h.dhash).toMap
    assert(ids.exists(id => plain(id + 200L) != plain(id)),
      "rot90 should scramble the plain dHash for some profile")
  }

  test("canonicalDhashImages: non-square orientation edge — a 10×8 " +
      "image hashes from its valid orientations; 8×8 is dropped") {
    val session = spark
    import session.implicits._
    // 10×8 solid: identity/rot180/flips hash (all-zero comparisons),
    // quarter-turn orientations are 8 px wide (< 9 columns) and cannot;
    // the canonical min over the valid four is defined. 8×8 has no
    // valid orientation at all.
    val assets = Seq(
      Multimodal.Asset(1L, pngBytes(10, 8, 0x406080), "image/png", 0L),
      Multimodal.Asset(2L, pngBytes(8, 8, 0x406080), "image/png", 0L)).toDS()
    val canon = Multimodal.canonicalDhashImages(assets).collect()
      .map(h => h.asset_id -> h.chash).toMap
    assert(canon == Map(1L -> 0L))
  }

  test("dhashImages drops images too small to hash; imageNearDupPairs " +
      "finds planted perturbed pairs at Hamming 0 via pigeonhole") {
    val session = spark
    import session.implicits._
    val tiny = pngBytes(4, 4, 0x808080)
    val assets = Seq(
      Multimodal.Asset(1L, Multimodal.syntheticBandPng(1L), "image/png", 0L),
      Multimodal.Asset(101L,
        Multimodal.syntheticBandPng(1L, brightness = 25), "image/png", 0L),
      Multimodal.Asset(201L,
        Multimodal.syntheticBandPng(1L, scaleStep = 2), "image/png", 0L),
      Multimodal.Asset(2L, Multimodal.syntheticBandPng(2L), "image/png", 0L),
      Multimodal.Asset(9L, tiny, "image/png", 0L)).toDS()
    val hashes = Multimodal.dhashImages(assets).toDF()
    assert(hashes.count() == 4) // the 4x4 image has no 9x8 gradient
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    // all three id=1 variants pair with each other at distance 0; the
    // id=2 profile is far from all of them (different wrap pattern)
    val within = pairs.filter { case (a, b, _) =>
      Set(1L, 101L, 201L).contains(a) && Set(1L, 101L, 201L).contains(b) }
    assert(within.length == 3 && within.forall(_._3 == 0L), pairs.toSeq)
    assert(pairs.length == within.length,
      s"id=2 must not near-pair with the id=1 family: ${pairs.toSeq}")
  }

  test("imageDupClusters equals the brute-force transitive closure, " +
      "with degenerate identical-hash families collapsed before pairing") {
    val session = spark
    import session.implicits._
    // id=1 family (3 perturbed variants, identical hash), id=2 and id=5
    // singles, and six SOLID images — every solid image hashes to
    // exactly 0 regardless of color or size, the web-scale degenerate
    // family the representative collapse exists for
    val assets = (Seq(
      Multimodal.Asset(1L, Multimodal.syntheticBandPng(1L), "image/png", 0L),
      Multimodal.Asset(101L,
        Multimodal.syntheticBandPng(1L, brightness = 30), "image/png", 0L),
      Multimodal.Asset(201L,
        Multimodal.syntheticBandPng(1L, scaleStep = 1), "image/png", 0L),
      Multimodal.Asset(2L, Multimodal.syntheticBandPng(2L), "image/png", 0L),
      Multimodal.Asset(5L, Multimodal.syntheticBandPng(5L), "image/png", 0L)) ++
      (50L to 55L).map(i => Multimodal.Asset(i,
        pngBytes(16, 16, (i * 111).toInt), "image/png", 0L))).toDS()
    val hashes = Multimodal.dhashImages(assets).toDF()
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val solid = hs.filter(h => h._1 >= 50L && h._1 <= 55L)
    assert(solid.length == 6 && solid.forall(_._2 == 0L),
      s"solid images must hash to 0: ${solid.toSeq}")
    // brute-force reference closure over Hamming<=3 edges
    val parent = scala.collection.mutable.Map(hs.map(h => h._1 -> h._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for {
      (a, ha) <- hs; (b, hb) <- hs
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } parent(find(a)) = find(b)
    val want = hs.map(_._1).groupBy(find).values
      .filter(_.length > 1)
      .map(g => (g.min, g.length.toLong, g.max))
      .toSeq.sortBy(_._1)
    val got = Multimodal.imageDupClusters(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(got == want, s"\n got=$got\nwant=$want")
    // the degenerate solid family is ONE cluster labeled by its min id
    assert(got.exists { case (c, n, m) => c == 50L && n == 6L && m == 55L },
      got.toString)
    CacheRegistry.drain()
  }

  /** The fixture's closed-form 64-bit audio hash (syntheticBandWav doc). */
  private def refBandAudioHash(id: Long): Long = {
    var hash = 0L
    for (w <- 0 until 64)
      if ((id * 31 + w * 17) % 200 < 183) hash |= 1L << w
    hash
  }

  /** 16-bit mono PCM WAV from raw samples (for non-fixture audio tests). */
  private def wavOf(samples: Array[Short], rate: Float = 8000f): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("ahashAudio: decoded hash equals the fixture closed form for " +
      "every band-length class, and is gain/resample invariant") {
    val session = spark
    import session.implicits._
    // ids 0..11 cover every id%3 band-length class; gain (8×) and
    // resample (2×) perturb each — 3 assets per id
    val ids = (0L until 12L)
    val assets = ids.flatMap { id =>
      def a(aid: Long, p: Array[Byte]) =
        Multimodal.Asset(aid, p, "audio/wav", p.length.toLong)
      Seq(
        a(id, Multimodal.syntheticBandWav(id)),
        a(id + 100L, Multimodal.syntheticBandWav(id, gainShift = 3)),
        a(id + 200L, Multimodal.syntheticBandWav(id, rateStep = 1)))
    }.toDS()
    val got = Multimodal.ahashAudio(assets).collect()
      .map(h => h.asset_id -> h.ahash).toMap
    assert(got.size == 36)
    for (id <- ids) {
      val want = refBandAudioHash(id)
      assert(got(id) == want, s"id=$id base hash")
      assert(got(id + 100L) == want, s"id=$id gain variant diverged")
      assert(got(id + 200L) == want, s"id=$id resample variant diverged")
    }
    assert(ids.map(got).distinct.size > 1)
  }

  test("ahashAudio: gain invariance holds on arbitrary (non-fixture) " +
      "PCM; short or non-16-bit streams drop; pairs surface via pigeonhole") {
    val session = spark
    import session.implicits._
    // deterministic pseudo-random PCM, then an exact 4× re-gain of it —
    // the general invariance, not the band-aligned special case
    val rnd = new scala.util.Random(42)
    val base = Array.fill(1300)((rnd.nextInt(8000) - 4000).toShort)
    val gained = base.map(s => (s * 4).toShort)
    val assets = Seq(
      Multimodal.Asset(1L, wavOf(base), "audio/wav", 0L),
      Multimodal.Asset(2L, wavOf(gained), "audio/wav", 0L),
      Multimodal.Asset(3L, wavOf(base, rate = 16000f), "audio/wav", 0L),
      // 64 samples: one short of the 65-window minimum — must drop
      Multimodal.Asset(9L, wavOf(Array.fill(64)(100.toShort)), "audio/wav", 0L),
      // not audio at all — must drop, never throw
      Multimodal.Asset(8L, "not a wav".getBytes("UTF-8"), "audio/wav", 0L)
    ).toDS()
    val hashes = Multimodal.ahashAudio(assets).collect()
      .map(h => h.asset_id -> h.ahash).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L))
    assert(hashes(1L) == hashes(2L), "4x re-gain changed the hash")
    assert(hashes(1L) == hashes(3L), "rate relabel changed the hash")
    val pairs = Multimodal.audioNearDupPairs(
        Multimodal.ahashAudio(assets).toDF(), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pairs.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)), pairs.toSeq)
  }

  test("contentBoxDhashImages: uniform letterbox/pillarbox/matte " +
      "borders never change the hash (equals the bare dHash of the " +
      "interior); the fixed-grid dHash IS scrambled by the same bars; " +
      "fully-uniform images drop") {
    val session = spark
    import session.implicits._
    def a(aid: Long, png: Array[Byte]) =
      Multimodal.Asset(aid, png, "image/png", png.length.toLong)
    // a solid PNG: fully uniform — must drop
    val solid = {
      javax.imageio.ImageIO.setUseCache(false)
      val im = new java.awt.image.BufferedImage(
        20, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = im.createGraphics()
      try {
        g2.setColor(new java.awt.Color(30, 30, 30))
        g2.fillRect(0, 0, 20, 16)
      } finally g2.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val assets = ((0L until 8L).flatMap { id =>
      Seq(
        a(id, Multimodal.syntheticBandPng(id)),
        a(id + 100L, Multimodal.padImage(
          Multimodal.syntheticBandPng(id), border = 3, gray = 0)),
        a(id + 200L, Multimodal.padImage(
          Multimodal.syntheticBandPng(id, brightness = 25),
          border = 9, gray = 255)))
    } :+ a(900L, solid)).toDS()
    val boxed = Multimodal.contentBoxDhashImages(assets).collect()
      .map(h => h.asset_id -> h.dhash).toMap
    assert(!boxed.contains(900L))
    val bare = Multimodal.dhashImages(assets).collect()
      .map(h => h.asset_id -> h.dhash).toMap
    for (id <- 0L until 8L) {
      assert(boxed(id) == bare(id),
        s"id=$id content box of an unpadded image must be the image")
      assert(boxed(id + 100L) == boxed(id),
        s"id=$id black matte changed the content hash")
      assert(boxed(id + 200L) == boxed(id),
        s"id=$id white matte + brightness diverged")
    }
    // the fixed grid is genuinely scrambled by the bars it samples
    assert((0L until 8L).exists(id => bare(id + 100L) != bare(id)),
      "expected plain dHash to differ under letterboxing")
    // fixture generator fails loudly on an undecodable payload (the
    // scan paths DROP corrupt assets; a generator input is a caller bug)
    val bad = intercept[IllegalArgumentException] {
      Multimodal.padImage(Array[Byte](1, 2, 3), border = 2, gray = 0)
    }
    assert(bad.getMessage.contains("undecodable"))
    CacheRegistry.drain()
  }

  test("tiledDhashImages: a grid-aligned crop's tile hashes are a " +
      "subset of the original's, crop+brightness compositions pair, a " +
      "misaligned crop genuinely scrambles (the documented boundary), " +
      "and flat tiles never create pairs") {
    val session = spark
    import session.implicits._
    def a(aid: Long, png: Array[Byte]) =
      Multimodal.Asset(aid, png, "image/png", png.length.toLong)
    def base(id: Long, b: Int = 0) =
      Multimodal.syntheticBandPng(id, brightness = b, scaleStep = 2)
    val assets = ((0L until 12L).flatMap { id =>
      Seq(
        a(id, base(id)),
        // one-tile left+top crop — every surviving tile grid-aligned
        a(id + 100L, Multimodal.cropImage(base(id), left = 9, top = 9)),
        // brightness + right/bottom crop composition
        a(id + 200L, Multimodal.cropImage(base(id, b = 30),
          left = 0, top = 0, right = 9, bottom = 9)),
        // misaligned crop: 4 px is NOT a multiple of the 9-px tile
        a(id + 300L, Multimodal.cropImage(base(id), left = 4, top = 4)))
    } :+ a(900L, { // a solid image: every tile flat, hash 0, excluded
      val im = new java.awt.image.BufferedImage(
        27, 27, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = im.createGraphics()
      try {
        g2.setColor(new java.awt.Color(77, 77, 77))
        g2.fillRect(0, 0, 27, 27)
      } finally g2.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    })).toDS()
    val tiles = Multimodal.tiledDhashImages(assets, tile = 9)
    val byAsset = tiles.collect().groupBy(_.asset_id)
      .map { case (k, v) => k -> v.map(_.dhash).toSet }
    for (id <- 0L until 12L) {
      assert(byAsset(id + 100L).subsetOf(byAsset(id)),
        s"id=$id aligned-crop tiles escaped the original's hash set")
      assert(byAsset(id + 200L).subsetOf(byAsset(id)),
        s"id=$id crop+brightness tiles escaped the original's hash set")
    }
    // the misaligned crop is NOT a subset for at least some images —
    // the grid-alignment boundary is real, not vacuous
    assert((0L until 12L).exists(id => !byAsset(id + 300L)
        .forall(h => byAsset(id)(h) || h == 0L)),
      "expected a 4-px crop to scramble some tile hashes")
    // the solid image's tiles all hashed 0
    assert(byAsset.get(900L).forall(_ == Set(0L)))
    val pairs = Multimodal.tiledImageNearDupPairs(tiles.toDF(),
        minShared = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // rule-exact recall: a variant pairs with its original IFF their
    // non-degenerate hash sets share >= 3 distinct values (band-phase
    // repetition can collapse a crop's surviving tiles to fewer
    // DISTINCT hashes — the k-of-n rule counts values, not positions)
    var aligned = 0
    var composed = 0
    for (id <- 0L until 12L; off <- Seq(100L, 200L)) {
      val shared = (byAsset(id) & byAsset(id + off)) - 0L
      assert(pairs((id, id + off)) == (shared.size >= 3),
        s"id=$id off=$off shared=${shared.size} pair=${pairs((id, id + off))}")
      if (pairs((id, id + off))) {
        if (off == 100L) aligned += 1 else composed += 1
      }
    }
    // and the tier genuinely recalls most planted crops (deterministic
    // fixture — pin the floor, not the exact count)
    assert(aligned >= 8, s"only $aligned/12 aligned crops recalled")
    assert(composed >= 8, s"only $composed/12 compositions recalled")
    // the flat image pairs with NOTHING (degenerate-tile exclusion)
    assert(!pairs.exists(p => p._1 == 900L || p._2 == 900L))
    // stop-tile cap: at maxHashFreq = 1 every hash is "ubiquitous"
    // (each planted family shares it), so no pairs survive
    assert(Multimodal.tiledImageNearDupPairs(tiles.toDF(),
      minShared = 1, maxHashFreq = 1).count() == 0L)
    CacheRegistry.drain()
  }

  test("sharedValueStats surfaces a ubiquitous tile before the pair " +
      "join goes quadratic through it; the maxHashFreq cap drops it " +
      "LOUDLY and spares genuine duplicate pairs") {
    val session = spark
    import session.implicits._
    // degenerate corpus, distilled to the tiles relation the tier
    // joins on: 40 assets ALL carrying tile-hash 111 (a shared
    // watermark/header tile), plus each even/odd pair (2i, 2i+1)
    // sharing three hashes of its own (genuine near-dups)
    val tiles = (0L until 40L).flatMap { id =>
      val fam = id / 2
      (111L, id) +: (1 to 3).map(j => (1000L + fam * 10 + j, id))
    }.map { case (h, id) => (id, h) }.toDF("asset_id", "dhash")
    // the stats surface the hazard BEFORE any join: hash 111 carried
    // by all 40 ids (the max-n early warning), each family hash by 2;
    // singletons would be pruned (none here)
    val stats = Multimodal.sharedValueStats(tiles, "asset_id", "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stats(111L) == 40L, s"hot tile must surface: $stats")
    assert(stats.size == 61 && stats.filter(_._1 != 111L).values
      .forall(_ == 2L), s"family tiles must read n=2: ${stats.size}")
    // uncapped at minShared=1, the hot tile alone pairs EVERYONE:
    // 40*39/2 candidate pairs — the n²-through-one-value hazard
    assert(Multimodal.tiledImageNearDupPairs(tiles, minShared = 1)
      .count() == 780L)
    // capped below the hot tile's population (logged drop): only the
    // 20 genuine families pair, through their own three shared hashes
    val capped = Multimodal.tiledImageNearDupPairs(tiles,
        minShared = 1, maxHashFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == (0L until 20L).map(f =>
      (2 * f, 2 * f + 1, 3L)).toSet, s"$capped")
    // and a pair that needed the hot tile to reach minShared is the
    // documented recall trade: at minShared=4 the uncapped join pairs
    // every family (3 own + the watermark), the capped one pairs none
    assert(Multimodal.tiledImageNearDupPairs(tiles, minShared = 4)
      .count() == 20L)
    assert(Multimodal.tiledImageNearDupPairs(tiles,
      minShared = 4, maxHashFreq = 10).count() == 0L)
    // the video tier shares the same join and cap (one smoke row)
    val sh = Seq((1L, "5:6:7"), (2L, "5:6:7"), (3L, "9:9:9"))
      .toDF("asset_id", "shingle")
    assert(Multimodal.sharedValueStats(sh, "asset_id", "shingle")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("5:6:7", 2L)))
    CacheRegistry.drain()
  }

  test("scaleNormalizeImages closes the crop+RESCALE gap: a 2x-" +
      "rescaled short-edge crop re-pairs with its original through " +
      "the normalized tiled tier, and provably does NOT pair without " +
      "the normalization pre-step") {
    val session = spark
    import session.implicits._
    javax.imageio.ImageIO.setUseCache(false)
    def png(im: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    // deterministic dense-texture source: every tile non-flat, every
    // hash informative
    val rnd = new scala.util.Random(77)
    val base = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64)
      base.setRGB(x, y, rnd.nextInt(1 << 24))
    // short-edge trim (bottom 18 rows): the long edge survives, so
    // the normalization factor is pinned — the documented in-scope
    // crop class (letterbox removal / banner cuts)
    val cropPng = Multimodal.cropImage(png(base), left = 0, top = 0,
      right = 0, bottom = 18)
    val crop = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(cropPng))
    // 2x nearest upscale — the re-upload rescale being recovered
    val up = new java.awt.image.BufferedImage(
      128, 60, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 60; x <- 0 until 128)
      up.setRGB(x, y, crop.getRGB(x / 2, y / 2) & 0xffffff)
    val assets = Seq(
      Multimodal.Asset(1L, png(base), "image/png", 1L),
      Multimodal.Asset(2L, png(up), "image/png", 1L)).toDS()
    // WITHOUT normalization the rescale scrambles every tile: no pair
    val rawTiles = Multimodal.tiledDhashImages(assets, tile = 9)
    assert(Multimodal.tiledImageNearDupPairs(rawTiles.toDF(),
      minShared = 3).count() == 0L,
      "the gap being closed must actually exist")
    // WITH it: the rescaled crop normalizes to the exact pixels the
    // un-rescaled crop would (floor-composition), so its whole tiles
    // re-hash identically and the pair lands
    val norm = Multimodal.scaleNormalizeImages(assets, longEdge = 256)
    val tiles = Multimodal.tiledDhashImages(norm, tile = 9)
    val byAsset = tiles.collect().groupBy(_.asset_id)
      .map { case (k, v) => k -> v.map(_.dhash).toSet }
    val shared = (byAsset(1L) & byAsset(2L)) - 0L
    assert(shared.size >= 3,
      s"normalized tiles must overlap: ${shared.size}")
    assert((byAsset(2L) - 0L).subsetOf(byAsset(1L)),
      "normalized rescaled-crop tiles must be a subset of the original's")
    val pairs = Multimodal.tiledImageNearDupPairs(tiles.toDF(),
        minShared = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"$pairs")
    CacheRegistry.drain()
  }

  test("videoShingles: mid-stream trims and splices share intact " +
      "windows with their source (the content-signature fold is MOVED " +
      "by the same edits — the gap being closed); sub-w videos emit " +
      "nothing; the stop-shingle cap prunes") {
    val session = spark
    import session.implicits._
    def a(aid: Long, avi: Array[Byte]) =
      Multimodal.Asset(aid, avi, "video/avi", avi.length.toLong)
    // ids chosen with >= 5 content frames (3 + id%4 >= 5) so a head
    // trim AND a tail trim both leave a 3-run
    val ids = Seq(2L, 3L, 6L, 7L, 14L, 15L)
    val assets = (ids.flatMap { id =>
      Seq(
        a(id, Multimodal.syntheticBandAvi(id)),
        // head cut + brightness: a GENUINE content re-edit
        a(id + 100L, Multimodal.syntheticBandAvi(id, brightness = 30,
          trimHead = 1)),
        // tail cut
        a(id + 200L, Multimodal.syntheticBandAvi(id, trimTail = 1)),
        // splice with the geometry-sharing neighbor id+6
        a(id + 300L, Multimodal.syntheticSpliceBandAvi(id, id + 6)))
    } :+ a(900L, Multimodal.syntheticBandAvi(1L))  // 4 frames
     :+ a(901L, Multimodal.syntheticBandAvi(1L, trimHead = 1,
          trimTail = 1))  // only 2 content frames: below w=3, no shingles
    ).toDS()
    val fh = Multimodal.dhashVideoFrames(
      Multimodal.sampleAviFrames(assets, everyNth = 1)).toDF()
    val sh = Multimodal.videoShingles(fh, w = 3)
    val byAsset = sh.collect()
      .groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.map(_.getString(2)).toSet }
    for (id <- ids) {
      assert(byAsset(id + 100L).subsetOf(byAsset(id)),
        s"id=$id head-trim windows escaped the original's")
      assert(byAsset(id + 200L).subsetOf(byAsset(id)),
        s"id=$id tail-trim windows escaped the original's")
      assert(byAsset(id + 100L).nonEmpty && byAsset(id + 200L).nonEmpty)
      // the splice carries every window of BOTH clips (id+6 is not an
      // asset here; compare against its would-be shingle set via a
      // second spliced build sharing only the B clip is overkill —
      // the A-side subset is the load-bearing claim)
      assert(byAsset(id).subsetOf(byAsset(id + 300L)),
        s"id=$id splice lost some of clip A's windows")
    }
    // below-w videos emit nothing (901 has 2 content frames)
    assert(!byAsset.contains(901L))
    val pairs = Multimodal.videoShingleNearDupPairs(sh).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (id <- ids) {
      assert(pairs((id, id + 100L)), s"id=$id head trim not recalled")
      assert(pairs((id, id + 200L)), s"id=$id tail trim not recalled")
      assert(pairs((id, id + 300L)), s"id=$id splice not recalled")
    }
    // the content-signature fold (q131's tier) is genuinely MOVED by
    // a content trim for at least some ids — this tier's raison d'être
    val sigs = Multimodal.videoContentSignatures(fh).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ids.exists(id => sigs(id) != sigs(id + 100L)),
      "expected a head cut to move the majority fold")
    // stop-shingle cap: every planted family shares its windows across
    // >= 3 assets, so a cap of 1 leaves nothing to pair
    assert(Multimodal.videoShingleNearDupPairs(sh,
      maxShingleFreq = 1).count() == 0L)
    CacheRegistry.drain()
  }

  test("videoContentSignatures: solid intro/outro padding never changes " +
      "the signature or the content-frame count; the plain fold IS " +
      "moved by the same padding (the gap being closed); all-degenerate " +
      "videos drop") {
    val session = spark
    import session.implicits._
    def a(aid: Long, avi: Array[Byte]) =
      Multimodal.Asset(aid, avi, "video/avi", avi.length.toLong)
    val solidOnly = graft.sources.AviDemux.mux(
      Seq.fill(4)(graft.sources.AviDemux.solidDibFrame(18, 16, 40, 40, 40)),
      18, 16, 40000L, compressed = false)
    val assets = ((0L until 8L).flatMap { id =>
      Seq(
        a(id, Multimodal.syntheticBandAvi(id)),
        a(id + 100L, Multimodal.syntheticBandAvi(id, introFrames = 3,
          outroFrames = 2)),
        a(id + 200L, Multimodal.syntheticBandAvi(id, brightness = 25,
          introFrames = 1)))
    } :+ a(900L, solidOnly)).toDS()
    val hashes = Multimodal.dhashVideoFrames(
      Multimodal.sampleAviFrames(assets, everyNth = 1)).toDF()
    val content = Multimodal.videoContentSignatures(hashes).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // all-degenerate video: no content frames, no signature
    assert(!content.contains(900L))
    for (id <- 0L until 8L) {
      assert(content(id + 100L) == content(id),
        s"id=$id intro/outro padding changed the content signature")
      assert(content(id + 200L) == content(id),
        s"id=$id brightness+intro variant diverged")
    }
    // the PLAIN fold is genuinely moved by the same padding on at
    // least one video — the blindness videoContentSignatures closes
    val plain = Multimodal.videoSignatures(hashes).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((0L until 8L).exists(id => plain(id + 100L) != plain(id)),
      "expected the plain majority fold to shift under padding")
    CacheRegistry.drain()
  }

  /** The SPAN fixture's closed-form hash (syntheticSpanWav doc): pinned
    * 200-amp delimiter bands ⇒ bit 0 never set, bits 1-62 the band
    * rule, bit 63 rises into the trailing delimiter unless band 63 is
    * itself at 200.
    */
  private def refSpanAudioHash(id: Long): Long = {
    var hash = 0L
    for (w <- 1 until 63)
      if ((id * 31 + w * 17) % 200 < 183) hash |= 1L << w
    if ((id * 31 + 63 * 17) % 200 < 199) hash |= 1L << 63
    hash
  }

  test("ahashAudioSpan: TRIM-invariant — leading silence of any length " +
      "never changes the hash (closed form holds), gain/resample " +
      "invariance carries over, and the container-anchored ahashAudio " +
      "really is blind to the same trim (the gap being closed)") {
    val session = spark
    import session.implicits._
    val ids = (0L until 12L)
    val assets = ids.flatMap { id =>
      def a(aid: Long, p: Array[Byte]) =
        Multimodal.Asset(aid, p, "audio/wav", p.length.toLong)
      Seq(
        a(id, Multimodal.syntheticSpanWav(id)),
        // the trimmed-re-upload relation: original carries silence,
        // variant none — plus gain and resample on top
        a(id + 100L, Multimodal.syntheticSpanWav(id, silenceBands = 5)),
        a(id + 200L, Multimodal.syntheticSpanWav(id, gainShift = 3,
          silenceBands = 2)),
        a(id + 300L, Multimodal.syntheticSpanWav(id, rateStep = 1,
          silenceBands = 7)))
    }.toDS()
    val got = Multimodal.ahashAudioSpan(assets).collect()
      .map(h => h.asset_id -> h.ahash).toMap
    assert(got.size == 48)
    for (id <- ids) {
      val want = refSpanAudioHash(id)
      assert(got(id) == want, s"id=$id base hash vs closed form")
      assert(got(id + 100L) == want, s"id=$id silence-trim diverged")
      assert(got(id + 200L) == want, s"id=$id gain+trim diverged")
      assert(got(id + 300L) == want, s"id=$id resample+trim diverged")
    }
    assert(ids.map(got).distinct.size > 1)
    // the OLD container-anchored tier is genuinely blind to this edit:
    // silence shifts its window grid, so the same pair diverges there
    val oldTier = Multimodal.ahashAudio(assets).collect()
      .map(h => h.asset_id -> h.ahash).toMap
    assert(ids.exists(id => oldTier(id) != oldTier(id + 100L)),
      "expected ahashAudio to differ on at least one silence-trim pair")
    // and the planted trimmed pairs surface through the pigeonhole
    val pairs = Multimodal.audioNearDupPairs(
        Multimodal.ahashAudioSpan(assets.filter(a =>
          a.asset_id == 3L || a.asset_id == 103L)).toDF(),
        maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((3L, 103L)), pairs)
  }

  test("ahashAudioSpan: non-fixture sanity — pure silence drops, a " +
      "sub-65-sample loud span drops, and arbitrary PCM survives its " +
      "own silence-padding round trip") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(1300)((rnd.nextInt(8000) - 4000).toShort)
    val padded = Array.fill(400)(0.toShort) ++ base ++
      Array.fill(250)(0.toShort)
    // quiet padding BELOW half-max (not exact silence) must also stay
    // outside the span: pad with values under maxAmp/2
    val maxAmp = base.map(s => math.abs(s.toInt)).max
    val quiet = Array.fill(300)(((maxAmp + 1) / 2 - 1).toShort)
    val quietPadded = quiet ++ base ++ quiet
    val assets = Seq(
      Multimodal.Asset(1L, wavOf(base), "audio/wav", 0L),
      Multimodal.Asset(2L, wavOf(padded), "audio/wav", 0L),
      Multimodal.Asset(3L, wavOf(quietPadded), "audio/wav", 0L),
      // pure silence: no sample reaches any threshold — drop
      Multimodal.Asset(8L, wavOf(Array.fill(500)(0.toShort)), "audio/wav", 0L),
      // loud span of 1 sample inside quiet: span < 65 — drop
      Multimodal.Asset(9L, wavOf(
        Array.fill(100)(10.toShort) ++ Array(32000.toShort) ++
          Array.fill(100)(10.toShort)), "audio/wav", 0L)
    ).toDS()
    val hashes = Multimodal.ahashAudioSpan(assets).collect()
      .map(h => h.asset_id -> h.ahash).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L))
    assert(hashes(1L) == hashes(2L), "silence padding changed the hash")
    assert(hashes(1L) == hashes(3L), "sub-threshold padding changed the hash")
  }

  test("pcm16 extraction: the direct RIFF/WAVE reader and the " +
      "AudioSystem fallback agree — an AU re-container (big-endian " +
      "PCM) of the same samples hashes identically on both tiers, and " +
      "the WAV path still matches the closed form") {
    val session = spark
    import session.implicits._
    def auOf(samples: Array[Short]): Array[Byte] = {
      // AU stores PCM big-endian — exercises the fallback path AND the
      // endianness handling of the shared hash cores
      val data = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        data(2 * i) = ((samples(i) >> 8) & 0xff).toByte
        data(2 * i + 1) = (samples(i) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.AU, bos)
      bos.toByteArray
    }
    // decode fixture WAV samples back out so the AU twin is sample-exact
    val wav = Multimodal.syntheticSpanWav(5L, silenceBands = 2)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val pcm = in.readAllBytes(); in.close()
    val samples = Array.tabulate(pcm.length / 2)(i =>
      (((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff))).toShort)
    val assets = Seq(
      Multimodal.Asset(1L, wav, "audio/wav", wav.length.toLong),
      Multimodal.Asset(2L, auOf(samples), "audio/basic", 0L)).toDS()
    val span = Multimodal.ahashAudioSpan(assets).collect()
      .map(h => h.asset_id -> h.ahash).toMap
    val plain = Multimodal.ahashAudio(assets).collect()
      .map(h => h.asset_id -> h.ahash).toMap
    assert(span(1L) == span(2L), "AU re-container diverged on span tier")
    assert(plain(1L) == plain(2L), "AU re-container diverged on plain tier")
    assert(span(1L) == refSpanAudioHash(5L), "direct WAV path vs closed form")
    CacheRegistry.drain()
  }

  test("audio perceptualDupClusters equals the brute-force transitive " +
      "closure, with the degenerate constant-signal (hash 0) family " +
      "collapsed before pairing") {
    val session = spark
    import session.implicits._
    // id=1 family (re-gained + resampled variants, identical hash),
    // id=2 and id=5 singles, and six CONSTANT signals of differing
    // amplitude and length — every constant signal has equal per-window
    // energies, so no delta ever rises and the hash is exactly 0: the
    // audio twin of the solid-image degenerate family (silence, test
    // tones, DC offsets at web scale)
    val assets = (Seq(
      Multimodal.Asset(1L, Multimodal.syntheticBandWav(1L), "audio/wav", 0L),
      Multimodal.Asset(101L,
        Multimodal.syntheticBandWav(1L, gainShift = 3), "audio/wav", 0L),
      Multimodal.Asset(201L,
        Multimodal.syntheticBandWav(1L, rateStep = 1), "audio/wav", 0L),
      Multimodal.Asset(2L, Multimodal.syntheticBandWav(2L), "audio/wav", 0L),
      Multimodal.Asset(5L, Multimodal.syntheticBandWav(5L), "audio/wav", 0L)) ++
      (50L to 55L).map(i => Multimodal.Asset(i,
        wavOf(Array.fill(65 + 13 * i.toInt)((i * 77).toShort)),
        "audio/wav", 0L))).toDS()
    val hashes = Multimodal.ahashAudio(assets).toDF()
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val const = hs.filter(h => h._1 >= 50L && h._1 <= 55L)
    assert(const.length == 6 && const.forall(_._2 == 0L),
      s"constant signals must hash to 0: ${const.toSeq}")
    // brute-force reference closure over Hamming<=3 edges
    val parent = scala.collection.mutable.Map(hs.map(h => h._1 -> h._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for {
      (a, ha) <- hs; (b, hb) <- hs
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } parent(find(a)) = find(b)
    val want = hs.map(_._1).groupBy(find).values
      .filter(_.length > 1)
      .map(g => (g.min, g.length.toLong, g.max))
      .toSeq.sortBy(_._1)
    val got = Multimodal.perceptualDupClusters(
        hashes, "asset_id", "ahash", maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(got == want, s"\n got=$got\nwant=$want")
    // the degenerate constant family is ONE cluster labeled by its min id
    assert(got.exists { case (c, n, m) => c == 50L && n == 6L && m == 55L },
      got.toString)
    CacheRegistry.drain()
  }

  /** The fixture's closed-form per-frame dHash (syntheticBandAvi doc). */
  private def refBandFrameHash(id: Long, f: Int): Long = {
    var hash = 0L
    for (r <- 0 until 8; i <- 0 until 8)
      if ((id * 31 + f * 53 + i * 97 + r * 57) % 200 < 103)
        hash |= 1L << (r * 8 + i)
    hash
  }

  /** The fixture's closed-form majority-fold video signature. */
  private def refBandVideoSig(id: Long): Long = {
    val n = 3 + (id % 4).toInt
    var sig = 0L
    for (b <- 0 until 64) {
      val set = (0 until n).count(f => (refBandFrameHash(id, f) >> b & 1L) == 1L)
      if (2 * set > n) sig |= 1L << b
    }
    sig
  }

  test("dhashVideoFrames + videoSignatures equal the fixture closed " +
      "form; brightness/scale re-muxes pair at Hamming 0; MJPEG path decodes") {
    val session = spark
    import session.implicits._
    val ids = (0L until 12L) // every (id%3, id%2, id%4) class
    val assets = ids.flatMap { id =>
      def a(aid: Long, p: Array[Byte]) =
        Multimodal.Asset(aid, p, "video/avi", p.length.toLong)
      Seq(
        a(id, Multimodal.syntheticBandAvi(id)),
        a(id + 100L, Multimodal.syntheticBandAvi(id, brightness = 40)),
        a(id + 200L, Multimodal.syntheticBandAvi(id, scaleStep = 1)))
    }.toDS()
    val frames = Multimodal.sampleAviFrames(assets, everyNth = 1)
    val fh = Multimodal.dhashVideoFrames(frames).collect()
      .map(h => (h.asset_id, h.frame_idx) -> h.dhash).toMap
    for (id <- ids; f <- 0 until (3 + (id % 4).toInt)) {
      val want = refBandFrameHash(id, f)
      assert(fh((id, f)) == want, s"id=$id frame=$f hash")
      assert(fh((id + 100L, f)) == want, s"id=$id f=$f brightness diverged")
      assert(fh((id + 200L, f)) == want, s"id=$id f=$f scale diverged")
    }
    val sigs = Multimodal.videoSignatures(
      Multimodal.dhashVideoFrames(frames).toDF())
    val sm = sigs.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (id <- ids) {
      val n = (3 + (id % 4)).toLong
      assert(sm(id) == ((n, refBandVideoSig(id))), s"id=$id signature")
      assert(sm(id + 100L)._2 == refBandVideoSig(id))
      assert(sm(id + 200L)._2 == refBandVideoSig(id))
    }
    // the fold must DISCRIMINATE: distinct videos → distinct signatures
    // (guards the balanced-bit property of the fixture — a biased band
    // step saturates every majority to all-ones, round-10 lesson)
    assert(ids.map(id => sm(id)._2).distinct.size > 6,
      s"majority fold degenerated: ${ids.map(id => sm(id)._2).distinct}")
    // every planted re-mux pairs with its base at distance 0
    val pairs = Multimodal.videoNearDupPairs(sigs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for (id <- ids) {
      assert(pairs.exists(p => p._1 == id && p._2 == id + 100L && p._3 == 0L),
        s"id=$id brightness re-mux not paired")
      assert(pairs.exists(p => p._1 == id && p._2 == id + 200L && p._3 == 0L),
        s"id=$id scale re-mux not paired")
    }
    // MJPEG branch: solid gray frames decode via ImageIO and hash to 0
    val mj = Seq(Multimodal.Asset(7L, Multimodal.syntheticMjpegAvi(7L),
      "video/avi", 0L)).toDS()
    val mjh = Multimodal.dhashVideoFrames(
      Multimodal.sampleAviFrames(mj, everyNth = 1)).collect()
    assert(mjh.nonEmpty && mjh.forall(_.dhash == 0L),
      s"solid MJPEG frames must hash 0: ${mjh.toSeq}")
    CacheRegistry.drain()
  }
}
