package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media assets are
  * opaque `binary` columns + typed metadata; decode / feature-extraction
  * runs per-partition so decoder state (a codec, a model) is initialized
  * once per task, not per row — the Scala analog of a Pandas-UDF batch.
  *
  * Decode tiers in this environment:
  *  - IMAGES are decoded for REAL via the JDK's built-in ImageIO codecs
  *    (PNG/JPEG/BMP/GIF ship with every JVM) — [[decodeImages]].
  *  - PCM AUDIO (WAV) is decoded for REAL via `javax.sound.sampled` —
  *    [[decodeWavs]].
  *  - compressed audio / video codecs do NOT exist on the JVM without
  *    external libraries, so that tier keeps the clearly-marked
  *    deterministic fake ([[fakeDecode]]); the Spark-side plumbing —
  *    schema, batch shape, partition sizing — is identical either way.
  */
object Multimodal {

  /** An ingested asset: payload + metadata the pipeline carries along. */
  case class Asset(asset_id: Long, payload: Array[Byte], format: String, n_bytes: Long)

  /** Fixed-size fake "feature vector" per asset. */
  case class AssetFeatures(asset_id: Long, n_bytes: Long, features: Array[Float])

  /** Attach binary payload + metadata columns to a text-keyed table (the
    * harness has no real media files; text bytes stand in for the blob).
    */
  def withPayloadMeta(df: DataFrame): DataFrame =
    df.withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("format", lit("text/plain"))

  /** STUB decode / feature-extract. Real implementation would open a codec
    * per partition and decode each payload; here the "features" are a
    * deterministic hash-derived vector so tests are stable. Marked clearly:
    * replace the body of `fakeDecode` with a real decoder when the codec
    * libraries are available.
    */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 8): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init would go here (codec / model handle)
      it.map { a =>
        AssetFeatures(a.asset_id, a.n_bytes, fakeDecode(a.payload, dim))
      }
    }
  }

  /** Real image decode output: dimensions, per-channel means over a
    * deterministic sample grid, and a grayscale thumbnail vector.
    */
  case class ImageFeatures(asset_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, thumb: Array[Float])

  /** Deterministic evenly-spaced sample positions: `min(size, cap)`
    * indices `i·(size-1)/(k-1)` (floor) — the shared grid of
    * [[decodeImages]] and [[dhashImages]], integer arithmetic only so an
    * oracle replicates it exactly.
    */
  private[operators] def sampleGrid(size: Int, cap: Int): Array[Int] = {
    val k = math.min(size, cap)
    Array.tabulate(k)(i =>
      if (k == 1) 0 else (i.toLong * (size - 1) / (k - 1)).toInt)
  }

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF — built
    * into every JVM, nothing external): per asset, dimensions, channel
    * means over an at-most-64×64 deterministic sample grid (bounded work
    * per image regardless of resolution), and an n×n grayscale thumbnail
    * — the classic embedding-ready shape. Runs in `mapPartitions` where
    * the payload bytes already live; undecodable payloads are dropped
    * (count the difference to monitor corrupt-asset rate).
    */
  def decodeImages(assets: Dataset[Asset], thumbSize: Int = 4): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    val n = thumbSize
    assets.mapPartitions { it =>
      // payloads are in-memory byte arrays: the default DISK-backed
      // ImageIO cache writes a temp file per decode, which at corpus
      // scale thrashes the local filesystem (measured degrading every
      // LATER query in the same JVM); the heap cache is strictly better
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload)))
          catch { case _: Exception => None }
        img.map { im =>
          val w = im.getWidth
          val h = im.getHeight
          val (xs, ys) = (sampleGrid(w, 64), sampleGrid(h, 64))
          var (sr, sg, sb) = (0L, 0L, 0L)
          for (y <- ys; x <- xs) {
            val rgb = im.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          }
          val cnt = (xs.length * ys.length).toDouble
          val (txs, tys) = (sampleGrid(w, n), sampleGrid(h, n))
          val thumb = for (y <- tys; x <- txs) yield {
            val rgb = im.getRGB(x, y)
            (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
              (rgb & 0xff) * 114L).toFloat / (1000f * 255f)
          }
          ImageFeatures(a.asset_id, w, h, sr / cnt, sg / cnt, sb / cnt, thumb)
        }
      }
    }
  }

  /** REAL image resize via JDK Graphics2D (no external codecs): decode,
    * draw onto a target-size canvas with bilinear interpolation,
    * re-encode as PNG. Per-partition like the other decode tiers; the
    * output is again an [[Asset]] so resize composes with
    * [[decodeImages]] / feature extraction downstream (the
    * thumbnail-pipeline shape every multimodal corpus runs). Undecodable
    * payloads are dropped.
    */
  def resizeImages(assets: Dataset[Asset], width: Int, height: Int): Dataset[Asset] = {
    require(width > 0 && height > 0, s"target ${width}x$height must be positive")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload)))
          catch { case _: Exception => None }
        img.map { im =>
          val out = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(im, 0, 0, width, height, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          val bytes = bos.toByteArray
          Asset(a.asset_id, bytes, "image/png", bytes.length.toLong)
        }
      }
    }
  }

  /** Real PCM-audio decode output. */
  case class AudioFeatures(asset_id: Long, sample_rate: Double, channels: Int,
      n_frames: Long, duration_ms: Double, rms: Double)

  /** REAL WAV (PCM) decode via `javax.sound.sampled` (JDK-built-in):
    * frame geometry, duration, and RMS amplitude over 16-bit samples —
    * the loudness/silence signal an audio-corpus filter needs.
    * Non-WAV / unsupported encodings are dropped.
    */
  def decodeWavs(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.BufferedInputStream(
              new java.io.ByteArrayInputStream(a.payload)))
          try {
            val fmt = in.getFormat
            if (fmt.getSampleSizeInBits != 16) None
            else {
              val bytes = in.readAllBytes()
              val bigEndian = fmt.isBigEndian
              var sumSq = 0.0
              var i = 0
              while (i + 1 < bytes.length) {
                val s =
                  if (bigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
                  else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
                sumSq += s.toDouble * s.toDouble
                i += 2
              }
              val nSamples = bytes.length / 2
              val frames = nSamples / math.max(1, fmt.getChannels)
              Some(AudioFeatures(a.asset_id, fmt.getSampleRate.toDouble,
                fmt.getChannels, frames,
                frames * 1000.0 / fmt.getSampleRate,
                if (nSamples == 0) 0.0
                else math.sqrt(sumSq / nSamples) / 32768.0))
            }
          } finally in.close()
        } catch { case _: Exception => None }
      }
    }
  }

  /** Deterministic synthetic PNG for oracle-checkable decode tests: a
    * solid-color image whose geometry and fill are closed-form in the id
    * (width = 8 + id%8, height = 8 + (3·id)%8, rgb = ((37·id)%256,
    * (59·id)%256, (83·id)%256)). PNG is lossless and the fill is solid,
    * so [[decodeImages]]' channel means equal the fill exactly — an
    * engine with no image codec (the DuckDB oracle) can still predict
    * every output column arithmetically while the Spark side exercises
    * the REAL ImageIO encode→decode round trip.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 8).toInt
    val h = 8 + ((id * 3) % 8).toInt
    val rgb = ((((id * 37) % 256) << 16) | (((id * 59) % 256) << 8) |
      ((id * 83) % 256)).toInt
    javax.imageio.ImageIO.setUseCache(false) // in-memory streams only
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { im.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic banded PNG for oracle-checkable
    * perceptual-hash tests: a 9-column × 8-row grid of solid gray bands
    * at band-aligned dimensions — `W = 9·(2 + id%3 + scaleStep)`,
    * `H = 8·(2 + id%2 + scaleStep)` — where band `(j, r)` fills
    * `gray = (id·31 + j·17 + r·57) % 200 + brightness` on all three
    * channels. Band alignment makes [[dhashImages]]' sampled column `i`
    * of sampled row `r` land in band `(i, r)` at EVERY fixture size
    * (spec-verified for all multiplier classes), so the hash is
    * closed-form in the id alone — the step between neighboring bands
    * is +17 mod 200, so the comparison rises exactly when it does not
    * wrap: `bit(r,i) = (id·31 + i·17 + r·57) % 200 < 183` — independent
    * of `brightness` (≤ 55 keeps every gray under 255, unclamped, and
    * monotone maps preserve comparisons) and of `scaleStep` (a larger
    * multiplier resamples the same band profile). That independence IS
    * the perceptual invariance the tier exists for, and it is what lets
    * the DuckDB oracle predict the hash of a brightness- or
    * scale-perturbed variant arithmetically. `transform` (0–7) emits
    * the dihedral image of the same band field — a genuinely rotated /
    * mirrored / transposed copy that DEFEATS the plain [[dhashImages]]
    * fingerprint and is the planted fixture for the canonical tier
    * ([[canonicalDhashImages]]).
    */
  def syntheticBandPng(
      id: Long, brightness: Int = 0, scaleStep: Int = 0,
      transform: Int = 0): Array[Byte] = {
    require(brightness >= 0 && brightness <= 55,
      s"brightness=$brightness must be in [0, 55] to stay unclamped")
    require(scaleStep >= 0, s"scaleStep=$scaleStep must be non-negative")
    require(transform >= 0 && transform <= 7,
      s"transform=$transform must be a dihedral index in [0, 7]")
    val m = 2 + (id % 3).toInt + scaleStep
    val n = 2 + (id % 2).toInt + scaleStep
    val w = 9 * m
    val h = 8 * n
    // `transform` paints the dihedral image of the base band field —
    // pixel (x, y) of the emitted image reads the base field at the
    // canonicalDhashFromLum coordinate map (quarter-turn transforms
    // swap the emitted dimensions) — the planted-rotation fixture for
    // the canonical-hash tier (q114).
    val swap = (transform & 1) == 1
    val wT = if (swap) h else w
    val hT = if (swap) w else h
    javax.imageio.ImageIO.setUseCache(false)
    val im = new java.awt.image.BufferedImage(
      wT, hT, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < hT) {
      var x = 0
      while (x < wT) {
        val (px, py) = transform match {
          case 0 => (x, y)
          case 1 => (y, h - 1 - x)
          case 2 => (w - 1 - x, h - 1 - y)
          case 3 => (w - 1 - y, x)
          case 4 => (w - 1 - x, y)
          case 5 => (y, x)
          case 6 => (x, h - 1 - y)
          case _ => (w - 1 - y, h - 1 - x)
        }
        val j = px / m
        val r = py / n
        val g = (((id * 31 + j * 17 + r * 57) % 200) + brightness).toInt
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic WAV (16-bit mono PCM @ 8 kHz) for
    * oracle-checkable decode tests: frames = 800 + id%100 of an
    * alternating ±amp square wave with amp = 1000 + id%2000, so
    * [[decodeWavs]]' RMS is exactly amp/32768 (a power-of-two divisor —
    * bit-exact in IEEE double) and every other column is closed-form in
    * the id.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val frames = 800 + (id % 100).toInt
    val amp = (1000 + (id % 2000)).toInt
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = if (i % 2 == 0) amp else -amp
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Exact image dedup by DECODED content — the reason multimodal
    * pipelines decode before hashing: the same pixels under different
    * encodings (PNG vs BMP, different compressors, re-saves) are one
    * image, which a payload-byte hash can never see. The fingerprint
    * covers dimensions, channel means, and the grayscale thumbnail from
    * [[decodeImages]] (a canonical content sketch, bounded per image);
    * groups collapse to the smallest asset id. One shuffle on the
    * fingerprint — identical shape to text exact-dedup, after the
    * scan-speed decode.
    */
  def imageDedup(features: Dataset[ImageFeatures]): DataFrame = {
    val f = features.toDF()
    val fp = md5(concat_ws("|",
      col("width"), col("height"),
      col("mean_r"), col("mean_g"), col("mean_b"),
      array_join(transform(col("thumb"), x => x.cast("string")), ",")))
    f.withColumn("__fp", fp)
      .groupBy("__fp")
      .agg(min(col("asset_id")).as("keep_id"), count(lit(1)).as("n_copies"),
        min(col("width")).as("width"), min(col("height")).as("height"))
      .drop("__fp")
  }

  /** A perceptual image fingerprint: 64-bit difference hash. */
  case class ImageDHash(asset_id: Long, dhash: Long)

  /** Perceptual 64-bit difference hash (dHash — the standard
    * near-duplicate image fingerprint, cf. the pHash family): decode,
    * sample luminance on the deterministic 9-column × 8-row
    * [[sampleGrid]] points, set bit `r·8+i` iff luminance rises from
    * sampled column `i` to column `i+1` in row `r`. Because only the
    * SIGN of neighboring-luminance differences is kept, the hash
    * survives exactly the perturbations that defeat
    * [[imageDedup]]'s exact content fingerprint: global brightness /
    * contrast shifts (any monotone luminance map preserves every
    * comparison), rescaling (the grid resamples the same relative
    * positions), and re-encoding. Luminance is the integer BT.601
    * weighting `299·R + 587·G + 114·B` (no division — comparisons only
    * need ordering, and the integer form is oracle-replicable). Images
    * narrower than 9 px or shorter than 8 px have no gradient to hash
    * and are dropped, the [[decodeImages]] corrupt-asset convention.
    *
    * What it does NOT survive (standard dHash limitation): rotation,
    * mirroring, and cropping all move content across the sample grid
    * and scramble the comparisons — a rotated or cropped copy hashes
    * as a different image. Rotation/mirroring are closed by
    * [[canonicalDhashImages]]; uniform-border re-framing (letterbox/
    * matte) by [[contentBoxDhashImages]]; true content cropping by
    * [[tiledDhashImages]] (grid-aligned crops, the k-of-n tile rule).
    *
    * Scale shape: map-side only (decode + 72 `getRGB` probes per
    * image, bounded regardless of resolution); pair finding is the
    * separate [[imageNearDupPairs]].
    */
  def dhashImages(assets: Dataset[Asset]): Dataset[ImageDHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload)))
          catch { case _: Exception => None }
        img.flatMap { im =>
          dhashFromLum(im.getWidth, im.getHeight, (x, y) => {
            val rgb = im.getRGB(x, y)
            299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
          }).map(ImageDHash(a.asset_id, _))
        }
      }
    }
  }

  /** The dHash core shared by [[dhashImages]] and [[dhashVideoFrames]]:
    * 9×8 [[sampleGrid]] luminance probes, bit `r·8+i` set iff luminance
    * rises from sampled column `i` to `i+1` in row `r`; `None` below
    * 9×8 px (no gradient to hash). `lum` reads TOP-DOWN (x, y)
    * coordinates, the [[decodeImages]] convention.
    */
  private def dhashFromLum(
      w: Int, h: Int, lum: (Int, Int) => Long): Option[Long] = {
    if (w < 9 || h < 8) None
    else {
      val xs = sampleGrid(w, 9)
      val ys = sampleGrid(h, 8)
      var hash = 0L
      var r = 0
      while (r < 8) {
        var i = 0
        while (i < 8) {
          if (lum(xs(i + 1), ys(r)) > lum(xs(i), ys(r)))
            hash |= 1L << (r * 8 + i)
          i += 1
        }
        r += 1
      }
      Some(hash)
    }
  }

  /** Perceptual near-duplicate image pairs from [[dhashImages]]
    * fingerprints: Hamming distance ≤ `maxHamming` over the 64-bit
    * hashes, found by [[Dedup.simhashPairsFromSigs]]'s pigeonhole
    * blocking (4 disjoint 16-bit chunks — distance ≤ 3 guarantees an
    * identical chunk, perfect recall, no all-pairs join). Returns
    * `(id_a, id_b, hamming)`.
    */
  def imageNearDupPairs(
      hashes: DataFrame, idCol: String = "asset_id",
      maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairsFromSigs(hashes, idCol, "dhash", maxHamming,
      chunkBits = 16, nChunks = 4)

  /** LETTERBOX/PILLARBOX-robust difference hash — the image member of
    * the border-anchor family ([[ahashAudioSpan]] trims silence,
    * [[videoContentSignatures]] drops title cards): strip the maximal
    * UNIFORM border before hashing, so a copy re-framed inside black
    * bars, a solid matte, or any uniform padding — the commonest
    * "crop-ish" re-encode in the wild — hashes identically to the
    * original, where [[dhashImages]]' fixed grid samples the bars and
    * scrambles. The content box is an exact rule (oracle-replicable,
    * no tolerance): strip top/bottom rows that are each a single
    * color, then left/right columns uniform within the remaining rows;
    * the interior then feeds the ordinary 9×8 [[dhashImages]] grid, so
    * brightness/rescale/re-encode invariance carries over. Honest
    * limits: true CONTENT cropping is the separate
    * [[tiledDhashImages]] tier; an exactly-uniform content edge row (synthetic
    * solids, flat skies rendered without noise) is stripped too — the
    * price of the exact rule, same trade as the video tier's 0-hash
    * exclusion. Fully-uniform images and interiors under 9×8 px drop,
    * the [[decodeImages]] corrupt-asset convention.
    *
    * Scale shape: map-side only — the border scan touches each border
    * row/column once (O(w + h) pixel reads beyond the bars on
    * non-degenerate images) plus the 72 grid probes.
    */
  def contentBoxDhashImages(assets: Dataset[Asset]): Dataset[ImageDHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload)))
          catch { case _: Exception => None }
        img.flatMap { im =>
          val w = im.getWidth
          val h = im.getHeight
          def rowUniform(y: Int): Boolean = {
            val c0 = im.getRGB(0, y)
            var x = 1
            while (x < w && im.getRGB(x, y) == c0) x += 1
            x == w
          }
          def colUniform(x: Int, y0: Int, y1: Int): Boolean = {
            val c0 = im.getRGB(x, y0)
            var y = y0 + 1
            while (y < y1 && im.getRGB(x, y) == c0) y += 1
            y == y1
          }
          var top = 0
          while (top < h && rowUniform(top)) top += 1
          if (top == h) None // fully uniform: no content to hash
          else {
            var bot = h
            while (bot > top && rowUniform(bot - 1)) bot -= 1
            var left = 0
            while (left < w && colUniform(left, top, bot)) left += 1
            var right = w
            while (right > left && colUniform(right - 1, top, bot))
              right -= 1
            dhashFromLum(right - left, bot - top, (x, y) => {
              val rgb = im.getRGB(left + x, top + y)
              299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)
            }).map(ImageDHash(a.asset_id, _))
          }
        }
      }
    }
  }

  /** Re-frame any decodable image inside a uniform gray border of
    * `border` px on all four sides (PNG out) — the letterbox fixture
    * generator for [[contentBoxDhashImages]] tests and oracles: the
    * interior pixels are copied verbatim, so the content box recovers
    * them exactly.
    */
  def padImage(payload: Array[Byte], border: Int, gray: Int): Array[Byte] = {
    require(border >= 1, s"border=$border must be positive")
    require(gray >= 0 && gray <= 255, s"gray=$gray out of range")
    javax.imageio.ImageIO.setUseCache(false)
    // ImageIO.read returns null (not an exception) on an undecodable
    // payload; fail loudly here — unlike the scan paths, this is a
    // fixture GENERATOR, so a corrupt input is a caller bug, not data
    val im = Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
      .getOrElse(throw new IllegalArgumentException(
        s"padImage: undecodable image payload (${payload.length} bytes)"))
    val w = im.getWidth + 2 * border
    val h = im.getHeight + 2 * border
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = out.createGraphics()
    try {
      g2.setColor(new java.awt.Color(gray, gray, gray))
      g2.fillRect(0, 0, w, h)
      g2.drawImage(im, border, border, null)
    } finally g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Crop any decodable image to the window that remains after removing
    * `left`/`top`/`right`/`bottom` pixels (PNG out) — the crop fixture
    * generator for [[tiledDhashImages]] tests and oracles (the inverse
    * of [[padImage]]): surviving pixels are copied verbatim, so every
    * fully-contained tile of the original whose origin the crop shifts
    * by a whole tile count re-hashes identically.
    */
  def cropImage(payload: Array[Byte], left: Int, top: Int,
      right: Int = 0, bottom: Int = 0): Array[Byte] = {
    require(left >= 0 && top >= 0 && right >= 0 && bottom >= 0,
      s"crop offsets must be non-negative: $left/$top/$right/$bottom")
    javax.imageio.ImageIO.setUseCache(false)
    val im = Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
      .getOrElse(throw new IllegalArgumentException(
        s"cropImage: undecodable image payload (${payload.length} bytes)"))
    val w = im.getWidth - left - right
    val h = im.getHeight - top - bottom
    require(w >= 1 && h >= 1,
      s"crop $left/$top/$right/$bottom leaves no pixels of " +
        s"${im.getWidth}x${im.getHeight}")
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.setRGB(x, y, im.getRGB(left + x, top + y) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Nearest-neighbor scale of a decoded image to `dstW`×`dstH`:
    * destination pixel `(x, y)` samples source
    * `(⌊x·srcW/dstW⌋, ⌊y·srcH/dstH⌋)` — exact integer floors, no
    * blending. The FLOOR rule is load-bearing for
    * [[scaleNormalizeImages]]' composition guarantee
    * (`⌊⌊2a⌋/2⌋ = ⌊a⌋`), which interpolating resamplers break.
    */
  private def nearestScale(im: java.awt.image.BufferedImage,
      dstW: Int, dstH: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val srcW = im.getWidth
    val srcH = im.getHeight
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * srcH / dstH).toInt
      var x = 0
      while (x < dstW) {
        out.setRGB(x, y,
          im.getRGB((x.toLong * srcW / dstW).toInt, sy) & 0xffffff)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Scale canonicalization for the tiled crop tier — the upstream
    * pre-step [[tiledDhashImages]]' scaladoc sketches: re-sample every
    * image so its LONG edge is exactly `longEdge` pixels (aspect
    * preserved by integer floor, minimum 1), nearest-neighbor. After
    * this, a rescaled copy and its source normalize to IDENTICAL
    * pixels whenever the scale factors compose through the floor rule
    * — exactly true for k× nearest up/down-scales
    * (`⌊⌊k·a⌋/k⌋ = ⌊a⌋`), approximately true for real-world
    * interpolated rescales (the dHash sign rule absorbs small
    * resampling error). Composition contract with the tiled tier:
    * `tiledDhashImages(scaleNormalizeImages(assets))` pairs a
    * RESCALED tile-aligned crop with its original PROVIDED the crop
    * kept the long edge (a short-edge trim: letterbox removal, bottom
    * banner cuts) — the long edge pins the normalization factor, so
    * the surviving rows re-sample bit-identically and whole tiles
    * re-hash equal (MultimodalSpec pins the 2×-rescaled case
    * end-to-end). A crop that shortens the LONG edge changes the
    * factor and stays out of scope, as does rotation
    * ([[canonicalDhashImages]] owns that axis). Undecodable payloads
    * drop, the [[decodeImages]] corrupt-asset convention; re-encoding
    * is lossless PNG so no generation loss enters the pipeline.
    *
    * Scale shape: map-side only — one decode + one `longEdge`-bounded
    * resample + one PNG encode per asset; downstream tiling cost
    * becomes resolution-INDEPENDENT (every normalized image carries
    * ≤ `⌈longEdge/tile⌉²` tiles).
    */
  def scaleNormalizeImages(
      assets: Dataset[Asset], longEdge: Int = 256): Dataset[Asset] = {
    require(longEdge >= 9,
      s"longEdge=$longEdge must be at least 9 (the dHash grid)")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload)))
          catch { case _: Exception => None }
        img.filter(im => im.getWidth > 0 && im.getHeight > 0).map { im =>
          val (dw, dh) =
            if (im.getWidth >= im.getHeight)
              (longEdge,
                math.max(1, (im.getHeight.toLong * longEdge /
                  im.getWidth).toInt))
            else
              (math.max(1, (im.getWidth.toLong * longEdge /
                im.getHeight).toInt), longEdge)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(nearestScale(im, dw, dh), "png", bos)
          val png = bos.toByteArray
          Asset(a.asset_id, png, "image/png", png.length.toLong)
        }
      }
    }
  }

  /** One sub-region difference hash of a tiled image. */
  case class ImageTileHash(asset_id: Long, tile_x: Int, tile_y: Int,
      dhash: Long)

  /** CROPPING-robust perceptual fingerprints — the answer to
    * [[dhashImages]]' (and [[contentBoxDhashImages]]') documented
    * content-crop blindness, without keypoints: hash every complete
    * `tile`×`tile` pixel block of the image (absolute top-left-anchored
    * grid) with the ordinary 9×8 [[dhashImages]] rule, one 64-bit hash
    * per tile. A crop whose offsets are multiples of `tile` shifts the
    * grid by WHOLE tiles, so every fully-contained tile of the original
    * that survives the crop re-hashes bit-identically — pigeonhole:
    * the copy and the original share those tiles' hash VALUES no matter
    * where the tiles landed, which is exactly what
    * [[tiledImageNearDupPairs]] joins on. Per-tile brightness/contrast
    * invariance carries over from the dHash sign rule, so
    * crop+brightness compositions are still recalled. Honest limits:
    * a crop NOT aligned to the tile grid shifts content within tiles
    * and scrambles their hashes (the alignment granularity is the
    * knob: smaller `tile` = finer crop tolerance, more hashes/rows);
    * rescaled crops change the pixels under every tile (compose with
    * [[canonicalDhashImages]]-style canonicalization upstream if
    * needed). Tiles must be at least 9×9 px (the dHash grid minimum);
    * images smaller than one tile emit nothing, the [[decodeImages]]
    * corrupt-asset convention.
    *
    * Scale shape: map-side only — `⌊w/tile⌋·⌊h/tile⌋` tiles × 72
    * luminance probes each, bounded by resolution/`tile`²; pair
    * finding is the separate value-join in [[tiledImageNearDupPairs]].
    */
  def tiledDhashImages(
      assets: Dataset[Asset], tile: Int = 32): Dataset[ImageTileHash] = {
    require(tile >= 9, s"tile=$tile must be at least 9 (the dHash grid)")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload)))
          catch { case _: Exception => None }
        img.toSeq.flatMap { im =>
          for {
            ty <- 0 until im.getHeight / tile
            tx <- 0 until im.getWidth / tile
            h <- dhashFromLum(tile, tile, (x, y) => {
              val rgb = im.getRGB(tx * tile + x, ty * tile + y)
              299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)
            })
          } yield ImageTileHash(a.asset_id, tx, ty, h)
        }
      }
    }
  }

  /** Crop-robust near-duplicate image pairs from [[tiledDhashImages]]
    * fingerprints: two images pair iff they share at least `minShared`
    * distinct non-degenerate tile-hash VALUES (positions deliberately
    * ignored — that is what makes grid-aligned crops free). Degenerate
    * all-flat tiles (hash 0 — solid mattes, letterbox bars, blank
    * margins) are excluded BEFORE the join: every document scan with a
    * white margin would otherwise pair with every other through the
    * blank tile, the same n²-through-degenerate-keys guard as the
    * video tier's 0-hash exclusion. `maxHashFreq` optionally drops
    * tile hashes carried by more than that many assets (stop-tiles —
    * shared headers/watermarks at corpus scale); the recall contract
    * then reads "≥ `minShared` shared non-ubiquitous tiles".
    *
    * Scale shape: distinct → value-equi-join on the 64-bit hash →
    * count-filtered pair aggregation; no all-pairs product, join
    * fan-out bounded by per-hash asset frequency (capped when
    * `maxHashFreq` is set). Returns `(id_a, id_b, shared_tiles)`.
    */
  def tiledImageNearDupPairs(
      tiles: DataFrame, idCol: String = "asset_id",
      minShared: Int = 3, maxHashFreq: Int = Int.MaxValue): DataFrame =
    sharedValuePairs(tiles.filter(col("dhash") =!= 0L), idCol, "dhash",
      "shared_tiles", minShared, maxHashFreq)

  /** A rotation/mirror-invariant perceptual image fingerprint. */
  case class ImageCanonicalHash(asset_id: Long, chash: Long)

  /** Dihedral-canonical difference hash — the answer to [[dhashImages]]'
    * documented rotation/mirror blindness: compute the 64-bit dHash of
    * all EIGHT dihedral transforms of the image (identity, the three
    * right-angle rotations, the horizontal and vertical flips, and the
    * two transposes — the symmetry group of the rectangle) and keep the
    * signed-Long MINIMUM as the canonical hash. Because the eight maps
    * form a group, transforming an image permutes its eight transform
    * hashes rather than changing them, so the minimum is EXACTLY
    * invariant: a rotated, mirrored, or transposed copy gets the
    * identical canonical hash, on top of dHash's existing brightness/
    * scale/re-encode invariance (each member hash keeps only luminance-
    * comparison signs). Cropping remains out of scope (it needs
    * keypoints, not a global grid).
    *
    * No pixels are moved: each transform hash is computed by remapping
    * the 9×8 sample-grid probe coordinates through the transform
    * (rotations by a quarter turn swap the sampled width/height), so
    * the cost is 8 × 72 bounded luminance probes per image, map-side
    * only. Non-square images too small in one orientation (e.g. 10×8 —
    * rotated it is 8 px wide, under the 9-column grid) take the
    * minimum over the orientations that CAN hash; an image under 9×8
    * AND 8×9 has no gradient to hash in any orientation and is dropped,
    * the [[decodeImages]] corrupt-asset convention. The signed-Long min
    * (not unsigned) is the documented tie-break so the DuckDB oracle's
    * BIGINT `min()` replicates it bit-exactly.
    */
  def canonicalDhashImages(
      assets: Dataset[Asset]): Dataset[ImageCanonicalHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload)))
          catch { case _: Exception => None }
        img.flatMap { im =>
          val w = im.getWidth
          val h = im.getHeight
          val lum: (Int, Int) => Long = (x, y) => {
            val rgb = im.getRGB(x, y)
            299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
          }
          canonicalDhashFromLum(w, h, lum).map(ImageCanonicalHash(a.asset_id, _))
        }
      }
    }
  }

  /** The dihedral-min core of [[canonicalDhashImages]]: min over the
    * eight transform hashes, each one [[dhashFromLum]] with probe
    * coordinates remapped through the transform. Transform t's probe
    * (x, y) reads the original image at: t0 identity (x, y); t1 rot90°
    * (y, h−1−x); t2 rot180° (w−1−x, h−1−y); t3 rot270° (w−1−y, x);
    * t4 flip-x (w−1−x, y); t5 transpose (y, x); t6 flip-y (x, h−1−y);
    * t7 anti-transpose (w−1−y, h−1−x). Quarter-turn transforms
    * (t1/t3/t5/t7) hash with width/height swapped.
    */
  private[operators] def canonicalDhashFromLum(
      w: Int, h: Int, lum: (Int, Int) => Long): Option[Long] = {
    var best = Long.MaxValue
    var found = false
    var t = 0
    while (t < 8) {
      val swap = (t & 1) == 1
      val wt = if (swap) h else w
      val ht = if (swap) w else h
      val mapped: (Int, Int) => Long = t match {
        case 0 => lum
        case 1 => (x, y) => lum(y, h - 1 - x)
        case 2 => (x, y) => lum(w - 1 - x, h - 1 - y)
        case 3 => (x, y) => lum(w - 1 - y, x)
        case 4 => (x, y) => lum(w - 1 - x, y)
        case 5 => (x, y) => lum(y, x)
        case 6 => (x, y) => lum(x, h - 1 - y)
        case _ => (x, y) => lum(w - 1 - y, h - 1 - x)
      }
      dhashFromLum(wt, ht, mapped).foreach { hsh =>
        if (!found || hsh < best) { best = hsh; found = true }
      }
      t += 1
    }
    if (found) Some(best) else None
  }

  /** Perceptual duplicate-CLUSTER resolution over ANY 64-bit
    * fingerprint column — the corpus-scale formulation shared by the
    * image ([[dhashImages]]), audio ([[ahashAudio]]) and video
    * ([[videoSignatures]]) tiers, mirroring [[Dedup.nearDupClusters]]'
    * exact-collapse-first design. Assets with IDENTICAL hashes collapse
    * to min-id representatives first (one shuffle on the hash); the
    * pigeonhole Hamming join then runs over DISTINCT hash values only.
    * That ordering is the scale property: a web corpus carries millions
    * of assets sharing a handful of degenerate hashes (solid fills,
    * letterboxes, silence — a solid image or a constant signal hashes
    * to exactly 0), and pairing raw ids would drop them all into the
    * same chunk buckets — a per-bucket n² blowup. With representatives,
    * a chunk bucket is bounded by the number of DISTINCT hashes sharing
    * that chunk, independent of how many assets share each hash.
    * Transitive closure over representative pairs ([[Components]])
    * labels the clusters; identical-hash members ride their
    * representative's label, and exact groups with no near neighbor are
    * their own cluster. Returns `(cluster_id, n_images, max_id)` —
    * cluster_id is the cluster's minimum asset id (each representative
    * is its group's minimum).
    */
  def perceptualDupClusters(
      hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 3): DataFrame = {
    // persisted (r19): `hashes` feeds the exact-group rollup AND the
    // member join-back as separate plan subtrees, so an un-persisted
    // input re-runs the upstream decode+hash pipeline per consumer
    // (2-3 passes for the image/audio callers). Two longs per asset.
    val hc = CacheRegistry.track(
      hashes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val groups = hc.groupBy(col(hashCol))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("grp_n"))
    val members = hc.select(col(idCol), col(hashCol))
      .join(groups, hashCol)
    val reps = groups.select(col("rep_id").as(idCol), col(hashCol))
    val pairs = Dedup.simhashPairsFromSigs(reps, idCol, hashCol,
      maxHamming, chunkBits = 16, nChunks = 4)
    val comp = Components.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "rep_id")
    members.join(comp, Seq("rep_id"), "left")
      .select(col(idCol),
        // rep in a component → its label; otherwise a size-≥2
        // identical-hash group is its own cluster labeled by the rep;
        // singletons with no neighbor are not duplicates of anything
        coalesce(col("component"),
          when(col("grp_n") > 1, col("rep_id"))).as("cluster_id"))
      .filter(col("cluster_id").isNotNull)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_images"), max(col(idCol)).as("max_id"))
  }

  /** [[perceptualDupClusters]] over [[dhashImages]] fingerprints. */
  def imageDupClusters(
      hashes: DataFrame, idCol: String = "asset_id",
      maxHamming: Int = 3): DataFrame =
    perceptualDupClusters(hashes, idCol, "dhash", maxHamming)

  /** Audio twin of [[imageDedup]]: exact dedup by decoded signal
    * characteristics (rate, channels, frame count, RMS) instead of
    * payload bytes — re-containered or re-headered audio with the same
    * PCM content is one recording. Same one-shuffle fingerprint shape.
    */
  def audioDedup(features: Dataset[AudioFeatures]): DataFrame = {
    val f = features.toDF()
    val fp = md5(concat_ws("|", col("sample_rate"), col("channels"),
      col("n_frames"), col("rms")))
    f.withColumn("__fp", fp)
      .groupBy("__fp")
      .agg(min(col("asset_id")).as("keep_id"), count(lit(1)).as("n_copies"),
        min(col("n_frames")).as("n_frames"))
      .drop("__fp")
  }

  /** A perceptual audio fingerprint: 64-bit energy-delta sign hash. */
  case class AudioAHash(asset_id: Long, ahash: Long)

  /** Perceptual 64-bit audio hash — the audio twin of [[dhashImages]],
    * closing the gap [[audioDedup]] leaves open (its exact
    * rate/frames/RMS fingerprint is defeated by any resample, re-gain,
    * or lossy re-encode of the same recording): extract 16-bit PCM (a
    * direct RIFF/WAVE chunk walk for plain WAV — see [[pcm16Of]] for
    * the AudioSystem-lock rationale — `javax.sound.sampled` for other
    * containers), partition the sample stream into 65 equal
    * windows (floor boundaries `w·n/65` — the audio [[sampleGrid]]),
    * compute per-window energy (sum of squared samples, integer Long
    * arithmetic), and set bit `w` iff mean energy RISES from window `w`
    * to window `w+1`. Keeping only the SIGN of successive-window energy
    * deltas (the chromaprint idea reduced to sign bits) is what buys
    * the invariances:
    *
    *  - '''gain''': scaling every sample by a constant scales every
    *    window energy by its square — comparisons unchanged;
    *  - '''resample''': the 65 windows cover the same RELATIVE signal
    *    regions at any sample count, so a k× resample of the same
    *    energy profile replays the same comparisons;
    *  - '''re-encode / re-container''': the hash reads decoded PCM,
    *    not payload bytes.
    *
    * It does NOT survive trimming or time-shifts (content moves across
    * the window grid — the audio analog of dHash's crop blindness);
    * [[ahashAudioSpan]] closes the commonest case (leading/trailing
    * silence or quiet-edge edits) by anchoring the same grid to the
    * signal's half-max loud span.
    * When neighboring windows have EQUAL sample counts (always true
    * when `n % 65 == 0`, the synthetic-fixture shape) the comparison is
    * pure Long integer ordering, which is what makes the hash
    * oracle-replicable closed-form; unequal counts (real audio)
    * compare double means. Multi-channel audio hashes the interleaved
    * sample stream (channel-constant perturbations cancel the same
    * way). Streams shorter than 65 samples, or not 16-bit PCM, are
    * dropped — the [[decodeWavs]] corrupt-asset convention.
    *
    * Scale shape: map-side only (one pass over the PCM per asset);
    * pair finding is the separate [[audioNearDupPairs]] /
    * [[perceptualDupClusters]].
    */
  def ahashAudio(assets: Dataset[Asset]): Dataset[AudioAHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        pcm16Of(a.payload).flatMap { case (bytes, bigEndian) =>
          ahashFromPcm(bytes, bigEndian)
        }.map(AudioAHash(a.asset_id, _))
      }
    }
  }

  /** The [[ahashAudio]] core over already-extracted 16-bit PCM. */
  private def ahashFromPcm(
      bytes: Array[Byte], bigEndian: Boolean): Option[Long] = {
    val n = bytes.length / 2
    if (n < 65) None
    else {
      // per-window energy over the 65-window floor grid
      val sumSq = new Array[Long](65)
      val cnt = new Array[Long](65)
      var i = 0
      while (i < n) {
        val o = 2 * i
        val s =
          if (bigEndian)
            ((bytes(o) << 8) | (bytes(o + 1) & 0xff)).toShort
          else ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
        val w = (i.toLong * 65 / n).toInt
        sumSq(w) += s.toLong * s
        cnt(w) += 1
        i += 1
      }
      var hash = 0L
      var w = 0
      while (w < 64) {
        val rises =
          if (cnt(w) == cnt(w + 1)) sumSq(w + 1) > sumSq(w)
          else sumSq(w + 1).toDouble / cnt(w + 1) >
            sumSq(w).toDouble / cnt(w)
        if (rises) hash |= 1L << w
        w += 1
      }
      Some(hash)
    }
  }

  /** 16-bit PCM sample bytes of an audio payload, with endianness:
    * RIFF/WAVE PCM16 is read DIRECTLY (one chunk walk over the byte
    * array — WAV data is little-endian by spec), because
    * `AudioSystem.getAudioInputStream`'s provider lookup synchronizes
    * process-wide and measurably serializes 32-thread corpus scans
    * (ScaleStress round 11: the hash tier read ~3× over linear at 10×
    * purely from that lock); a RIFF/WAVE container that is NOT plain
    * PCM16 drops (exactly what the AudioSystem path did — it reports
    * the stored format and non-16-bit was dropped); anything that is
    * not RIFF/WAVE falls back to the AudioSystem path, so AIFF/AU and
    * friends keep decoding as before.
    */
  private def pcm16Of(
      payload: Array[Byte]): Option[(Array[Byte], Boolean)] = {
    def le16(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def tag(o: Int): String =
      if (o + 4 <= payload.length)
        new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      else ""
    if (payload.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE") {
      var off = 12
      var pcm16 = false
      var sawFmt = false
      var data: Array[Byte] = null
      while (off + 8 <= payload.length && (data == null || !sawFmt)) {
        val id = tag(off)
        val size = le32(off + 4)
        // clamp: streaming writers emit 0xFFFFFFFF / oversized sizes
        val avail = math.min(size, (payload.length - off - 8).toLong).toInt
        if (id == "fmt " && avail >= 16) {
          sawFmt = true
          // 1 = PCM; 0xFFFE = WAVE_FORMAT_EXTENSIBLE, whose 16-bit
          // payload is PCM16 too (16-bit float does not exist)
          val code = le16(off + 8)
          pcm16 = (code == 1 || code == 0xFFFE) && le16(off + 8 + 14) == 16
        } else if (id == "data") {
          data = java.util.Arrays.copyOfRange(payload, off + 8,
            off + 8 + math.max(0, avail))
        }
        off += 8 + avail + (avail & 1) // RIFF chunks are word-aligned
      }
      if (sawFmt && pcm16 && data != null) Some((data, false)) else None
    } else {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.BufferedInputStream(
            new java.io.ByteArrayInputStream(payload)))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16) None
          else Some((in.readAllBytes(), fmt.isBigEndian))
        } finally in.close()
      } catch { case _: Exception => None }
    }
  }

  /** Perceptual near-duplicate audio pairs from [[ahashAudio]]
    * fingerprints — the same pigeonhole Hamming blocking as
    * [[imageNearDupPairs]] (4 disjoint 16-bit chunks, perfect recall
    * at distance ≤ 3, no all-pairs join). Returns
    * `(id_a, id_b, hamming)`.
    */
  def audioNearDupPairs(
      hashes: DataFrame, idCol: String = "asset_id",
      maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairsFromSigs(hashes, idCol, "ahash", maxHamming,
      chunkBits = 16, nChunks = 4)

  /** Deterministic synthetic banded WAV for oracle-checkable
    * perceptual-audio tests — the audio twin of [[syntheticBandPng]]:
    * 65 constant-amplitude bands of `L = (2 + id%3) · (1 + rateStep)`
    * samples each (16-bit mono PCM; band `w` is an alternating ±amp
    * square wave with `amp = ((id·31 + w·17) % 200 + 1) · 2^gainShift`).
    * Total length `65·L` makes every [[ahashAudio]] window land exactly
    * on one band, so the hash is closed-form in the id alone —
    * `bit(w) = (id·31 + w·17) % 200 < 183` (the +17 band step wraps
    * exactly when the energy comparison falls) — independent of
    * `gainShift` (energies scale by `4^gainShift`, comparisons
    * preserved; ≤ 5 keeps every sample inside 16 bits) and of
    * `rateStep` (a (1+rateStep)× resample of the same band profile,
    * with the sample rate raised to match so duration is constant).
    * That independence IS the perceptual invariance the tier exists
    * for, and it is what lets the DuckDB oracle predict the hash of a
    * re-gained or resampled variant arithmetically.
    */
  def syntheticBandWav(
      id: Long, gainShift: Int = 0, rateStep: Int = 0): Array[Byte] = {
    require(gainShift >= 0 && gainShift <= 5,
      s"gainShift=$gainShift must be in [0, 5] to stay inside 16 bits")
    require(rateStep >= 0, s"rateStep=$rateStep must be non-negative")
    val L = (2 + (id % 3).toInt) * (1 + rateStep)
    val frames = 65 * L
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val w = i / L
      val amp = (((id * 31 + w * 17) % 200 + 1) << gainShift).toInt
      val s = if (i % 2 == 0) amp else -amp
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f * (1 + rateStep), 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** TRIM-ROBUST perceptual audio hash — [[ahashAudio]] with the
    * window grid anchored to the signal's LOUD SPAN instead of the
    * container boundaries, closing the documented trim/shift blindness
    * for the commonest real-world case (a re-upload with leading or
    * trailing silence / quiet intro removed or added): the 65-window
    * energy-delta grid runs over `[firstLoud, lastLoud]`, where a
    * sample is loud when `|s| ≥ ceil(maxAmp/2)` (half the stream's
    * peak — a RELATIVE threshold, so re-gains move it in lockstep and
    * the span is gain-invariant; integer arithmetic throughout).
    * Everything outside the span — however long — never touches the
    * hash, so `hash(silence ++ x) == hash(x)` EXACTLY.
    *
    * Inherited invariances (same argument as [[ahashAudio]]): gain
    * (energies scale by the square, span endpoints scale with the
    * threshold), resample (relative span positions and window regions
    * are rate-free), re-encode/re-container (reads decoded PCM).
    * Honest limits: an edit INSIDE the loud span still shifts the
    * grid (that is content change, not trimming), and a recording
    * whose onset is quieter than half its global peak anchors on the
    * later loud part — the half-max anchor trades a sharp, arithmetic,
    * oracle-replicable span for onset-detection heuristics. Streams
    * with no sample at/above threshold (pure silence) or a span
    * shorter than 65 samples are dropped, the [[decodeWavs]]
    * corrupt-asset convention.
    *
    * Scale shape: identical to [[ahashAudio]] — one map-side pass per
    * asset (two scans of the PCM: peak+span, then windows); pair
    * finding reuses [[audioNearDupPairs]] / [[perceptualDupClusters]]
    * on the emitted `ahash` column.
    */
  def ahashAudioSpan(assets: Dataset[Asset]): Dataset[AudioAHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        pcm16Of(a.payload).flatMap { case (bytes, bigEndian) =>
          spanHashFromPcm(bytes, bigEndian)
        }.map(AudioAHash(a.asset_id, _))
      }
    }
  }

  /** The [[ahashAudioSpan]] core over already-extracted 16-bit PCM. */
  private def spanHashFromPcm(
      bytes: Array[Byte], bigEndian: Boolean): Option[Long] = {
    val n = bytes.length / 2
    def sample(i: Int): Int = {
      val o = 2 * i
      val s =
        if (bigEndian)
          ((bytes(o) << 8) | (bytes(o + 1) & 0xff)).toShort
        else ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
      s.toInt
    }
    // pass 1: peak, then the half-max loud span
    var maxAmp = 0
    var i = 0
    while (i < n) {
      val v = math.abs(sample(i))
      if (v > maxAmp) maxAmp = v
      i += 1
    }
    if (maxAmp == 0) None
    else {
      val thr = (maxAmp + 1) / 2
      var first = 0
      while (first < n && math.abs(sample(first)) < thr) first += 1
      var last = n - 1
      while (last >= 0 && math.abs(sample(last)) < thr) last -= 1
      val m = last - first + 1
      if (m < 65) None
      else {
        // pass 2: the ahashAudio grid over the span only
        val sumSq = new Array[Long](65)
        val cnt = new Array[Long](65)
        var j = 0
        while (j < m) {
          val s = sample(first + j).toLong
          val w = (j.toLong * 65 / m).toInt
          sumSq(w) += s * s
          cnt(w) += 1
          j += 1
        }
        var hash = 0L
        var w = 0
        while (w < 64) {
          val rises =
            if (cnt(w) == cnt(w + 1)) sumSq(w + 1) > sumSq(w)
            else sumSq(w + 1).toDouble / cnt(w + 1) >
              sumSq(w).toDouble / cnt(w)
          if (rises) hash |= 1L << w
          w += 1
        }
        Some(hash)
      }
    }
  }

  /** [[syntheticBandWav]]'s trim-fixture twin for the span-anchored
    * tier: bands 0 and 64 are pinned at the MAX amplitude 200 (loud
    * delimiters), inner bands follow the same `(id·31 + w·17) % 200 + 1`
    * profile, and `silenceBands` zero-amplitude bands are PREPENDED.
    * With the delimiters pinned, [[ahashAudioSpan]]'s half-max span is
    * exactly the 65 content bands (threshold `100·2^gainShift`; band 0
    * and 64 always reach it), every window lands on one band, and the
    * hash is closed-form in the id alone — `bit(0) = 0` (nothing tops
    * the leading delimiter), `bit(w) = (id·31 + w·17) % 200 < 183` for
    * `w ∈ [1, 62]` (the q110 rule), `bit(63) = (id·31 + 63·17) % 200 <
    * 199` (everything but a 200-amp band 63 rises into the trailing
    * delimiter) — independent of `gainShift`, `rateStep` AND
    * `silenceBands`. That last independence is the trim robustness the
    * tier exists for, arithmetically checkable by the DuckDB oracle.
    */
  def syntheticSpanWav(
      id: Long, gainShift: Int = 0, rateStep: Int = 0,
      silenceBands: Int = 0): Array[Byte] = {
    require(gainShift >= 0 && gainShift <= 5,
      s"gainShift=$gainShift must be in [0, 5] to stay inside 16 bits")
    require(rateStep >= 0, s"rateStep=$rateStep must be non-negative")
    require(silenceBands >= 0,
      s"silenceBands=$silenceBands must be non-negative")
    val L = (2 + (id % 3).toInt) * (1 + rateStep)
    val frames = (65 + silenceBands) * L
    val data = new Array[Byte](frames * 2)
    var i = silenceBands * L // leading silence stays zero-filled
    while (i < frames) {
      val w = i / L - silenceBands
      val base =
        if (w == 0 || w == 64) 200L else (id * 31 + w * 17) % 200 + 1
      val amp = (base << gainShift).toInt
      val s = if (i % 2 == 0) amp else -amp
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f * (1 + rateStep), 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** One sampled video frame: typed metadata + the frame payload. */
  case class FrameSample(asset_id: Long, frame_idx: Int, ts_ms: Double,
      frame: Array[Byte])

  /** Frame sampling for containers the JVM cannot demux — every
    * `everyNth` frame with its index and timestamp, one output row per
    * kept frame. For AVI files carrying MJPEG or uncompressed frames use
    * [[sampleAviFrames]], which is a REAL demux (pure-JDK RIFF parsing,
    * [[graft.sources.AviDemux]]); this generic tier keeps the
    * clearly-labeled deterministic stub [[fakeVideoFrames]] for true
    * inter-frame codecs (H.264 etc., no JVM codec exists), while
    * everything Spark-side — binary payloads in, per-partition decoder
    * init, a typed exploded-frames relation out — is the real pipeline
    * shape a JavaCV/ffmpeg-backed decoder would slot into.
    */
  def sampleFrames(assets: Dataset[Asset], everyNth: Int,
      fps: Double = 25.0): Dataset[FrameSample] = {
    require(everyNth > 0, s"everyNth=$everyNth must be positive")
    require(fps > 0, s"fps=$fps must be positive")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would go here (codec handle)
      it.flatMap { a =>
        fakeVideoFrames(a.payload).zipWithIndex.collect {
          case (f, i) if i % everyNth == 0 =>
            FrameSample(a.asset_id, i, i * 1000.0 / fps, f)
        }
      }
    }
  }

  /** One sampled AVI video frame: geometry from the container header,
    * the raw chunk payload, and whether it is MJPEG (`00dc`) or raw DIB
    * (`00db`).
    */
  case class VideoFrame(asset_id: Long, frame_idx: Int, ts_ms: Double,
      width: Int, height: Int, compressed: Boolean, frame: Array[Byte])

  /** Decoded per-frame stats — the closed-form-checkable shape
    * ([[ImageFeatures]] convention: dims + channel means).
    */
  case class VideoFrameStats(asset_id: Long, frame_idx: Int, ts_ms: Double,
      width: Int, height: Int, mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL video frame sampling over AVI containers
    * ([[graft.sources.AviDemux]] — pure-JDK RIFF parsing, no codec
    * library): every `everyNth` frame of the video stream, with its
    * index, the container-declared timestamp (`idx · µs-per-frame`), and
    * geometry. Non-AVI or structurally-broken payloads are dropped, the
    * [[decodeImages]] corrupt-asset convention. Per-partition demux over
    * in-memory payloads; one output row per kept frame.
    */
  def sampleAviFrames(assets: Dataset[Asset], everyNth: Int): Dataset[VideoFrame] = {
    require(everyNth > 0, s"everyNth=$everyNth must be positive")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        graft.sources.AviDemux.demux(a.payload).toSeq.flatMap { v =>
          v.frames.zipWithIndex.collect {
            case (f, i) if i % everyNth == 0 =>
              VideoFrame(a.asset_id, i, i * (v.usPerFrame / 1000.0),
                v.width, v.height, f.compressed, f.payload)
          }
        }
      }
    }
  }

  /** REAL decode of sampled AVI frames to per-frame channel means: MJPEG
    * frames are complete JPEGs (ImageIO, like [[decodeImages]] — exact
    * 64×64-capped sample grid), raw `00db` frames are interpreted as the
    * bottom-up BGR DIB layout their header declares (exact over ALL
    * pixels). Undecodable frames are dropped.
    */
  def decodeVideoFrames(frames: Dataset[VideoFrame]): Dataset[VideoFrameStats] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { f =>
        if (!f.compressed)
          graft.sources.AviDemux.dibChannelMeans(f.frame, f.width, f.height)
            .map { case (mr, mg, mb) =>
              VideoFrameStats(f.asset_id, f.frame_idx, f.ts_ms,
                f.width, f.height, mr, mg, mb) }
        else {
          val img =
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(f.frame)))
            catch { case _: Exception => None }
          img.map { im =>
            val w = im.getWidth
            val h = im.getHeight
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = im.getRGB(x, y)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            val cnt = (w.toLong * h).toDouble
            VideoFrameStats(f.asset_id, f.frame_idx, f.ts_ms, w, h,
              sr / cnt, sg / cnt, sb / cnt)
          }
        }
      }
    }
  }

  /** A per-frame perceptual hash of one demuxed video frame. */
  case class FrameDHash(asset_id: Long, frame_idx: Int, dhash: Long)

  /** Per-frame perceptual dHash over demuxed AVI frames — the frame
    * half of the video near-dup tier ([[videoSignatures]] folds these
    * into one per-video fingerprint). Raw `00db` frames read luminance
    * straight from the bottom-up BGR DIB layout their header declares
    * (top-down grid coordinates, the [[decodeImages]] convention);
    * MJPEG frames decode via ImageIO like [[dhashImages]]. Same 9×8
    * grid, same invariances (brightness, rescale, re-encode), same
    * rotation/crop blindness. Undecodable or sub-9×8 frames are
    * dropped.
    */
  def dhashVideoFrames(frames: Dataset[VideoFrame]): Dataset[FrameDHash] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { f =>
        val hash =
          if (!f.compressed) {
            val w = f.width
            val h = f.height
            if (w <= 0 || h <= 0) None
            else {
              val strideL = ((w.toLong * 3 + 3) / 4) * 4
              // untrusted geometry: bounds-check before the pixel reads
              // (the dibChannelMeans overflow rationale)
              if (h > f.frame.length / strideL) None
              else {
                val stride = strideL.toInt
                dhashFromLum(w, h, (x, y) => {
                  val o = (h - 1 - y) * stride + 3 * x
                  299L * (f.frame(o + 2) & 0xff) +
                    587L * (f.frame(o + 1) & 0xff) +
                    114L * (f.frame(o) & 0xff)
                })
              }
            }
          } else {
            val img =
              try Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(f.frame)))
              catch { case _: Exception => None }
            img.flatMap { im =>
              dhashFromLum(im.getWidth, im.getHeight, (x, y) => {
                val rgb = im.getRGB(x, y)
                299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                  114L * (rgb & 0xff)
              })
            }
          }
        hash.map(FrameDHash(f.asset_id, f.frame_idx, _))
      }
    }
  }

  /** Per-video perceptual signature from sampled-frame hashes
    * ([[dhashVideoFrames]]): the MAJORITY-BIT fold — signature bit `b`
    * is set iff strictly more than half of the video's hashed frames
    * have bit `b` set. The fold inherits the per-frame invariances (a
    * re-scaled, brightness-shifted, or re-encoded copy of the same
    * footage has identical per-frame hashes, hence an identical fold)
    * and adds robustness a single-frame pick lacks: one corrupt or
    * re-keyframed frame cannot flip more bits than its minority share.
    * It does NOT survive trimming or re-timing (frames enter/leave the
    * majority — the temporal analog of dHash's crop blindness;
    * [[videoContentSignatures]] closes the commonest case, added or
    * trimmed solid intro/outro frames), and it
    * only DISCRIMINATES when the per-frame bits are roughly balanced —
    * true of dHash on natural content (luminance rises or falls about
    * evenly), but a bit that is heavily biased across frames saturates
    * its majority to the same value for every video (the
    * [[syntheticBandAvi]] fixture is band-stepped to keep its bits
    * near 50/50 for exactly this reason). Returns
    * `(idCol, n_frames, vhash)`.
    *
    * Scale shape: one hash aggregation on the video id (64 conditional
    * sums + a count, the [[Dedup.simhashMd5]] fold shape) — no
    * per-frame state leaves the aggregation; pair finding is the
    * separate [[videoNearDupPairs]] / [[perceptualDupClusters]].
    */
  def videoSignatures(
      frameHashes: DataFrame, idCol: String = "asset_id"): DataFrame = {
    val sums = (0 until 64).map { b =>
      sum(shiftright(col("dhash"), b).bitwiseAND(lit(1L))).as(s"s$b")
    }
    val aggCols = count(lit(1)).as("n_frames") +: sums
    val agg = frameHashes.groupBy(col(idCol))
      .agg(aggCols.head, aggCols.tail: _*)
    val bits = (0 until 64).map { b =>
      when(col(s"s$b") * 2 > col("n_frames"), shiftleft(lit(1L), b))
        .otherwise(lit(0L))
    }
    agg.select(col(idCol), col("n_frames"),
      bits.reduce(_ bitwiseOR _).as("vhash"))
  }

  /** INTRO/OUTRO-robust video signature — [[videoSignatures]] with
    * DEGENERATE frames excluded from the majority fold (frame hash
    * exactly 0: a solid fill ties every dHash comparison, which is
    * what title cards, fades-to-black, and blank leaders hash to), the
    * video analog of [[ahashAudioSpan]]'s silence exclusion: a
    * re-upload that adds or trims any number of such frames at either
    * end — the commonest real-world re-edit — folds the identical
    * content-frame multiset and gets the IDENTICAL signature, where
    * the plain fold's majority shifts. Honest limits: edits to the
    * CONTENT frames still move the majority (that is content change),
    * and a genuine content frame that happens to hash to exactly 0
    * (near-solid footage) is excluded too — the price of an exact,
    * oracle-replicable exclusion rule. Videos with ONLY degenerate
    * frames drop entirely (no signature), the corrupt-asset
    * convention. `n_frames` counts content frames only — itself a
    * useful dedup feature (two re-edits of the same footage agree on
    * it). Same one-aggregation scale shape as [[videoSignatures]].
    */
  def videoContentSignatures(
      frameHashes: DataFrame, idCol: String = "asset_id"): DataFrame =
    videoSignatures(frameHashes.filter(col("dhash") =!= 0L), idCol)

  /** Perceptual near-duplicate video pairs from [[videoSignatures]] —
    * the same pigeonhole Hamming blocking as [[imageNearDupPairs]].
    * Returns `(id_a, id_b, hamming)`.
    */
  def videoNearDupPairs(
      sigs: DataFrame, idCol: String = "asset_id",
      maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairsFromSigs(sigs.select(col(idCol), col("vhash")),
      idCol, "vhash", maxHamming, chunkBits = 16, nChunks = 4)

  /** One frame-hash shingle (a window of consecutive content-frame
    * hashes) of a video. */
  case class VideoShingle(asset_id: Long, start_idx: Int, shingle: String)

  /** CONTENT-TRIM-robust video fingerprints — the answer to
    * [[videoContentSignatures]]' documented boundary (an edit that cuts
    * REAL frames, or splices two clips, still moves the majority fold):
    * after the 0-hash degenerate-frame exclusion, slide a window of `w`
    * consecutive content-frame hashes per video (frame order, dense
    * over the surviving subsequence) and emit each window as one
    * shingle value — the video analog of text w-shingling, and the
    * temporal twin of [[tiledDhashImages]]' spatial tiles. A re-edit
    * that keeps ANY run of ≥ `w` consecutive content frames intact
    * shares that run's shingles verbatim (pigeonhole — position
    * independent, so head/mid/tail cuts and splices are all recalled
    * by [[videoShingleNearDupPairs]]' value join); per-frame
    * brightness/rescale/re-encode invariance carries over from the
    * dHash. Honest limits: an edit that re-times EVERY run below `w`
    * frames leaves no shared window (that is pervasive content
    * change); videos with fewer than `w` content frames emit nothing,
    * the corrupt-asset convention.
    *
    * Scale shape: one per-video window aggregation (partitioned by the
    * video id, ordered by frame index, `w`-row frames — no global
    * window); pair finding is the separate value join.
    */
  def videoShingles(
      frameHashes: DataFrame, w: Int = 3,
      idCol: String = "asset_id"): DataFrame = {
    require(w >= 1, s"w=$w must be positive")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("frame_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        w - 1)
    frameHashes.filter(col("dhash") =!= 0L)
      .withColumn("__run", collect_list(col("dhash")).over(win))
      .filter(size(col("__run")) === w)
      .select(col(idCol), col("frame_idx").as("start_idx"),
        array_join(col("__run"), ":").as("shingle"))
  }

  /** Trim/splice-robust near-duplicate video pairs from
    * [[videoShingles]]: two videos pair iff they share at least
    * `minShared` distinct shingle values — any intact run of `w`
    * consecutive content frames is one shared shingle, wherever the
    * edit moved it. `maxShingleFreq` optionally drops shingles carried
    * by more than that many videos (stop-shingles — shared channel
    * intros at corpus scale), the [[tiledImageNearDupPairs]] cap.
    * Returns `(id_a, id_b, shared_shingles)`; same
    * distinct → value-equi-join → count-filter scale shape.
    */
  def videoShingleNearDupPairs(
      shingles: DataFrame, idCol: String = "asset_id",
      minShared: Int = 1, maxShingleFreq: Int = Int.MaxValue): DataFrame =
    sharedValuePairs(shingles, idCol, "shingle", "shared_shingles",
      minShared, maxShingleFreq)

  /** Hot-value observability for the shared-value pair joins
    * ([[tiledImageNearDupPairs]] / [[videoShingleNearDupPairs]]) — the
    * [[Dedup.pigeonholeBucketStats]] counterpart for these tiers: one
    * row `(value, n)` per tile-hash / shingle value carried by `n ≥ 2`
    * distinct ids (singleton values produce no candidates and are the
    * overwhelming majority at corpus scale, so they are pruned here
    * rather than shipped). The join's candidate count is
    * `Σ n·(n-1)/2` over these rows; the MAX `n` is the
    * quadratic-blowup early warning that tells an operator the
    * `maxHashFreq`/`maxShingleFreq` cap is needed — a ubiquitous
    * watermark tile or shared channel-intro shingle shows up here as
    * one value carried by thousands of assets BEFORE the pair join is
    * ever run. `valCol` is `"dhash"` for the tiled tier (pass the
    * tier's own degenerate filter first — `dhash =!= 0`), `"shingle"`
    * for the video tier.
    */
  def sharedValueStats(
      df: DataFrame, idCol: String, valCol: String): DataFrame =
    df.select(col(idCol), col(valCol)).distinct()
      .groupBy(valCol)
      .agg(countDistinct(col(idCol)).as("n"))
      .filter(col("n") >= 2)

  /** The shared k-of-n value-set pair join of [[tiledImageNearDupPairs]]
    * and [[videoShingleNearDupPairs]]: distinct (id, value) → self
    * equi-join on the value → pair counts filtered at `minShared`,
    * with an optional per-value frequency cap. Degenerate-value
    * exclusion is the CALLER's contract (each tier filters its own
    * notion of "flat" before the distinct).
    *
    * The cap is never silent (the [[Dedup.simhashPairsFromSigs]]
    * no-silent-caps rule): when `maxFreq` binds, one bounded
    * pre-aggregation LOGS how many hot values (and carrying ids) were
    * dropped — a dropped value weakens the recall contract to
    * "≥ `minShared` shared non-ubiquitous values", a trade the
    * operator must own out loud. [[sharedValueStats]] surfaces the
    * same populations ahead of the run.
    */
  private def sharedValuePairs(
      df: DataFrame, idCol: String, valCol: String, outCol: String,
      minShared: Int, maxFreq: Int): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared must be positive")
    require(maxFreq >= 1, s"maxFreq=$maxFreq must be positive")
    val distinctVals = df.select(col(idCol), col(valCol)).distinct()
    val usable =
      if (maxFreq == Int.MaxValue) distinctVals
      else {
        val over = distinctVals.groupBy(valCol)
          .agg(count(lit(1)).as("__ids"))
          .filter(col("__ids") > maxFreq)
        // bounded action: three numbers, not the hot-value list
        val s = over.agg(count(lit(1)).as("v"), max(col("__ids")).as("mx"),
          sum(col("__ids")).as("members")).collect()(0)
        if (s.getLong(0) > 0)
          org.slf4j.LoggerFactory.getLogger(Multimodal.getClass).warn(
            s"shared-value cap maxFreq=$maxFreq dropped ${s.getLong(0)} " +
              s"hot $valCol value(s) (largest carried ${s.getLong(1)} " +
              s"ids, ${s.getLong(2)} id-value rows total): pairs that " +
              s"needed a dropped value to reach minShared=$minShared " +
              "are NOT emitted")
        distinctVals.join(over.select(valCol), Seq(valCol), "left_anti")
      }
    usable.as("x")
      .join(usable.as("y"), Seq(valCol))
      .filter(col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .agg(count(lit(1)).as(outCol))
      .filter(col(outCol) >= minShared)
  }

  /** Deterministic synthetic uncompressed AVI for oracle-checkable video
    * tests: `3 + id%4` solid DIB frames at `(4 + id%4)×(3 + id%3)`,
    * 25 fps (40 000 µs/frame); frame `f` fills
    * `rgb = ((19id+23f)%256, (13id+17f)%256, (11id+7f)%256)`. Solid fill
    * + lossless DIB ⇒ [[decodeVideoFrames]]' means equal the fill
    * EXACTLY, so an engine with no container parser (the DuckDB oracle)
    * predicts every column arithmetically while the Spark side exercises
    * the real RIFF demux + DIB read-back.
    */
  def syntheticAvi(id: Long): Array[Byte] = {
    val w = 4 + (id % 4).toInt
    val h = 3 + (id % 3).toInt
    val n = 3 + (id % 4).toInt
    val frames = (0 until n).map { f =>
      graft.sources.AviDemux.solidDibFrame(w, h,
        ((id * 19 + f * 23) % 256).toInt,
        ((id * 13 + f * 17) % 256).toInt,
        ((id * 11 + f * 7) % 256).toInt)
    }
    graft.sources.AviDemux.mux(frames, w, h, 40000L, compressed = false)
  }

  /** Deterministic synthetic BANDED AVI for oracle-checkable perceptual
    * video tests — [[syntheticBandPng]]'s grid carried onto DIB frames:
    * `3 + id%4` uncompressed frames at band-aligned dimensions
    * `W = 9·(2 + id%3 + scaleStep)`, `H = 8·(2 + id%2 + scaleStep)`,
    * where frame `f`'s band `(j, r)` fills gray
    * `(id·31 + f·53 + j·97 + r·57) % 200 + brightness` on all three
    * channels (bottom-up DIB rows, so stored row `H-1-y` carries
    * top-down row `y`). Band alignment puts [[dhashVideoFrames]]'
    * sampled column `i` of row `r` in band `(i, r)` at every fixture
    * size, so frame `f`'s hash is closed-form — the +97 band step
    * wraps exactly when the comparison falls:
    * `bit(r,i) = (id·31 + f·53 + i·97 + r·57) % 200 < 103` —
    * independent of `brightness` (≤ 55, unclamped monotone shift) and
    * `scaleStep` (resampled band profile), and therefore so is the
    * [[videoSignatures]] majority fold the DuckDB oracle replays
    * arithmetically. The step is 97 (bit probability 103/200 ≈ 0.5),
    * NOT the PNG fixture's 17 (183/200 ≈ 0.92): near-balanced
    * per-frame bits are what keep the majority fold discriminative —
    * at 0.92 every video's majority saturates to all-ones and the
    * folded signature carries zero information (measured round 10:
    * ONE distinct signature across the whole sf0.01 corpus).
    * `introFrames`/`outroFrames` prepend/append SOLID gray frames
    * (hash exactly 0 — the [[videoContentSignatures]] trim fixture):
    * the content frames and their closed form are untouched.
    * `trimHead`/`trimTail` instead CUT content frames — the emitted
    * range is `f ∈ [trimHead, nFrames - trimTail)` with each frame's
    * closed form keyed by its ORIGINAL `f` (a genuine content re-edit:
    * the surviving frames are bit-identical to the original's, the
    * cut ones are gone) — the [[videoShingles]] trim fixture.
    */
  def syntheticBandAvi(
      id: Long, brightness: Int = 0, scaleStep: Int = 0,
      introFrames: Int = 0, outroFrames: Int = 0,
      trimHead: Int = 0, trimTail: Int = 0): Array[Byte] = {
    require(brightness >= 0 && brightness <= 55,
      s"brightness=$brightness must be in [0, 55] to stay unclamped")
    require(scaleStep >= 0, s"scaleStep=$scaleStep must be non-negative")
    require(introFrames >= 0 && outroFrames >= 0,
      s"intro/outro frame counts must be non-negative")
    require(trimHead >= 0 && trimTail >= 0 &&
      trimHead + trimTail < 3 + (id % 4).toInt,
      s"trim $trimHead/$trimTail must leave at least one content frame")
    val m = 2 + (id % 3).toInt + scaleStep
    val nrow = 2 + (id % 2).toInt + scaleStep
    val w = 9 * m
    val h = 8 * nrow
    val stride = ((w * 3 + 3) / 4) * 4
    val nFrames = 3 + (id % 4).toInt
    // intro/outro: SOLID frames (title card / fade-to-black stand-ins)
    // — every dHash comparison ties on a solid fill, so their frame
    // hash is exactly 0 and [[videoContentSignatures]] excludes them
    val solid = {
      val g = (40 + brightness).toByte
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * stride
        var x = 0
        while (x < w) {
          val o = row + x * 3
          out(o) = g; out(o + 1) = g; out(o + 2) = g
          x += 1
        }
        y += 1
      }
      out
    }
    val frames =
      Seq.fill(introFrames)(solid) ++
      (trimHead until nFrames - trimTail).map { f =>
        val out = new Array[Byte](stride * h)
        var y = 0
        while (y < h) {
          val r = y / nrow
          val row = (h - 1 - y) * stride
          var x = 0
          while (x < w) {
            val j = x / m
            val g = (((id * 31 + f * 53 + j * 97 + r * 57) % 200) +
              brightness).toByte
            val o = row + x * 3
            out(o) = g; out(o + 1) = g; out(o + 2) = g
            x += 1
          }
          y += 1
        }
        out
      } ++
      Seq.fill(outroFrames)(solid)
    graft.sources.AviDemux.mux(frames, w, h, 40000L, compressed = false)
  }

  /** A SPLICE of two [[syntheticBandAvi]] clips into one container —
    * idA's content frames followed by idB's, each keyed by its own
    * closed form ([[videoShingles]]' splice fixture: the spliced video
    * shares every length-w frame run with BOTH sources). The two ids
    * must agree on band dimensions (`idA ≡ idB (mod 6)` — m and nrow
    * are functions of id mod 3 and mod 2), since one AVI carries one
    * geometry.
    */
  def syntheticSpliceBandAvi(
      idA: Long, idB: Long, brightness: Int = 0): Array[Byte] = {
    require(idA % 6 == idB % 6,
      s"idA=$idA and idB=$idB must agree mod 6 (shared band geometry)")
    require(brightness >= 0 && brightness <= 55,
      s"brightness=$brightness must be in [0, 55] to stay unclamped")
    val m = 2 + (idA % 3).toInt
    val nrow = 2 + (idA % 2).toInt
    val w = 9 * m
    val h = 8 * nrow
    val stride = ((w * 3 + 3) / 4) * 4
    def clip(id: Long): Seq[Array[Byte]] =
      (0 until 3 + (id % 4).toInt).map { f =>
        val out = new Array[Byte](stride * h)
        var y = 0
        while (y < h) {
          val r = y / nrow
          val row = (h - 1 - y) * stride
          var x = 0
          while (x < w) {
            val j = x / m
            val g = (((id * 31 + f * 53 + j * 97 + r * 57) % 200) +
              brightness).toByte
            val o = row + x * 3
            out(o) = g; out(o + 1) = g; out(o + 2) = g
            x += 1
          }
          y += 1
        }
        out
      }
    graft.sources.AviDemux.mux(clip(idA) ++ clip(idB), w, h, 40000L,
      compressed = false)
  }

  /** Deterministic synthetic MJPEG AVI (each frame a real ImageIO JPEG
    * of a solid gray) — the compressed-container fixture for round-trip
    * specs. JPEG is lossy, so specs assert dimensions exactly and fills
    * within codec tolerance rather than bit-equality.
    */
  def syntheticMjpegAvi(id: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val w = 16 + (id % 4).toInt * 8
    val h = 16 + (id % 3).toInt * 8
    val n = 2 + (id % 3).toInt
    val frames = (0 until n).map { f =>
      val gray = (40 + ((id * 31 + f * 53) % 176)).toInt
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = im.createGraphics()
      try {
        g2.setColor(new java.awt.Color(gray, gray, gray))
        g2.fillRect(0, 0, w, h)
      } finally g2.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    graft.sources.AviDemux.mux(frames, w, h, 40000L, compressed = true)
  }

  /** STUB: a deterministic payload-derived "frame list" standing in for
    * a real video demux+decode of the codec tiers the JVM lacks
    * (inter-frame codecs: H.264 etc.) — NOT a real decode; the AVI
    * container tier IS real, see [[sampleAviFrames]]. Frame count and
    * bytes derive from the payload hash so tests are stable.
    */
  private[graft] def fakeVideoFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val n = 4 + (math.floorMod(h, 8L)).toInt // 4..11 "frames"
    (0 until n).map { idx =>
      fakeDecode(payload :+ idx.toByte, 8).map(f => (f * 255).toByte)
    }
  }

  /** STUB: deterministic stand-in for the codec tiers the JVM lacks
    * (compressed audio, video) — NOT a real decode.
    */
  private[graft] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      out(j) = (h % 1000).toFloat / 1000.0f
      j += 1
    }
    out
  }
}
