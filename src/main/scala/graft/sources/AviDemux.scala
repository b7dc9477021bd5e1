package graft.sources

/** Pure-JDK RIFF/AVI demuxer (and a matching muxer for synthetic
  * fixtures) — the container layer that makes the video tier REAL on an
  * offline JVM: an AVI file is a RIFF chunk tree, and for the two
  * codec-less payload kinds the JDK can already decode every frame —
  *
  *  - `00db` uncompressed DIB frames (bottom-up BGR rows, 4-byte-aligned
  *    stride — plain byte interpretation),
  *  - `00dc` MJPEG frames (each chunk is a complete JPEG that `ImageIO`
  *    decodes; Motion-JPEG has no inter-frame state by design),
  *
  * so RIFF parsing (~100 lines, below) is the ONLY missing piece — no
  * codec library. True inter-frame codecs (H.264 etc.) remain out of
  * scope and fall back to the labeled stub tier
  * ([[graft.operators.Multimodal.sampleFrames]]).
  *
  * Layout parsed (OpenDML/AVI 1.0, reference: Microsoft's public AVI
  * RIFF spec): `RIFF('AVI ' LIST('hdrl' avih ...) LIST('movi' 00db/00dc
  * ... [LIST('rec ' ...)]) [idx1])`. The demuxer takes dimensions and
  * frame cadence from `avih` (micro-seconds per frame, width, height),
  * collects stream-0 video chunks in file order (the `movi` order IS
  * presentation order for a single-stream file), recurses into `rec `
  * groups, and treats any structural damage — truncated chunk, missing
  * header, zero frames — as "not demuxable" (`None`), never an
  * exception: corpus inputs are untrusted.
  */
object AviDemux {

  /** A demuxed single-video-stream AVI: geometry, cadence, and the raw
    * frame payloads in presentation order (`compressed` = `00dc`/MJPEG,
    * else `00db` raw DIB).
    */
  case class AviVideo(width: Int, height: Int, usPerFrame: Long,
      frames: Vector[AviFrame])

  case class AviFrame(compressed: Boolean, payload: Array[Byte])

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Demux a single-video-stream AVI; `None` for anything that is not a
    * structurally-sound AVI with at least one video frame.
    */
  def demux(avi: Array[Byte]): Option[AviVideo] = {
    if (avi.length < 12 || fourcc(avi, 0) != "RIFF" ||
      fourcc(avi, 8) != "AVI ") return None
    var width = 0
    var height = 0
    var usPerFrame = 0L
    val frames = Vector.newBuilder[AviFrame]
    var malformed = false
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var o = start
      while (!malformed && o + 8 <= end) {
        val id = fourcc(avi, o)
        val size = u32(avi, o + 4)
        val dataStart = o + 8
        if (size > end - dataStart) { malformed = true; return }
        val dataEnd = dataStart + size.toInt
        id match {
          case "LIST" if size >= 4 =>
            val lt = fourcc(avi, dataStart)
            walk(dataStart + 4, dataEnd, inMovi || lt == "movi")
          case "avih" if size >= 40 =>
            usPerFrame = u32(avi, dataStart)
            width = u32(avi, dataStart + 32).toInt
            height = u32(avi, dataStart + 36).toInt
          case "00db" if inMovi =>
            frames += AviFrame(compressed = false,
              java.util.Arrays.copyOfRange(avi, dataStart, dataEnd))
          case "00dc" if inMovi =>
            frames += AviFrame(compressed = true,
              java.util.Arrays.copyOfRange(avi, dataStart, dataEnd))
          case _ => () // other streams, idx1, strl details: skipped
        }
        o = dataEnd + (size & 1).toInt // chunks pad to even offsets
      }
    }
    walk(12, avi.length, inMovi = false)
    val fs = frames.result()
    if (malformed || fs.isEmpty || width <= 0 || height <= 0 ||
      usPerFrame <= 0) None
    else Some(AviVideo(width, height, usPerFrame, fs))
  }

  /** Interpret a `00db` payload as bottom-up 24-bit BGR with 4-byte row
    * alignment (the DIB layout `strf`'s BITMAPINFOHEADER declares for
    * biBitCount=24/BI_RGB) and return (mean_r, mean_g, mean_b) over all
    * pixels; `None` if the payload length does not match the geometry.
    */
  def dibChannelMeans(frame: Array[Byte], width: Int, height: Int)
      : Option[(Double, Double, Double)] = {
    if (width <= 0 || height <= 0) return None
    // Long math: a crafted header (e.g. 50000x50000 on a 100-byte chunk)
    // must fail the bounds check, not overflow Int past it and then
    // throw out of the pixel loop — inputs are untrusted, the contract
    // is drop-never-throw
    val strideL = ((width.toLong * 3 + 3) / 4) * 4
    // division form: strideL * height would itself overflow Long for
    // width and height both near Int.MaxValue, wrap negative, and pass
    // the check (strideL > 0 because width > 0, so dividing is safe)
    if (height > frame.length / strideL) return None
    val stride = strideL.toInt // <= frame.length, so it fits
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < height) {
      val row = y * stride // bottom-up: row order does not matter for means
      var x = 0
      while (x < width) {
        val o = row + x * 3
        sb += frame(o) & 0xff
        sg += frame(o + 1) & 0xff
        sr += frame(o + 2) & 0xff
        x += 1
      }
      y += 1
    }
    val cnt = (width.toLong * height).toDouble
    Some((sr / cnt, sg / cnt, sb / cnt))
  }

  /** Encode one bottom-up BGR 4-byte-aligned DIB frame (the `00db`
    * payload [[dibChannelMeans]] reads back) with a solid (r,g,b) fill.
    */
  def solidDibFrame(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val stride = ((width * 3 + 3) / 4) * 4
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = y * stride + x * 3
        out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Mux video frames into a minimal structurally-valid AVI the demuxer
    * (or any standard player) reads back: RIFF(AVI ) with a real `hdrl`
    * (avih + one `vids` strl whose strh/strf declare MJPG or BI_RGB) and
    * the `movi` frame list. For synthetic fixtures and round-trip specs.
    */
  def mux(frames: Seq[Array[Byte]], width: Int, height: Int,
      usPerFrame: Long, compressed: Boolean): Array[Byte] = {
    require(frames.nonEmpty, "mux needs at least one frame")
    require(width > 0 && height > 0, s"bad geometry ${width}x$height")
    require(usPerFrame > 0, s"usPerFrame=$usPerFrame must be positive")
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(cc(id)); o.write(le32(data.length.toLong)); o.write(data)
      if ((data.length & 1) == 1) o.write(0) // even padding
      o.toByteArray
    }
    def list(listType: String, children: Array[Byte]*): Array[Byte] = {
      val body = new java.io.ByteArrayOutputStream()
      body.write(cc(listType)); children.foreach(body.write)
      chunk("LIST", body.toByteArray)
    }
    def cat(parts: Array[Byte]*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      parts.foreach(o.write); o.toByteArray
    }
    val handler = if (compressed) cc("MJPG") else cc("DIB ")
    val avih = cat(le32(usPerFrame), le32(0), le32(0), le32(0),
      le32(frames.length.toLong), le32(0), le32(1), le32(0),
      le32(width.toLong), le32(height.toLong),
      le32(0), le32(0), le32(0), le32(0))
    val strh = cat(cc("vids"), handler, le32(0), le16(0), le16(0), le32(0),
      le32(usPerFrame), le32(1000000L), le32(0), le32(frames.length.toLong),
      le32(0), le32(0), le32(0), le16(0), le16(0), le16(0), le16(0))
    val strf = cat(le32(40), le32(width.toLong), le32(height.toLong),
      le16(1), le16(24), if (compressed) cc("MJPG") else le32(0),
      le32((((width * 3 + 3) / 4) * 4).toLong * height),
      le32(0), le32(0), le32(0), le32(0))
    val hdrl = list("hdrl", chunk("avih", avih),
      list("strl", chunk("strh", strh), chunk("strf", strf)))
    val frameId = if (compressed) "00dc" else "00db"
    val movi = list("movi", frames.map(f => chunk(frameId, f)): _*)
    val riffBody = cat(cc("AVI "), hdrl, movi)
    bos.write(cc("RIFF")); bos.write(le32(riffBody.length.toLong))
    bos.write(riffBody)
    bos.toByteArray
  }
}
