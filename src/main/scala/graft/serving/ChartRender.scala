package graft.serving

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

/** PNG chart rendering with the JDK's own raster stack (BufferedImage +
  * ImageIO — headless-safe, zero added dependencies): the reference's
  * chart endpoints (`routes/charts.py:39-149`) draw a horizontal bar
  * chart (loyalty/attendance) and a party-colored scatter (PCA). Styling
  * follows the reference's light institutional look (white figure,
  * #F7F7F7 axes background, #333 text, #D9D9D9 frame).
  */
object ChartRender {

  System.setProperty("java.awt.headless", "true")

  private val Fg = new Color(0x33, 0x33, 0x33)
  private val AxesBg = new Color(0xF7, 0xF7, 0xF7)
  private val Frame = new Color(0xD9, 0xD9, 0xD9)

  /** Deterministic qualitative palette (stable across runs). */
  private def seriesColor(i: Int, n: Int): Color =
    Color.getHSBColor(i.toFloat / math.max(1, n), 0.55f, 0.80f)

  private def png(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def prepared(g: java.awt.Graphics2D): Unit = {
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
      RenderingHints.VALUE_ANTIALIAS_ON)
    g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
      RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
  }

  /** Horizontal bar chart: one row per (label, value), largest first at
    * the top (the reference reverses its rows for barh).
    */
  def barChart(title: String, xLabel: String,
      rows: Seq[(String, Double)]): Array[Byte] = {
    val w = 1200
    val rowH = 28
    val top = 60
    val bottom = 50
    val left = 360
    val right = 40
    val h = math.max(300, top + bottom + rowH * rows.length)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    prepared(g)
    g.setColor(Color.WHITE); g.fillRect(0, 0, w, h)
    g.setColor(AxesBg); g.fillRect(left, top, w - left - right, h - top - bottom)
    g.setColor(Frame); g.drawRect(left, top, w - left - right, h - top - bottom)
    g.setColor(Fg)
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 18))
    g.drawString(title, left, 34)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 13))
    g.drawString(xLabel, left, h - 16)
    val maxV = math.max(rows.map(_._2).foldLeft(0.0)(math.max), 1e-9)
    val plotW = w - left - right - 20
    rows.zipWithIndex.foreach { case ((label, value), i) =>
      val y = top + i * rowH + 4
      g.setColor(Fg)
      val shown = if (label.length > 44) label.take(43) + "…" else label
      g.drawString(shown, 12, y + 15)
      g.setColor(seriesColor(i, rows.length))
      val bw = math.max(1, (value / maxV * plotW).toInt)
      g.fillRect(left + 1, y, bw, rowH - 8)
      g.setColor(Fg)
      g.drawString(f"$value%.1f", left + bw + 6, y + 15)
    }
    g.dispose()
    png(img)
  }

  /** Scatter with one color per group and a legend (the PCA chart). */
  def scatterChart(title: String, xLabel: String, yLabel: String,
      points: Seq[(String, Double, Double)]): Array[Byte] = {
    val w = 1100; val h = 800
    val left = 70; val right = 220; val top = 60; val bottom = 60
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    prepared(g)
    g.setColor(Color.WHITE); g.fillRect(0, 0, w, h)
    g.setColor(AxesBg); g.fillRect(left, top, w - left - right, h - top - bottom)
    g.setColor(Frame); g.drawRect(left, top, w - left - right, h - top - bottom)
    g.setColor(Fg)
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 18))
    g.drawString(title, left, 34)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 13))
    g.drawString(xLabel, left + (w - left - right) / 2 - 20, h - 20)
    val old = g.getTransform
    g.rotate(-math.Pi / 2, 22, top + (h - top - bottom) / 2)
    g.drawString(yLabel, 22, top + (h - top - bottom) / 2)
    g.setTransform(old)

    val groups = points.map(_._1).distinct.sorted
    val colors = groups.zipWithIndex
      .map { case (p, i) => p -> seriesColor(i, groups.length) }.toMap
    def bounds(vs: Seq[Double]) = {
      val lo = vs.foldLeft(Double.MaxValue)(math.min)
      val hi = vs.foldLeft(Double.MinValue)(math.max)
      val pad = math.max((hi - lo) * 0.06, 1e-9)
      (lo - pad, hi + pad)
    }
    val (x0, x1) = bounds(points.map(_._2))
    val (y0, y1) = bounds(points.map(_._3))
    val plotW = w - left - right; val plotH = h - top - bottom
    points.foreach { case (grp, x, y) =>
      val px = left + ((x - x0) / (x1 - x0) * plotW).toInt
      val py = top + plotH - ((y - y0) / (y1 - y0) * plotH).toInt
      g.setColor(colors(grp))
      g.fillOval(px - 5, py - 5, 10, 10)
      g.setColor(Fg)
      g.setStroke(new BasicStroke(0.6f))
      g.drawOval(px - 5, py - 5, 10, 10)
    }
    // legend
    val lx = w - right + 16
    g.setColor(Color.WHITE); g.fillRect(lx - 8, top, right - 24, 22 * groups.length + 12)
    g.setColor(Frame); g.drawRect(lx - 8, top, right - 24, 22 * groups.length + 12)
    groups.zipWithIndex.foreach { case (grp, i) =>
      val y = top + 16 + i * 22
      g.setColor(colors(grp)); g.fillOval(lx, y - 9, 10, 10)
      g.setColor(Fg)
      val shown = if (grp.length > 20) grp.take(19) + "…" else grp
      g.drawString(shown, lx + 16, y)
    }
    g.dispose()
    png(img)
  }
}
