package graft.serving

import org.apache.spark.sql.DataFrame

/** Server-rendered HTML pages (reference `routes/pages.py` + Jinja2
  * templates, minus HTMX): the same catalog results as the /api routes,
  * rendered as semantic HTML tables with a nav bar and a cs/en toggle.
  * No client framework, no inline scripts or styles (the CSP the server
  * already sends forbids them); presentation is deliberately minimal —
  * the data surface is the point.
  */
object PageRender {

  def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c => c.toString
  }

  /** Localized nav labels (reference `i18n/translations.py` nav.*). */
  private val Nav: Seq[(String, Map[String, String])] = Seq(
    "/" -> Map("cs" -> "Přehled", "en" -> "Overview"),
    "/votes" -> Map("cs" -> "Hlasování", "en" -> "Votes"),
    "/laws" -> Map("cs" -> "Zákony", "en" -> "Laws"),
    "/amendments" -> Map("cs" -> "Pozměňovací návrhy", "en" -> "Amendments"),
    "/loyalty" -> Map("cs" -> "Loajalita", "en" -> "Loyalty"),
    "/attendance" -> Map("cs" -> "Účast", "en" -> "Attendance"),
    "/similarity" -> Map("cs" -> "Podobnost", "en" -> "Similarity"))

  def page(title: String, lang: String, period: Int, body: String): String = {
    val nav = Nav.map { case (href, labels) =>
      s"""<a href="${href}?period=$period&amp;lang=$lang">${
        esc(labels.getOrElse(lang, labels("cs")))}</a>"""
    }.mkString(" | ")
    val langToggle =
      s"""<a href="?period=$period&amp;lang=${if (lang == "en") "cs" else "en"}">${
        if (lang == "en") "čeština" else "English"}</a>"""
    s"""<!DOCTYPE html>
       |<html lang="$lang"><head><meta charset="utf-8">
       |<title>${esc(title)}</title></head>
       |<body>
       |<header><nav>$nav</nav> <span>$langToggle</span></header>
       |<main><h1>${esc(title)}</h1>
       |$body
       |</main>
       |</body></html>""".stripMargin
  }

  /** Render a (small, already-clamped) DataFrame as a table; headers are
    * localized through [[I18n.headerLabel]] (reference `th.*` keys),
    * unknown columns fall back to their own name.
    */
  def table(df: DataFrame, lang: String = "cs", maxRows: Int = 200): String = {
    val cols = df.columns
    val head = cols.map(c => s"<th>${esc(I18n.headerLabel(c, lang))}</th>").mkString
    val rows = df.limit(maxRows).collect().map { r =>
      cols.indices.map { i =>
        val v = r.get(i)
        s"<td>${esc(if (v == null) "" else v.toString)}</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString("\n")
    s"<table><thead><tr>$head</tr></thead><tbody>\n$rows\n</tbody></table>"
  }

  def link(href: String, label: String): String =
    s"""<a href="${href}">${esc(label)}</a>"""

  /** HTMX-style partial (reference `templates/partials`, `…_list.html`): the
    * listing envelope — found-count line, localized table, prev/next
    * links carrying the filter params — WITHOUT page chrome, so a client
    * can swap just the results region. `baseHref` is the fragment's own
    * route; `params` the filter params to propagate (already validated
    * upstream; values are URL-encoded here).
    */
  def listFragment(
      rows: DataFrame, total: Long, page: Int, totalPages: Int,
      lang: String, baseHref: String, params: Map[String, String]): String = {
    val found =
      if (lang == "en") s"$total found (page $page/$totalPages)"
      else s"nalezeno $total (strana $page/$totalPages)"
    def href(p: Int): String = {
      val qs = (params + ("page" -> p.toString) + ("lang" -> lang)).toSeq.sorted
        .map { case (k, v) =>
          s"${java.net.URLEncoder.encode(k, "UTF-8")}=${java.net.URLEncoder.encode(v, "UTF-8")}"
        }.mkString("&amp;")
      s"$baseHref?$qs"
    }
    val prev =
      if (page > 1) link(href(page - 1), if (lang == "en") "prev" else "předchozí")
      else ""
    val next =
      if (page < totalPages) link(href(page + 1), if (lang == "en") "next" else "další")
      else ""
    s"<p><strong>${esc(found)}</strong></p>\n" + table(rows, lang) +
      s"\n<nav>$prev $next</nav>"
  }
}
