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
}
