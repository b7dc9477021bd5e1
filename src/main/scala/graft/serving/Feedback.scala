package graft.serving

/** User-feedback submission (reference `services/feedback_service.py` +
  * `routes/feedback.py`): feedback becomes an issue in an external
  * tracker. The transport is an external-network boundary, so it sits
  * behind [[FeedbackSink]] — tests wire a recording fixture, production
  * wires [[GitHubFeedbackSink]].
  */
trait FeedbackSink {
  def configured: Boolean
  /** Returns the created issue's URL, or None on failure. */
  def createIssue(title: String, body: String, voteId: Long, period: Int,
      pageUrl: String, lang: String): Option[String]
}

object Feedback {
  /** Issue body with the vote-metadata header, user text HTML-escaped
    * (`feedback_service.py:21-31`). The page URL comes from the Referer
    * header — attacker-controlled — so it gets the same escaping plus
    * newline stripping; otherwise a crafted Referer injects markdown (or
    * fake metadata lines) into the issue.
    */
  def issueBody(body: String, voteId: Long, period: Int, pageUrl: String,
      lang: String): String = {
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&#x27;")
    val escaped = esc(body)
    val safeUrl = esc(pageUrl.replaceAll("[\\r\\n]+", " "))
    s"**Vote ID:** $voteId\n**Period:** $period\n**Page URL:** $safeUrl\n" +
      s"**Language:** $lang\n\n---\n\n$escaped"
  }

  /** Field envelope (`routes/feedback.py:33-37`). */
  def validateFields(title: String, body: String): Option[String] =
    if (title.length < 5 || title.length > 200 ||
        body.length < 10 || body.length > 2000)
      Some("Feedback fields out of bounds: title 5-200 chars, body 10-2000")
    else None
}

/** GitHub Issues sink (`feedback_service.py:35-90`): POST
  * /repos/{repo}/issues with a bearer token. Repo/token come from the
  * environment; unconfigured → every submission reports failure, like
  * the reference's disabled mode.
  */
class GitHubFeedbackSink(
    repo: String = sys.env.getOrElse("GRAFT_FEEDBACK_REPO", ""),
    token: String = sys.env.getOrElse("GRAFT_FEEDBACK_TOKEN", ""))
    extends FeedbackSink {

  override def configured: Boolean = repo.nonEmpty && token.nonEmpty

  override def createIssue(title: String, body: String, voteId: Long,
      period: Int, pageUrl: String, lang: String): Option[String] = {
    if (!configured) return None
    val payload = {
      def q(s: String) = "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      s"""{"title":${q(s"[Feedback] Vote #$voteId: $title")},""" +
        s""""body":${q(Feedback.issueBody(body, voteId, period, pageUrl, lang))}}"""
    }
    try {
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"https://api.github.com/repos/$repo/issues"))
        .timeout(java.time.Duration.ofSeconds(15))
        .header("Authorization", s"Bearer $token")
        .header("Accept", "application/vnd.github+json")
        .header("X-GitHub-Api-Version", "2022-11-28")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))
        .build()
      val resp = java.net.http.HttpClient.newHttpClient()
        .send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 201) {
        // minimal extraction: the html_url field of the created issue
        val m = java.util.regex.Pattern
          .compile(""""html_url"\s*:\s*"([^"]+/issues/\d+)"""")
          .matcher(resp.body())
        if (m.find()) Some(m.group(1)) else None
      } else None
    } catch { case _: Exception => None }
  }
}
