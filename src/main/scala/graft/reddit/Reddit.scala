package graft.reddit

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Reddit political-ads processing (SURVEY F19): the self-text
  * key/value parser (`reddit_ingest_get_ads/main.py:44-71`) — HTML →
  * text, fix-up replacements, line-split on ": ", snake_cased keys,
  * date normalization — as a deterministic JVM function returning
  * `MapType(String, String)`.
  */
object Reddit {

  private val mdY = DateTimeFormatter.ofPattern("M/d/yyyy")
  private val mdy = DateTimeFormatter.ofPattern("M/d/yy")
  private val iso = DateTimeFormatter.ISO_LOCAL_DATE

  private def normalizeDate(v: String): String = {
    def tryFmt(f: DateTimeFormatter): Option[String] =
      try Some(LocalDate.parse(v, f).format(iso))
      catch { case _: Exception => None }
    tryFmt(mdY).orElse(tryFmt(mdy)).getOrElse(v)
  }

  /** Strip tags the way an HTML-to-text pass does: tags removed, block
    * boundaries become newlines. (The reference uses BeautifulSoup
    * get_text; payload fixtures here carry simple <p>/<br> markup.) */
  private[reddit] def htmlToText(html: String): String =
    html
      .replaceAll("(?i)<br\\s*/?>", "\n")
      .replaceAll("(?i)</p>|</div>|</li>", "\n")
      .replaceAll("<[^>]+>", "")
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&#39;", "'").replace("&quot;", "\"")

  /** F19: parse the self-text into the processed key→value map. */
  def parseSelfText(selftextHtml: String): Map[String, String] = {
    if (selftextHtml == null) return Map.empty
    var text = htmlToText(selftextHtml)
    text = text.replace("Ad Buyer Information and Related Data:", "")
    text = text.replace("Ad Duration:", "")
    text = text.replace("Subreddits:\n\n", "Subreddits:")
    text = text.replace("\nr/", ", r/")
    text = text.replace(":,", ":")
    text.linesIterator.flatMap { line =>
      if (line.contains(": ")) {
        val parts = line.split(": ", -1)
        var key = parts(0).toLowerCase
          .replace("-", "_").replace("/", "_").replace(" ", "_")
        key = key.filter(c => c.isLetter || c == '_')
        if (key.endsWith("_")) key = key.dropRight(1)
        val value = normalizeDate(parts(1))
        if (key.nonEmpty) Some(key -> value) else None
      } else None
    }.toMap
  }

  val parseSelfTextUdf = udf(parseSelfText _)

  def parse_selftext(c: Column): Column = parseSelfTextUdf(c)

  /** Reddit ad envelope: obj + processed map + context. */
  def adDocs(submissions: DataFrame, runTs: Column): DataFrame =
    submissions.select(
      col("id").as("doc_id"),
      struct(submissions.columns.map(col): _*).as("obj"),
      parse_selftext(col("selftext_html")).as("processed"),
      struct(runTs.as("last_indexed")).as("context"))
}
