package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** URL normalizations (pure parts only — the reference's HEAD-follow
  * unshortener is I/O and stays out of the engine).
  *
  * Behavioral specs: `twitter_compute_load_graph/utilities.py:16-30`
  * (strip_url), `twitter_compute_extract_domains/main.py:24-28`
  * (get_domain), `news_articles_ingest_get_paper/main.py:45-48`
  * (parse_proxy), `news_sources_ingest_get_crawls/main.py:68-74`
  * (domain normalization).
  */
object Urls {

  /** strip_url: drop query args + fragment (keeping `v=` for YouTube
    * watch urls), then strip scheme and a leading `www.`. */
  def stripUrl(url: String): String = {
    if (url == null) return null
    var u = url
    val qIdx = u.indexOf('?')
    val fIdx = u.indexOf('#')
    val cut = (qIdx, fIdx) match {
      case (-1, -1) => u.length
      case (-1, f)  => f
      case (q, -1)  => q
      case (q, f)   => math.min(q, f)
    }
    if (u.contains("youtube.com/watch")) {
      // retain only the v= arg, as `furl.remove(args).add({'v': v})` does
      val base = u.substring(0, cut)
      val args = if (qIdx >= 0) {
        val end = if (fIdx > qIdx) fIdx else u.length
        u.substring(qIdx + 1, end)
      } else ""
      val v = args.split('&').find(_.startsWith("v=")).map(_.drop(2))
      u = v.fold(base)(vv => s"$base?v=$vv")
    } else {
      u = u.substring(0, cut)
    }
    if (u.contains("://www.")) u.split("://www\\.", 2)(1)
    else if (u.contains("://")) u.split("://", 2)(1)
    else u
  }

  /** get_domain: host portion of an already-stripped url, minus a
    * leading `www.`. */
  def getDomain(strippedUrl: String): String = {
    if (strippedUrl == null) return null
    val host = strippedUrl.split("/")(0)
    if (host.startsWith("www.")) host.replaceFirst("www\\.", "") else host
  }

  /** parse_proxy: recover the target url from a scraper-proxy wrapper. */
  def parseProxy(url: String): String = {
    if (url == null) return null
    val i = url.indexOf("&url=")
    if (i >= 0) url.substring(i + 5) else url
  }

  val stripUrlUdf = udf(stripUrl _)
  val getDomainUdf = udf(getDomain _)

  def strip_url(c: Column): Column = stripUrlUdf(c)

  /** Column form of get_domain with built-ins only (codegen'd). */
  def get_domain(c: Column): Column =
    regexp_replace(substring_index(c, "/", 1), "^www\\.", "")

  /** netloc-style domain normalization for source lists: lower, trim,
    * strip scheme/www, drop path, trailing `,segment` and leading dot. */
  def normalize_domain(c: Column): Column = {
    val lowered = lower(trim(c))
    val noScheme = regexp_replace(lowered, "^[a-z][a-z0-9+.-]*://", "")
    val host = substring_index(noScheme, "/", 1)
    val noWww = regexp_replace(host, "^www\\.", "")
    val noTrail = regexp_replace(noWww, ",[^,]*$", "")
    regexp_replace(noTrail, "^\\.", "")
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("strip_url", stripUrl _)
    spark.udf.register("get_domain", getDomain _)
    spark.udf.register("parse_proxy", parseProxy _)
  }
}
