package graft.functions

/** HTML/markup MAIN-CONTENT extraction — the trafilatura/readability
  * stage every web-scale text pipeline runs before any quality gate
  * applies. The reference does this work out-of-engine (bs4 tag
  * stripping in `reddit_ingest_get_ads/main.py:44-71`; the vendored
  * newspaper library's whole purpose for `news/articles/`); here it is
  * a first-class scan operator: one stateless left-to-right pass per
  * document, no shuffle, no driver work.
  *
  * The scanner is a real state machine, not a regex pile:
  *  - `<!-- -->` comments are skipped wholesale (tags inside them are
  *    never tokenized);
  *  - `<script>`/`<style>` are RAW-TEXT elements — their bodies are
  *    skipped to the matching case-insensitive close tag, so a
  *    literal `"</div>"` inside a script string cannot terminate the
  *    element (the classic naive-stripper bug);
  *  - tag scanning honors quoted attribute values, so `>` inside an
  *    attribute does not end the tag;
  *  - text nodes decode the common named entities plus numeric
  *    `&#NN;`/`&#xHH;` forms; a malformed entity stays literal
  *    (lenient, like every production parser);
  *  - unclosed comments/raw-text elements swallow the remainder
  *    (fail-soft: a truncated page yields its parsed prefix).
  *
  * BLOCK segmentation and the content heuristic follow Kohlschütter,
  * Fankhauser & Nejdl, "Boilerplate Detection using Shallow Text
  * Features" (WSDM 2010), in its published shallow form: block-level
  * tags flush text blocks; a block is MAIN CONTENT iff it has >= 4
  * words and link density <= 1/3 (3·linkChars <= chars, integer
  * exact) — navigation bars and footers are link-dense short blocks,
  * body paragraphs are word-dense link-sparse ones. Deterministic by
  * construction: same bytes, same blocks, same verdicts.
  */
object HtmlExtract {

  /** One text block with its shallow features. `linkChars` counts the
    * characters that were inside an `<a>` element; `links` counts the
    * `<a>` openings attributed to this block. */
  final case class Block(text: String, words: Int, linkChars: Int,
      links: Int)

  /** Extraction result: kept-block texts joined by '\n' plus the
    * boilerplate ledger a dataset-card funnel wants. */
  final case class Result(content: String, keptBlocks: Int,
      droppedBlocks: Int, droppedLinks: Int)

  private val blockTags: Set[String] = Set(
    "html", "head", "body", "title", "p", "div", "h1", "h2", "h3",
    "h4", "h5", "h6", "ul", "ol", "li", "table", "tr", "td", "th",
    "br", "hr", "blockquote", "pre", "article", "section", "header",
    "footer", "nav", "aside", "form", "meta", "link")

  private val rawTextTags: Set[String] = Set("script", "style")

  private val namedEntities: Map[String, Int] = Map(
    "amp" -> '&'.toInt, "lt" -> '<'.toInt, "gt" -> '>'.toInt,
    "quot" -> '"'.toInt, "apos" -> '\''.toInt, "nbsp" -> 0xA0,
    "copy" -> 0xA9)

  /** Words = maximal runs of non-[space TAB LF CR] characters — the
    * exact class the SQL oracle mirrors with
    * `string_split_regex(text, '[ \t\n\r]+')`. */
  private[graft] def countWords(t: String): Int = {
    var words = 0; var inWord = false; var i = 0
    while (i < t.length) {
      val ws = t.charAt(i) == ' ' || t.charAt(i) == '\t' ||
        t.charAt(i) == '\n' || t.charAt(i) == '\r'
      if (!ws && !inWord) words += 1
      inWord = !ws
      i += 1
    }
    words
  }

  /** A numeric reference is emittable only if it is a real scalar
    * value: in Unicode range, not a lone surrogate — anything else
    * (e.g. `&#x110000;`) stays literal, upholding the fail-soft
    * contract (appendCodePoint would THROW on it otherwise). */
  private def validCp(cp: Int): Boolean =
    cp >= 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)

  /** Decode the entity starting at `i` (which holds '&'). Returns
    * (codepoint, indexAfter), or (-1, _) meaning "not an entity —
    * keep the '&' literal". */
  private def decodeEntity(s: String, i: Int): (Int, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return (-1, i + 1)
    val body = s.substring(i + 1, semi)
    if (body.startsWith("#x") || body.startsWith("#X")) {
      val hex = body.substring(2)
      if (hex.nonEmpty && hex.forall(c => Character.digit(c, 16) >= 0))
        try {
          val cp = Integer.parseInt(hex, 16)
          if (validCp(cp)) (cp, semi + 1) else (-1, i + 1)
        } catch { case _: NumberFormatException => (-1, i + 1) }
      else (-1, i + 1)
    } else if (body.startsWith("#")) {
      val dec = body.substring(1)
      if (dec.nonEmpty && dec.forall(_.isDigit))
        try {
          val cp = Integer.parseInt(dec, 10)
          if (validCp(cp)) (cp, semi + 1) else (-1, i + 1)
        } catch { case _: NumberFormatException => (-1, i + 1) }
      else (-1, i + 1)
    } else namedEntities.get(body) match {
      case Some(cp) => (cp, semi + 1)
      case None     => (-1, i + 1)
    }
  }

  /** The one-pass scanner: html → text blocks with shallow features.
    * Whitespace-only blocks (the inter-tag glue) are never emitted. */
  def parseBlocks(html: String): Vector[Block] = {
    val blocks = Vector.newBuilder[Block]
    val sb = new java.lang.StringBuilder
    var linkChars = 0
    var links = 0
    var linkDepth = 0
    var i = 0
    val n = html.length
    def emit(cp: Int): Unit = {
      val before = sb.length()
      sb.appendCodePoint(cp)
      if (linkDepth > 0) linkChars += sb.length() - before
    }
    def flush(): Unit = {
      val t = sb.toString
      // ONE whitespace class everywhere: a block is emitted iff it has
      // at least one word under the SAME [ \t\n\r] split the word
      // counter and the SQL oracle use — a wider Java-isWhitespace
      // emptiness test here would disagree with the oracle about
      // whether a U+000B-only block exists
      val wc = countWords(t)
      if (wc > 0) blocks += Block(t, wc, linkChars, links)
      sb.setLength(0); linkChars = 0; links = 0
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter ||
            html.charAt(i + 1) == '/' || html.charAt(i + 1) == '!')) {
          val closing = html.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && html.charAt(j).isLetterOrDigit) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // scan to the tag's real '>' — quoted attribute values may
          // contain one
          var q: Char = 0
          while (j < n && (q != 0 || html.charAt(j) != '>')) {
            val cj = html.charAt(j)
            if (q != 0) { if (cj == q) q = 0 }
            else if (cj == '"' || cj == '\'') q = cj
            j += 1
          }
          val tagEnd = if (j < n) j + 1 else n
          if (!closing && rawTextTags.contains(name)) {
            // raw-text element: skip to the matching close tag,
            // case-insensitively; "</div>" inside cannot end it
            var k = tagEnd
            var found = -1
            val probe = "</" + name
            while (found < 0 && k + probe.length <= n) {
              // the name must END here: "</scriptfoo>" inside a script
              // body is content, not the close tag — require '>', '/',
              // whitespace, or end-of-input after the matched name
              val after = k + probe.length
              val nameEnds = after >= n || {
                val c = html.charAt(after)
                c == '>' || c == '/' || c == ' ' || c == '\t' ||
                  c == '\n' || c == '\r' || c == '\f'
              }
              if (nameEnds &&
                  html.regionMatches(true, k, probe, 0, probe.length))
                found = k
              else k += 1
            }
            if (found < 0) i = n
            else {
              val gt = html.indexOf('>', found)
              i = if (gt < 0) n else gt + 1
            }
          } else {
            if (blockTags.contains(name)) flush()
            else if (name == "a") {
              if (closing) { if (linkDepth > 0) linkDepth -= 1 }
              else { linkDepth += 1; links += 1 }
            }
            i = tagEnd
          }
        } else { emit('<'.toInt); i += 1 }
      } else if (c == '&') {
        val (cp, next) = decodeEntity(html, i)
        if (cp >= 0) { emit(cp); i = next }
        else { emit('&'.toInt); i += 1 }
      } else {
        emit(c.toInt); i += 1
      }
    }
    flush()
    blocks.result()
  }

  /** The published shallow content rule: word-dense, link-sparse. */
  def isContent(b: Block): Boolean =
    b.words >= 4 && b.linkChars * 3 <= b.text.length

  /** Extract main content: kept blocks joined by '\n' + the ledger. */
  def extract(html: String): Result = {
    val bs = parseBlocks(html)
    val (kept, dropped) = bs.partition(isContent)
    Result(kept.map(_.text).mkString("\n"), kept.length, dropped.length,
      dropped.map(_.links).sum)
  }
}
