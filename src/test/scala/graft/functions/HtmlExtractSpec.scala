package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The HTML main-content extractor's scanner contract: hostile markup
  * classes a naive regex stripper gets wrong, the entity decoder, and
  * the Kohlschütter link-density block rule — all pure-function, no
  * Spark session needed. */
class HtmlExtractSpec extends AnyFunSuite {
  import HtmlExtract._

  test("tags strip, entities decode, text survives verbatim") {
    val r = extract("<p>Fish &amp; chips cost &lt;5 &#x20AC; or &#163;</p>")
    assert(r.content == "Fish & chips cost <5 € or £")
    assert(r.keptBlocks == 1 && r.droppedBlocks == 0)
  }

  test("a script string containing '</div>' does not end the script " +
    "(raw-text element semantics)") {
    val html = "<div><script>var x = \"</div>\"; if (1 < 2) y();" +
      "</script>real words appear here after</div>"
    val r = extract(html)
    assert(r.content == "real words appear here after")
  }

  test("'</scriptfoo>' inside a script body does not end the raw-text " +
    "element — the close-tag name must END at '>', '/', or whitespace") {
    val html = "<div><script>register('</scriptfoo>');" +
      "</script>words that survive the script body</div>"
    assert(extract(html).content == "words that survive the script body")
    // and the legitimate close still works with attributes/whitespace
    val html2 = "<script>x('</scriptnope>')</script\t >kept tail words here"
    assert(extract(html2).content == "kept tail words here")
  }

  test("style bodies and comments are skipped wholesale, even when " +
    "they contain tag-like text") {
    val html = "<style>p > a {color:red}</style>" +
      "<!-- a comment with <p>fake tags</p> inside -->" +
      "<p>only this paragraph of text remains</p>"
    assert(extract(html).content == "only this paragraph of text remains")
  }

  test("a '>' inside a quoted attribute does not end the tag") {
    val html = "<p title=\"a > b\" data-x='1>0'>the attribute stayed " +
      "inside its tag</p>"
    assert(extract(html).content == "the attribute stayed inside its tag")
  }

  test("unclosed comment / script swallow the remainder (fail-soft), " +
    "unknown entities and bare & stay literal") {
    assert(extract("<p>kept text present here</p><!-- never closed " +
      "<p>gone</p>").content == "kept text present here")
    assert(extract("<p>kept text present here</p><script>never closed")
      .content == "kept text present here")
    val r = extract("<p>AT&T and &bogus; and 1 &lt 2 stay literal</p>")
    assert(r.content == "AT&T and &bogus; and 1 &lt 2 stay literal")
  }

  test("case-insensitive tags; <BR/> splits blocks; whitespace-only " +
    "blocks are never emitted") {
    val bs = parseBlocks("<P>first half of the text<BR/>second half " +
      "of the text</P>  \n  <DIV></DIV>")
    assert(bs.length == 2)
    assert(bs(0).text == "first half of the text")
    assert(bs(1).text == "second half of the text")
  }

  test("Kohlschuetter rule: link-dense nav drops, word-dense paragraph " +
    "with an inline link keeps") {
    val html = "<div><a href='/'>Home</a> <a href='/a'>About</a> " +
      "<a href='/b'>Contact</a></div>" +
      "<p>This long sentence keeps its inline <a href='x'>link</a> " +
      "because the block is word dense.</p>"
    val r = extract(html)
    assert(r.content == "This long sentence keeps its inline link " +
      "because the block is word dense.")
    assert(r.droppedBlocks == 1 && r.droppedLinks == 3)
    assert(r.keptBlocks == 1)
  }

  test("short blocks (titles, footers) drop on the 4-word floor") {
    val r = extract("<title>Doc 42</title><p>three words only</p>" +
      "<p>but this one has five words</p>")
    assert(r.content == "but this one has five words")
    assert(r.droppedBlocks == 2)
  }

  test("nested links and unbalanced closes stay sane") {
    val bs = parseBlocks("<p><a href='/'>outer <a href='/i'>inner</a> " +
      "tail</a> free text of the block</p></a>")
    assert(bs.length == 1)
    assert(bs(0).links == 2)
    assert(bs(0).text == "outer inner tail free text of the block")
    // link chars = everything inside the <a> spans
    assert(bs(0).linkChars == "outer inner tail".length)
  }

  test("word counting matches the oracle's [ \\t\\n\\r]+ split class") {
    assert(countWords("a b\tc\nd\re") == 5)
    assert(countWords("  leading and trailing  ") == 3)
    assert(countWords("") == 0)
    assert(countWords(" \t\n ") == 0)
  }
}
