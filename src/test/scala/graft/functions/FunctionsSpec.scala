package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class NamesSpec extends AnyFunSuite {
  import Names._

  test("uppercase + period strip") {
    assert(processName("john q. smith") == "JOHN Q SMITH")
  }
  test("LLC/INC comma fix") {
    assert(processName("ACME, LLC") == "ACME LLC")
    assert(processName("Widgets, Inc") == "WIDGETS INC")
  }
  test("LAST, FIRST flip") {
    assert(processName("SMITH, JOHN") == "JOHN SMITH")
  }
  test("LAST, FIRST with generation suffix keeps suffix at end") {
    assert(processName("SMITH, JOHN JR") == "JOHN SMITH JR")
    assert(processName("DOE, JANE III") == "JANE DOE III")
    assert(processName("ROE, RICHARD IV") == "RICHARD ROE IV")
  }
  test("single trailing title stripped per pass, three passes") {
    assert(processName("JOHN SMITH MD PHD") == "JOHN SMITH")
    // three titles all gone after the 3 up-front passes
    assert(processName("JOHN SMITH ESQ MD PHD") == "JOHN SMITH")
  }
  test("titles inside the flip are stripped from both parts") {
    assert(processName("SMITH MD, JOHN DR") == "JOHN SMITH")
  }
  test("leading DR stripped once at the end") {
    assert(processName("DR JOHN SMITH") == "JOHN SMITH")
  }
  test("(RET) and military titles") {
    assert(processName("JOHN SMITH (RET)") == "JOHN SMITH")
    assert(processName("JOHN SMITH USAF") == "JOHN SMITH")
  }
  test("null-safe") {
    assert(processName(null) == null)
  }
  test("idempotent on already-clean names") {
    val clean = Seq("JOHN SMITH", "ACME LLC", "JANE DOE II")
    clean.foreach(n => assert(processName(n) == n))
  }
}

class ZipsSpec extends AnyFunSuite {
  import Zips._

  test("pads to 5") { assert(cleanZip("123") == "00123") }
  test("empty/null/zero to empty") {
    assert(cleanZip("") == "")
    assert(cleanZip(null) == "")
    assert(cleanZip("0") == "")
    assert(cleanZip("00000") == "")
  }
  test("9-digit zip passes through") {
    assert(cleanZip("941101234") == "941101234")
  }
  test("strips leading zeros then re-pads (int round-trip)") {
    assert(cleanZip("00123") == "00123")
  }
  test("non-numeric padded as-is") {
    assert(cleanZip("AB1") == "00AB1")
  }
}

class UrlsSpec extends AnyFunSuite {
  import Urls._

  test("strip scheme + www") {
    assert(stripUrl("https://www.example.com/a/b") == "example.com/a/b")
    assert(stripUrl("http://example.com/a") == "example.com/a")
  }
  test("drop args and fragment") {
    assert(stripUrl("https://example.com/a?x=1&y=2#frag") == "example.com/a")
  }
  test("youtube keeps v arg only") {
    assert(stripUrl("https://www.youtube.com/watch?v=abc123&t=5s") ==
      "youtube.com/watch?v=abc123")
  }
  test("get_domain drops path and www") {
    assert(getDomain("example.com/a/b") == "example.com")
    assert(getDomain("www.example.com/a") == "example.com")
  }
  test("parse_proxy strips wrapper") {
    assert(parseProxy("http://proxy?key=k&url=https://target.com/x") ==
      "https://target.com/x")
    assert(parseProxy("https://plain.com") == "https://plain.com")
  }
}

class SimHashSpec extends AnyFunSuite {
  import SimHash._

  test("deterministic") {
    val t = "The quick brown fox jumps over the lazy dog"
    assert(simhash64(t) == simhash64(t))
  }
  test("small edits keep hamming distance small; different text far") {
    val a = simhash64("The quick brown fox jumps over the lazy dog")
    val b = simhash64("The quick brown fox jumped over the lazy dog")
    val c = simhash64("Completely unrelated content about tax policy")
    assert(hammingDistance(a, b) < 16)
    assert(hammingDistance(a, c) > hammingDistance(a, b))
  }
  test("null is 0") { assert(simhash64(null) == 0L) }
}

class MinHashSpec extends AnyFunSuite {
  import MinHash._

  test("signature deterministic, fixed length") {
    val s1 = signature("a b c d e f g")
    val s2 = signature("a b c d e f g")
    assert(s1.toSeq == s2.toSeq)
    assert(s1.length == 64)
  }
  test("identical texts have estJaccard 1") {
    val s = signature("one two three four five six")
    assert(estJaccard(s.toIndexedSeq, s.toIndexedSeq) == 1.0)
  }
  test("est tracks exact jaccard within tolerance") {
    val t1 = "the cat sat on the mat and looked at the dog"
    val t2 = "the cat sat on the mat and looked at the bird"
    val est = estJaccard(signature(t1).toIndexedSeq, signature(t2).toIndexedSeq)
    val exact = exactJaccard(t1, t2)
    assert(math.abs(est - exact) < 0.3)
  }
  test("band keys: equal signatures share all bands") {
    val s = signature("x y z w v u t s")
    assert(bandKeys(s, 16).toSeq == bandKeys(s, 16).toSeq)
    assert(bandKeys(s, 16).length == 16)
  }
  test("exact jaccard bounds (property)") {
    val prop = Prop.forAll(Gen.alphaStr, Gen.alphaStr) { (a, b) =>
      val j = exactJaccard(a, b)
      j >= 0.0 && j <= 1.0
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}

class VectorsSpec extends AnyFunSuite {
  import Vectors._

  test("cosine of identical vectors is 1") {
    val v = Seq(1.0f, 2.0f, 3.0f)
    assert(math.abs(cosine(v, v) - 1.0) < 1e-12)
  }
  test("cosine of orthogonal vectors is 0") {
    assert(cosine(Seq(1f, 0f), Seq(0f, 1f)) == 0.0)
  }
  test("zero vector cosine is 0") {
    assert(cosine(Seq(0f, 0f), Seq(1f, 1f)) == 0.0)
  }
  test("hyperplane sketch: similar vectors closer than dissimilar") {
    val a = Array.tabulate(64)(i => math.sin(i).toFloat)
    val b = a.map(x => x + 0.01f)
    val c = a.map(x => -x)
    val sa = hyperplaneSketch(a.toIndexedSeq, 32, 42)
    val sb = hyperplaneSketch(b.toIndexedSeq, 32, 42)
    val sc = hyperplaneSketch(c.toIndexedSeq, 32, 42)
    val near = java.lang.Long.bitCount(sa ^ sb)
    val far = java.lang.Long.bitCount(sa ^ sc)
    assert(near < far)
    assert(far == 32) // antipodal flips every sign bit
  }
}

class TextAnalysisSpec extends AnyFunSuite {
  import TextAnalysis._

  test("language detection: script-based") {
    assert(detectLanguage("这是一个中文句子，包含很多汉字内容") == "zh")
    assert(detectLanguage("Это предложение на русском языке") == "ru")
  }
  test("language detection: stopword-based latin") {
    assert(detectLanguage("the cat and the dog are in the house") == "en")
    assert(detectLanguage("el gato y la casa de los perros en una calle") == "es")
    assert(detectLanguage("der Hund und die Katze ist nicht mit ein Haus") == "de")
  }
  test("unknown text is und") {
    assert(detectLanguage("") == "und")
    assert(detectLanguage("xyzzy qwfp zxcv") == "und")
  }
  test("rolling hash deterministic, whitespace-normalized") {
    assert(rollingHash64("a  b\tc") == rollingHash64("a b c"))
    assert(rollingHash64("abc") != rollingHash64("abd"))
  }
}
