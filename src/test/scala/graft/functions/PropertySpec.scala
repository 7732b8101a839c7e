package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property suites for the identity-defining functions
  * (SURVEY §5 item 1): process_name drives Donor node identity,
  * clean_zip drives Zip identity — structural invariants must hold on
  * arbitrary inputs, not just the curated cases. */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaUpperChar).map(_.mkString)

  test("process_name: no-comma clean names are stable under reapplication") {
    // simple "FIRST LAST" forms (no commas, no titles) must pass through
    val simpleName = for {
      a <- word.suchThat(w => !Names.processName(s"X $w").endsWith(" "))
      b <- word
    } yield s"$a $b"
    check(Prop.forAll(simpleName) { n =>
      val once = Names.processName(n)
      Names.processName(once) == once
    })
  }

  test("process_name: output never retains a comma-flip form") {
    val flip = for { a <- word; b <- word } yield s"$a, $b"
    check(Prop.forAll(flip) { n =>
      !Names.processName(n).contains(",")
    })
  }

  test("process_name: uppercase and period-free") {
    val messy = Gen.listOfN(3, Gen.oneOf(word, Gen.const("a.b.c")))
      .map(_.mkString(" "))
    check(Prop.forAll(messy) { n =>
      val out = Names.processName(n)
      out == out.toUpperCase && !out.contains(".")
    })
  }

  test("clean_zip: result is empty or at least 5 chars, digits for numeric input") {
    check(Prop.forAll(Gen.chooseNum(0L, 9999999999L)) { z =>
      val out = Zips.cleanZip(z.toString)
      if (z == 0L) out == ""
      else out.length >= 5 && out.forall(_.isDigit) &&
        out.toLong == z // zero-padding never changes the value
    })
  }

  test("clean_zip: leading-zero inputs round-trip through int parse") {
    check(Prop.forAll(Gen.chooseNum(1L, 99999L)) { z =>
      val padded = ("0" * 3) + z.toString
      Zips.cleanZip(padded) == Zips.cleanZip(z.toString)
    })
  }

  test("simhash: identical text yields identical hash; hamming is a metric-ish") {
    val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    check(Prop.forAll(text) { t =>
      SimHash.simhash64(t) == SimHash.simhash64(t)
    })
    check(Prop.forAll(text, text) { (a, b) =>
      val d = SimHash.hammingDistance(SimHash.simhash64(a), SimHash.simhash64(b))
      d >= 0 && d <= 64 &&
        (a != b || d == 0)
    })
  }

  test("minhash: estJaccard of identical signatures is 1, bounded otherwise") {
    val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    check(Prop.forAll(text, text) { (a, b) =>
      val sa = MinHash.signature(a).toIndexedSeq
      val sb = MinHash.signature(b).toIndexedSeq
      val est = MinHash.estJaccard(sa, sb)
      est >= 0.0 && est <= 1.0 && MinHash.estJaccard(sa, sa) == 1.0
    })
  }

  // arbitrary unicode (incl. supplementary-plane chars the UTF8String
  // round-trip could mangle)
  // valid-UTF-16 fragments only (Spark stores valid UTF-8; an unpaired
  // surrogate would be lossily transcoded at the UTF8String boundary
  // and the comparison would test the transcoder, not the sketch)
  private val anyText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("é"),
    Gen.const("ß"), Gen.const("中"), Gen.const("\t"),
    Gen.choose(' ', '~').map(_.toString),
    Gen.const("𝕏"))).map(_.mkString) // 𝕏 as a proper pair

  test("native sketch expressions match the Scala functions across the UTF8String boundary") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.expressions.{MinHashBandKeys, SimHash64}
    check(Prop.forAll(anyText) { s =>
      SimHash64.compute(UTF8String.fromString(s)) == SimHash.simhash64(s)
    })
    check(Prop.forAll(anyText) { s =>
      MinHashBandKeys.compute(UTF8String.fromString(s), 64, 16)
        .toLongArray().toSeq ==
        MinHash.bandKeys(MinHash.signature(s), 16).toSeq
    })
  }

  test("strip_accents is idempotent and fixes ASCII") {
    check(Prop.forAll(anyText) { s =>
      val once = TextAnalysis.stripAccents(s)
      TextAnalysis.stripAccents(once) == once
    })
    val ascii = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
    check(Prop.forAll(ascii) { s => TextAnalysis.stripAccents(s) == s })
  }

  test("rolling hash: whitespace-normalization invariance") {
    val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    check(Prop.forAll(text) { t =>
      TextAnalysis.rollingHash64(t) ==
        TextAnalysis.rollingHash64("  " + t.replace(" ", "   ") + " ")
    })
  }
}
