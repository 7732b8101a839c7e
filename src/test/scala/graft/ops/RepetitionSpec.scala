package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Semantic properties of the within-doc repetition signals and the
  * corpus-wide duplicated-passage coverage on injected fixtures (the
  * synthetic corpus has no within-doc repetition — dup5_frac is 0.0
  * across all 500 docs — so the catalog rows alone can't prove the
  * positive cases). */
class RepetitionSpec extends SparkFunSuite {
  import spark.implicits._

  private val shared =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  private lazy val dir: String = {
    val d = Files.createTempDirectory("repspec").toString
    Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "hi"),
      (4L, ""),
      (10L, s"unique1 unique2 $shared"),           // shared 10-token passage
      (11L, s"x1 x2 x3 $shared"),                  // same passage, other host
      (12L, "entirely fresh words never repeated anywhere in this corpus today"),
      (13L, "entirely fresh words never repeated anywhere in this corpus today"))
      .map { case (id, t) => (id, t, "en", "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def repRow(id: Long) =
    TextOps.textRepetition(spark, dir).filter($"doc_id" === id).head()

  test("a one-word-spam doc maxes every repetition signal") {
    val r = repRow(1L)
    assert(r.getAs[Long]("n_tokens") == 10L)
    assert(r.getAs[Double]("top2_frac") == 1.0) // all 9 bigrams identical
    assert(r.getAs[Double]("top3_frac") == 1.0)
    assert(r.getAs[Double]("dup5_frac") == 1.0) // every 5-gram repeats
  }

  test("an all-distinct doc has uniform top fractions and no dup 5-grams") {
    val r = repRow(2L)
    assert(r.getAs[Double]("top2_frac") == 0.111111) // 1 of 9
    assert(r.getAs[Double]("top3_frac") == 0.125)    // 1 of 8
    assert(r.getAs[Double]("dup5_frac") == 0.0)
  }

  test("docs shorter than the gram width score 0.0, not null") {
    for (id <- Seq(3L, 4L)) {
      val r = repRow(id)
      assert(r.getAs[Double]("top2_frac") == 0.0)
      assert(r.getAs[Double]("dup5_frac") == 0.0)
    }
    assert(repRow(4L).getAs[Long]("n_tokens") == 0L)
  }

  test("char entropy: 0 for one-symbol docs, log2(n) for uniform docs") {
    val rows = TextOps.textEntropy(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("char_entropy"))
      .toMap
    // doc 4 is empty -> 0.0 by convention
    assert(rows(4L) == 0.0)
    // "hi" = two distinct chars, uniform -> exactly 1 bit
    assert(rows(3L) == 1.0)
    // spam doc: dominated by one word -> entropy well below doc 2's
    // all-distinct wording
    assert(rows(1L) < rows(2L))
    assert(rows.values.forall(e => e >= 0.0 && e <= 8.0))
  }

  test("filter_funnel stages are monotone and count the fixture exactly") {
    val rows = TextOps.filterFunnel(spark, dir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(rows("total") == 8L)
    assert(rows("nonempty") == 7L) // doc 4 is empty
    // every stage retains no more than the previous one
    val ordered = TextOps.filterFunnel(spark, dir).collect()
      .sortBy(_.getAs[Int]("stage_idx")).map(_.getAs[Long]("n_docs"))
    assert(ordered.zip(ordered.tail).forall { case (a, b) => b <= a })
    // all fixture docs are under the 20-token floor
    assert(rows("token_range") == 0L && rows("exact_unique") == 0L)
  }

  test("accent folding matches the ICU behavior on real diacritics") {
    import graft.functions.TextAnalysis
    assert(TextAnalysis.stripAccents("café Ünïcödé naïve") == "cafe Unicode naive")
    assert(TextAnalysis.stripAccents("São Paulo, Ångström") == "Sao Paulo, Angstrom")
    assert(TextAnalysis.stripAccents(null) == null)
    assert(TextAnalysis.stripAccents("plain ascii") == "plain ascii")
  }

  test("dedup_semantic prunes the higher id of an identical vector pair") {
    val d = Files.createTempDirectory("semded").toString
    // identical vectors tie on every centroid similarity, so they land
    // in the same IVF cell no matter which sampled vectors become
    // centroids — the one fixture shape robust to the md5 sample
    // 24-dim one-hot fillers: every non-dup pair is exactly orthogonal,
    // so the only τ-similar pair in ANY cell is the duplicate pair
    def oneHot(dim: Int): Array[Float] =
      Array.tabulate(24)(j => if (j == dim) 1f else 0f)
    val dup = Array.tabulate(24)(j =>
      if (j == 21) 0.6f else if (j == 22) 0.8f else 0f)
    val emb = Seq(100L -> dup, 101L -> dup, 102L -> oneHot(20)) ++
      (1L to 17L).map(i => i -> oneHot(i.toInt - 1))
    emb.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val rows = DedupOps.dedupSemantic(spark, d).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("keep")).toMap
    assert(rows(100L) == 1 && rows(101L) == 0) // lower id survives
    assert(rows(102L) == 1)                    // singleton cell untouched
    assert(rows.size == 20 && rows.values.sum >= 18)
  }

  test("dedup_substr covers exactly the cross-doc shared passage") {
    val rows = DedupOps.dedupSubstr(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dup_tokens"), r.getAs[Double]("dup_frac"))).toMap
    // the 10-token shared run is covered in both hosts; the unique
    // prefixes are not (their 8-grams mix unique + shared tokens)
    assert(rows(10L) == (10L, 0.833333)) // 10 of 12
    assert(rows(11L) == (10L, 0.769231)) // 10 of 13
    // exact copies cover everything; spam self-repetition too (its
    // 8-grams all collide with each other)
    assert(rows(12L)._2 == 1.0 && rows(13L)._2 == 1.0)
    assert(rows(1L)._2 == 1.0)
    // all-distinct docs and short docs are never flagged
    assert(rows(2L) == (0L, 0.0))
    assert(rows(3L) == (0L, 0.0))
    assert(rows(4L) == (0L, 0.0))
  }

  test("dedup_substr_clean removes exactly the shared passage") {
    val clean = DedupOps.dedupSubstrClean(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text"))
      .toMap
    assert(clean(10L) == "unique1 unique2") // shared tail excised
    assert(clean(11L) == "x1 x2 x3")
    assert(clean(12L) == "" && clean(13L) == "") // exact copies vanish
    assert(clean(2L) == "one two three four five six seven eight nine ten")
    assert(clean(1L) == "") // self-repeating spam fully covered
  }
}
