package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Semantic ranking properties of the BM25 retrieval operator on an
  * injected fixture (the catalog row proves engine-vs-oracle
  * agreement; this proves the scoring means what it claims). */
class TextSearchSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("bm25").toString
    Seq(
      // all four query terms, short doc → strongest match
      (1L, "stream window fast query"),
      // one query term diluted in a long doc
      (2L, "stream " + Seq.fill(60)("filler").mkString(" ")),
      // term repetition saturates (k1), not linearly
      (3L, "query query query query query query query query"),
      // no query terms at all
      (4L, "completely unrelated words about campaign finance records"),
      // 'query' appears in MANY docs below → lower idf than 'stream'
      (5L, "query things"),
      (6L, "query stuff"),
      (7L, "query words"),
      (8L, "stream only"))
      .map { case (id, t) => (id, t, "en", "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("bm25 ranks multi-term short docs first and drops no-match docs") {
    val rows = TextOps.textSearchBm25(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25"))
    val scores = rows.toMap
    // the all-terms doc wins
    assert(rows.head._1 == 1L)
    // no-match doc is excluded entirely
    assert(!scores.contains(4L))
    // scores strictly ordered in the output
    rows.sliding(2).foreach { case Array((ia, a), (ib, b)) =>
      assert(a > b || (a == b && ia < ib))
    }
    // saturation: 8 repetitions of one term score less than 8x one hit
    assert(scores(3L) < 8 * scores(5L))
    // idf: the rare term ('stream', df=3) outscores the common term
    // ('query', df=5) at equal tf and comparable doc length
    assert(scores(8L) > scores(7L))
  }
}
