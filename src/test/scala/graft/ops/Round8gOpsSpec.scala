package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Hand-traced pins for T221-T225 (emb_mrl_recall, dq_kanon,
  * dedup_blocking_eval, dedup_fellegi, text_watermark). Each trace is
  * small enough to verify on paper: the MRL corpus separates prefix
  * ranks from full-width ranks with exact-cosine ties, the linkage
  * traces use a single exact-duplicate truth pair, and the watermark
  * pins replay the md5 green rule on two literal bigrams. */
class Round8gOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("emb_mrl_recall: prefix-tied decoys displace 5 of the true top-20") {
    val d = Files.createTempDirectory("mrl").toString
    // query (vec 0) = e1. Decoys 1-5: e1 plus mass on dims 33-64 so the
    // full-width cosine collapses (1/sqrt(3201)) while every prefix
    // cosine stays exactly 1.0. Good vectors 6-25: e1 exactly. At
    // k<64 all 25 candidates tie at cos 1.0 -> vec_id cut keeps 1-20
    // (5 decoys + good 6-20); ground truth (k=64) is good 6-25.
    val rows = (0L to 25L).map { id =>
      val v = Array.fill(64)(0.0f)
      v(0) = 1.0f
      if (id >= 1 && id <= 5) (32 until 64).foreach(i => v(i) = 10.0f)
      (id, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val got = SimOps.embMrlRecall(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((8, 15L, 0.75), (16, 15L, 0.75),
      (32, 15L, 0.75), (64, 20L, 1.0)))
  }

  test("dq_kanon: 3-row class and a singleton under the QI tuple") {
    val d = Files.createTempDirectory("kanon").toString
    // rows 1-3 share (nation 1, 'B', band 1); row 4 is alone with a
    // NEGATIVE balance -> floor(-500/1000) = band -1 (floor, not trunc)
    Seq((1L, "a", 1, 1500.0, "B"), (2L, "b", 1, 1800.0, "B"),
      (3L, "c", 1, 1999.0, "B"), (4L, "d", 2, -500.0, "A"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    val got = Profiling.dqKanon(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 1L, 1L, 0.25), (3L, 1L, 3L, 0.75)))
  }

  private def linkageDocs(dir: String): Unit =
    // docs 1,2: identical 3-token text -> identical shingle set ->
    // jaccard 1.0 -> the single truth pair. doc 3: disjoint shingles.
    Seq((1L, "alpha beta gamma", "en", "s1", 10L),
      (2L, "alpha beta gamma", "en", "s2", 10L),
      (3L, "delta epsilon zeta xi", "fr", "s1", 250L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

  test("dedup_blocking_eval: completeness 1/1/0, reduction 2/3") {
    val d = Files.createTempDirectory("blockeval").toString
    linkageDocs(d)
    val got = DedupOps.dedupBlockingEval(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Double]),
        r.getDouble(6)))
    // each scheme blocks {pair, singleton}: 1 candidate of C(3,2)=3
    // total pairs -> reduction 1 - 1/3; the truth pair agrees on lang
    // (en=en) and len_band (0=0) but not source (s1 vs s2)
    assert(got.toSeq == Seq(
      ("lang", 2L, 1L, 1L, 1L, Some(1.0), 0.666667),
      ("len_band", 2L, 1L, 1L, 1L, Some(1.0), 0.666667),
      ("source", 2L, 1L, 1L, 0L, Some(0.0), 0.666667)))
  }

  test("dedup_fellegi: m/u off the single truth pair, guarded ln") {
    val d = Files.createTempDirectory("fellegi").toString
    linkageDocs(d)
    val got = DedupOps.dedupFellegi(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        r.getDouble(5), Option(r.get(6)).map(_.asInstanceOf[Double])))
    // lang/len_band: the only all-pairs agreeing pair IS the truth pair
    // -> u = 0/2 and ln(m/u) guards to null; source: truth disagrees
    // (m = 0 -> null weight) while the {1,3} s1 pair gives u = 1/2
    assert(got.toSeq == Seq(
      ("lang", 1L, 1L, 1L, Some(1.0), 0.0, None),
      ("len_band", 1L, 1L, 1L, Some(1.0), 0.0, None),
      ("source", 1L, 0L, 1L, Some(0.0), 0.5, None)))
  }

  test("text_watermark: md5 green rule and z on literal bigrams") {
    val d = Files.createTempDirectory("wm").toString
    // md5('alpha|beta') starts '2' (green); md5('a|b') starts 'd'
    // (red); md5('b|a') starts '0' (green). doc 1: T=1, g=1 ->
    // z = (2-1)/sqrt(1) = 1. doc 3 'a b a b a': bigrams ab,ba,ab,ba ->
    // T=4, g=2 -> z = 0. doc 2 has no bigram -> excluded.
    Seq((1L, "alpha beta", "en", "s1", 10L),
      (2L, "x", "en", "s1", 1L),
      (3L, "a b a b a", "en", "s1", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.textWatermark(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 1L, 1L, 1.0), (3L, 4L, 2L, 0.0)))
  }
}
