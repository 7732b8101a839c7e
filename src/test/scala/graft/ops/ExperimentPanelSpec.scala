package graft.ops

import graft.SparkFunSuite
import graft.functions.TextAnalysis
import java.nio.file.Files

/** Hand-traced pins for the experiment / fingerprint / PCA additions:
  * the A/B z-test panel, winnowing's selection guarantees, and power
  * iteration recovering a planted principal axis exactly. */
class ExperimentPanelSpec extends SparkFunSuite {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  test("ev_abtest: 0.5 vs 1.0 conversion hand-traced z") {
    val d = Files.createTempDirectory("ab").toString
    // control (even ids): user 2 converts (14 purchases), user 4 none;
    // treatment (odd): users 1 and 3 both convert
    def purchases(u: Long, n: Int) =
      (0 until n).map(i => (u * 1000 + i, t0, u, "purchase", 1.0))
    val rows = purchases(2L, 14) ++ purchases(1L, 14) ++ purchases(3L, 14) ++
      Seq((9000L, t0, 4L, "view", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = StatsOps.evAbtest(spark, d).collect().head
    // rates: control 1/2, treat 2/2; pool 3/4
    // z = 0.5 / sqrt(0.75·0.25·(1/2+1/2)) = 0.5/0.433013 = 1.154701
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 1L, 0.5)))
    assert((r.getLong(3), r.getLong(4), r.getDouble(5)) == ((2L, 2L, 1.0)))
    assert(r.getDouble(6) == 1.154701 && r.getInt(7) == 0)
  }

  test("winnowStats: edge shapes and the global-min guarantee") {
    // empty → nothing
    assert(TextAnalysis.winnowStats("") ==
      TextAnalysis.WinnowStats(0, 0, None, None))
    assert(TextAnalysis.winnowStats(null) ==
      TextAnalysis.WinnowStats(0, 0, None, None))
    // < k tokens → one whole-text gram, selected as-is
    val short = TextAnalysis.winnowStats("alpha beta gamma")
    assert(short.nGrams == 1 && short.nFp == 1 &&
      short.fpMin == short.fpMax)
    // 8 tokens → 4 grams = exactly one window → one fingerprint
    val one = TextAnalysis.winnowStats("a b c d e f g h")
    assert(one.nGrams == 4 && one.nFp == 1)
    // 10 tokens → 6 grams, 3 windows; the globally minimal gram hash
    // is inside every text's some window → fpMin is the gram-set min
    def gramHash(g: String): Long = {
      var h = 1125899906842597L
      g.foreach(c => h = 31 * h + c)
      h
    }
    val toks = "one two three four five six seven eight nine ten".split(" ")
    val grams = (0 to 5).map(i => gramHash(toks.slice(i, i + 5).mkString(" ")))
    val w = TextAnalysis.winnowStats(toks.mkString(" "))
    assert(w.nGrams == 6 && w.fpMin == Some(grams.min))
    assert(w.nFp >= 1 && w.nFp <= 3)
  }

  test("winnowStats: shared long run ⇒ shared window minima (MOSS guarantee)") {
    // both docs contain the same 12-token run; with k=5, w=4 any match
    // of ≥ k+w−1 = 8 tokens must surface in both fingerprint ranges
    val run = "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    val a = TextAnalysis.winnowStats(run)
    val b = TextAnalysis.winnowStats("prefix1 prefix2 " + run)
    // a's fingerprints are minima over the shared run's grams — its
    // global min gram hash appears in b's selected range too
    assert(a.fpMin.get >= b.fpMin.get && a.fpMax.get <= Long.MaxValue)
  }

  test("dedup_winnow: an 8-token shared run forces a candidate pair") {
    val d = Files.createTempDirectory("dwin").toString
    val run = "zeta eta theta iota kappa lambda mu nu" // k+w−1 = 8 tokens
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon $run"),
      (2L, s"$run omicron pi rho sigma tau upsilon"),
      (3L, "completely different words about sparks and plans and joins"))
    docs.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = DedupOps.dedupWinnow(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 1L))
    assert(!got.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("w04_ranks: tie semantics — gaps in rank, none in dense_rank") {
    val d = Files.createTempDirectory("w04").toString
    // one sampled order (key 97) with quantities 5,5,3
    (Seq((97L, 1, 5.0), (97L, 2, 5.0), (97L, 3, 3.0))
      : Seq[(Long, Int, Double)])
      .toDF("l_orderkey", "l_linenumber", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")
    val got = CoreRelational.w04Ranks(spark, d).collect()
      .map(r => r.getInt(1) -> ((r.getInt(3), r.getInt(4),
        r.getDouble(5), r.getDouble(6), r.getInt(7))))
      .toMap
    // ties at rank 1; the 3.0 row ranks 3 (gap) but dense-ranks 2
    assert(got(1) == ((1, 1, 0.0, 0.666667, 1)))
    assert(got(2) == ((1, 1, 0.0, 0.666667, 2)))
    assert(got(3) == ((3, 2, 1.0, 1.0, 3)))
  }

  test("text_textrank: symmetric pair sits at the 1/2 fixed point; hub dominates a star") {
    val d = Files.createTempDirectory("trank").toString
    Seq((1L, "alpha beta")).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val sym = TextOps.textTextrank(spark, d).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // 2-node symmetric graph: r = 0.15/2 + 0.85·r ⇒ r = 0.5 exactly
    assert(sym == Map("alpha" -> 0.5, "beta" -> 0.5))

    val d2 = Files.createTempDirectory("trank2").toString
    Seq((1L, "hub alpha"), (2L, "hub beta"), (3L, "hub gamma"))
      .toDF("doc_id", "text").write.parquet(s"$d2/documents.parquet")
    val star = TextOps.textTextrank(spark, d2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(star.head._1 == "hub" && star.head._2 == 3L)
    assert(star.tail.forall(t => t._3 < star.head._3 && t._2 == 1L))
  }

  test("ann_recall: probing every IVF cell makes recall@20 exactly 1") {
    // an exhaustive probe degenerates IVF to brute force — the recall
    // panel must report a perfect score (and its k bookkeeping holds)
    val prev = spark.conf.getOption("spark.graft.ann.nprobe")
    spark.conf.set("spark.graft.ann.nprobe", "16") // = default nlist
    try {
      val r = SimOps.annRecall(spark, graft.SparkTestBase.sfDir).collect().head
      assert(r.getLong(0) == 20L && r.getLong(1) == 20L &&
        r.getDouble(2) == 1.0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.ann.nprobe", v)
        case None    => spark.conf.unset("spark.graft.ann.nprobe")
      }
    }
  }

  test("emb_pca recovers a planted axis: loading e₀, eigenvalue 2") {
    val d = Files.createTempDirectory("pca").toString
    def vec(i0: Float, i1: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(0) = i0; a(1) = i1; a
    }
    val rows = Seq(
      (1L, vec(2f, 0f), 0), (2L, vec(-2f, 0f), 0),
      (3L, vec(0f, 1f), 0), (4L, vec(0f, -1f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val got = SimOps.embPca(spark, d).collect()
    assert(got.length == 64)
    val byDim = got.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // covariance diag(2, 0.5, 0…): top axis e₀ with λ=2, sign positive
    assert(byDim(1) == 1.0 && byDim(2) == 0.0)
    assert((3 to 64).forall(byDim(_) == 0.0))
    assert(got.head.getDouble(2) == 2.0)
  }
}
