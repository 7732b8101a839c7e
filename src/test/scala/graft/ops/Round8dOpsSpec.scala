package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Hand-traced / property pins for the T212–T215 additions: LOO k-NN
  * label accuracy, personalized PageRank, the greedy k-center coreset
  * and the vocabulary-coverage curve. */
class Round8dOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("emb_knn_acc: two orthogonal clusters vote with perfect purity") {
    // 20 vectors, 10 per orthogonal cluster → any 16-seed IVF split
    // keeps every cell cluster-pure (an A-vector's max-cos seed is
    // always an A-seed), so every evaluated vector is 3-NN-correct
    val d = Files.createTempDirectory("knnacc").toString
    val vecs =
      (1 to 10).map(i => (i.toLong, Seq(1.0f, 0.001f * i), 0)) ++
      (11 to 20).map(i => (i.toLong, Seq(0.001f * i, 1.0f), 1))
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val got = SimOps.embKnnAcc(spark, d).collect()
    assert(got.nonEmpty && got.length <= 2)
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"label ${r.getInt(0)}: eval ${r.getLong(1)} != correct ${r.getLong(2)}")
      assert(r.getDouble(3) == 1.0)
      assert(r.getLong(1) <= 10L)
    }
    assert(got.map(_.getLong(1)).sum >= 2L)
  }

  test("graph_ppr: hand-traced 3 rounds on the c1—s1—c2—s2 path") {
    // seeds {c1,c2,c3}; c3 is isolated and keeps exactly the teleport
    // mass. Traced: s1 .345224, s2 .149193, c2 .095156, c1 .077094
    val d = Files.createTempDirectory("ppr").toString
    Seq((1L, 1L), (2L, 2L), (3L, 2L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    Seq((1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    val got = GraphOps.graphPpr(spark, d).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    def near(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(near(got("s1"), 0.3452239583333333))
    assert(near(got("s2"), 0.1491927083333333))
    assert(near(got("c2"), 0.09515625))
    assert(near(got("c1"), 0.07709374999999999))
    assert(near(got("c3"), 0.049999999999999996))
    // ranks 1..5 in that order
    val byRk = GraphOps.graphPpr(spark, d).collect()
      .sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    assert(byRk == Seq("s1", "s2", "c2", "c1", "c3"))
  }

  test("sample_coreset: farthest-first picks the orthogonal vector, then covers") {
    // v1=[1,0], v2=[0,1], v3=[1,0] (dup). Round 1 must take v2 at
    // radius 1; after that every vector is exactly covered (radius 0)
    val d = Files.createTempDirectory("coreset").toString
    Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.0f, 1.0f), 1),
      (3L, Seq(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val got = TrainOps.sampleCoreset(spark, d).collect()
    assert(got.length == 8)
    assert(got(0).getInt(0) == 0 && got(0).getLong(1) == 1L
      && got(0).isNullAt(2))
    assert(got(1).getInt(0) == 1 && got(1).getLong(1) == 2L
      && got(1).getDouble(2) == 1.0)
    (2 until 8).foreach { i =>
      assert(got(i).getDouble(2) == 0.0) // corpus exactly covered
    }
  }

  test("text_ngram_coverage: top-100 cut splits a 151-type vocabulary") {
    // 'top' ×50 + 150 singletons: rank 1 = top(50), ranks 2..151 the
    // singletons tok-asc. V=100 → 100 types, 50+99 = 149 of 200 occ
    val d = Files.createTempDirectory("cov").toString
    val singles = (1 to 150).map(i => f"w$i%03d").mkString(" ")
    val text = (Seq.fill(50)("top") :+ singles).mkString(" ")
    Seq((1L, text, "en", "src", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.textNgramCoverage(spark, d).collect()
    assert(got.length == 3)
    val v100 = got(0)
    assert(v100.getInt(0) == 100 && v100.getLong(1) == 100L)
    assert(v100.getLong(2) == 149L && v100.getLong(3) == 151L
      && v100.getLong(4) == 200L)
    assert(v100.getDouble(5) == 0.745)
    assert(got(1).getDouble(5) == 1.0 && got(2).getDouble(5) == 1.0)
    assert(got(1).getLong(1) == 151L)
  }
}
