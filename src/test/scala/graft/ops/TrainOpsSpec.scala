package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Semantic properties of the training-pipeline composition operators
  * on an injected fixture (the catalog rows prove engine-vs-oracle
  * agreement; this proves the operators mean what they claim). */
class TrainOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("trainops").toString
    val docs = Seq(
      // doc_id % 97 == 0 → held-out eval slice (0 and 97)
      (0L, "zeroth evaluation document completely distinct wording", "en"),
      (97L, "unique benchmark shingle sequence held out for eval", "en"),
      // 5 copies the benchmark phrasing → contaminated
      (5L, "training doc leaking the unique benchmark shingle sequence", "en"),
      (1L, "the quick brown fox jumps over one lazy dog", "en"),
      (2L, "the quick brown fox jumps over two lazy dogs", "en"),
      (3L, "a slow green turtle walks under three tall trees", "en"),
      (4L, "rain falls on the gray roof during four long nights", "en"),
      (6L, "children play near the old stone bridge at noon", "en"),
      (20L, "the the the the the the the the", "en"),
      (21L, "xylophone quixotic zygote jabberwock vermillion obelisk", "en"),
      (11L, "el perro corre por la plaza cada manana", "es"),
      (12L, "la casa blanca tiene dos puertas grandes", "es"),
      (13L, "un gato negro duerme sobre la mesa vieja", "es"))
      .map { case (id, t, l) => (id, t, l, "fix", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val emb = Seq(
      (1L, Array(1f, 0.01f, 0f, 0f), 0), (2L, Array(0.98f, 0f, 0.02f, 0f), 0),
      (3L, Array(1f, 0f, 0.01f, 0.01f), 0), (4L, Array(0.97f, 0.02f, 0f, 0f), 0),
      (6L, Array(-1f, 0.01f, 0f, 0f), 0), // label-0 outlier
      (7L, Array(0f, 1f, 0.01f, 0f), 1), (8L, Array(0.02f, 0.99f, 0f, 0f), 1),
      (9L, Array(0f, 1f, 0f, 0.02f), 1), (10L, Array(0.01f, 0.98f, 0.01f, 0f), 1),
      (12L, Array(0f, -1f, 0f, 0.01f), 1)) // label-1 outlier
    emb.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("pack_chunks conserves the token stream and packs contiguously") {
    val packed = TrainOps.packChunks(spark, dir).collect()
    val total = packed.map(_.getAs[Long]("n_tokens")).sum
    // offsets tile [0, total) with no gap or overlap, in doc_id order
    var expectedOff = 0L
    packed.foreach { r =>
      assert(r.getAs[Long]("start_off") == expectedOff)
      expectedOff += r.getAs[Long]("n_tokens")
    }
    assert(expectedOff == total)
    packed.foreach { r =>
      assert(r.getAs[Long]("chunk_first") == r.getAs[Long]("start_off") / 512)
      assert(r.getAs[Int]("n_chunks") >= 1)
    }
  }

  test("pack_windows tiles each doc with stride-96 width-128 spans") {
    val d2 = Files.createTempDirectory("trainops_win").toString
    // "aaaa " repeated: each "aaaa" is exactly one \w{1,4} token
    Seq((1L, Seq.fill(200)("aaaa").mkString(" "), "en", "fix", 999L),
        (2L, "aaaa aaaa", "en", "fix", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val got = TrainOps.packWindows(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1 (200 toks): starts 0/96/192 → lens 128/104/8; doc 2: one span
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 128L), (1L, 1L, 96L, 104L), (1L, 2L, 192L, 8L),
      (2L, 0L, 0L, 2L)))
    // overlap contract: consecutive windows share 128-96=32 tokens
    val d1 = got.filter(_._1 == 1L)
    assert(d1.zip(d1.tail).forall { case (a, b) => a._3 + 128 - b._3 == 32 })
  }

  test("pack_manifest conserves per-doc tokens and fills interior chunks") {
    val packed = TrainOps.packChunks(spark, dir)
    val manifest = TrainOps.packManifest(spark, dir)
    // each doc's manifest slices sum back to its token count
    val byDoc = manifest.groupBy("doc_id")
      .agg(sum("n_tok_in_chunk").as("m"))
      .join(packed.select("doc_id", "n_tokens"), "doc_id")
    assert(byDoc.filter($"m" =!= $"n_tokens").count() == 0)
    // every chunk except the last carries exactly the budget
    val lastChunk = manifest.agg(max("chunk_id")).head().getLong(0)
    val short = manifest.groupBy("chunk_id")
      .agg(sum("n_tok_in_chunk").as("filled"))
      .filter($"chunk_id" =!= lastChunk && $"filled" =!= 512)
    assert(short.count() == 0)
  }

  test("contamination flags the leaked doc and nothing else") {
    val out = TrainOps.textContaminated(spark, dir)
    val flagged = out.filter($"contaminated" === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(5L))
    // eval docs themselves are excluded from the scored set
    val scored = out.select("doc_id").as[Long].collect().toSet
    assert(!scored.contains(0L) && !scored.contains(97L))
  }

  test("stratified sample keeps ceil(20%) per stratum, deterministically") {
    val out = TrainOps.sampleStratified(spark, dir)
    val perLang = out.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(perLang("en") == 2) // ceil(10 * 0.2)
    assert(perLang("es") == 1) // ceil(3 * 0.2)
    val run1 = out.select("doc_id").as[Long].collect().toSortedSet
    val run2 = TrainOps.sampleStratified(spark, dir)
      .select("doc_id").as[Long].collect().toSortedSet
    assert(run1 == run2)
  }

  test("mix budget keeps a per-source prefix and never exceeds the cap") {
    val out = TrainOps.mixBudget(spark, dir).collect()
    // running totals stay within budget and are consistent per source
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("cum_tokens"))
      var run = 0L
      sorted.foreach { r =>
        run += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("cum_tokens") == run)
      }
      assert(run <= 1024)
    }
  }

  test("temperature mixing up-weights the small source vs proportional") {
    val d2 = Files.createTempDirectory("mixtemp").toString
    // big source: 40 docs of ~12 tokens; small source: 4 docs of same
    // shape — proportional sampling would give small ~9% of the mix,
    // sqrt temperature lifts it toward sqrt(4/40) ≈ 24%
    val docs = (1L to 40L).map(i =>
      (i, s"alpha beta gamma delta epsilon word$i tail tokens here now", "big")) ++
      (101L to 104L).map(i =>
        (i, s"omega psi chi phi upsilon word$i tail tokens here now", "small"))
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val out = TrainOps.mixTemperature(spark, d2).collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    val smallShare = bySrc.getOrElse("small", 0L).toDouble /
      (bySrc.values.sum.toDouble max 1.0)
    assert(smallShare > 0.15, s"small source share $smallShare not lifted")
    // budgets respected: cum_tokens never exceeds budget_tokens
    out.foreach { r =>
      assert(r.getAs[Long]("cum_tokens") <= r.getAs[Long]("budget_tokens"))
    }
    assert(out.nonEmpty)
  }

  test("corpus_keep assigns the first failing gate as the reason") {
    val d2 = Files.createTempDirectory("curation").toString
    val keepText = "the quick brown fox jumps over the lazy dog and then " +
      "the dog runs to the river bank in the morning light today"
    Seq(
      (1L, keepText, "en"),                                   // kept
      (20L, keepText, "en"),                                  // exact dup
      (21L, keepText.replace("quick", "swift"), "en"),        // near dup
      (30L, "el perro corre por la plaza cada manana y luego duerme", "es"),
      (40L, "the cat and the dog sat on the old mat", "en"),  // 10 words
      (50L, "", "en"),                                        // empty
      (60L, null, "en"),                                      // NULL text
      (70L, keepText.replace("fox", "wolf"), null))           // NULL lang
      .map { case (id, t, l) =>
        (id, t, l, "fix", Option(t).fold(0L)(_.length.toLong)) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val rows = TrainOps.corpusKeep(spark, d2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("keep"), r.getAs[String]("reason"))).toMap
    assert(rows(1L) == (1, "kept"))
    assert(rows(20L) == (0, "dup_exact")) // exact dup loses before near-dup
    assert(rows(21L) == (0, "near_dup"))
    assert(rows(30L) == (0, "lang"))
    assert(rows(40L) == (0, "length"))    // quality passes, token floor fails
    assert(rows(50L) == (0, "empty"))
    // NULL flags fold to a failed gate, never to NULL keep or 'kept'
    assert(rows(60L) == (0, "empty"))
    assert(rows(70L) == (0, "lang"))
  }

  test("bpe pair counts rank the dominant adjacent pair first") {
    val rows = TrainOps.bpePairs(spark, dir).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("n"))
    // descending by count, ties broken by pair string
    rows.zip(rows.tail).foreach { case ((pa, na), (pb, nb)) =>
      assert(na > nb || (na == nb && pa < pb))
    }
    // "the the the ..." spam doc (8 repeats) + "the quick" docs make
    // 'th'/'he' the dominant pairs of the fixture corpus
    assert(rows.take(3).map(_._1).toSet.intersect(Set("th", "he")).nonEmpty)
    rows.foreach { case (p, n) => assert(p.length == 2 && n >= 1) }
  }

  test("padded packing conserves tokens and pads only the last chunk") {
    val rows = TrainOps.packPadded(spark, dir).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val chunks = r.getAs[Int]("n_chunks")
      val pad = r.getAs[Long]("pad_tokens")
      assert(chunks == ((n + 511) / 512).toInt)
      assert(chunks.toLong * 512 == n + pad)
      assert(pad >= 0 && pad < 512) // never a whole wasted chunk
    }
  }

  test("eval split is ~80/10/10, deterministic, and id-keyed only") {
    val a = TrainOps.evalSplit(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val b = TrainOps.evalSplit(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a == b) // rerun-stable
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.6 && frac("train") < 0.95)
    assert(frac.getOrElse("val", 0.0) + frac.getOrElse("test", 0.0) < 0.4)
    // the same doc_id lands in the same split under a different corpus
    val big = TrainOps.evalSplit(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    a.keys.foreach { id => assert(big(id) == a(id)) }
  }

  test("two-level cumsum == monolithic per-source window on skewed random data") {
    // the scale rewrite must be EXACTLY the old semantics: compare
    // mix_budget's (source, __gid)-grouped running sum against a
    // directly-computed single-window reference on a seeded random
    // corpus with one dominant source (the skew the rewrite exists for)
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextAnalysis
    val rnd = new scala.util.Random(42)
    val d2 = Files.createTempDirectory("cum2l").toString
    (1L to 400L).map { i =>
      val src = if (rnd.nextInt(10) < 8) "web" else s"s${rnd.nextInt(3)}"
      val words = Seq.fill(1 + rnd.nextInt(30))(s"w${rnd.nextInt(50)}")
        .mkString(" ")
      (i, words, "en", src, words.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val got = TrainOps.mixBudget(spark, d2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = spark.read.parquet(s"$d2/documents.parquet")
      .select(col("doc_id"), col("source"),
        TextAnalysis.token_count_bpe(spark, col("text")).cast("bigint")
          .as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= 1024)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == ref)
    assert(got.nonEmpty && got.map(_._2).size >= 2)
  }

  test("importance sampling keeps iff the md5 fraction beats the quality") {
    val rows = TrainOps.sampleImportance(spark, dir).collect()
    rows.foreach { r =>
      val expect = if (r.getAs[Double]("u") < r.getAs[Double]("quality")) 1 else 0
      assert(r.getAs[Int]("keep") == expect)
      val u = r.getAs[Double]("u")
      assert(u >= 0.0 && u < 1.0)
    }
    // rerun-stable (no RNG)
    val again = TrainOps.sampleImportance(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("sample_weighted: exact k per source, two-level == direct single window") {
    val d = Files.createTempDirectory("wsample").toString
    (1 to 60).map(i =>
        (i.toLong, s"doc text $i", "en", s"src${i % 3}", (i * 37 % 500 + 20).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = TrainOps.sampleWeighted(spark, d).collect()
    // exact-size draw: 5 per source, ranks 1..5
    assert(out.groupBy(_.getString(0)).forall { case (_, rs) =>
      rs.length == 5 && rs.map(_.getInt(1)).sorted.toSeq == (1 to 5) })
    // two-level selection is exact: equals the direct per-source rank
    val mhex = md5(col("doc_id").cast("string"))
    val frac = conv(substring(mhex, 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0)
    val direct = spark.read.parquet(s"$d/documents.parquet")
      .withColumn("ex", round(-log(frac) / col("n_chars").cast("double"), 6))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("ex").asc, col("doc_id").asc)))
      .where(col("rank") <= 5)
      .select("source", "rank", "doc_id", "ex")
      .orderBy("source", "rank").collect()
    assert(out.toSeq == direct.toSeq)
  }

  test("ppl buckets are ordered head <= middle <= tail within a language") {
    val rows = TrainOps.textPplBuckets(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket"),
        r.getAs[Double]("avg_neg_logp")))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val by = rs.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
      for {
        h <- by.get("head"); t <- by.get("tail")
      } assert(h.max <= t.min)
      for {
        h <- by.get("head"); m <- by.get("middle")
      } assert(h.max <= m.min)
    }
  }

  test("shards tile the shuffled token stream contiguously") {
    val rows = TrainOps.packShards(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    // offsets tile [0, total) with no gap/overlap in md5-shuffle order
    val inOrder = rows.sortBy(_.getAs[Long]("start_off"))
    var expected = 0L
    inOrder.foreach { r =>
      assert(r.getAs[Long]("start_off") == expected)
      assert(r.getAs[Long]("shard_id") == r.getAs[Long]("start_off") / 2048)
      expected += r.getAs[Long]("n_tokens")
    }
    assert(expected == total)
    // and the shuffle order is NOT doc_id order (it's md5 order)
    val byDoc = rows.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("start_off"))
    assert(byDoc.toSeq != byDoc.sorted.toSeq)
  }

  test("cross-source dedup reports only pairs spanning two sources") {
    val d2 = Files.createTempDirectory("xsrc").toString
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "the dog runs to the river bank in the morning light today"
    Seq(
      (1L, base, "web"),
      (2L, base.replace("quick", "swift"), "books"), // near-dup, CROSS
      (3L, base.replace("quick", "rapid"), "web"),   // near-dup, same as 1
      (4L, "completely unrelated content about campaign finance records", "web"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val out = TrainOps.dedupCrossSource(spark, d2).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[String]("source_a"), r.getAs[String]("source_b")))
    assert(out.forall { case (_, _, a, b) => a != b })
    assert(out.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (2L, 3L)))
  }

  test("unigram LM scores common-token docs below rare-token docs") {
    val scores = TrainOps.textUnigramLm(spark, dir)
      .select("doc_id", "avg_neg_logp").as[(Long, Double)].collect().toMap
    assert(scores(20L) < scores(21L)) // "the the the…" ≪ rare-token soup
    scores.values.foreach(v => assert(v > 0))
  }

  test("embedding outliers rank the anti-centroid vector first per label") {
    val out = TrainOps.embOutliers(spark, dir)
    val rk1 = out.filter($"rk" === 1)
      .select("label", "vec_id").as[(Int, Long)].collect().toMap
    assert(rk1 == Map(0 -> 6L, 1 -> 12L))
    // outlier similarity is far below the in-cluster rank-2 value
    val sims = out.filter($"rk" <= 2)
      .select("label", "rk", "sim").as[(Int, Int, Double)].collect()
    sims.groupBy(_._1).foreach { case (_, rows) =>
      val byRk = rows.map(r => r._2 -> r._3).toMap
      assert(byRk(1) < 0 && byRk(2) > 0.9)
    }
  }

  test("pack_interleave: round-robin positions, sparse after exhaustion") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("ileave").toString
    (Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b")): Seq[(Long, String)])
      .toDF("doc_id", "source").write.parquet(s"$d/documents.parquet")
    val got = TrainOps.packInterleave(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    // s_ord: a=1, b=2; a's ranks 1..3 land on even positions 0,2,4;
    // b's single doc on position 1; position 3 goes unused (b exhausted)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 4L))
    assert(got.map(_._2).toSeq == Seq("a", "b", "a", "a"))
    assert(got.collect { case (_, "a", rk) => rk }.toSeq == Seq(1L, 2L, 3L))
  }

  private implicit class SortedSetOps(a: Array[Long]) {
    def toSortedSet: List[Long] = a.toList.sorted
  }
}
