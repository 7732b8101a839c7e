package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextAnalysis

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language ID, fingerprinting.
  *
  * Scale: all per-row map-side transforms — no shuffle at all except the
  * final presentation sort (dropped under count()); at 100 TB these run
  * scan-speed with full column pruning (only doc_id + text read).
  */
object TextOps {

  /** Whitespace + BPE-ish token counts (SQL-expressible → full oracle). */
  def textTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.token_count_ws(col("text")).as("n_tokens_ws"),
        TextAnalysis.token_count_bpe(s, col("text")).as("n_tokens_bpe"))
      .orderBy(col("doc_id"))

  /** Quality features + composite score. */
  def textQuality(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
    val withCols = TextAnalysis.qualityColumns(col("text"))
      .foldLeft(base) { case (df, (name, c)) => df.withColumn(name, c) }
    withCols
      .withColumn("quality", TextAnalysis.quality_score(col("text")))
      .select(col("doc_id"), col("n_words"), col("punct_ratio"),
        col("digit_ratio"), col("stop_ratio"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Trigram/stopword language ID; includes agreement flag against the
    * table's labeled lang. The scoring (stopword-hit counts, max score,
    * lexicographic tie-break, "und" fallbacks) is replicated in the
    * oracle SQL; the JVM fn additionally handles non-Latin scripts,
    * which the corpus (all-ASCII) never exercises. */
  def textLangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        TextAnalysis.detect_language(col("text")).as("detected_lang"))
      .withColumn("agrees",
        (col("labeled_lang") === col("detected_lang")).cast("int"))
      .orderBy(col("doc_id"))

  /** Exact md5 fingerprint (SQL-expressible → full oracle). */
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.fingerprint_md5(col("text")).as("fp_md5"))
      .orderBy(col("doc_id"))

  /** 64-bit rolling-hash fingerprint; the oracle replays the same
    * 31·h+c polynomial in 128-bit arithmetic mod 2^64. */
  def textFingerprintRoll(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.fingerprint_rolling(col("text")).as("fp_roll"))
      .orderBy(col("doc_id"))

  /** PII scan + redaction (the training-data scrub stage): per-doc
    * match counts for emails / US phone numbers / SSNs and the
    * redacted text. Patterns are deliberately RE2-safe (no lookaround,
    * no backrefs) so Java and the SQL oracle agree byte-for-byte; the
    * synthetic corpus contains no PII (all counts 0, redacted ≡ text
    * — still hash-verified), and PiiSpec proves detection/redaction on
    * injected fixtures. Narrow map transform — scan-speed at 100 TB. */
  def textPii(s: SparkSession, d: String): DataFrame = {
    val doc = Tables.documents(s, d)
    TextAnalysis.piiColumns(col("text"))
      .foldLeft(doc.select(col("doc_id"), col("text"))) {
        case (df, (name, c)) => df.withColumn(name, c) }
      .withColumn("has_pii", TextAnalysis.pii_flag)
      .drop("text")
      .orderBy(col("doc_id"))
  }

  /** Within-doc repetition signals (the Gopher/MassiveText gates):
    * fraction of bigram/trigram occurrences claimed by the most
    * frequent one, and the fraction of 5-gram occurrences that are
    * repeats. Pure higher-order array expressions — narrow map, no
    * shuffle; at 100 TB this is scan-speed beside the other quality
    * gates. */
  def textRepetition(s: SparkSession, d: String): DataFrame = {
    import TextAnalysis.wordGrams
    import graft.functions.expressions.GramStats
    // grams materialize as their own projection step (HOF subtrees are
    // excluded from subexpression elimination); the per-gram-width
    // occurrence statistics then come from the native single-pass
    // GramStats expression — one hash-count per row instead of the
    // O(distinct × length) HOF count array (identical integer values;
    // TextCountingSpec proves equivalence and the superlinear win)
    def frac(num: Column, grams: Column): Column =
      when(size(grams) === 0, lit(0.0)).otherwise(
        round(num.cast("double") / size(grams).cast("double"), 6))
    Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.wordTokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        wordGrams(col("toks"), 2).as("g2"),
        wordGrams(col("toks"), 3).as("g3"),
        wordGrams(col("toks"), 5).as("g5"))
      .select(col("doc_id"), col("toks"), col("g2"), col("g3"), col("g5"),
        GramStats.gram_stats(s, col("g2")).as("s2"),
        GramStats.gram_stats(s, col("g3")).as("s3"),
        GramStats.gram_stats(s, col("g5")).as("s5"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        frac(col("s2.max_count"), col("g2")).as("top2_frac"),
        frac(col("s3.max_count"), col("g3")).as("top3_frac"),
        frac(col("s5.dup_occ"), col("g5")).as("dup5_frac"))
      .orderBy(col("doc_id"))
  }

  /** Canonical text forms every downstream stage keys on: whitespace-
    * collapsed (exact dedup), lowercase alphanumeric (shingling), and
    * accent-folded (matching/joins). Narrow map; the only non-builtin
    * is the Unicode fold, and the corpus being ASCII means the oracle
    * hash-checks the plumbing while FunctionsSpec proves the fold on
    * real diacritics. */
  def textNormalize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.norm_ws(col("text")).as("norm_ws"),
        TextAnalysis.norm_alnum(col("text")).as("norm_alnum"),
        TextAnalysis.strip_accents(lower(
          TextAnalysis.norm_ws(col("text")))).as("norm_ascii"))
      .orderBy(col("doc_id"))

  /** The cumulative stage flags s2..s5 + content fingerprint — shared
    * by the batch funnel and the streaming intake
    * ([[graft.streaming.FunnelIntake]]), so both paths gate with
    * literally the same expressions. */
  def funnelFlags(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.token_count_ws(col("text"))
    val s2 = length(trim(col("text"))) > 0
    val s3 = s2 && col("lang") === "en"
    val s4 = s3 && TextAnalysis.quality_score(col("text")) >= 0.2
    val s5 = s4 && toks.between(20, 5000)
    docs
      .withColumn("s2", s2).withColumn("s3", s3)
      .withColumn("s4", s4).withColumn("s5", s5)
      .withColumn("fp", TextAnalysis.fingerprint_md5(col("text")))
  }

  /** The dataset-card funnel: one pass computes every doc's cumulative
    * survival through the standard pre-training gates (nonempty →
    * target language → quality ≥ 0.2 → token bounds → exact-unique),
    * then ONE hash-agg folds the flags into per-stage counts and an
    * unpivot presents them as rows. Zero per-stage scans: at 100 TB
    * this costs a single corpus read + a window on the fingerprint
    * (needed only for the final dedup stage). */
  def filterFunnel(s: SparkSession, d: String): DataFrame =
    funnelStageTable(funnelFlags(Tables.documents(s, d)), Seq(
      "nonempty" -> "s2", "lang_en" -> "s3", "quality" -> "s4",
      "token_range" -> "s5", "exact_unique" -> "s6"))

  /** The END-TO-END crawl-to-corpus funnel — the composition the
    * reference actually runs (fetch → bs4/newspaper extraction →
    * cleanup → gates) as ONE catalog row: each doc's text wraps into
    * the deterministic page skeleton ([[htmlWrap]]), the REAL
    * extractor ([[graft.functions.HtmlExtract]]) recovers the main
    * content from markup, [[mojibakeRepair]] runs the ftfy cleanup,
    * and the recovered text flows through the SAME cumulative gates
    * as [[filterFunnel]] (the funnelFlags expressions, shared — not
    * copies) plus the exact-dedup tail. The dataset card gains one
    * leading stage: `extracted` (the main block survived the
    * boilerplate rule and came back verbatim); a doc the extractor
    * loses has empty recovered text and fails every later gate, so an
    * extraction bug shows up as a retention shift the oracle (which
    * replays the stages from the raw text + the wc >= 4 keep rule)
    * catches. One mapPartitions scan + the one funnel aggregate: the
    * full raw-crawl → training-corpus path costs one corpus read. */
  def crawlFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val raw = Tables.spread(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
    val recovered = raw.mapPartitions { it =>
      it.map { case (id, lang, t) =>
        val r = graft.functions.HtmlExtract.extract(htmlWrap(id, t))
        (id, lang, mojibakeRepair(r.content), r.keptBlocks == 1)
      }
    }.toDF("doc_id", "lang", "text", "extracted")
    funnelStageTable(funnelFlags(recovered), Seq(
      "extracted" -> "extracted", "nonempty" -> "s2", "lang_en" -> "s3",
      "quality" -> "s4", "token_range" -> "s5", "exact_unique" -> "s6"))
  }

  /** The ONE stage-table presenter behind [[filterFunnel]] and
    * [[crawlFunnel]] (a dedup-rule or presentation fix lands once):
    * derives the exact-unique tail (survivor-min per fingerprint),
    * folds the cumulative flags in one hash-agg (coalesce: a zero-row
    * corpus must report 0 per stage, not NULL), and unpivots into the
    * dataset-card rows. `stages` lists (name, flag column) AFTER the
    * implicit leading `total`; the "s6" name resolves to the derived
    * dedup column. */
  private def funnelStageTable(flagged: DataFrame,
      stages: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val minSurvivor = min(when(col("s5"), col("doc_id")))
      .over(Window.partitionBy(col("fp")))
    val withS6 = flagged.withColumn("s6",
      col("s5") && col("doc_id") === minSurvivor)
    val aggs = stages.zipWithIndex.map { case ((_, c), i) =>
      coalesce(sum(col(c).cast("long")), lit(0L)).as(s"c${i + 1}")
    }
    val counts = withS6.agg(count(lit(1)).as("c0"), aggs: _*)
    val structs =
      struct(lit(1).as("stage_idx"), lit("total").as("stage"),
        col("c0").as("n_docs")) +:
        stages.zipWithIndex.map { case ((nm, _), i) =>
          struct(lit(i + 2).as("stage_idx"), lit(nm).as("stage"),
            col(s"c${i + 1}").as("n_docs"))
        }
    counts.select(explode(array(structs: _*)).as("r"), col("c0"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.n_docs"),
        round(col("r.n_docs").cast("double") /
          greatest(col("c0"), lit(1L)).cast("double"), 6)
          .as("retained_frac"))
      .orderBy(col("stage_idx"))
  }

  /** The shared tokenized-corpus artifact (round-10 ask #3): one
    * (source, doc_id, token-array) table, localCheckpoint'd once per
    * (session, dataset) and read by FIVE consumers —
    * [[textSearchBm25]], [[textTopTerms]], [[textPmi]], [[textRake]],
    * [[textTextrank]] — that each previously re-ran the identical
    * `filter(split(lower(text)))` scan+tokenize over the full corpus
    * (the lmScores/cdcChunkTable discipline). The tokenize is the
    * dominant per-query cost of the keyword/collocation suite, so
    * paying it once is a ~4x cut on a quiet host; the checkpoint
    * also truncates lineage for textrank's iterative consumer. At
    * 100 TB this is the "tokenize once, derive many" layout every
    * training pipeline writes to disk — here it lives as checkpointed
    * blocks keyed by the live session. */
  private val tokCorpusCache = new graft.SessionCache[DataFrame](df => {
    df.unpersist(); ()
  })

  private[graft] def tokCorpus(s: SparkSession, d: String): DataFrame =
    tokCorpusCache.getOrCompute(s, "tok|" + d) {
      val docs = Tables.spread(Tables.documents(s, d))
      // minimal fixtures (unit specs) carry only (doc_id, text); the
      // artifact keeps a fixed 3-column schema either way so every
      // consumer sees one shape
      val src =
        if (docs.columns.contains("source")) col("source")
        else lit(null).cast("string").as("source")
      docs.select(src, col("doc_id"), expr(
          "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')")
          .as("ts"))
        .localCheckpoint()
    }

  /** Character-level Shannon entropy (the gibberish/low-information
    * gate: natural text sits ~4.0-4.5 bits, single-char spam near 0,
    * uniform noise near log2(alphabet)). Same narrow higher-order
    * array idiom as the repetition gates — distinct chars × chars per
    * row, no shuffle. */
  def textEntropy(s: SparkSession, d: String): DataFrame = {
    // native single-pass expression (sort + run-scan per row) replaying
    // the HOF form's exact arithmetic — ascending-char fold order, the
    // (c/n)·log2(c/n) term shape — so the oracle's sorted left fold
    // still hash-matches; TextCountingSpec proves bit-equivalence
    // against the HOF formula and the superlinear win on long docs
    import graft.functions.expressions.CharEntropy
    Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        round(CharEntropy.char_entropy(s, col("text")), 6)
          .as("char_entropy"))
      .orderBy(col("doc_id"))
  }

  /** BM25-scored full-text retrieval — the ranked `match` query of the
    * reference's document stores, as pure relational algebra: one
    * tokenize+aggregate pass builds per-doc term frequencies and
    * lengths, a 1-row corpus stat table (N, avgdl, per-term df)
    * broadcasts, and the Okapi BM25 score (k1=1.2, b=0.75) is a fixed
    * per-row expression — scan + one hash agg at 100 TB, top-k via
    * TakeOrdered. Cross-engine FP: the oracle mirrors the exact
    * expression tree (same association order), the 4 term scores add
    * in fixed order, and the presentation sorts on the ROUNDED score.
    * (A deployment parameterizes the query terms; the catalog entry
    * pins a fixed query so the oracle replays it.) */
  def textSearchBm25(s: SparkSession, d: String): DataFrame = {
    val qterms = Seq("stream", "window", "fast", "query")
    val k1 = 1.2
    val b = 0.75
    val toks = tokCorpus(s, d).select(col("doc_id"),
      explode(col("ts")).as("tok"))
    val perDoc = toks.groupBy("doc_id").agg(
      count(lit(1)).as("dl"),
      qterms.map(t =>
        sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"tf_$t")): _*)
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl") +:
        qterms.map(t =>
          sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t")): _*)
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"df_$t").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
      // lit(2.2), NOT lit(k1 + 1): the Scala sum 1.2+1.0 can differ
      // from the parsed literal 2.2 in the last ulp, and the oracle
      // parses "2.2"
      idf * (tf * lit(2.2)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col("dl").cast("double") / col("avgdl")))
    }
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"),
        round(qterms.map(termScore).reduce(_ + _), 6).as("bm25"))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
  }

  /** Per-source characteristic vocabulary: TF-IDF with each SOURCE as
    * the "document" (the dataset-card "what does this feed talk about"
    * panel, and the vocabulary-drift monitor between crawls). One
    * corpus-scale tokenize+hash-agg collapses to (source, term)
    * counts; everything after runs on VOCABULARY-sized tables (distinct
    * terms × sources — orders of magnitude below corpus scale at
    * 100 TB), so the per-source top-k window is cheap and the 1-row
    * source-count table broadcasts. idf = ln(n_sources/df) naturally
    * zeroes out terms present in every feed (stopwords need no list).
    * Rank is taken over the ROUNDED score with a term tiebreak so both
    * engines order identically. */
  def textTopTerms(s: SparkSession, d: String): DataFrame = {
    val toks = tokCorpus(s, d).select(col("source"),
      explode(col("ts")).as("tok"))
    val tf = toks.groupBy("source", "tok").agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nSrc = tf.select(countDistinct(col("source")).as("n_src"))
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc, col("tok").asc)
    tf.join(dfTab, "tok").crossJoin(broadcast(nSrc))
      .withColumn("score", round(col("tf").cast("double") *
        log(col("n_src").cast("double") / col("df").cast("double")), 6))
      .filter(col("score") > 0)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("source"), col("rk"), col("tok"), col("score"))
      .orderBy(col("source"), col("rk"))
  }

  /** Token-pair PMI (pointwise mutual information) over per-document
    * co-occurrence — the collocation/phrase-mining signal ("new york"
    * scores high, "the of" scores ~0). Document frequencies come from
    * one tokenize+hash-agg pass (df ≥ 25 prunes the vocabulary; at
    * 100 TB cap it to a deterministic top-V by df). Pairs are then
    * generated NARROWLY — each doc's sorted distinct-token array is
    * intersected with the broadcast vocab array and expanded in-row to
    * its ordered pairs by a nested-transform HOF — so there is no
    * corpus self-join on doc_id anywhere: the only pair-side shuffle
    * is the map-side-combined aggregate on the ≤|vocab|² key space.
    * df_a/df_b re-attach to the AGGREGATED pair table (vocab-sized)
    * by broadcast joins; the 1-row doc count broadcasts. Ordering is
    * on the ROUNDED pmi with a pair tiebreak, as in text_topterms. */
  def textPmi(s: SparkSession, d: String): DataFrame = {
    val dfTab = tokCorpus(s, d).select(
        explode(array_distinct(col("ts"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 25)
    val vocab = dfTab.agg(sort_array(collect_list(col("tok"))).as("vocab"))
    val nDocs = tokCorpus(s, d)
      .select(countDistinct(col("doc_id")).as("n_docs"))
    val pairs = tokCorpus(s, d)
      .select(sort_array(array_distinct(col("ts"))).as("ts"))
      .crossJoin(broadcast(vocab))
      // sorted ∩ vocab keeps first-arg (ascending) order, so the
      // nested expansion below emits each unordered pair once, a < b
      .select(expr("array_intersect(ts, vocab)").as("tv"))
      .select(explode(expr(
        "flatten(transform(tv, (x, i) ->" +
          " transform(slice(tv, i + 2, size(tv))," +
          " y -> struct(x AS tok_a, y AS tok_b))))")).as("p"))
      .select(col("p.tok_a"), col("p.tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("co_df"))
      .filter(col("co_df") >= 10)
    pairs
      .join(broadcast(dfTab.select(col("tok").as("tok_a"),
        col("df").as("df_a"))), "tok_a")
      .join(broadcast(dfTab.select(col("tok").as("tok_b"),
        col("df").as("df_b"))), "tok_b")
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("co_df"),
        round(log(col("co_df").cast("double") * col("n_docs").cast("double")
          / (col("df_a").cast("double") * col("df_b").cast("double"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("tok_a").asc, col("tok_b").asc)
      .limit(50)
  }

  /** Heavy-hitter vocabulary: every token with frequency ≥ 1% of the
    * corpus (the "what dominates this feed" monitor, and the stopword
    * discovery pass a tokenizer-training pipeline runs first).
    *
    * Two-pass sketch-then-verify, the [[graft.ops.DedupOps]] LSH
    * contract applied to frequency: pass 1 folds the token stream
    * into a k=200-entry Misra–Gries summary
    * ([[graft.functions.expressions.MisraGries]]) whose buffer is
    * O(k) at every stage — no shuffle ever carries the full
    * vocabulary, unlike a groupBy-all-tokens + HAVING plan whose
    * exchange is vocabulary-sized. Pass 2 recounts ONLY the ≤k
    * broadcast candidates exactly (shuffle keyspace ≤ k) and applies
    * the exact threshold. MG guarantees every token above n/(k+1) ≈
    * 0.5% survives the sketch regardless of merge order, so the 1%
    * threshold makes the final output deterministic and the sketch's
    * merge-order nondeterminism unobservable — which is what lets a
    * DuckDB oracle (plain GROUP BY + HAVING ground truth) hash-match
    * a sketch-driven plan. */
  def textHeavyHitters(s: SparkSession, d: String): DataFrame = {
    import graft.functions.expressions.MisraGries
    val toks = Tables.documents(s, d).select(
      explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"))
        .as("tok"))
    val cands = toks
      .agg(MisraGries.mg_native(s, col("tok")).as("cands"))
      .select(explode(col("cands")).as("tok"))
    val n = toks.agg(count(lit(1)).as("n_toks"))
    toks.join(broadcast(cands), Seq("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt").cast("double") >=
        col("n_toks").cast("double") * lit(0.01))
      .select(col("tok"), col("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
  }

  /** Zipf-law fit per source: OLS slope/intercept of ln(count) over
    * ln(rank) for the top-50 tokens — the corpus-health diagnostic
    * (natural text slopes ≈ −1; template/boilerplate corpora flatten,
    * spam steepens), a standard pre-training distribution check.
    *
    * Determinism: ranks come from exact integer counts with a (count
    * DESC, token ASC) total order; the four OLS sums fold over the
    * rank-sorted 50-row list (both engines: ascending-rank
    * seed-from-first fold), and slope/intercept are a fixed double
    * expression tree over those sums — try_divide/CASE NULL on a
    * degenerate single-point fit. round(…,6) grid-guards.
    *
    * 100 TB posture: one tokenize scan + (source, tok) hash agg; the
    * per-source rank window carries WindowGroupLimit pushdown (top-50
    * cap inside the sort), and everything after is 50 rows per
    * source. */
  def textZipf(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.spread(Tables.documents(s, d))
      .select(col("source"), explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"))
        .as("tok"))
    val w = Window.partitionBy("source")
      .orderBy(col("c").desc, col("tok").asc)
    val top = toks.groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 50)
      .select(col("source"), col("rank"),
        log(col("rank").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    def foldSum(v: String): Column = expr(
      s"""aggregate(array_sort(collect_list(struct(rank as r, $v as v))),
         |cast(0.0 as double), (a, p) -> a + p.v)""".stripMargin)
    val sums = top.groupBy("source").agg(
      count(lit(1)).as("n_terms"),
      foldSum("x").as("sx"), foldSum("y").as("sy"),
      foldSum("x * x").as("sxx"), foldSum("x * y").as("sxy"))
      .withColumn("n", col("n_terms").cast("double"))
      .withColumn("slope", try_divide(
        col("n") * col("sxy") - col("sx") * col("sy"),
        col("n") * col("sxx") - col("sx") * col("sx")))
    sums.select(col("source"), col("n_terms"),
        round(col("slope"), 6).as("slope"),
        round((col("sy") - col("slope") * col("sx")) / col("n"), 6)
          .as("intercept"))
      .orderBy(col("source"))
  }

  /** Count-Min frequency estimation over the token stream — the
    * fourth sketch aggregate's catalog row: ONE bounded-memory pass
    * builds the 3×4096 counter grid
    * ([[graft.functions.expressions.CountMinSketch]]), and the top-20
    * tokens probe it for (exact, estimate, overcount). The one-sided
    * error (est ≥ exact, inflated only by bucket collisions) is
    * exactly what the output exposes — the overcount column IS the
    * collision mass, hash-checked against the oracle's full replay.
    *
    * 100 TB posture: the sketch aggregate is associative/commutative
    * fixed memory (map-side combined, 96 KB on the wire); the probe is
    * a 1-row broadcast cross join + in-row element_at — the exact-count
    * side here exists only to exhibit the error bound and would be
    * dropped in production (the sketch's whole point). */
  def textCms(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.spread(Tables.documents(s, d))
      .select(explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"))
        .as("tok"))
    val sketch = toks.agg(graft.functions.expressions.CountMinSketch
      .cms_native(s, col("tok")).as("sk"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
    val probes = exact.orderBy(col("exact").desc, col("tok").asc).limit(20)
    def bucket(j: Int): Column =
      expr(s"cast(conv(substr(md5(tok), ${3 * j + 1}, 3), 16, 10) as int)")
    probes.crossJoin(broadcast(sketch))
      .select(col("tok"), col("exact"),
        least(
          element_at(col("sk"), bucket(0) + lit(1)),
          element_at(col("sk"), bucket(1) + lit(4097)),
          element_at(col("sk"), bucket(2) + lit(8193))).as("est"))
      .withColumn("overcount", col("est") - col("exact"))
      .orderBy(col("exact").desc, col("tok").asc)
  }

  /** Readability scoring (Flesch reading-ease with the standard
    * vowel-group syllable heuristic): words, sentences and syllable
    * proxies are three regexp counts per row — fully narrow, no
    * shuffle, scan-bound at any scale. The formula is one fixed double
    * expression over exact integer counts (identical op order in the
    * oracle), denominators clamped to ≥1 so empty/punctuation-only
    * docs score instead of NULLing. */
  def textReadability(s: SparkSession, d: String): DataFrame = {
    val words = regexp_count(col("text"), lit("[A-Za-z]+"))
    val sents = regexp_count(col("text"), lit("[.!?]+"))
    val sylls = regexp_count(lower(col("text")), lit("[aeiouy]+"))
    Tables.documents(s, d)
      .select(col("doc_id"), words.as("n_words"), sents.as("n_sents"),
        sylls.as("n_sylls"))
      .select(col("doc_id"), col("n_words"), col("n_sents"), col("n_sylls"),
        round(lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") /
            greatest(col("n_sents"), lit(1)).cast("double")) -
          lit(84.6) * (col("n_sylls").cast("double") /
            greatest(col("n_words"), lit(1)).cast("double")), 6)
          .as("flesch"))
      .orderBy(col("doc_id"))
  }

  /** Lexical-diversity panel (type-token ratio + Simpson concentration
    * index) per document — the vocabulary-health signal quality
    * filtering reads next to [[textRepetition]]'s within-doc gates.
    * One explode → (doc, token) count → per-doc aggregate: both
    * shuffles keyed by high-cardinality ids, all statistics exact
    * integers until one fixed double expression per row (Simpson is
    * Σc(c−1)/n(n−1), NULL for single-token docs — no 0/0). */
  def textDiversity(s: SparkSession, d: String): DataFrame = {
    val toks = filter(split(lower(col("text")), "[^a-z0-9]+"),
      t => length(t) > 0)
    Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("t"),
        sum(col("c") * (col("c") - 1)).as("sn"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("t").as("n_types"),
        round(col("t").cast("double") / col("n").cast("double"), 6)
          .as("ttr"),
        when(col("n") > 1,
          round(col("sn").cast("double") /
            (col("n").cast("double") * (col("n") - 1).cast("double")), 6))
          .as("simpson"))
      .orderBy(col("doc_id"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs; word score = deg/freq
    * (degree counts the lengths of every phrase the word occurs in);
    * phrase score = Σ member-word scores. Spark-first shape: the
    * phrase segmentation is pure in-row array work (mark stopwords →
    * join → split on the marker), the two corpus aggregates are keyed
    * by word/phrase text (high-cardinality, map-side combinable), and
    * the per-phrase score sum rides the exact-DECIMAL 1e-9 grid so it
    * is order-free — no sorted fold, no collect_list. */
  def textRake(s: SparkSession, d: String): DataFrame = {
    val stops = Seq("a", "the", "and", "of", "to", "in", "is", "it",
      "for", "on")
    val marked = transform(col("ts"),
      t => when(t.isInCollection(stops), lit("|")).otherwise(t))
    val phrases = tokCorpus(s, d)
      .select(explode(split(array_join(marked, " "), "\\|")).as("raw"))
      .select(trim(col("raw")).as("phrase"))
      .filter(col("phrase") =!= "")
    val pw = phrases
      .select(col("phrase"), size(split(col("phrase"), " ")).as("plen"),
        explode(split(col("phrase"), " ")).as("w"))
    val wstats = pw.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("wscore",
        round(col("deg").cast("double") / col("freq").cast("double"), 9)
          .cast("decimal(20,9)"))
    val ph = phrases.groupBy(col("phrase")).agg(count(lit(1)).as("n_occ"))
    ph.select(col("phrase"), col("n_occ"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wstats.select(col("w"), col("wscore")), "w")
      .groupBy(col("phrase"), col("n_occ"))
      .agg(round(sum(col("wscore")).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(20)
  }

  /** Winnowing document fingerprints ([[TextAnalysis.winnowStats]]):
    * the per-doc panel (gram count, selected-fingerprint count, signed
    * min/max fingerprint). Narrow map transform — one pass per
    * document, scan-speed at 100 TB; the oracle replays the 31·h+c
    * polynomial, window minima and distinct selection with 128-bit
    * list arithmetic mod 2⁶⁴. */
  def textWinnow(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.winnow_stats(col("text")).as("w"))
      .select(col("doc_id"), col("w.nGrams").as("n_grams"),
        col("w.nFp").as("n_fp"), col("w.fpMin").as("fp_min"),
        col("w.fpMax").as("fp_max"))
      .orderBy(col("doc_id"))

  /** Lexicon-based sentiment scoring — the AFINN-style broadcast-
    * lexicon pattern (here a small embedded domain lexicon; a real one
    * swaps the literal arrays for a broadcast table): polarity =
    * (pos−neg)/(pos+neg) over lexicon token hits, neutral when no hit.
    * Narrow in-row array ops — scan-speed, no shuffle, no UDF. */
  def textSentiment(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')").as("ts"))
      .withColumn("npos", expr(
        "size(filter(ts, t -> t in ('fast', 'big', 'value', 'merge', 'spark')))"))
      .withColumn("nneg", expr(
        "size(filter(ts, t -> t in ('slow', 'small', 'dup', 'error')))"))
      .select(col("doc_id"), col("npos"), col("nneg"),
        expr("case when npos + nneg = 0 then 0.0" +
          " else round(cast(npos - nneg as double)" +
          " / cast(npos + nneg as double), 6) end").as("polarity"),
        expr("case when npos > nneg then 'pos'" +
          " when nneg > npos then 'neg' else 'neu' end").as("label"))
      .orderBy(col("doc_id"))

  /** TextRank keyword extraction (Mihalcea & Tarau): PageRank over the
    * corpus word co-occurrence graph (adjacent-token edges, weights =
    * corpus co-counts, symmetrized), damping 0.85, 5 fixed rounds, top
    * 20 words — the graph-centrality upgrade of RAKE/TF-IDF keyword
    * ranking ([[textRake]], [[textTopTerms]]).
    *
    * Scale/FP: the graph is VOCABULARY-sized (edges ≤ distinct
    * adjacent pairs — Heaps-law bounded, not corpus-bounded), so each
    * round is one keyed join + one hash agg on vocab keys; per-edge
    * contributions r(u)·w/wdeg(u) quantize to 1e-12 scaled LONGS
    * before the sum (order-proof, the exact-decimal idiom), and the
    * vocab count is a bounded driver scalar like pagerank's node
    * count. */
  def textTextrank(s: SparkSession, d: String): DataFrame = {
    val toks = tokCorpus(s, d).select(col("ts"))
      .filter(size(col("ts")) >= 2)
    // r13: checkpointed — the vocab-sized pair aggregate is consumed
    // through edges (×2 via the symmetrizing union), wdeg AND the
    // vocab count; unmaterialized, the corpus-wide explode+agg
    // subtree re-executed per consumer (profiled: four identical
    // 380 ms 32-task stages per call)
    val pairs = toks.select(explode(expr(
        """transform(sequence(1, size(ts) - 1),
          |  i -> struct(least(ts[i - 1], ts[i]) AS a,
          |    greatest(ts[i - 1], ts[i]) AS b))""".stripMargin)).as("p"))
      .filter(col("p.a") =!= col("p.b"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst"), col("w")))
    val wdeg = edges.groupBy("src").agg(sum("w").as("wdeg"))
    val ew = edges.join(wdeg, "src").localCheckpoint()
    val v = wdeg.count() // bounded driver scalar (vocab size)
    val base = 0.15 / v
    var ranks = wdeg.select(col("src").as("word"))
      .withColumn("r", lit(1.0 / v))
    for (_ <- 1 to 5) {
      ranks = ew.join(ranks, ew("src") === ranks("word"))
        .select(col("dst"), expr(
          "cast(floor(r * w / wdeg * 1000000000000.0 + 0.5) as bigint)")
          .as("qc"))
        .groupBy("dst").agg(sum("qc").as("sq"))
        .select(col("dst").as("word"),
          (lit(base) + lit(0.85) *
            (col("sq").cast("double") / lit(1000000000000.0))).as("r"))
        .localCheckpoint()
    }
    ranks.join(wdeg, ranks("word") === wdeg("src"))
      .select(col("word"), col("wdeg"), round(col("r"), 6).as("rank"))
      .orderBy(col("rank").desc, col("word").asc)
      .limit(20)
  }

  /** Gopher-style quality-rule panel (Rae et al. 2021 §A1.1 — the
    * published rule set behind most production pre-training corpus
    * gates; the reference's quality filters are the same shape:
    * reject-on-threshold predicates over cheap per-doc statistics).
    * One row PER RULE with corpus-wide pass/fail counts and rate, plus
    * an `all` row for the conjunction — the panel a pipeline owner
    * reads to see WHICH gate is eating the corpus before flipping it
    * on.
    *
    * Rules (each a per-row boolean over built-in functions):
    *  - word_count:     50 ≤ words ≤ 100000
    *  - mean_word_len:  3 ≤ mean word length ≤ 10
    *  - hash_ellipsis:  (#'#' + #'...') / words ≤ 0.1
    *  - bullet_lines:   < 90% of lines start with a bullet (-, *, •)
    *  - ellipsis_lines: ≤ 30% of lines end with '...'
    *  - alpha_words:    ≥ 80% of words contain a letter
    *  - stop_words:     ≥ 2 hits from the 8-word Gopher stop list
    *
    * 100 TB posture: ONE corpus scan computes all seven flags as
    * conditional sums in a single 1-row aggregate (map-side combined);
    * the per-rule unpivot (`stack`) runs on that 1-row result — the
    * panel never shuffles doc-sized data. Counts are exact integers;
    * the rate is one division, rounded 6. */
  def textGopherRules(s: SparkSession, d: String): DataFrame = {
    val text = col("text")
    val words = expr("filter(split(trim(text), '\\\\s+'), w -> w != '')")
    val nWords = size(words)
    val nAlphaWords = expr(
      "size(filter(filter(split(trim(text), '\\\\s+'), w -> w != '')," +
        " w -> w rlike '[A-Za-z]'))")
    val lines = expr("split(text, '\\n')")
    val nLines = size(lines)
    val nBulletLines = expr(
      "size(filter(split(text, '\\n'), l ->" +
        " trim(l) rlike '^[-*\\u2022]'))")
    val nEllipsisLines = expr(
      "size(filter(split(text, '\\n'), l ->" +
        " trim(l) rlike '\\\\.\\\\.\\\\.$'))")
    val nHash = length(text) - length(regexp_replace(text, "#", ""))
    val nEllipsis = regexp_count(text, lit("\\.\\.\\."))
    val meanWordLen =
      expr("aggregate(filter(split(trim(text), '\\\\s+'), w -> w != '')," +
        " cast(0 as bigint), (a, w) -> a + length(w))").cast("double") /
        greatest(nWords, lit(1)).cast("double")
    val stopHits = regexp_count(lower(text),
      lit("\\b(the|be|to|of|and|that|have|with)\\b"))
    val safeWords = greatest(nWords, lit(1)).cast("double")
    val safeLines = greatest(nLines, lit(1)).cast("double")
    val flags = Tables.documents(s, d).select(
      (nWords >= 50 && nWords <= 100000).cast("long").as("r_word_count"),
      (meanWordLen >= 3.0 && meanWordLen <= 10.0).cast("long")
        .as("r_mean_word_len"),
      ((nHash + nEllipsis).cast("double") / safeWords <= 0.1).cast("long")
        .as("r_hash_ellipsis"),
      (nBulletLines.cast("double") / safeLines < 0.9).cast("long")
        .as("r_bullet_lines"),
      (nEllipsisLines.cast("double") / safeLines <= 0.3).cast("long")
        .as("r_ellipsis_lines"),
      (nAlphaWords.cast("double") / safeWords >= 0.8).cast("long")
        .as("r_alpha_words"),
      (stopHits >= 2).cast("long").as("r_stop_words"))
    val ruleCols = Seq("r_word_count", "r_mean_word_len", "r_hash_ellipsis",
      "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stop_words")
    val agg1 = flags.agg(count(lit(1)).as("n_docs"),
      ruleCols.map(c => sum(col(c)).as(c)) :+
        sum(when(ruleCols.map(col(_) === 1L).reduce(_ && _), 1L)
          .otherwise(0L)).as("r_all"): _*)
    val stackExpr = (ruleCols.map(c =>
      s"'${c.stripPrefix("r_")}', $c") :+ "'all', r_all").mkString(", ")
    agg1.select(col("n_docs"),
        expr(s"stack(${ruleCols.size + 1}, $stackExpr) as (rule, n_pass)"))
      .select(col("rule"), col("n_pass"),
        (col("n_docs") - col("n_pass")).as("n_fail"),
        round(col("n_pass").cast("double") / col("n_docs").cast("double"), 6)
          .as("pass_rate"))
      .orderBy(col("rule"))
  }

  /** Vocabulary growth curve (Heaps' law): cumulative distinct word
    * types vs cumulative tokens across corpus-order deciles — the
    * scaling diagnostic behind "will my vocab/OOV rate keep growing
    * if I crawl 10× more" (sub-linear growth flattening is what Heaps
    * predicts; a linear curve means the corpus keeps changing domain).
    *
    * Decile assignment is the exact two-level global rank + integer
    * ntile closed form (the pack_curriculum idiom, keyed by doc_id
    * buckets). Each word type is attributed to the decile of its
    * FIRST-occurrence document by joining the first-occurrence id
    * back to the doc-decile table (no threshold scan); cumulative
    * sums run over the 10-row panel. Type/token counts are exact
    * integers; the type-token ratio is one division, round 6. */
  def textVocabGrowth(s: SparkSession, d: String): DataFrame = {
    val dt = Tables.spread(Tables.documents(s, d))
      .select(col("doc_id"), explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"))
        .as("tok"))
    val perDoc = dt.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
    val docs = Tables.documents(s, d).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_toks"), lit(0L)).as("n_toks"))
      .withColumn("__b", expr("cast(doc_id div 1000 as int)"))
    val wIn = Window.partitionBy("__b").orderBy("doc_id")
    val wOff = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = docs.groupBy("__b").agg(count(lit(1)).as("__g_n"))
      .withColumn("__g_off", coalesce(sum(col("__g_n")).over(wOff), lit(0L)))
    val total = docs.agg(count(lit(1)).as("n_total"))
    val deciled = docs.withColumn("__rn", row_number().over(wIn))
      .join(offs.select("__b", "__g_off"), Seq("__b"))
      .crossJoin(broadcast(total))
      .withColumn("decile",
        expr("cast((__g_off + __rn - 1) * 10 div n_total as int) + 1"))
      .select(col("doc_id"), col("n_toks"), col("decile"))
    val first = dt.groupBy("tok").agg(min(col("doc_id")).as("fd"))
    val newTypes = first
      .join(deciled.select(col("doc_id").as("fd"), col("decile")), Seq("fd"))
      .groupBy("decile").agg(count(lit(1)).as("new_types"))
    val w10 = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciled.groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("toks"))
      .join(newTypes, Seq("decile"), "left")
      .withColumn("cum_tokens", sum(col("toks")).over(w10))
      .withColumn("cum_vocab",
        sum(coalesce(col("new_types"), lit(0L))).over(w10))
      .select(col("decile"), col("n_docs"), col("cum_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"),
        col("cum_vocab"),
        round(col("cum_vocab").cast("double")
          / col("cum_tokens").cast("double"), 6).as("ttr"))
      .orderBy(col("decile"))
  }

  /** Token BURSTINESS (Church–Gale): variance-to-mean ratio of a
    * token's per-document counts, zeros included — the dispersion
    * statistic that separates function words (VMR ≈ 1, Poisson-like:
    * sprinkled evenly) from content words (VMR ≫ 1: absent almost
    * everywhere, bursty where they appear). The signal behind
    * burstiness-aware term weighting and stopword induction.
    *
    * Zeros never materialize: with N docs, mean = T/N and
    * E[c²] = Σc²/N over the DOCS CONTAINING the token only (absent
    * docs add 0 to both sums), so one (doc, tok) count + one token
    * aggregate + a 1-row N broadcast computes the exact moments.
    * All sufficient statistics are exact integers; VMR is one fixed
    * double expression, round 6. Top-20 by frequency = TakeOrdered. */
  def textBurstiness(s: SparkSession, d: String): DataFrame = {
    val dt = Tables.spread(Tables.documents(s, d))
      .select(col("doc_id"), explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"))
        .as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
    dt.groupBy(col("tok"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("tot"),
        sum(col("c") * col("c")).as("ss"))
      .crossJoin(broadcast(n))
      .filter(col("tot") >= 50)
      .select(col("tok"), col("tot"), col("n_docs"),
        round(expr(
          "(cast(ss as double) / cast(n as double)" +
            " - (cast(tot as double) / cast(n as double))" +
            " * (cast(tot as double) / cast(n as double)))" +
            " / (cast(tot as double) / cast(n as double))"), 6).as("vmr"))
      .orderBy(col("tot").desc, col("tok").asc)
      .limit(20)
  }

  /** Language-ID confusion matrix — [[textLangId]] collapsed to the
    * eval deliverable: per (labeled, detected) cell, the count and its
    * share of the labeled row (per-class recall on the diagonal). The
    * matrix is |langs|²-bounded regardless of SF; built from one
    * detector pass + two bounded aggs. */
  def textLangConfusion(s: SparkSession, d: String): DataFrame = {
    val lid = textLangId(s, d)
      .select(col("labeled_lang"), col("detected_lang"))
    val tot = lid.groupBy("labeled_lang").agg(count(lit(1)).as("tot"))
    lid.groupBy(col("labeled_lang"), col("detected_lang"))
      .agg(count(lit(1)).as("n"))
      .join(tot, Seq("labeled_lang"))
      .select(col("labeled_lang"), col("detected_lang"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("share"))
      .orderBy(col("labeled_lang"), col("detected_lang"))
  }

  /** Per-document n-gram NOVELTY in corpus-id order: the share of a
    * doc's distinct word-3-gram shingles whose FIRST corpus occurrence
    * (minimum doc_id) is the doc itself — the curation signal behind
    * "is the tail of this crawl adding anything": low-novelty late
    * documents are re-treads even when no single document duplicates
    * them (which is why dedup alone can't see this).
    *
    * 100 TB posture: reads the memoized (doc_id, shingle) inverted
    * index ([[DedupOps.shingleRows]] — the same artifact the n-gram
    * dedup and contamination checks amortize); first-occurrence is a
    * map-side-combinable min agg on the shingle key; the attribution
    * join is 1:1 (first-occurrence is unique per shingle), so even a
    * degenerate hot shingle fans out no rows. No windows, no pair
    * expansion. Counts exact; the ratio is one division, round 6. */
  def textNovelty(s: SparkSession, d: String): DataFrame = {
    val sh = DedupOps.shingleRows(s, d).select(col("doc_id"), col("shingle"))
    val first = sh.groupBy(col("shingle")).agg(min(col("doc_id")).as("fd"))
    sh.join(first, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("fd") === col("doc_id")).cast("long")).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double")
          / col("n_shingles").cast("double"), 6).as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** Pairwise Jensen–Shannon divergence between the unigram
    * distributions of document SOURCES — the standard "how different
    * are my corpus slices" panel a mixing pipeline reads before
    * setting source weights (JSD is symmetric, bounded by ln 2, and
    * defined even on disjoint vocabularies — exactly why it beats
    * raw KL here).
    *
    * Shared-token identity: tokens present in only one side
    * contribute 0.5·ln2·mass in closed form (P sums to 1), so JSD =
    * Σ_shared [½p·ln(2p/(p+q)) + ½q·ln(2q/(p+q))]
    *   + ½·ln2·(2 − Σ_shared p − Σ_shared q)
    * — the expensive union-vocab full-outer join NEVER happens; only
    * the inner join on shared tokens does.
    *
    * 100 TB posture: one tokenize + (source, tok) count agg (map-side
    * combined, vocab-sized output); the pair expansion is the vocab
    * self-join with |sources| bounded (a domain constant), so the
    * joined table is ≤ |vocab|·|sources|² — corpus-independent.
    * Determinism: p = n/tot is an exact-integer division; each
    * per-token term quantizes to a 1e-12 scaled long before the
    * order-free integer sum (the text_textrank idiom); ln only ever
    * sees identical doubles in both engines. */
  def textJsdSources(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.spread(Tables.documents(s, d))
      .select(col("source"), explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"))
        .as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("n"))
    val tot = tok.groupBy("source").agg(sum(col("n")).as("tot"))
    val p = tok.join(tot, "source")
      .select(col("source"), col("tok"),
        (col("n").cast("double") / col("tot").cast("double")).as("p"))
    val a = p.select(col("source").as("s1"), col("tok"), col("p").as("pa"))
    val b = p.select(col("source").as("s2"), col("tok"), col("p").as("pb"))
    // all source pairs, even vocabulary-disjoint ones (their JSD is
    // exactly ln 2 from the closed form with zero shared sums)
    val grid = tot.select(col("source").as("s1"))
      .crossJoin(tot.select(col("source").as("s2")))
      .filter(col("s1") < col("s2"))
    val shared = a.join(b, Seq("tok")).filter(col("s1") < col("s2"))
      .withColumn("term", expr(
        "cast(floor((0.5 * pa * ln(2.0 * pa / (pa + pb))" +
          " + 0.5 * pb * ln(2.0 * pb / (pa + pb)))" +
          " * 1000000000000.0 + 0.5) as bigint)"))
      .withColumn("qpa",
        expr("cast(floor(pa * 1000000000000.0 + 0.5) as bigint)"))
      .withColumn("qpb",
        expr("cast(floor(pb * 1000000000000.0 + 0.5) as bigint)"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_shared"), sum(col("term")).as("sq"),
        sum(col("qpa")).as("spa"), sum(col("qpb")).as("spb"))
    grid.join(shared, Seq("s1", "s2"), "left")
      .select(col("s1"), col("s2"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(expr(
          "cast(coalesce(sq, 0) as double) / 1000000000000.0" +
            " + 0.5 * ln(2.0)" +
            " * (2.0 - cast(coalesce(spa, 0) as double) / 1000000000000.0" +
            " - cast(coalesce(spb, 0) as double) / 1000000000000.0)"), 6)
          .as("jsd"))
      .orderBy(col("s1"), col("s2"))
  }

  /** The content-defined-chunking expressions shared VERBATIM by
    * [[textCdcChunks]] and [[textBoilerplateFrac]] — one copy, so the
    * cut rule can never drift between the panel and its consumer.
    *
    * The gram hash is a base-31 Horner polynomial over the 8
    * codepoints ending at each position (exact long arithmetic:
    * max codepoint 0x10FFFF × Σ31^k(k≤7) ≈ 3.2e16 < 2^63, so both
    * engines compute the identical integer with no modular step),
    * written as a FLAT 8-term expression — an inner
    * `aggregate(slice(...))` fold measured 7 µs/position at sf0.1
    * (array alloc + nested interpreted fold inside the already-
    * interpreted filter lambda; 54 s/query), the flat form is ~20×
    * cheaper and still ~an order under the md5-per-gram rule it
    * replaced (round-7 perf audit #4).
    *
    * A position cuts when h % 256 < 16 — the same 1/16 cut
    * probability (expected chunk ≈ 16 chars) as the md5
    * leading-nibble rule, judged on the full LOW BYTE deliberately:
    * 31 ≡ −1 (mod 16), so `h % 16` would collapse to an alternating
    * codepoint sum — a degenerate rule that chunks periodic text
    * pathologically; mod 256 the weights 31^k stay distinct and odd,
    * so every gram character moves the decision. */
  private val cdcCodesExpr =
    "transform(split(t, ''), c -> cast(ascii(c) as bigint))"

  private val cdcCutsExpr =
    """concat(array(0L),
      | CASE WHEN length(t) < 8 THEN cast(array() as array<bigint>)
      |   ELSE transform(filter(sequence(1L, length(t) - 7),
      |     p -> (element_at(cs, cast(p as int)) * 27512614111L
      |         + element_at(cs, cast(p + 1 as int)) * 887503681L
      |         + element_at(cs, cast(p + 2 as int)) * 28629151L
      |         + element_at(cs, cast(p + 3 as int)) * 923521L
      |         + element_at(cs, cast(p + 4 as int)) * 29791L
      |         + element_at(cs, cast(p + 5 as int)) * 961L
      |         + element_at(cs, cast(p + 6 as int)) * 31L
      |         + element_at(cs, cast(p + 7 as int))) % 256 < 16),
      |   p -> p + 7) END,
      | array(cast(length(t) as bigint)))""".stripMargin

  private val cdcChunksExpr =
    """filter(transform(sequence(1, size(cuts) - 1),
      |  i -> substring(t, cast(element_at(cuts, i) + 1 as int),
      |    cast(element_at(cuts, i + 1) - element_at(cuts, i)
      |      as int))), c -> c != '')""".stripMargin

  /** The materialized (doc_id, chunk-hash, chunk-length) table all
    * three CDC consumers ([[textCdcChunks]], [[textBoilerplateFrac]],
    * [[dedupCdcShare]]) read — memoized per (session, dataset) and
    * localCheckpoint'd once, the walksTable discipline: the
    * per-position Horner scan is the whole cost of the CDC family, so
    * each consumer re-paying it (and boilerplate's two consumers
    * re-paying it twice) triples the suite. Narrow rows (corpus/16 of
    * them); chunk TEXT never leaves the expansion — md5 + length are
    * taken in the same projection. */
  private val cdcChunkCache = new graft.SessionCache[DataFrame](df => {
    df.unpersist(); ()
  })

  private def cdcChunkTable(s: SparkSession, d: String): DataFrame =
    cdcChunkCache.getOrCompute(s, d) {
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").as("t"))
        .withColumn("cs", expr(cdcCodesExpr))
        .withColumn("cuts", expr(cdcCutsExpr))
        .select(col("doc_id"), explode(expr(cdcChunksExpr)).as("chunk"))
        .select(col("doc_id"), md5(col("chunk")).as("h"),
          length(col("chunk")).as("clen"))
        .localCheckpoint()
    }

  /** T169: content-defined chunking + duplicate-chunk panel (the
    * FastCDC/rsync idea re-expressed for corpus boilerplate
    * detection): cut points are where the base-31 Horner hash of the
    * 8-char gram ending there is ≡ 0 mod 16 (expected chunk ≈ 16
    * chars — CONTENT decides the boundaries, so an insertion shifts
    * only its own chunk, unlike fixed-width windows), then chunks
    * hash cross-doc to surface shared boilerplate runs that doc-level
    * exact dedup and shingle Jaccard both miss. Top-20 chunks by
    * document spread.
    *
    * Everything up to the chunk hash is IN-ROW (one narrow scan; the
    * breakpoint filter + substring expansion are HOFs, no explode of
    * per-position rows); the only shuffle carries (md5, doc_id) per
    * chunk — corpus/16 rows — into a map-side-combinable aggregate.
    * Spark's `sequence(1, n)` REVERSES when n < 1, so short docs
    * guard behind a CASE (DuckDB's `range` just empties — the guard
    * is mirrored for parity). */
  def textCdcChunks(s: SparkSession, d: String): DataFrame = {
    cdcChunkTable(s, d)
      .groupBy(col("h").as("chunk_md5"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occur"),
        max(col("clen")).as("chunk_len"))
      .orderBy(col("n_docs").desc, col("n_occur").desc,
        col("chunk_md5").asc)
      .limit(20)
  }

  /** T170: per-document BOILERPLATE fraction — how much of each doc's
    * text lives in chunks shared with at least one OTHER document
    * (the doc-level consumption of [[textCdcChunks]]' signal: a
    * training-data curation pipeline drops or down-weights docs that
    * are mostly template). Same Horner-gram cut rule; a chunk is shared
    * when its hash spans ≥ 2 distinct docs; the per-doc panel reports
    * chunk counts and the shared-character fraction.
    *
    * One in-row chunk expansion — localCheckpoint'd: its two consumers
    * (spread agg + join back) would otherwise each re-pay the
    * per-position Horner scan, and the materialized (doc_id, h, clen)
    * table is corpus/16 NARROW rows (the reverse of the lmScores
    * trade, where re-scanning was the cheap side) — then one
    * chunk-hash spread aggregate (map-side combinable), one hash join
    * back, one per-doc conditional-sum aggregate — no self-join, no
    * window. */
  def textBoilerplateFrac(s: SparkSession, d: String): DataFrame = {
    val chunks = cdcChunkTable(s, d)
    val spread = chunks.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    chunks.join(spread, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L))
          .as("shared_chunks"),
        sum(col("clen").cast("long")).as("total_chars"),
        sum(when(col("n_docs") >= 2, col("clen").cast("long"))
          .otherwise(0L)).as("shared_chars"))
      .select(col("doc_id"), col("n_chunks"), col("shared_chunks"),
        round(col("shared_chars").cast("double")
          / col("total_chars").cast("double"), 6).as("shared_frac"))
      .orderBy(col("doc_id"))
  }

  /** T197: HASHING-TRICK feature vectors (Weinberger 2009) — the
    * fixed-width bag-of-words a downstream classifier trains on
    * without a vocabulary pass: each token hashes to one of 16
    * buckets (first-8-hex md5 mod 16, the repo's deterministic-hash
    * convention) and the doc's features are the bucket counts. ONE
    * explode → per-(doc, bucket) fold → 16 conditional sums per doc;
    * the left join back to `documents` keeps token-less docs as
    * all-zero rows. Fixed width means NO shuffle ever carries the
    * vocabulary — the entire point of the trick at 100 TB. */
  def textHashingFeatures(s: SparkSession, d: String): DataFrame = {
    val tb = Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"))
        .as("tok"))
      .withColumn("b", expr(
        "cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint) % 16"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
    val fAggs = (0 until 16).map(i =>
      sum(when(col("b") === i, col("n")).otherwise(0L)).as(s"f$i"))
    val feats = tb.groupBy("doc_id")
      .agg(sum("n").as("n_toks"), fAggs: _*)
    val outCols = col("doc_id") +:
      coalesce(col("n_toks"), lit(0L)).as("n_toks") +:
      (0 until 16).map(i => coalesce(col(s"f$i"), lit(0L)).as(s"f$i"))
    Tables.documents(s, d).select(col("doc_id"))
      .join(feats, Seq("doc_id"), "left")
      .select(outCols: _*)
      .orderBy("doc_id")
  }

  /** T215: VOCABULARY COVERAGE curve — what fraction of all token
    * occurrences the top-V most frequent types capture, at V ∈ {100,
    * 1000, 10000} (the "how big must the tokenizer vocab be" sizing
    * curve; the complement of the OOV rate at each budget). Vocab
    * ranks by (freq desc, token asc) through the banded two-level
    * cumulative — band = freq div 1024, so every higher band strictly
    * outranks every lower one and no vocab-sized global window ever
    * sorts (the ev_gini discipline, descending); only the ≤10k-row
    * ranked head meets the 3-row cut panel. Exact integer freqs all
    * the way; the coverage division is the only double. */
  def textNgramCoverage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.spread(Tables.documents(s, d))
      .select(explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"))
        .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val banded = vocab
      .withColumn("__b", floor(col("freq") / 1024).cast("long"))
    val wIn = Window.partitionBy("__b")
      .orderBy(col("freq").desc, col("tok").asc)
    val wOff = Window.orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = banded.groupBy("__b").agg(count(lit(1)).as("nb"))
      .withColumn("off", coalesce(sum("nb").over(wOff), lit(0L)))
      .select("__b", "off")
    val head = banded.withColumn("rin", row_number().over(wIn))
      .join(offs, Seq("__b"))
      .withColumn("rank", col("off") + col("rin"))
      .filter(col("rank") <= 10000)
      .select(col("rank"), col("freq"))
    val tot = vocab.agg(sum("freq").as("t"), count(lit(1)).as("vsz"))
    val cuts = Seq(100, 1000, 10000).toDF("v")
    head.join(broadcast(cuts), col("rank") <= col("v"))
      .groupBy("v")
      .agg(count(lit(1)).as("n_types"), sum("freq").as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("v").cast("int").as("v"), col("n_types"),
        col("covered"), col("vsz").as("vocab_size"),
        col("t").as("total_tokens"),
        expr("round(cast(covered as double) / cast(t as double), 6)")
          .as("coverage"))
      .orderBy("v")
  }

  /** T216: CODE-vs-PROSE detection per source — the corpus-mix filter
    * every LLM pretraining pipeline runs (code in the prose stream
    * skews tokenizers; prose in the code stream skews fill-in-middle).
    * Three deterministic char-class densities per doc — code symbols
    * `;{}()=<>[]`, camelCase bigrams, digits — fold into
    * score = (4·sym + 2·camel + dig)/chars, code iff score > 0.05.
    * All counts are exact integers off one codegen'd
    * regexp_replace/extract pass; the per-doc score quantizes to the
    * 1e-9 grid so the per-source mean is an exact DECIMAL sum. One
    * corpus scan, source-cardinality output. */
  def textCodeFrac(s: SparkSession, d: String): DataFrame = {
    Tables.spread(Tables.documents(s, d))
      .select(col("source"),
        length(col("text")).cast("long").as("chars"),
        length(regexp_replace(col("text"), "[^;{}()=<>\\[\\]]", ""))
          .cast("long").as("sym"),
        size(expr("regexp_extract_all(text, '[a-z][A-Z]', 0)"))
          .cast("long").as("camel"),
        length(regexp_replace(col("text"), "[^0-9]", ""))
          .cast("long").as("dig"))
      .filter(col("chars") > 0)
      .withColumn("score", expr(
        "cast(round((4.0 * cast(sym as double)" +
          " + 2.0 * cast(camel as double) + cast(dig as double))" +
          " / cast(chars as double), 9) as decimal(18,9))"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0.05, 1L).otherwise(0L)).as("n_code"),
        sum("score").as("sscore"))
      .select(col("source"), col("n_docs"), col("n_code"),
        expr("round(cast(n_code as double) / cast(n_docs as double), 6)")
          .as("frac_code"),
        expr("round(cast(sscore as double) / cast(n_docs as double), 6)")
          .as("mean_score"))
      .orderBy("source")
  }

  /** T219: CDC-chunk near-duplicate pairs — the document-pair readout
    * of the [[textCdcChunks]] signal (ref analysis/hash.py simhash
    * pairing intent, restated on content-defined chunks): Jaccard over
    * each doc's chunk-HASH SET, so a shared paragraph scores even when
    * shingle-window dedup misses it (CDC boundaries realign after an
    * edit; fixed shingles don't). Top-20 pairs by chunk Jaccard.
    *
    * 100 TB posture: the pair generator is SPREAD-CAPPED — only chunks
    * spanning 2..8 distinct docs key the self-join (singletons can't
    * pair; wider chunks are boilerplate, the [[textBoilerplateFrac]]
    * signal, and would fan out quadratically) — so each surviving hash
    * contributes at most C(8,2)=28 id-only pairs, the banded-MinHash
    * discipline. The chunk table is localCheckpoint'd once (three
    * consumers: per-doc sizes, spread filter, pair join would each
    * re-pay the per-position Horner scan); everything after it shuffles
    * only (hash, doc_id) and (d1, d2) pairs. Jaccard is an exact
    * integer ratio rounded to 6dp — tie-broken (shared desc, d1, d2),
    * a total order both engines agree on bit-for-bit. */
  def dedupCdcShare(s: SparkSession, d: String): DataFrame = {
    val ch = cdcChunkTable(s, d)
      .select(col("doc_id"), col("h"))
      .distinct()
    val perDoc = ch.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val paired = ch.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd").between(2, 8))
      .select("h")
    val keyed = ch.join(paired, Seq("h"))
    val pairs = keyed.select(col("h"), col("doc_id").as("d1"))
      .join(keyed.select(col("h"), col("doc_id").as("d2")), Seq("h"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("shared"))
    pairs
      .join(perDoc.select(col("doc_id").as("d1"), col("n").as("n1")),
        Seq("d1"))
      .join(perDoc.select(col("doc_id").as("d2"), col("n").as("n2")),
        Seq("d2"))
      .select(col("d1"), col("d2"), col("shared"), col("n1"), col("n2"),
        round(col("shared").cast("double")
          / (col("n1") + col("n2") - col("shared")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("shared").desc,
        col("d1").asc, col("d2").asc)
      .limit(20)
  }

  /** T225: GREEN-LIST watermark detection (Kirchenbauer et al. 2023,
    * "A Watermark for Large Language Models") — the provenance screen
    * a pretraining pipeline runs to keep watermarked synthetic text out
    * of (or quota'd inside) the corpus. The detector replays the
    * watermark's partition: token t following context token p is
    * "green" iff the seeded hash of the (p, t) pair lands in the green
    * half (here: first md5 hex digit of `p|t` in 0-7, γ = 1/2), and the
    * per-doc one-proportion z-score (2·greens − T)/√T says how far the
    * doc sits above the unwatermarked null. Natural text ≈ 0; sampled-
    * with-watermark text scores z ≳ 4.
    *
    * One tokenize scan → in-row bigram expansion (the bigram-LM idiom)
    * → per-doc conditional count: one map-side-combinable hash agg on
    * doc_id, one top-20 TakeOrdered. Counts are exact integers; z is
    * one double expression off them, rounded at 6dp (identical IEEE
    * ops both engines). */
  def textWatermark(s: SparkSession, d: String): DataFrame = {
    val ts = Tables.spread(Tables.documents(s, d))
      .select(col("doc_id"), expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')").as("ts"))
    ts.filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ts) - 1),
          |  i -> struct(ts[i - 1] AS w1, ts[i] AS w2))""".stripMargin))
        .as("b"))
      .select(col("doc_id"),
        substring(md5(concat(col("b.w1"), lit("|"), col("b.w2"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7").as("green"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("green").cast("long")).as("n_green"))
      .select(col("doc_id"), col("n_bigrams"), col("n_green"),
        round((lit(2.0) * col("n_green").cast("double")
            - col("n_bigrams").cast("double"))
          / sqrt(col("n_bigrams").cast("double")), 6).as("z_green"))
      .orderBy(col("z_green").desc, col("doc_id").asc)
      .limit(20)
  }

  /** The encoding-anomaly detectors behind [[textMojibake]], factored
    * over a (source, text) frame so the spec can drive them with
    * injected fixtures (the PiiSpec discipline — the shipped corpus
    * is clean, so the catalog row's zero counts are COMPUTED by both
    * engines running the same regexes, not pinned constants):
    *  - `n_replacement`: U+FFFD — a decoder already gave up upstream;
    *  - `n_c1_controls`: U+0080-U+009F — the classic CP1252/Latin-1
    *    misread of UTF-8 continuation bytes;
    *  - `n_double_utf8`: the two highest-frequency mojibake bigrams —
    *    U+00C3 + a Latin-1 high byte (the e-acute→"Ã©" class) and
    *    the "â€" smart-quote prefix (the ’→"â€™" class) — UTF-8
    *    decoded as Latin-1/CP1252 and re-encoded;
    *  - `n_controls`: C0 controls except TAB/LF/CR (binary bleed;
    *    the range starts at U+0001 because a NUL can ride neither
    *    the oracle-SQL JSON nor the parquet text column).
    * This is the ftfy-class intake screen every web-scale text
    * pipeline runs before quality scoring — mojibake inflates
    * character entropy and deflates stopword ratios, silently
    * poisoning the downstream gates. Pure per-row codegen'd regex
    * counts, one map-side-combinable aggregate, no shuffle beyond
    * the tiny per-source ledger. */
  private[ops] def mojibakePanel(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        regexp_count(col("text"), lit("\uFFFD")).as("repl"),
        regexp_count(col("text"), lit("[\u0080-\u009F]")).as("c1"),
        regexp_count(col("text"),
          lit("\u00C3[\u0080-\u00BF]|\u00E2\u20AC")).as("dbl"),
        regexp_count(col("text"),
          lit("[\u0001-\u0008\u000B\u000C\u000E-\u001F]"))
          .as("ctrl"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("repl") + col("c1") + col("dbl") + col("ctrl") === 0,
          1L).otherwise(0L)).as("clean_docs"),
        sum(col("repl")).cast("long").as("n_replacement"),
        sum(col("c1")).cast("long").as("n_c1_controls"),
        sum(col("dbl")).cast("long").as("n_double_utf8"),
        sum(col("ctrl")).cast("long").as("n_controls"))
      .orderBy(col("source"))

  /** T274: encoding-anomaly / mojibake panel per source. */
  def textMojibake(s: SparkSession, d: String): DataFrame =
    mojibakePanel(Tables.spread(Tables.documents(s, d))
      .select(col("source"), col("text")))

  /** `&`/`<`/`>` escaped so arbitrary text embeds as ONE HTML text
    * node — the inverse of the extractor's entity decode. */
  private def escHtml(t: String): String =
    t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** The deterministic page wrap behind [[textHtmlExtract]]: a real
    * page skeleton around the document text — title, a style block, a
    * script whose string literal contains `"</div>"` (the naive-
    * stripper trap), a 3-link nav, the text as one `<p>`, and a
    * link+entity footer. Single line, so the only text blocks are
    * title/nav/p/footer. */
  private[ops] def htmlWrap(id: Long, text: String): String =
    "<html><head><title>Doc " + id + "</title>" +
      "<style>p{color:#000}</style>" +
      "<script>var x = 1 < 2 && \"</div>\";</script></head>" +
      "<body><div id=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">A</a>" +
      " <a href=\"/b\">B</a></div>" +
      "<p>" + escHtml(text) + "</p>" +
      "<div class=\"footer\"><a href=\"/c\">Contact</a> &copy; 2026</div>" +
      "</body></html>"

  /** The wrap's fixed character count (id and text contribute on top):
    * computed from the template itself so the oracle formula can never
    * drift from the builder. */
  private[ops] lazy val htmlWrapConst: Long = htmlWrap(0L, "").length - 1L

  /** HTML/markup MAIN-CONTENT extraction as a catalog row — the
    * trafilatura-class stage every raw web crawl needs before the 60+
    * text gates apply (the round-11 verdict's #1 ask; the reference
    * runs bs4/newspaper out-of-engine for exactly this). Each doc's
    * text wraps into the deterministic page skeleton ([[htmlWrap]]),
    * the REAL state-machine extractor
    * ([[graft.functions.HtmlExtract]]) runs over the markup —
    * comments, raw-text script/style, quoted-attribute tags, entity
    * decode, Kohlschütter link-density blocks — and the per-source
    * ledger hash-checks that it recovered EXACTLY the original text
    * and dropped EXACTLY the boilerplate: n_ok/n_kept (docs whose
    * main block survived the >= 4-words rule, recovered verbatim),
    * extracted_chars (= Σ text length over kept docs), html_chars
    * (= the template-constant formula — ties the builder AND parser
    * lengths together), boiler_blocks (title+nav+footer, +1 when the
    * main block itself is boilerplate-short), links_dropped (the 4
    * nav/footer links per doc). The oracle recomputes every column
    * from the text alone, so a scanner bug (mis-skipped script, a '>'
    * inside an attribute ending a tag early, an entity double-decode)
    * desynchronizes content or lengths and goes red.
    *
    * Scale posture: one stateless mapPartitions scan over
    * (source, doc_id, text) — O(bytes) per doc, embarrassingly
    * parallel, no shuffle beyond the tiny per-source ledger; the
    * detectors/counts are plain codegen'd expressions. */
  def textHtmlExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.spread(Tables.documents(s, d))
      .select(col("source"), col("doc_id"), col("text"))
      .as[(String, Long, String)]
    val ex = docs.mapPartitions { it =>
      it.map { case (src, id, t) =>
        val html = htmlWrap(id, t)
        val r = graft.functions.HtmlExtract.extract(html)
        // codepoint count, to match the oracle's length() semantics
        (src, t, html.codePointCount(0, html.length).toLong, r.content,
          r.keptBlocks.toLong, r.droppedBlocks.toLong,
          r.droppedLinks.toLong)
      }
    }.toDF("source", "text", "html_len", "content", "kept", "dropped",
      "dropped_links")
    ex.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("content") === col("text"), 1L).otherwise(0L))
          .as("n_ok"),
        sum(col("kept")).as("n_kept"),
        sum(length(col("content")).cast("long")).as("extracted_chars"),
        sum(col("html_len")).as("html_chars"),
        sum(col("dropped")).as("boiler_blocks"),
        sum(col("dropped_links")).as("links_dropped"))
      .orderBy(col("source"))
  }

  /** The CP1252 inverse table behind [[mojibakeRepair]] — the 27
    * codepoints Windows-1252 places at bytes 0x80-0x9F (€‚ƒ„…†‡ˆ‰Š‹Œ
    * Ž''""•–—˜™š›œžŸ); everything else maps "sloppily": U+0080-U+00BF
    * pass through as their Latin-1 byte (ftfy's sloppy-windows-1252
    * posture — an undefined CP1252 byte decodes to its C1 codepoint,
    * so the inverse must accept it back), anything else is
    * unmappable (0). */
  private val cp1252Inverse: Map[Int, Int] = Map(
    0x20AC -> 0x80, 0x201A -> 0x82, 0x0192 -> 0x83, 0x201E -> 0x84,
    0x2026 -> 0x85, 0x2020 -> 0x86, 0x2021 -> 0x87, 0x02C6 -> 0x88,
    0x2030 -> 0x89, 0x0160 -> 0x8A, 0x2039 -> 0x8B, 0x0152 -> 0x8C,
    0x017D -> 0x8E, 0x2018 -> 0x91, 0x2019 -> 0x92, 0x201C -> 0x93,
    0x201D -> 0x94, 0x2022 -> 0x95, 0x2013 -> 0x96, 0x2014 -> 0x97,
    0x02DC -> 0x98, 0x2122 -> 0x99, 0x0161 -> 0x9A, 0x203A -> 0x9B,
    0x0153 -> 0x9C, 0x017E -> 0x9E, 0x0178 -> 0x9F)

  private def sloppyByte(c: Int): Int =
    cp1252Inverse.getOrElse(c, if (c >= 0x80 && c <= 0xBF) c else 0)

  /** The REPAIR step complementing [[mojibakePanel]]'s detection — the
    * ftfy fix for exactly the detector's classes, one deterministic
    * left-to-right pass:
    *  - `Ã` + [U+0080-U+00BF]: the 2-byte double-UTF8 class — the pair
    *    IS the UTF-8 encoding (0xC3, b) read as Latin-1, so the repair
    *    re-decodes it: emit U+00C0 + (b - 0x80) (é from "Ã©");
    *  - `â€` + c where c's sloppy-CP1252 byte b3 ∈ [0x80, 0xBF]: the
    *    3-byte class — (0xE2, 0x80, b3) read as CP1252, re-decoded to
    *    U+2000 + (b3 - 0x80) ('’' from "â€™");
    *  - stray C1 (U+0080-U+009F) and C0-except-TAB/LF/CR controls are
    *    STRIPPED (binary bleed has no textual reading);
    *  - everything else — including U+FFFD, which records an upstream
    *    decoder's loss and is NOT repairable, and `â€` sequences whose
    *    third character maps outside a UTF-8 continuation byte —
    *    passes through byte-identical, so clean text round-trips
    *    unchanged and honest damage stays visible to the detector.
    * Scope is deliberately the detector's own two double-UTF8 classes
    * (the two highest-frequency mojibake shapes), not a generic
    * any-prefix resurrection: a wider rule (e.g. every U+00C2-U+00DF
    * lead) starts rewriting legitimate text ("Ö£") without ftfy's
    * badness heuristics, which is worse than leaving it flagged. */
  private[ops] def mojibakeRepair(t: String): String = {
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i).toInt
      if (c == 0xC3 && i + 1 < t.length &&
          t.charAt(i + 1) >= 0x80 && t.charAt(i + 1) <= 0xBF) {
        sb.append((t.charAt(i + 1) + 0x40).toChar); i += 2
      } else if (c == 0xE2 && i + 2 < t.length &&
          t.charAt(i + 1).toInt == 0x20AC &&
          sloppyByte(t.charAt(i + 2).toInt) >= 0x80) {
        sb.append((0x2000 + sloppyByte(t.charAt(i + 2).toInt) - 0x80).toChar)
        i += 3
      } else if ((c >= 0x80 && c <= 0x9F) || (c >= 0x01 && c <= 0x08) ||
          c == 0x0B || c == 0x0C || (c >= 0x0E && c <= 0x1F)) {
        i += 1 // stripped: stray C1 / C0-except-TAB-LF-CR
      } else { sb.append(t.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** The transformative companion row to T274 (the dedup_substr_clean
    * pattern): run [[mojibakeRepair]] over the corpus and hash-check
    * the per-source repair ledger — docs changed, characters removed,
    * and the four detector counts RE-RUN ON THE REPAIRED TEXT (zeros
    * for the repairable classes must be computed by both engines
    * applying the same repair, never pinned; U+FFFD survives repair by
    * design and its post count says so). The oracle replays the whole
    * repair character-by-character in SQL — the greedy scan decomposes
    * into independent per-position classification because no repair's
    * leading character can ever be consumed by another repair (starts
    * are Ã/â, consumed positions are continuation-class). One
    * mapPartitions scan (the repair needs 2-char lookahead, beyond a
    * codegen'd regex), detectors stay codegen'd column expressions,
    * one map-side-combinable aggregate. */
  def textMojibakeFix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.spread(Tables.documents(s, d))
      .select(col("source"), col("text")).as[(String, String)]
    val fixed = docs.mapPartitions { it =>
      it.map { case (src, t) => (src, t, mojibakeRepair(t)) }
    }.toDF("source", "text", "fixed")
    fixed.select(col("source"),
        (col("text") =!= col("fixed")).cast("long").as("changed"),
        (length(col("text")) - length(col("fixed"))).cast("long")
          .as("removed"),
        regexp_count(col("fixed"), lit("\uFFFD")).as("repl"),
        regexp_count(col("fixed"), lit("[\u0080-\u009F]")).as("c1"),
        regexp_count(col("fixed"),
          lit("\u00C3[\u0080-\u00BF]|\u00E2\u20AC")).as("dbl"),
        regexp_count(col("fixed"),
          lit("[\u0001-\u0008\u000B\u000C\u000E-\u001F]"))
          .as("ctrl"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("changed")).as("n_changed"),
        sum(col("removed")).as("chars_removed"),
        sum(col("repl")).cast("long").as("post_replacement"),
        sum(col("c1")).cast("long").as("post_c1"),
        sum(col("dbl")).cast("long").as("post_double_utf8"),
        sum(col("ctrl")).cast("long").as("post_controls"))
      .orderBy(col("source"))
  }

  /** T239: HAPAX LEGOMENA rate per source — the fraction of each
    * source's vocabulary seen exactly once, the classic lexical-health
    * probe (a scrape gone wrong shows up as a hapax spike — OCR
    * garbage, mangled encodings and boilerplate IDs are all
    * once-words; a natural corpus sits near the Zipf-predicted ~50%,
    * which is the reading [[textZipf]]'s slope fit can't give you
    * directly). One tokenize + (source, token) hash agg (map-side
    * combinable), then a source-cardinality fold — exact integers and
    * one 6dp ratio. */
  def textHapax(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables.documents(s, d))
      .select(col("source"), explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"))
        .as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("n"))
      .groupBy("source")
      .agg(count(lit(1)).as("vocab"),
        sum("n").as("n_tokens"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        round(col("hapax").cast("double") / col("vocab").cast("double"), 6)
          .as("hapax_rate"))
      .orderBy("source")

  /** T263: REAL compression-ratio quality signal — the
    * Gopher/RefinedWeb-class filter "highly compressible text is
    * repetitive/boilerplate", computed with the JDK's actual DEFLATE
    * (zlib) per document inside one mapPartitions (one Deflater/
    * Inflater pair per partition, reset per row — the batched-codec
    * amortization). A compressed LENGTH is not replayable in SQL, so
    * the hash-checked columns are the INVARIANTS the real codec must
    * satisfy over the CHECKED band of the corpus — docs of 32 B to
    * 32 KiB, mirrored replayably in the oracle (tiny docs are all
    * zlib header so the ratio bound is vacuous; past the 32 KiB LZ77
    * window the second copy of t∥t cannot back-reference the first,
    * so the doubling claim only holds in-window; the lower bound is
    * 128 B, not 32, because zlib's fixed ~11-byte overhead (2-byte
    * header + deflate block header + 4-byte Adler) puts even a
    * low-redundancy 32-48 B doc at ratio ≈1.2-1.35 — the sanity bound
    * needs real headroom over the constant cost): inflate∘deflate
    * round-trips every checked doc (roundtrip_ok = n_checked),
    * doubling the text never increases the ratio (doubling_violations
    * = 0), and every checked ratio lies in (0, 1.2). The per-source
    * MEAN ratio itself feeds engine-side consumers (a quality gate
    * would threshold it); here it is asserted sane, not replayed. */
  def textCompress(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.spread(Tables.documents(s, d))
      .select(col("source"), col("text"))
      .as[(String, String)]
    val per = docs.mapPartitions { it =>
      // one codec pair per partition (the batched-codec amortization);
      // native zlib memory is released on TASK COMPLETION, not GC —
      // a consumer that short-circuits the iterator (limit, take,
      // task failure) would leak it under a drain-detecting wrapper
      val defl = new java.util.zip.Deflater()
      val infl = new java.util.zip.Inflater()
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          defl.end(); infl.end()
        })
      val buf = new Array[Byte](1 << 16)
      def deflate(bytes: Array[Byte]): Array[Byte] = {
        defl.reset(); defl.setInput(bytes); defl.finish()
        val z = new java.io.ByteArrayOutputStream()
        while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
        z.toByteArray
      }
      def roundtrips(z: Array[Byte], bytes: Array[Byte]): Boolean = {
        infl.reset(); infl.setInput(z)
        val out = new Array[Byte](bytes.length)
        var got = 0
        while (got < out.length && !infl.finished()) {
          val n = infl.inflate(out, got, out.length - got)
          if (n == 0 && (infl.needsInput() || infl.needsDictionary()))
            return false
          got += n
        }
        got == bytes.length && java.util.Arrays.equals(out, bytes)
      }
      it.map { case (source, text) =>
        val b = text.getBytes("UTF-8")
        val checked = b.length >= 128 && b.length <= 32768
        if (!checked) (source, 0.0, false, true, true, true)
        else {
          // ONE deflate serves both the ratio and the round trip
          val z = deflate(b)
          val ratio = z.length.toDouble / b.length
          val doubled = deflate((text + text).getBytes("UTF-8"))
            .length.toDouble / (2.0 * b.length)
          (source, ratio, true, doubled <= ratio, roundtrips(z, b),
            ratio > 0.0 && ratio < 1.2)
        }
      }
    }.toDF("source", "ratio", "checked", "doubling_ok", "roundtrip",
      "sane")
    per.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("checked"), 1L).otherwise(0L)).as("n_checked"),
        sum(when(col("checked") && col("roundtrip"), 1L).otherwise(0L))
          .as("roundtrip_ok"),
        sum(when(col("doubling_ok"), 0L).otherwise(1L))
          .as("doubling_violations"),
        min(col("sane")).as("ratio_sane"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "crawl_funnel"        -> crawlFunnel _,
    "text_html_extract"   -> textHtmlExtract _,
    "text_mojibake_fix"   -> textMojibakeFix _,
    "text_mojibake"       -> textMojibake _,
    "text_compress"       -> textCompress _,
    "text_hapax"          -> textHapax _,
    "text_watermark"      -> textWatermark _,
    "dedup_cdc_share"     -> dedupCdcShare _,
    "text_code_frac"      -> textCodeFrac _,
    "text_ngram_coverage" -> textNgramCoverage _,
    "text_hash_features"    -> textHashingFeatures _,
    "text_boilerplate"      -> textBoilerplateFrac _,
    "text_cdc_chunks"       -> textCdcChunks _,
    "text_novelty"          -> textNovelty _,
    "text_burstiness"       -> textBurstiness _,
    "text_vocab_growth"     -> textVocabGrowth _,
    "text_lang_confusion"   -> textLangConfusion _,
    "text_jsd_sources"      -> textJsdSources _,
    "text_gopher_rules"     -> textGopherRules _,
    "text_textrank"         -> textTextrank _,
    "text_sentiment"        -> textSentiment _,
    "text_winnow"           -> textWinnow _,
    "text_rake"             -> textRake _,
    "text_diversity"        -> textDiversity _,
    "text_readability"      -> textReadability _,
    "text_cms"              -> textCms _,
    "text_zipf"             -> textZipf _,
    "text_heavyhitters"     -> textHeavyHitters _,
    "text_pmi"              -> textPmi _,
    "text_topterms"         -> textTopTerms _,
    "text_search_bm25"      -> textSearchBm25 _,
    "text_entropy"          -> textEntropy _,
    "text_normalize"        -> textNormalize _,
    "filter_funnel"         -> filterFunnel _,
    "text_repetition"       -> textRepetition _,
    "text_pii"              -> textPii _,
    "text_tokens"           -> textTokens _,
    "text_quality"          -> textQuality _,
    "text_langid"           -> textLangId _,
    "text_fingerprint"      -> textFingerprint _,
    "text_fingerprint_roll" -> textFingerprintRoll _)

  // the stopword-vote language detector as a reusable CTE chain
  // (shared by the per-doc langid row and the confusion matrix)
  private val langidCte =
    """t AS (
      |  SELECT doc_id, lang AS labeled_lang,
      |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x != '') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, labeled_lang, toks, list_max([
      |    {'s': len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','that','for','with','was'))), 'l': 'en'},
      |    {'s': len(list_filter(toks, x -> x IN ('el','la','los','las','de','que','y','en','un','una','por','con'))), 'l': 'es'},
      |    {'s': len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','mit','ein','eine','zu','den'))), 'l': 'de'},
      |    {'s': len(list_filter(toks, x -> x IN ('le','la','les','des','et','est','une','dans','que','pour','qui'))), 'l': 'fr'},
      |    {'s': len(list_filter(toks, x -> x IN ('o','os','um','uma','do','da','em','para','com','não','por'))), 'l': 'pt'},
      |    {'s': len(list_filter(toks, x -> x IN ('il','lo','gli','che','di','e','un','una','per','con','del'))), 'l': 'it'}
      |  ]) AS best FROM t),
      |d AS (
      |  SELECT doc_id, labeled_lang,
      |    CASE WHEN len(toks) = 0 OR best.s = 0 THEN 'und' ELSE best.l END
      |      AS detected_lang
      |  FROM s)""".stripMargin

  /** The CDC cut/chunk CTE chain (`chx` = exploded chunks), shared
    * verbatim by the text_cdc_chunks and text_boilerplate oracles. */
  private lazy val cdcOracleCtes: String =
    """cx AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_concat(list_concat([CAST(0 AS BIGINT)],
        |      list_transform(list_filter(
        |        range(1, greatest(length(t) - 6, 1)),
        |        p -> (cs[p] * 27512614111
        |            + cs[p + 1] * 887503681
        |            + cs[p + 2] * 28629151
        |            + cs[p + 3] * 923521
        |            + cs[p + 4] * 29791
        |            + cs[p + 5] * 961
        |            + cs[p + 6] * 31
        |            + cs[p + 7]) % 256 < 16),
        |        p -> p + 7)),
        |      [CAST(length(t) AS BIGINT)]) AS cuts,
        |    t
        |  FROM (SELECT doc_id, text AS t,
        |          list_transform(string_split(text, ''),
        |            c -> CAST(unicode(c) AS BIGINT)) AS cs
        |        FROM documents)),
        |chx AS MATERIALIZED (
        |  SELECT doc_id, UNNEST(list_filter(
        |    list_transform(range(1, len(cuts)),
        |      i -> substr(t, CAST(cuts[i] + 1 AS INTEGER),
        |        CAST(cuts[i + 1] - cuts[i] AS INTEGER))),
        |    c -> c != '')) AS chunk
        |  FROM cx)""".stripMargin

  /** The sloppy-CP1252 inverse byte as inline SQL (the [[sloppyByte]]
    * table restated as a searched CASE over codepoint `x`): the 27
    * Windows-1252 specials, then the Latin-1/C1 passthrough band,
    * else 0 (unmappable). Generated, because the repair oracle needs
    * it inlined at three positions. */
  private def sqlSloppyByte(x: String): String = {
    val whens = cp1252Inverse.toSeq.sorted
      .map { case (c, b) => s"WHEN $x = $c THEN $b" }.mkString(" ")
    s"(CASE $whens WHEN $x BETWEEN 128 AND 191 THEN $x ELSE 0 END)"
  }

  /** The character-level repair replay (`cps` → `fix` CTEs), shared by
    * the text_mojibake_fix and crawl_funnel oracles so the two cannot
    * drift; `passCols` ride through. Margin-free text: it interpolates
    * into stripMargin'd strings, so no line may lead with a pipe (the
    * double-strip trap in the verify notes). */
  private def sqlRepairCtes(passCols: String): String = {
    val bSelf = sqlSloppyByte("cp[i]")
    val bNext = sqlSloppyByte("cp[i+1]")
    val bThird = sqlSloppyByte("cp[i+2]")
    s"""cps AS (
  SELECT $passCols, text,
    list_transform(string_split(text, ''), c -> unicode(c)) AS cp,
    string_split(text, '') AS cs
  FROM documents),
fix AS (
  SELECT $passCols, text,
    array_to_string(list_transform(range(1, len(cp) + 1), i ->
      CASE
        WHEN i >= 2 AND cp[i-1] = 195
          AND cp[i] BETWEEN 128 AND 191 THEN ''
        WHEN i >= 2 AND cp[i-1] = 226 AND cp[i] = 8364
          AND $bNext >= 128 THEN ''
        WHEN i >= 3 AND cp[i-2] = 226 AND cp[i-1] = 8364
          AND $bSelf >= 128 THEN ''
        WHEN cp[i] = 195
          AND COALESCE(cp[i+1], 0) BETWEEN 128 AND 191
          THEN chr(CAST(cp[i+1] + 64 AS INTEGER))
        WHEN cp[i] = 226 AND COALESCE(cp[i+1], 0) = 8364
          AND $bThird >= 128
          THEN chr(CAST(8064 + $bThird AS INTEGER))
        WHEN cp[i] BETWEEN 128 AND 159 THEN ''
        WHEN cp[i] BETWEEN 1 AND 8 OR cp[i] IN (11, 12)
          OR cp[i] BETWEEN 14 AND 31 THEN ''
        ELSE cs[i] END), '') AS fixed
  FROM cps)"""
  }

  val oracles: Map[String, String] = Map(
    // the filter_funnel stage replay with the extraction stage
    // prepended AND the repair replayed: a doc keeps its recovered
    // text iff its main block survives the >= 4-words boilerplate rule
    // on the RAW text (extraction precedes repair and returns the text
    // verbatim — separately hash-checked), and every later gate runs
    // on the REPAIRED text in both engines, so the parity holds on ANY
    // corpus, mojibaked or clean — no identity assumption
    "crawl_funnel" ->
      s"""WITH ${sqlRepairCtes("doc_id, lang")},
        |f AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
        |      x -> x != '')) >= 4 AS sx,
        |    length(trim(fixed)) > 0 AS raw2,
        |    md5(regexp_replace(lower(trim(fixed)), '\\s+', ' ', 'g'))
        |      AS fp,
        |    CASE WHEN length(trim(fixed)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(fixed), '\\s+')) END
        |      AS n_words,
        |    len(regexp_extract_all(fixed, '[^\\w\\s]')) AS n_punct,
        |    length(fixed) AS n_chars2,
        |    len(regexp_extract_all(lower(fixed),
        |      '\\b(the|a|an|of|to|in|and|is|it|that|for|on|was|with|as|at|be|this|are|or)\\b'))
        |      AS n_stop
        |  FROM fix),
        |g AS (
        |  SELECT doc_id, fp, sx,
        |    sx AND raw2 AS s2,
        |    sx AND raw2 AND lang = 'en' AS s3,
        |    sx AND raw2 AND lang = 'en' AND
        |      round(least(CAST(n_words AS DOUBLE) / 20.0, 1.0)
        |        * least(round(CAST(n_stop AS DOUBLE) / greatest(n_words, 1), 6) * 4.0, 1.0)
        |        * greatest(0.0, 1.0 - round(CAST(n_punct AS DOUBLE) / greatest(n_chars2, 1), 6) * 4.0), 6)
        |        >= 0.2 AS s4,
        |    n_words AS n_words
        |  FROM f),
        |h AS (
        |  SELECT doc_id, fp, sx, s2, s3, s4,
        |    s4 AND n_words BETWEEN 20 AND 5000 AS s5
        |  FROM g),
        |i AS (
        |  SELECT *,
        |    s5 AND doc_id = min(CASE WHEN s5 THEN doc_id END)
        |      OVER (PARTITION BY fp) AS s6
        |  FROM h),
        |c AS (
        |  SELECT count(*) AS n1, count(*) FILTER (sx) AS nx,
        |    count(*) FILTER (s2) AS n2, count(*) FILTER (s3) AS n3,
        |    count(*) FILTER (s4) AS n4, count(*) FILTER (s5) AS n5,
        |    count(*) FILTER (s6) AS n6
        |  FROM i)
        |SELECT 1 AS stage_idx, 'total' AS stage, n1 AS n_docs,
        |  round(CAST(n1 AS DOUBLE) / greatest(n1, 1), 6) AS retained_frac FROM c
        |UNION ALL SELECT 2, 'extracted', nx,
        |  round(CAST(nx AS DOUBLE) / greatest(n1, 1), 6) FROM c
        |UNION ALL SELECT 3, 'nonempty', n2,
        |  round(CAST(n2 AS DOUBLE) / greatest(n1, 1), 6) FROM c
        |UNION ALL SELECT 4, 'lang_en', n3,
        |  round(CAST(n3 AS DOUBLE) / greatest(n1, 1), 6) FROM c
        |UNION ALL SELECT 5, 'quality', n4,
        |  round(CAST(n4 AS DOUBLE) / greatest(n1, 1), 6) FROM c
        |UNION ALL SELECT 6, 'token_range', n5,
        |  round(CAST(n5 AS DOUBLE) / greatest(n1, 1), 6) FROM c
        |UNION ALL SELECT 7, 'exact_unique', n6,
        |  round(CAST(n6 AS DOUBLE) / greatest(n1, 1), 6) FROM c
        |ORDER BY stage_idx""".stripMargin,
    // the extraction ledger recomputed from the text alone: the wrap
    // is deterministic (template constant interpolated from the very
    // builder), the extractor must recover the text verbatim when the
    // >= 4-words Kohlschütter rule keeps the main block, and the
    // title/nav/footer boilerplate counts follow the wrap's shape
    "text_html_extract" ->
      s"""WITH f AS (
        |  SELECT source,
        |    len(list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
        |      x -> x != '')) AS wc,
        |    length(text) AS tlen,
        |    regexp_matches(text, '[^ \\t\\n\\r]') AS has_txt,
        |    len(regexp_extract_all(text, '&')) AS na,
        |    len(regexp_extract_all(text, '<')) AS nl,
        |    len(regexp_extract_all(text, '>')) AS ng,
        |    length(CAST(doc_id AS VARCHAR)) AS idlen
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN wc >= 4 OR tlen = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_ok,
        |  CAST(SUM(CASE WHEN wc >= 4 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(SUM(CASE WHEN wc >= 4 THEN tlen ELSE 0 END) AS BIGINT)
        |    AS extracted_chars,
        |  CAST(SUM(${htmlWrapConst} + idlen + tlen
        |    + 4 * na + 3 * nl + 3 * ng) AS BIGINT) AS html_chars,
        |  CAST(SUM(CASE WHEN wc >= 4 THEN 3 WHEN has_txt THEN 4
        |    ELSE 3 END) AS BIGINT) AS boiler_blocks,
        |  CAST(COUNT(*) * 4 AS BIGINT) AS links_dropped
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    // the full repair REPLAYED character-by-character in SQL: the
    // greedy scan decomposes into independent per-position
    // classification (no repair's lead char is ever consumable by
    // another repair), then the T274 detectors re-run on the repaired
    // text — zeros computed, never pinned
    "text_mojibake_fix" -> {
      s"""WITH ${sqlRepairCtes("source")},
        |m AS (
        |  SELECT source,
        |    CASE WHEN fixed <> text THEN 1 ELSE 0 END AS changed,
        |    length(text) - length(fixed) AS removed,
        |    len(regexp_extract_all(fixed, '\\x{FFFD}')) AS repl,
        |    len(regexp_extract_all(fixed,
        |      '[\\x{0080}-\\x{009F}]')) AS c1,
        |    len(regexp_extract_all(fixed,
        |      '\\x{00C3}[\\x{0080}-\\x{00BF}]|\\x{00E2}\\x{20AC}')) AS dbl,
        |    len(regexp_extract_all(fixed,
        |      '[\\x{0001}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}]'))
        |      AS ctrl
        |  FROM fix)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(changed) AS BIGINT) AS n_changed,
        |  CAST(SUM(removed) AS BIGINT) AS chars_removed,
        |  CAST(SUM(repl) AS BIGINT) AS post_replacement,
        |  CAST(SUM(c1) AS BIGINT) AS post_c1,
        |  CAST(SUM(dbl) AS BIGINT) AS post_double_utf8,
        |  CAST(SUM(ctrl) AS BIGINT) AS post_controls
        |FROM m GROUP BY source ORDER BY source""".stripMargin
    },
    // both engines RUN the same four detectors (RE2 \\x{...} ranges =
    // the Java \\uXXXX classes on BMP points); the clean corpus yields
    // computed zeros, the spec injects mojibake fixtures
    "text_mojibake" ->
      """WITH m AS (
        |  SELECT source,
        |    len(regexp_extract_all(text, '\x{FFFD}')) AS repl,
        |    len(regexp_extract_all(text,
        |      '[\x{0080}-\x{009F}]')) AS c1,
        |    len(regexp_extract_all(text,
        |      '\x{00C3}[\x{0080}-\x{00BF}]|\x{00E2}\x{20AC}')) AS dbl,
        |    len(regexp_extract_all(text,
        |      '[\x{0001}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}]'))
        |      AS ctrl
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN repl + c1 + dbl + ctrl = 0 THEN 1
        |    ELSE 0 END) AS BIGINT) AS clean_docs,
        |  CAST(SUM(repl) AS BIGINT) AS n_replacement,
        |  CAST(SUM(c1) AS BIGINT) AS n_c1_controls,
        |  CAST(SUM(dbl) AS BIGINT) AS n_double_utf8,
        |  CAST(SUM(ctrl) AS BIGINT) AS n_controls
        |FROM m GROUP BY source ORDER BY source""".stripMargin,
    // compressed lengths are not replayable in SQL; the row pins the
    // codec's corpus-wide invariants (round trip everywhere, doubling
    // never raises the ratio, ratios in (0,1.2)) plus the replayable
    // per-source doc counts — the plan-census pinning idiom
    "text_compress" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN octet_length(encode(text))
        |      BETWEEN 128 AND 32768 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_checked,
        |  CAST(SUM(CASE WHEN octet_length(encode(text))
        |      BETWEEN 128 AND 32768 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS roundtrip_ok,
        |  CAST(0 AS BIGINT) AS doubling_violations,
        |  TRUE AS ratio_sane
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // same tokenize + (source, token) fold; SUM/COUNT cast to BIGINT
    "text_hapax" ->
      """WITH tf AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (
        |    SELECT source, UNNEST(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t != '')) AS tok
        |    FROM documents)
        |  GROUP BY source, tok)
        |SELECT source,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS vocab,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS hapax,
        |  round(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_rate
        |FROM tf GROUP BY source ORDER BY source""".stripMargin,
    // identical green rule (first md5 hex digit of 'w1|w2' in 0-7) and
    // z off exact integer counts; SUM/COUNT cast to BIGINT
    "text_watermark" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t != '') AS ts
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, UNNEST(list_transform(range(1, len(ts)),
        |    i -> ts[i] || '|' || ts[i + 1])) AS b
        |  FROM toks WHERE len(ts) >= 2),
        |cnt AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(CASE WHEN substr(md5(b), 1, 1) IN
        |      ('0','1','2','3','4','5','6','7') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_green
        |  FROM bi GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, n_green,
        |  round((2.0 * CAST(n_green AS DOUBLE) - CAST(n_bigrams AS DOUBLE))
        |    / sqrt(CAST(n_bigrams AS DOUBLE)), 6) AS z_green
        |FROM cnt
        |ORDER BY z_green DESC, doc_id ASC LIMIT 20""".stripMargin,
    // same exact char-class counts (regexp_replace with the 'g' flag),
    // same quantized score and 0.05 decimal cut
    "text_code_frac" ->
      """WITH f AS MATERIALIZED (
        |  SELECT source, CAST(length(text) AS BIGINT) AS chars,
        |    CAST(length(regexp_replace(text, '[^;{}()=<>\[\]]', '', 'g'))
        |      AS BIGINT) AS sym,
        |    CAST(len(regexp_extract_all(text, '[a-z][A-Z]'))
        |      AS BIGINT) AS camel,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
        |      AS BIGINT) AS dig
        |  FROM documents),
        |sc AS (
        |  SELECT source,
        |    CAST(round((4.0 * CAST(sym AS DOUBLE)
        |      + 2.0 * CAST(camel AS DOUBLE) + CAST(dig AS DOUBLE))
        |      / CAST(chars AS DOUBLE), 9) AS DECIMAL(18,9)) AS score
        |  FROM f WHERE chars > 0),
        |agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN score > 0.05 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_code,
        |    SUM(CAST(score AS DECIMAL(19,9))) AS sscore
        |  FROM sc GROUP BY source)
        |SELECT source, n_docs, n_code,
        |  round(CAST(n_code AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS frac_code,
        |  round(CAST(sscore AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS mean_score
        |FROM agg ORDER BY source""".stripMargin,
    // same (freq desc, tok asc) rank restated as one global
    // row_number (oracle-side only), same exact-integer coverage
    "text_ngram_coverage" ->
      """WITH vocab AS MATERIALIZED (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM (SELECT UNNEST(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t != '')) AS tok
        |    FROM documents) t
        |  GROUP BY tok),
        |ranked AS MATERIALIZED (
        |  SELECT freq, CAST(row_number() OVER (ORDER BY freq DESC,
        |    tok ASC) AS BIGINT) AS rank
        |  FROM vocab),
        |head AS (SELECT rank, freq FROM ranked WHERE rank <= 10000),
        |tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS t,
        |  CAST(COUNT(*) AS BIGINT) AS vsz FROM vocab),
        |cuts AS (SELECT UNNEST([100, 1000, 10000]) AS v)
        |SELECT CAST(c.v AS INTEGER) AS v,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(h.freq) AS BIGINT) AS covered,
        |  MAX(tot.vsz) AS vocab_size, MAX(tot.t) AS total_tokens,
        |  round(CAST(SUM(h.freq) AS DOUBLE) / CAST(MAX(tot.t) AS DOUBLE),
        |    6) AS coverage
        |FROM head h JOIN cuts c ON h.rank <= c.v CROSS JOIN tot
        |GROUP BY c.v ORDER BY c.v""".stripMargin,
    // same md5-mod bucket, same conditional sums, all-zero rows kept
    "text_hash_features" -> {
      val fcols = (0 until 16).map(i =>
        s"COALESCE(f.f$i, 0) AS f$i").mkString(",\n        |  ")
      val fsum = (0 until 16).map(i =>
        s"CAST(SUM(CASE WHEN b = $i THEN n ELSE 0 END) AS BIGINT) AS f$i")
        .mkString(",\n        |    ")
      s"""WITH tb AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 16
        |      AS BIGINT) AS b,
        |    COUNT(*) AS n
        |  FROM (
        |    SELECT doc_id, UNNEST(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t != '')) AS tok
        |    FROM documents)
        |  GROUP BY 1, 2),
        |f AS (
        |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_toks,
        |    $fsum
        |  FROM tb GROUP BY 1)
        |SELECT d.doc_id, COALESCE(f.n_toks, 0) AS n_toks,
        |  $fcols
        |FROM documents d LEFT JOIN f USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin
    },
    // same chunk derivation; shared = hash spans >= 2 distinct docs
    "text_boilerplate" ->
      s"""WITH $cdcOracleCtes,
        |ch AS MATERIALIZED (
        |  SELECT doc_id, md5(chunk) AS h, length(chunk) AS clen
        |  FROM chx),
        |sp AS MATERIALIZED (
        |  SELECT h, COUNT(DISTINCT doc_id) AS n_docs
        |  FROM ch GROUP BY h)
        |SELECT ch.doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN sp.n_docs >= 2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS shared_chunks,
        |  round(CAST(SUM(CASE WHEN sp.n_docs >= 2 THEN clen ELSE 0
        |      END) AS DOUBLE)
        |    / CAST(SUM(clen) AS DOUBLE), 6) AS shared_frac
        |FROM ch JOIN sp USING (h)
        |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin,
    // identical Horner-gram cut rule, list-op chunk expansion, and
    // spread-ordered top-20 (DuckDB's range already empties on short
    // docs; the guard mirrors the engine's sequence() reversal guard)
    // same Horner cut rule via the shared CTE chain; the spread cap
    // (2..8 docs) and the (jaccard, shared, d1, d2) total order are
    // mirrored exactly — jaccard is an exact-integer ratio in both
    "dedup_cdc_share" ->
      s"""WITH $cdcOracleCtes,
        |ch AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, md5(chunk) AS h FROM chx),
        |pd AS MATERIALIZED (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM ch GROUP BY doc_id),
        |sp AS MATERIALIZED (
        |  SELECT h FROM ch GROUP BY h
        |  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 8),
        |k AS MATERIALIZED (
        |  SELECT ch.doc_id, ch.h FROM ch JOIN sp USING (h)),
        |pr AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, shared, pa.n AS n1, pb.n AS n2,
        |  round(CAST(shared AS DOUBLE)
        |    / CAST(pa.n + pb.n - shared AS DOUBLE), 6) AS jaccard
        |FROM pr
        |JOIN pd pa ON pr.d1 = pa.doc_id
        |JOIN pd pb ON pr.d2 = pb.doc_id
        |ORDER BY jaccard DESC, shared DESC, d1, d2 LIMIT 20""".stripMargin,
    "text_cdc_chunks" ->
      s"""WITH $cdcOracleCtes
        |SELECT md5(chunk) AS chunk_md5,
        |  COUNT(DISTINCT doc_id) AS n_docs,
        |  COUNT(*) AS n_occur,
        |  CAST(MAX(length(chunk)) AS INTEGER) AS chunk_len
        |FROM chx GROUP BY 1
        |ORDER BY n_docs DESC, n_occur DESC, chunk_md5 ASC
        |LIMIT 20""".stripMargin,
    // monolithic ntile replay of the two-level decile rank; identical
    // first-occurrence attribution and 10-row cumulative sums
    "text_vocab_growth" ->
      """WITH dt AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'),
        |    t -> t != '')) AS tok
        |  FROM documents),
        |pd AS (SELECT doc_id, COUNT(*) AS n_toks FROM dt GROUP BY 1),
        |docs AS (
        |  SELECT d.doc_id, coalesce(pd.n_toks, 0) AS n_toks,
        |    CAST((row_number() OVER (ORDER BY d.doc_id) - 1) * 10
        |      // (SELECT COUNT(*) FROM documents) AS INTEGER) + 1
        |      AS decile
        |  FROM documents d LEFT JOIN pd USING (doc_id)),
        |fst AS (SELECT tok, MIN(doc_id) AS fd FROM dt GROUP BY 1),
        |nt AS (
        |  SELECT docs.decile, COUNT(*) AS new_types
        |  FROM fst JOIN docs ON docs.doc_id = fst.fd
        |  GROUP BY 1),
        |panel AS (
        |  SELECT decile, COUNT(*) AS n_docs,
        |    CAST(SUM(n_toks) AS BIGINT) AS toks
        |  FROM docs GROUP BY 1)
        |SELECT p.decile, p.n_docs,
        |  CAST(SUM(p.toks) OVER (ORDER BY p.decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_tokens,
        |  CAST(coalesce(nt.new_types, 0) AS BIGINT) AS new_types,
        |  CAST(SUM(coalesce(nt.new_types, 0)) OVER (ORDER BY p.decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_vocab,
        |  round(CAST(SUM(coalesce(nt.new_types, 0)) OVER (
        |      ORDER BY p.decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE)
        |    / CAST(SUM(p.toks) OVER (ORDER BY p.decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE), 6) AS ttr
        |FROM panel p LEFT JOIN nt USING (decile)
        |ORDER BY p.decile""".stripMargin,
    // same zero-free moment computation; identical fixed VMR tree
    "text_burstiness" ->
      """WITH dt AS (
        |  SELECT doc_id, tok, COUNT(*) AS c FROM (
        |    SELECT doc_id, UNNEST(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t != '')) AS tok
        |    FROM documents)
        |  GROUP BY 1, 2),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
        |a AS (
        |  SELECT tok, COUNT(*) AS n_docs,
        |    CAST(SUM(c) AS BIGINT) AS tot,
        |    CAST(SUM(c * c) AS BIGINT) AS ss
        |  FROM dt GROUP BY 1)
        |SELECT tok, tot, n_docs,
        |  round((CAST(ss AS DOUBLE) / n
        |    - (CAST(tot AS DOUBLE) / n) * (CAST(tot AS DOUBLE) / n))
        |    / (CAST(tot AS DOUBLE) / n), 6) AS vmr
        |FROM a, n WHERE tot >= 50
        |ORDER BY tot DESC, tok ASC LIMIT 20""".stripMargin,
    // same shingle construction (TrainOps.shingleCte, shared with the
    // ngram-dedup/contamination oracles), min-doc_id first occurrence
    "text_novelty" ->
      s"""WITH ${TrainOps.shingleCte},
         |f AS (SELECT shingle, MIN(doc_id) AS fd FROM sh GROUP BY 1),
         |n AS (
         |  SELECT s.doc_id, COUNT(*) AS n_shingles,
         |    CAST(SUM(CASE WHEN f.fd = s.doc_id THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_novel
         |  FROM sh s JOIN f USING (shingle) GROUP BY 1)
         |SELECT doc_id, n_shingles, n_novel,
         |  round(CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6)
         |    AS novelty
         |FROM n ORDER BY doc_id""".stripMargin,
    // shared-token JSD identity with the same 1e-12 quantized terms
    "text_jsd_sources" ->
      """WITH tk AS (
        |  SELECT source, UNNEST(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'),
        |    t -> t != '')) AS tok
        |  FROM documents),
        |cnt AS (SELECT source, tok, COUNT(*) AS n FROM tk GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot
        |        FROM cnt GROUP BY 1),
        |p AS (
        |  SELECT c.source, c.tok,
        |    CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
        |  FROM cnt c JOIN tot t USING (source)),
        |sh AS (
        |  SELECT a.source AS s1, b.source AS s2, a.p AS pa, b.p AS pb
        |  FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source),
        |agg AS (
        |  SELECT s1, s2, COUNT(*) AS n_shared,
        |    CAST(SUM(CAST(floor((0.5 * pa * ln(2.0 * pa / (pa + pb))
        |        + 0.5 * pb * ln(2.0 * pb / (pa + pb)))
        |        * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sq,
        |    CAST(SUM(CAST(floor(pa * 1000000000000.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS spa,
        |    CAST(SUM(CAST(floor(pb * 1000000000000.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS spb
        |  FROM sh GROUP BY 1, 2),
        |grid AS (
        |  SELECT a.source AS s1, b.source AS s2
        |  FROM tot a, tot b WHERE a.source < b.source)
        |SELECT g.s1, g.s2,
        |  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
        |  round(CAST(coalesce(sq, 0) AS DOUBLE) / 1000000000000.0
        |    + 0.5 * ln(2.0)
        |    * (2.0 - CAST(coalesce(spa, 0) AS DOUBLE) / 1000000000000.0
        |    - CAST(coalesce(spb, 0) AS DOUBLE) / 1000000000000.0), 6) AS jsd
        |FROM grid g LEFT JOIN agg USING (s1, s2)
        |ORDER BY s1, s2""".stripMargin,
    // same seven per-doc rule flags from identical word/line splits,
    // one aggregate, 8-row unpivot
    "text_gopher_rules" ->
      """WITH f AS (
        |  SELECT
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      w -> w != '') AS ws,
        |    string_split(text, chr(10)) AS ls,
        |    text
        |  FROM documents),
        |g AS (
        |  SELECT
        |    len(ws) AS nw,
        |    CAST(greatest(len(ws), 1) AS DOUBLE) AS sw,
        |    CAST(greatest(len(ls), 1) AS DOUBLE) AS sl,
        |    CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0)
        |      AS DOUBLE) AS wlen,
        |    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
        |      AS nalpha,
        |    len(list_filter(ls, l -> regexp_matches(trim(l), '^[-*•]')))
        |      AS nbull,
        |    len(list_filter(ls, l -> regexp_matches(trim(l), '\.\.\.$')))
        |      AS nell_l,
        |    length(text) - length(replace(text, '#', '')) AS nhash,
        |    len(regexp_extract_all(text, '\.\.\.')) AS nell,
        |    len(regexp_extract_all(lower(text),
        |      '\b(the|be|to|of|and|that|have|with)\b')) AS nstop
        |  FROM f),
        |fl AS (
        |  SELECT
        |    CASE WHEN nw >= 50 AND nw <= 100000 THEN 1 ELSE 0 END AS c1,
        |    CASE WHEN wlen / sw >= 3.0 AND wlen / sw <= 10.0
        |      THEN 1 ELSE 0 END AS c2,
        |    CASE WHEN CAST(nhash + nell AS DOUBLE) / sw <= 0.1
        |      THEN 1 ELSE 0 END AS c3,
        |    CASE WHEN CAST(nbull AS DOUBLE) / sl < 0.9
        |      THEN 1 ELSE 0 END AS c4,
        |    CASE WHEN CAST(nell_l AS DOUBLE) / sl <= 0.3
        |      THEN 1 ELSE 0 END AS c5,
        |    CASE WHEN CAST(nalpha AS DOUBLE) / sw >= 0.8
        |      THEN 1 ELSE 0 END AS c6,
        |    CASE WHEN nstop >= 2 THEN 1 ELSE 0 END AS c7
        |  FROM g),
        |a AS (
        |  SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(c1) AS BIGINT) AS s1, CAST(SUM(c2) AS BIGINT) AS s2,
        |    CAST(SUM(c3) AS BIGINT) AS s3, CAST(SUM(c4) AS BIGINT) AS s4,
        |    CAST(SUM(c5) AS BIGINT) AS s5, CAST(SUM(c6) AS BIGINT) AS s6,
        |    CAST(SUM(c7) AS BIGINT) AS s7,
        |    CAST(SUM(c1 * c2 * c3 * c4 * c5 * c6 * c7) AS BIGINT) AS sa
        |  FROM fl),
        |u AS (
        |  SELECT 'word_count' AS rule, s1 AS n_pass, n_docs FROM a
        |  UNION ALL SELECT 'mean_word_len', s2, n_docs FROM a
        |  UNION ALL SELECT 'hash_ellipsis', s3, n_docs FROM a
        |  UNION ALL SELECT 'bullet_lines', s4, n_docs FROM a
        |  UNION ALL SELECT 'ellipsis_lines', s5, n_docs FROM a
        |  UNION ALL SELECT 'alpha_words', s6, n_docs FROM a
        |  UNION ALL SELECT 'stop_words', s7, n_docs FROM a
        |  UNION ALL SELECT 'all', sa, n_docs FROM a)
        |SELECT rule, n_pass, n_docs - n_pass AS n_fail,
        |  round(CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS pass_rate
        |FROM u ORDER BY rule""".stripMargin,
    // 5 unrolled PageRank layers over the vocab graph; contributions
    // quantize to 1e-12 scaled longs exactly like the engine
    "text_textrank" -> {
      val iter = (prev: String, cur: String) =>
        s"""$cur AS (
           |  SELECT e.dst AS word,
           |    0.15 / (SELECT vv FROM v) + 0.85 *
           |      (CAST(SUM(CAST(floor(p.r * e.w / e.wdeg
           |          * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
           |        / 1000000000000.0) AS r
           |  FROM ew e JOIN $prev p ON e.src = p.word GROUP BY e.dst)"""
          .stripMargin
      s"""WITH ts AS (
         |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |    t -> t != '') AS ts
         |  FROM documents),
         |bi AS (
         |  SELECT p.a AS a, p.b AS b, COUNT(*) AS w FROM (
         |    SELECT UNNEST(list_transform(range(1, len(ts)),
         |      i -> struct_pack(a := least(ts[i], ts[i + 1]),
         |                       b := greatest(ts[i], ts[i + 1])))) AS p
         |    FROM ts WHERE len(ts) >= 2)
         |  WHERE p.a <> p.b GROUP BY 1, 2),
         |edges AS (SELECT a AS src, b AS dst, w FROM bi
         |          UNION ALL SELECT b AS src, a AS dst, w FROM bi),
         |wd AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wdeg
         |       FROM edges GROUP BY 1),
         |ew AS (SELECT e.src, e.dst, e.w, d.wdeg
         |       FROM edges e JOIN wd d USING (src)),
         |v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vv FROM wd),
         |tr0 AS (SELECT src AS word, 1.0 / (SELECT vv FROM v) AS r FROM wd),
         |${iter("tr0", "tr1")},
         |${iter("tr1", "tr2")},
         |${iter("tr2", "tr3")},
         |${iter("tr3", "tr4")},
         |${iter("tr4", "tr5")}
         |SELECT t.word, d.wdeg, round(t.r, 6) AS rank
         |FROM tr5 t JOIN wd d ON t.word = d.src
         |ORDER BY rank DESC, t.word ASC LIMIT 20""".stripMargin
    },
    "text_sentiment" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t != '') AS ts
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    len(list_filter(ts, t -> t IN
        |      ('fast', 'big', 'value', 'merge', 'spark'))) AS npos,
        |    len(list_filter(ts, t -> t IN
        |      ('slow', 'small', 'dup', 'error'))) AS nneg
        |  FROM t)
        |SELECT doc_id, CAST(npos AS INT) AS npos, CAST(nneg AS INT) AS nneg,
        |  CASE WHEN npos + nneg = 0 THEN 0.0
        |    ELSE round(CAST(npos - nneg AS DOUBLE)
        |      / CAST(npos + nneg AS DOUBLE), 6) END AS polarity,
        |  CASE WHEN npos > nneg THEN 'pos'
        |    WHEN nneg > npos THEN 'neg' ELSE 'neu' END AS label
        |FROM c ORDER BY doc_id""".stripMargin,
    // the 31·h+c polynomial in 128-bit mod-2⁶⁴ arithmetic, signed
    // conversion BEFORE the window minima so ordering matches JVM longs
    "text_winnow" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t != '') AS toks
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 3),
        |        i -> array_to_string(toks[i:i+4], ' '))
        |    END AS gs
        |  FROM toks),
        |hashed AS (
        |  SELECT doc_id, len(hu) AS n_grams,
        |    list_transform(hu, h ->
        |      CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |        THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT))
        |      AS hs
        |  FROM (
        |    SELECT doc_id,
        |      list_transform(gs, g ->
        |        list_reduce(
        |          list_prepend(1125899906842597::HUGEINT,
        |            list_transform(string_split(g, ''),
        |              c -> unicode(c)::HUGEINT)),
        |          (acc, c) -> (acc * 31 + c)
        |            % 18446744073709551616::HUGEINT)) AS hu
        |    FROM grams)),
        |sel AS (
        |  SELECT doc_id, n_grams,
        |    CASE WHEN n_grams = 0 THEN CAST([] AS BIGINT[])
        |      WHEN n_grams <= 4 THEN [list_min(hs)]
        |      ELSE list_distinct(list_transform(range(1, n_grams - 2),
        |        j -> list_min(hs[j:j+3])))
        |    END AS fps
        |  FROM hashed)
        |SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
        |  CAST(len(fps) AS INT) AS n_fp,
        |  list_min(fps) AS fp_min, list_max(fps) AS fp_max
        |FROM sel ORDER BY doc_id""".stripMargin,
    // identical mark→join→split segmentation and the same 1e-9
    // decimal-grid phrase-score sum
    "text_rake" ->
      """WITH marked AS (
        |  SELECT array_to_string(list_transform(
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t != ''),
        |    t -> CASE WHEN t IN ('a','the','and','of','to','in','is',
        |      'it','for','on') THEN '|' ELSE t END), ' ') AS m
        |  FROM documents),
        |phrases AS (
        |  SELECT trim(p) AS phrase
        |  FROM marked, UNNEST(string_split(m, '|')) AS t(p)
        |  WHERE trim(p) != ''),
        |pw AS (
        |  SELECT phrase, len(string_split(phrase, ' ')) AS plen, w
        |  FROM phrases, UNNEST(string_split(phrase, ' ')) AS u(w)),
        |ws AS (
        |  SELECT w,
        |    CAST(round(CAST(SUM(plen) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE), 9) AS DECIMAL(20,9)) AS wscore
        |  FROM pw GROUP BY 1),
        |ph AS (SELECT phrase, COUNT(*) AS n_occ FROM phrases GROUP BY 1),
        |pw2 AS (
        |  SELECT ph.phrase, ph.n_occ, u.w
        |  FROM ph, UNNEST(string_split(ph.phrase, ' ')) AS u(w))
        |SELECT pw2.phrase, pw2.n_occ,
        |  round(CAST(SUM(ws.wscore) AS DOUBLE), 6) AS score
        |FROM pw2 JOIN ws USING (w)
        |GROUP BY 1, 2
        |ORDER BY score DESC, phrase ASC LIMIT 20""".stripMargin,
    // same tokenization (the text_cms convention), exact integer
    // statistics, identical double expressions
    "text_diversity" ->
      """WITH toks AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'),
        |    t -> t != '')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |a AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS t,
        |    CAST(SUM(c * (c - 1)) AS BIGINT) AS sn
        |  FROM c GROUP BY 1)
        |SELECT doc_id, n AS n_tokens, t AS n_types,
        |  round(CAST(t AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ttr,
        |  CASE WHEN n > 1 THEN
        |    round(CAST(sn AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6)
        |  END AS simpson
        |FROM a ORDER BY doc_id""".stripMargin,
    // same three RE2-safe counts + the identical double-op order
    "text_readability" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INTEGER)
        |    AS n_words,
        |  CAST(len(regexp_extract_all(text, '[.!?]+')) AS INTEGER)
        |    AS n_sents,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INTEGER)
        |    AS n_sylls,
        |  round(206.835
        |    - 1.015 * (CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
        |        AS DOUBLE)
        |      / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |        AS DOUBLE))
        |    - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |        AS DOUBLE)
        |      / CAST(greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1)
        |        AS DOUBLE)), 6) AS flesch
        |FROM documents ORDER BY doc_id""".stripMargin,
    // full CMS replay: every token occurrence increments 3 buckets
    // (md5 nibble addressing, the Bloom idiom), est = min over the
    // probe token's 3 bucket counters — exact integers end to end
    "text_cms" ->
      """WITH toks AS (
        |  SELECT UNNEST(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != ''))
        |    AS tok
        |  FROM documents),
        |exact AS (SELECT tok, COUNT(*) AS exact FROM toks GROUP BY tok),
        |probes AS (
        |  SELECT tok, exact FROM exact
        |  ORDER BY exact DESC, tok LIMIT 20),
        |occ AS (
        |  SELECT tok, CAST(j AS INTEGER) AS j,
        |    CAST(list_sum(list_transform(range(3), i ->
        |      (strpos('0123456789abcdef', substr(md5(tok),
        |         CAST(j AS INTEGER) * 3 + CAST(i AS INTEGER) + 1, 1)) - 1)
        |      * power(16.0, CAST(2 - i AS DOUBLE)))) AS INTEGER) AS bucket
        |  FROM toks, UNNEST(range(3)) AS u(j)),
        |bc AS (SELECT j, bucket, COUNT(*) AS c FROM occ GROUP BY 1, 2),
        |ph AS (
        |  SELECT tok, CAST(j AS INTEGER) AS j,
        |    CAST(list_sum(list_transform(range(3), i ->
        |      (strpos('0123456789abcdef', substr(md5(tok),
        |         CAST(j AS INTEGER) * 3 + CAST(i AS INTEGER) + 1, 1)) - 1)
        |      * power(16.0, CAST(2 - i AS DOUBLE)))) AS INTEGER) AS bucket
        |  FROM probes, UNNEST(range(3)) AS u(j)),
        |est AS (
        |  SELECT ph.tok, CAST(MIN(bc.c) AS BIGINT) AS est
        |  FROM ph JOIN bc ON bc.j = ph.j AND bc.bucket = ph.bucket
        |  GROUP BY ph.tok)
        |SELECT p.tok, p.exact, e.est, e.est - p.exact AS overcount
        |FROM probes p JOIN est e USING (tok)
        |ORDER BY p.exact DESC, p.tok""".stripMargin,
    // rank-ordered list folds replay the engine's sorted aggregate
    // (seed 0.0 + x1 ≡ seed-from-first); slope/intercept share one
    // fixed expression tree; CASE NULL mirrors try_divide
    "text_zipf" ->
      """WITH toks AS (
        |  SELECT source, UNNEST(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != ''))
        |    AS tok
        |  FROM documents),
        |cnt AS (SELECT source, tok, COUNT(*) AS c
        |        FROM toks GROUP BY 1, 2),
        |top AS (
        |  SELECT source, rank,
        |    ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
        |  FROM (SELECT source, tok, c, ROW_NUMBER() OVER (
        |          PARTITION BY source ORDER BY c DESC, tok ASC) AS rank
        |        FROM cnt) WHERE rank <= 50),
        |s AS (
        |  SELECT source, COUNT(*) AS n_terms,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    list_reduce(list(x ORDER BY rank), (a, b) -> a + b) AS sx,
        |    list_reduce(list(y ORDER BY rank), (a, b) -> a + b) AS sy,
        |    list_reduce(list(x * x ORDER BY rank), (a, b) -> a + b) AS sxx,
        |    list_reduce(list(x * y ORDER BY rank), (a, b) -> a + b) AS sxy
        |  FROM top GROUP BY source),
        |f AS (
        |  SELECT source, n_terms, n, sx, sy,
        |    CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |      ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope
        |  FROM s)
        |SELECT source, n_terms, round(slope, 6) AS slope,
        |  round((sy - slope * sx) / n, 6) AS intercept
        |FROM f ORDER BY source""".stripMargin,
    // ground truth is the vocabulary-sized GROUP BY the sketch plan
    // avoids; MG recall above n/201 makes the sets provably equal at
    // the 1% threshold, and the recount makes the counts exact
    "text_heavyhitters" ->
      """WITH toks AS (
        |  SELECT UNNEST(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != ''))
        |    AS tok
        |  FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_toks FROM toks)
        |SELECT tok, COUNT(*) AS cnt FROM toks
        |GROUP BY tok
        |HAVING CAST(COUNT(*) AS DOUBLE) >= (SELECT n_toks FROM n) * 0.01
        |ORDER BY cnt DESC, tok ASC""".stripMargin,
    // same association order as the engine: (co·n) / (df_a·df_b),
    // sorted on the rounded pmi with the pair tiebreak
    "text_pmi" ->
      """WITH toks AS (
        |  SELECT doc_id, UNNEST(list_distinct(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != '')))
        |    AS tok
        |  FROM documents),
        |df AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY 1
        |       HAVING COUNT(*) >= 25),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        |vt AS (SELECT t.doc_id, t.tok, df.df FROM toks t
        |       JOIN df USING (tok)),
        |pairs AS (
        |  SELECT a.tok AS tok_a, b.tok AS tok_b, a.df AS df_a,
        |    b.df AS df_b, COUNT(*) AS co_df
        |  FROM vt a JOIN vt b
        |    ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 10)
        |SELECT tok_a, tok_b, co_df,
        |  round(ln(CAST(co_df AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
        |    / (CAST(df_a AS DOUBLE) * CAST(df_b AS DOUBLE))), 6) AS pmi
        |FROM pairs CROSS JOIN n
        |ORDER BY pmi DESC, tok_a ASC, tok_b ASC LIMIT 50""".stripMargin,
    // rank over the ROUNDED tf·ln(n/df) score with a term tiebreak —
    // identical ordering on both engines
    "text_topterms" ->
      """WITH toks AS (
        |  SELECT source, UNNEST(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != ''))
        |    AS tok
        |  FROM documents),
        |tf AS (SELECT source, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT source) AS n_src FROM tf),
        |scored AS (
        |  SELECT tf.source, tf.tok,
        |    round(CAST(tf.tf AS DOUBLE)
        |      * ln(CAST(n.n_src AS DOUBLE) / CAST(df.df AS DOUBLE)), 6)
        |      AS score
        |  FROM tf JOIN df USING (tok) CROSS JOIN n),
        |ranked AS (
        |  SELECT source, tok, score, row_number() OVER
        |      (PARTITION BY source ORDER BY score DESC, tok ASC) AS rk
        |  FROM scored WHERE score > 0)
        |SELECT source, CAST(rk AS INT) AS rk, tok, score FROM ranked
        |WHERE rk <= 5 ORDER BY source, rk""".stripMargin,
    // exact replay of the BM25 expression tree: same association
    // order, fixed term-sum order, sort on the rounded score
    "text_search_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != ''))
        |    AS tok
        |  FROM documents),
        |pd AS (
        |  SELECT doc_id, COUNT(*) AS dl,
        |    COUNT(*) FILTER (tok = 'stream') AS tf_stream,
        |    COUNT(*) FILTER (tok = 'window') AS tf_window,
        |    COUNT(*) FILTER (tok = 'fast') AS tf_fast,
        |    COUNT(*) FILTER (tok = 'query') AS tf_query
        |  FROM toks GROUP BY doc_id),
        |st AS (
        |  SELECT COUNT(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl,
        |    COUNT(*) FILTER (tf_stream > 0) AS df_stream,
        |    COUNT(*) FILTER (tf_window > 0) AS df_window,
        |    COUNT(*) FILTER (tf_fast > 0) AS df_fast,
        |    COUNT(*) FILTER (tf_query > 0) AS df_query
        |  FROM pd),
        |sc AS (
        |  SELECT doc_id, dl,
        |    round(
        |      ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_stream AS DOUBLE) + 0.5)
        |          / (CAST(df_stream AS DOUBLE) + 0.5))
        |        * (CAST(tf_stream AS DOUBLE) * 2.2)
        |        / (CAST(tf_stream AS DOUBLE) + 1.2 * (1.0 - 0.75
        |            + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |      + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_window AS DOUBLE) + 0.5)
        |          / (CAST(df_window AS DOUBLE) + 0.5))
        |        * (CAST(tf_window AS DOUBLE) * 2.2)
        |        / (CAST(tf_window AS DOUBLE) + 1.2 * (1.0 - 0.75
        |            + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |      + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_fast AS DOUBLE) + 0.5)
        |          / (CAST(df_fast AS DOUBLE) + 0.5))
        |        * (CAST(tf_fast AS DOUBLE) * 2.2)
        |        / (CAST(tf_fast AS DOUBLE) + 1.2 * (1.0 - 0.75
        |            + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |      + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_query AS DOUBLE) + 0.5)
        |          / (CAST(df_query AS DOUBLE) + 0.5))
        |        * (CAST(tf_query AS DOUBLE) * 2.2)
        |        / (CAST(tf_query AS DOUBLE) + 1.2 * (1.0 - 0.75
        |            + 0.75 * CAST(dl AS DOUBLE) / avgdl)), 6) AS bm25
        |  FROM pd, st)
        |SELECT doc_id, dl, bm25 FROM sc
        |WHERE bm25 > 0
        |ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin,
    "text_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, length(text) AS n_chars,
        |    string_split(text, '') AS chars
        |  FROM documents)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  CASE WHEN n_chars = 0 THEN 0.0 ELSE
        |    round(-list_reduce(list_prepend(0.0,
        |      list_transform(list_sort(list_distinct(chars)),
        |        d -> (CAST(len(list_filter(chars, x -> x = d)) AS DOUBLE) / n_chars)
        |          * log2(CAST(len(list_filter(chars, x -> x = d)) AS DOUBLE) / n_chars))),
        |      (a, b) -> a + b), 6)
        |  END AS char_entropy
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  regexp_replace(trim(text), '\s+', ' ', 'g') AS norm_ws,
        |  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
        |    AS norm_alnum,
        |  strip_accents(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |    AS norm_ascii
        |FROM documents ORDER BY doc_id""".stripMargin,
    "filter_funnel" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    length(trim(text)) > 0 AS s2,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
        |    len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
        |    length(text) AS n_chars2,
        |    len(regexp_extract_all(lower(text),
        |      '\b(the|a|an|of|to|in|and|is|it|that|for|on|was|with|as|at|be|this|are|or)\b'))
        |      AS n_stop
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, fp, s2,
        |    s2 AND lang = 'en' AS s3,
        |    s2 AND lang = 'en' AND
        |      round(least(CAST(n_words AS DOUBLE) / 20.0, 1.0)
        |        * least(round(CAST(n_stop AS DOUBLE) / greatest(n_words, 1), 6) * 4.0, 1.0)
        |        * greatest(0.0, 1.0 - round(CAST(n_punct AS DOUBLE) / greatest(n_chars2, 1), 6) * 4.0), 6)
        |        >= 0.2 AS s4,
        |    n_words AS n_words
        |  FROM f),
        |h AS (
        |  SELECT doc_id, fp, s2, s3, s4,
        |    s4 AND n_words BETWEEN 20 AND 5000 AS s5
        |  FROM g),
        |i AS (
        |  SELECT *,
        |    s5 AND doc_id = min(CASE WHEN s5 THEN doc_id END)
        |      OVER (PARTITION BY fp) AS s6
        |  FROM h),
        |c AS (
        |  SELECT count(*) AS n1,
        |    count(*) FILTER (s2) AS n2, count(*) FILTER (s3) AS n3,
        |    count(*) FILTER (s4) AS n4, count(*) FILTER (s5) AS n5,
        |    count(*) FILTER (s6) AS n6
        |  FROM i)
        |SELECT 1 AS stage_idx, 'total' AS stage, n1 AS n_docs,
        |  round(CAST(n1 AS DOUBLE) / greatest(n1, 1), 6) AS retained_frac FROM c
        |UNION ALL SELECT 2, 'nonempty', n2,
        |  round(CAST(n2 AS DOUBLE) / greatest(n1, 1), 6) FROM c
        |UNION ALL SELECT 3, 'lang_en', n3,
        |  round(CAST(n3 AS DOUBLE) / greatest(n1, 1), 6) FROM c
        |UNION ALL SELECT 4, 'quality', n4,
        |  round(CAST(n4 AS DOUBLE) / greatest(n1, 1), 6) FROM c
        |UNION ALL SELECT 5, 'token_range', n5,
        |  round(CAST(n5 AS DOUBLE) / greatest(n1, 1), 6) FROM c
        |UNION ALL SELECT 6, 'exact_unique', n6,
        |  round(CAST(n6 AS DOUBLE) / greatest(n1, 1), 6) FROM c
        |ORDER BY stage_idx""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x != '')
        |      AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, len(toks) AS n_toks,
        |    CASE WHEN len(toks) < 2 THEN []::VARCHAR[] ELSE
        |      list_transform(range(1, len(toks)),
        |        i -> array_to_string(toks[i:i+1], ' ')) END AS g2,
        |    CASE WHEN len(toks) < 3 THEN []::VARCHAR[] ELSE
        |      list_transform(range(1, len(toks) - 1),
        |        i -> array_to_string(toks[i:i+2], ' ')) END AS g3,
        |    CASE WHEN len(toks) < 5 THEN []::VARCHAR[] ELSE
        |      list_transform(range(1, len(toks) - 3),
        |        i -> array_to_string(toks[i:i+4], ' ')) END AS g5
        |  FROM t),
        |c AS (
        |  SELECT doc_id, n_toks, g2, g3, g5,
        |    list_transform(list_distinct(g2),
        |      d -> len(list_filter(g2, x -> x = d))) AS c2,
        |    list_transform(list_distinct(g3),
        |      d -> len(list_filter(g3, x -> x = d))) AS c3,
        |    list_transform(list_distinct(g5),
        |      d -> len(list_filter(g5, x -> x = d))) AS c5
        |  FROM g)
        |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_tokens,
        |  CASE WHEN len(g2) = 0 THEN 0.0 ELSE
        |    round(CAST(list_max(c2) AS DOUBLE) / len(g2), 6) END AS top2_frac,
        |  CASE WHEN len(g3) = 0 THEN 0.0 ELSE
        |    round(CAST(list_max(c3) AS DOUBLE) / len(g3), 6) END AS top3_frac,
        |  CASE WHEN len(g5) = 0 THEN 0.0 ELSE
        |    round(CAST(coalesce(list_sum(list_filter(c5, x -> x >= 2)), 0)
        |      AS DOUBLE) / len(g5), 6) END AS dup5_frac
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_pii" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS INT) AS n_ssns,
        |  CAST(len(regexp_extract_all(
        |    regexp_replace(text, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
        |    '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS INT) AS n_phones,
        |  CAST(
        |    len(regexp_extract_all(text,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) +
        |    len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) +
        |    len(regexp_extract_all(
        |      regexp_replace(text, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
        |      '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) > 0 AS INT) AS has_pii,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
        |    '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '[PHONE]', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
        |  END AS n_tokens_ws,
        |  CAST(len(regexp_extract_all(text, '\w{1,4}|[^\w\s]')) AS INTEGER)
        |    AS n_tokens_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    length(text) AS n_chars2,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
        |    len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
        |    len(regexp_extract_all(text, '[0-9]')) AS n_digit,
        |    len(regexp_extract_all(lower(text),
        |      '\b(the|a|an|of|to|in|and|is|it|that|for|on|was|with|as|at|be|this|are|or)\b')) AS n_stop
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(CAST(n_punct AS DOUBLE) / greatest(n_chars2, 1), 6) AS punct_ratio,
        |  round(CAST(n_digit AS DOUBLE) / greatest(n_chars2, 1), 6) AS digit_ratio,
        |  round(CAST(n_stop AS DOUBLE) / greatest(n_words, 1), 6) AS stop_ratio,
        |  round(least(CAST(n_words AS DOUBLE) / 20.0, 1.0)
        |      * least(round(CAST(n_stop AS DOUBLE) / greatest(n_words, 1), 6) * 4.0, 1.0)
        |      * greatest(0.0, 1.0 - round(CAST(n_punct AS DOUBLE) / greatest(n_chars2, 1), 6) * 4.0), 6)
        |    AS quality
        |FROM q ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""WITH $langidCte
        |SELECT doc_id, labeled_lang, detected_lang,
        |  CAST(CASE WHEN labeled_lang = detected_lang THEN 1 ELSE 0 END AS INTEGER)
        |    AS agrees
        |FROM d ORDER BY doc_id""".stripMargin,
    // same detector CTE, collapsed to the confusion matrix
    "text_lang_confusion" ->
      s"""WITH $langidCte,
        |tot AS (
        |  SELECT labeled_lang, COUNT(*) AS tot FROM d GROUP BY 1),
        |cm AS (
        |  SELECT labeled_lang, detected_lang, COUNT(*) AS n
        |  FROM d GROUP BY 1, 2)
        |SELECT cm.labeled_lang, cm.detected_lang, cm.n,
        |  round(CAST(cm.n AS DOUBLE) / CAST(tot.tot AS DOUBLE), 6)
        |    AS share
        |FROM cm JOIN tot USING (labeled_lang)
        |ORDER BY labeled_lang, detected_lang""".stripMargin,
    "text_fingerprint_roll" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |       THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT)
        |    AS fp_roll
        |FROM (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(1125899906842597::HUGEINT,
        |        list_transform(string_split(norm, ''), c -> unicode(c)::HUGEINT)),
        |      (acc, c) -> (acc * 31 + c) % 18446744073709551616::HUGEINT) AS h
        |  FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin)
}
