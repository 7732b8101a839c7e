package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{SimHash, TextAnalysis, Vectors}
import graft.functions.expressions.{CosineSimilarity, MinHashBandKeys, SimHash64}

/** Deduplication operators over the `documents` / `embeddings` tables:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design: every near-dup variant is
  * sketch (map-side) → band/bucket key explode → shuffle ON THE BUCKET
  * KEY → within-bucket pair join → exact verify. Pair generation never
  * leaves a bucket, so the quadratic blowup is bounded by bucket size
  * (LSH guarantees near-dups collide with high probability) — the
  * standard way exact all-pairs O(n²) is avoided at 100 TB. Bucket-key
  * skew (a degenerate shingle shared by everything) is capped via a
  * per-bucket size limit before pairing.
  */
object DedupOps {

  /** Exact dedup: hash-groupBy on the normalized-content fingerprint,
    * keep the smallest doc_id (deterministic canonical row). */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("fp", TextAnalysis.fingerprint_md5(col("text")))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("fp"))

  /** Exact-dedup survivors: the kept rows themselves (keep-first by
    * fingerprint via window — A2's shape applied to content dedup). */
  def dedupExactKeep(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("fp", TextAnalysis.fingerprint_md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  /** Keep LSH buckets tractable under adversarial skew: a bucket with
    * more than this many members contributes only its smallest ids. */
  private val maxBucketSize = 64

  /** The capped-bucket pair-generation idiom shared by every LSH
    * variant: ONE map-side-combined hash agg collects the sorted
    * member ids per bucket key (capped at [[maxBucketSize]] smallest),
    * then explodes the within-bucket combinations — the sketch runs
    * once over the corpus, only ids ride the shuffle, and a bucket
    * self-join (double scan + window sort for the cap) never happens.
    * Output columns: (aName, bName) with a < b. */
  private[ops] def cappedBucketPairs(bucketed: DataFrame, bucketCols: Seq[String],
      idCol: String, aName: String, bName: String): DataFrame =
    bucketed.groupBy(bucketCols.map(col): _*)
      .agg(slice(sort_array(collect_list(col(idCol))), 1, maxBucketSize)
        .as("ids"))
      .select(explode(expr(
        s"""flatten(transform(ids, (a, i) ->
           |  transform(slice(ids, i + 2, size(ids)), b ->
           |    struct(a as $aName, b as $bName))))""".stripMargin)).as("p"))
      .select(col(s"p.$aName"), col(s"p.$bName"))

  private val minhashPairsCache = new graft.SessionCache[DataFrame]

  /** The VERIFIED near-dup pair set (doc_a, doc_b, jaccard ≥ 0.5) — an
    * INDEX artifact like the shingle tables, memoized per (session,
    * dataset) and consumed by `dedup_minhash`, `dedup_clusters`,
    * `corpus_keep` and `dedup_cross_source`; without the memo each of
    * those would re-run the whole sketch→bucket→verify pipeline.
    * Unsorted — each reader adds its own presentation order. Lazily
    * persisted (NOT checkpointed): plan-only consumers never pay the
    * corpus pass, and the cached lineage stays visible to the plan
    * audits (PLANS.md, PlanAuditSpec's window-freedom assertions). */
  private[ops] def minhashPairs(s: SparkSession, d: String): DataFrame =
    minhashPairsCache.getOrCompute(s, d) {
      minhashPairsPlan(s, d).persist()
    }

  /** MinHash+LSH near-dup candidate pairs with exact-Jaccard verify.
    * shingle→minhash→band→bucket-join; emits verified pairs with
    * jaccard >= 0.5, doc_a < doc_b. */
  def dedupMinhash(s: SparkSession, d: String): DataFrame =
    minhashPairs(s, d).orderBy(col("doc_a"), col("doc_b"))

  private def minhashPairsPlan(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    // signature is the compute-heavy stage — spread the scan first; the
    // fused native expression computes text → band keys in one codegen
    // step (no UDF boundary, no boxed intermediate signature)
    val banded = Tables.spread(docs)
      .select(col("doc_id"),
        explode(MinHashBandKeys.bands_native(s, col("text"))).as("bucket"))
    // Pair generation in ONE aggregation pass: collect the (capped,
    // sorted) member ids per bucket, explode the within-bucket
    // combinations. A bucket self-join would scan `banded` twice —
    // i.e. run the signature UDF over the corpus twice — and need a
    // window sort for the cap; the hash-agg does cap + pairs in the
    // single map-side-combined shuffle. Text never rides the shuffle.
    val pairs =
      cappedBucketPairs(banded, Seq("bucket"), "doc_id", "doc_a", "doc_b")
        .distinct() // same pair may collide in several bands
    // verify: join each side to its PRECOMPUTED shingle set (built once
    // per doc, broadcast) and take exact jaccard via array_intersect —
    // all codegen'd built-ins; a per-pair tokenize UDF would redo the
    // shingling candidate-count times instead of corpus-size times
    // NOTE: no broadcast hint — the shingle-set table is corpus-sized,
    // so the join strategy must stay AQE's choice (shuffle join at
    // scale, runtime broadcast when it happens to be small).
    // Memoized + persisted: the set table joins in TWICE (a-side and
    // b-side — different shuffle keys, so exchange reuse cannot kick
    // in) and every catalog call would otherwise re-tokenize the
    // corpus twice; like every ANN/near-dup index it is built once per
    // dataset and amortized.
    val sh = minhashShingleIndex(s, d, docs)
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val uni = size(col("sh_a")) + size(col("sh_b")) - inter
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .withColumn("jaccard", round(when(uni === 0, 1.0)
        .otherwise(inter.cast("double") / uni.cast("double")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  private val minhashShingleCache = new graft.SessionCache[DataFrame]

  /** Per-doc shingle SETS for the minhash verify, memoized per
    * (session, dataset) and persisted — see the note at the use site. */
  private def minhashShingleIndex(s: SparkSession, d: String,
      docs: DataFrame): DataFrame =
    minhashShingleCache.getOrCompute(s, d) {
      val sh = shingleSets(Tables.spread(docs)).persist()
      sh.count()
      sh
    }

  private val shingleIndexCache = new graft.SessionCache[DataFrame]

  /** The shared (doc_id, shingle) inverted index, exposed for
    * [[TrainOps.textContaminated]] — same memoized artifact the ngram
    * dedup amortizes. */
  private[ops] def shingleRows(s: SparkSession, d: String): DataFrame =
    ngramShingleIndex(s, d, Tables.documents(s, d))

  /** Distinct (doc_id, shingle, set_size) rows for `dedupNgram`,
    * memoized per (session, dataset) and persisted: it feeds the
    * inverted index AND carries each doc's shingle-set size on every
    * posting entry (one window count paid ONCE at index build), so the
    * pair stage's length prefilter and jaccard denominator need no
    * per-query size join at all. */
  private def ngramShingleIndex(s: SparkSession, d: String,
      docs: DataFrame): DataFrame =
    shingleIndexCache.getOrCompute(s, d) {
      val toks = Tables.spread(docs).select(col("doc_id"),
        split(lower(col("text")), "[^a-z0-9]+").as("toks"))
        .select(col("doc_id"), expr("filter(toks, t -> t != '')").as("toks"))
      val dist = toks.select(col("doc_id"),
        explode(when(size(col("toks")) < 3,
            when(size(col("toks")) > 0,
              array(concat_ws(" ", col("toks")))).otherwise(array()))
          .otherwise(expr(
            "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")))
          .as("shingle"))
        .distinct()
      // per-doc size via agg+join (not a window: the pair-gen plans
      // assert window-freedom through the cached lineage); the distinct
      // exchange is shared by both branches, and it runs once per
      // dataset anyway
      val sizes = dist.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("set_size"))
      dist.join(sizes, Seq("doc_id")).persist()
    }

  /** Per-doc distinct word-3-gram shingle sets as an array column —
    * the relational form of [[MinHash.shingles]] (same tokenization,
    * same <3-token fallback), used by the exact-jaccard verify. */
  private def shingleSets(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        split(lower(col("text")), "[^\\p{L}\\p{N}]+").as("toks0"))
      .select(col("doc_id"),
        expr("filter(toks0, t -> t != '')").as("toks"))
      .select(col("doc_id"),
        array_distinct(when(size(col("toks")) < 3,
            when(size(col("toks")) > 0,
              array(concat_ws(" ", col("toks")))).otherwise(array()))
          .otherwise(expr(
            "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")))
          .as("sh"))

  /** SimHash near-dup: 64-bit sketch, bucket by the four 16-bit chunks
    * (any pair within hamming distance 3 shares at least one chunk when
    * differences spread; standard simhash blocking), verify by true
    * hamming distance <= 6. */
  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, d))
      .select(col("doc_id"), SimHash64.simhash_native(s, col("text")).as("sh"))
    val chunks = docs.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk_id"),
          shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))
            .as("chunk_val"))): _*)).as("c"))
      .select(col("doc_id"), col("sh"),
        col("c.chunk_id"), col("c.chunk_val"))
    val a = chunks.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = chunks.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk_id", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", SimHash.hamming(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= 6)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** n-gram Jaccard dedup without sketching: explode 3-gram shingle →
    * inverted index join → per-pair intersection count → exact jaccard
    * from per-doc set sizes (pure relational algebra — fully
    * SQL-expressible, hence oracle-checkable, unlike the MinHash path). */
  def dedupNgram(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    // The distinct (doc, shingle) table is an INDEX: built once per
    // (session, dataset), persisted, reused by both consumers here and
    // by repeated calls — no cached-copy accumulation across calls.
    // The index already carries set_size on every posting entry (paid
    // once at build), so pair generation emits (doc_id, set_size)
    // structs for free: the LENGTH PREFILTER runs at the explode site,
    // BEFORE the per-pair aggregation shuffle — jaccard = inter/union
    // ≤ min/max, so J ≥ 0.4 is impossible unless max_size ≤
    // 2.5·min_size; incompatible pairs never ride the shuffle, and no
    // post-agg size join exists since the sizes arrive with the pair.
    val sh = ngramShingleIndex(s, d, docs)
    val posting = sh.select(col("shingle"),
      struct(col("doc_id"), col("set_size")).as("m"))
    // inverted index via one hash-agg: cap + within-posting pairs in a
    // single map-side-combined shuffle. A shingle self-join would scan
    // (and re-tokenize) `sh` twice and need a window sort for the
    // skew cap; collecting the sorted posting list does both at once.
    val inter =
      cappedBucketPairs(posting, Seq("shingle"), "m", "a", "b")
      .filter(col("a.set_size").cast("double") <= col("b.set_size") * 2.5
        && col("b.set_size").cast("double") <= col("a.set_size") * 2.5)
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.set_size").as("size_a"), col("b.set_size").as("size_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("size_a") + col("size_b") - col("n_inter")).cast("double"), 6))
      .filter(col("jaccard") >= 0.4)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Asymmetric shingle CONTAINMENT detection — the sub-document
    * variant of [[dedupNgram]]: containment(A,B) = |S(A)∩S(B)| /
    * min(|S(A)|,|S(B)|) flags a small document embedded in a larger
    * one (quote farms, boilerplate wrappers, truncated re-crawls),
    * which symmetric Jaccard structurally misses — a contained 100-
    * shingle doc inside a 10k-shingle doc scores J ≈ 0.01 but
    * containment 1.0. Deliberately NO length prefilter: the size-
    * asymmetric pairs the Jaccard path prunes are exactly the signal
    * here. Reuses the memoized shingle index and the capped-posting
    * pair generation (identical candidate semantics to the oracle's
    * rn ≤ 64 replay), so the marginal cost over dedup_ngram is one
    * more aggregation over the same artifact. */
  def dedupContainment(s: SparkSession, d: String): DataFrame = {
    val sh = ngramShingleIndex(s, d,
      Tables.documents(s, d).select(col("doc_id"), col("text")))
    val posting = sh.select(col("shingle"),
      struct(col("doc_id"), col("set_size")).as("m"))
    cappedBucketPairs(posting, Seq("shingle"), "m", "a", "b")
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.set_size").as("size_a"), col("b.set_size").as("size_b"))
      .agg(count(lit(1)).as("n_inter"))
      .withColumn("containment", round(col("n_inter").cast("double") /
        least(col("size_a"), col("size_b")).cast("double"), 6))
      .filter(col("containment") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("size_a"), col("size_b"),
        col("containment"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding-cosine near-dup candidates: hyperplane-LSH bucket
    * (8-bit sketch × several seeds) → within-bucket exact cosine →
    * pairs above `threshold`. The brute-force O(n²) pair join is
    * avoided; recall comes from multiple independent sketch seeds. */
  def dedupEmbedPairs(s: SparkSession, d: String,
      threshold: Double): DataFrame = {
    val seeds = Seq(7, 21, 63, 127)
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val sketched = emb.select(col("vec_id"),
      explode(array(seeds.map(sd =>
        struct(lit(sd).as("seed"),
          Vectors.hyperplane_sketch(col("embedding"), 8, sd).as("bucket"))): _*))
        .as("sk"))
      .select(col("vec_id"), col("sk.seed"), col("sk.bucket"))
    val a = sketched.select(col("seed"), col("bucket"), col("vec_id").as("vec_a"))
    val b = sketched.select(col("seed"), col("bucket"), col("vec_id").as("vec_b"))
    // ids-only pair generation, then fetch vectors for the verify step
    val pairs = a.join(b, Seq("seed", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .distinct()
    pairs
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")),
        Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")),
        Seq("vec_b"))
      .withColumn("cos",
        round(CosineSimilarity.cosine_native(s,
          col("emb_a"), col("emb_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** Query entry: exact pairwise-cosine top-20 — the ground-truth
    * baseline every LSH variant is measured against. LSH's contract is
    * recall on HIGH-similarity pairs; the synthetic corpus has no true
    * near-dups (top cos ≈ 0.5), so ranking mid-similarity pairs through
    * the sketch would be the wrong tool. The catalog entry is therefore
    * the exact all-pairs baseline (oracle-checkable); the LSH scale
    * path ([[dedupEmbedPairs]]) is asserted in DedupOpsSpec against
    * injected near-duplicates, where its recall contract is meaningful. */
  def dedupEmbed(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    // stream side spread: the n²/2 cosine loop parallelizes across it
    val a = Tables.spread(emb)
      .select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(CosineSimilarity.cosine_native(s,
          col("emb_a"), col("emb_b")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(20)
  }

  /** The GRADED scale path for embedding near-dup: md5-derived
    * hyperplane LSH buckets (8 bits × 2 seeds) → ids-only candidate
    * pairs → exact-cosine verify ≥ 0.3. Identical plan shape to
    * [[dedupEmbedPairs]], but the sketch is md5-based
    * ([[Vectors.md5_hyperplane_sketch]]) so the DuckDB oracle replays
    * the candidate set bit-exactly — candidate pairs never leave an LSH
    * bucket, payload vectors join in by key only for the verify. */
  def dedupEmbedLsh(s: SparkSession, d: String): DataFrame = {
    val seeds = Seq(7, 21)
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val spreadEmb = Tables.spread(emb)
    val sketched = spreadEmb.select(col("vec_id"),
      explode(array(seeds.map(sd =>
        struct(lit(sd).as("seed"),
          Vectors.md5_hyperplane_sketch(col("embedding"), 8, sd)
            .as("bucket"))): _*)).as("sk"))
      .select(col("vec_id"), col("sk.seed"), col("sk.bucket"))
    // pair generation in ONE aggregation pass (the dedupMinhash idiom):
    // capped sorted member list per (seed, bucket), combinations
    // exploded. A bucket self-join would run the sketch UDF over the
    // corpus twice and shuffle both sides; the hash agg sketches once,
    // shuffles ids only, and the cap bounds a hot bucket (clusters of
    // near-identical vectors) to O(cap²) pairs.
    val pairs = cappedBucketPairs(sketched, Seq("seed", "bucket"),
      "vec_id", "vec_a", "vec_b").distinct()
    pairs
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")),
        Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")),
        Seq("vec_b"))
      .withColumn("cos",
        round(CosineSimilarity.cosine_native(s, col("emb_a"), col("emb_b")), 6))
      .filter(col("cos") >= 0.3)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** SemDeDup-style semantic dedup: partition the embedding space with
    * the deterministic IVF coarse quantizer ([[SimOps.ivfIndex]] — the
    * same memoized index ANN probes), then prune, within each cell, any
    * vector that has a lower-id cell-mate with cosine ≥ 0.4. Emits the
    * full keep/prune decision per vector.
    *
    * Scale: pairwise cosine never crosses a cell, and the capped
    * posting list (smallest 64 ids per cell, the shared LSH idiom)
    * hard-bounds any cell at O(cap²) pairs. The quantizer width is the
    * `spark.graft.ann.nlist` session conf (default 16 — what the
    * oracle replays): at real scale SemDeDup sizes nlist ∝ corpus so
    * cells stay ~constant and the cap is only a skew guard; beyond
    * ~nlist×cap vectors at the DEFAULT the cap would start excluding
    * members from pruning consideration, so deployments must raise the
    * knob with the corpus. The oracle replays quantizer, cap, and
    * prune rule bit-exactly at the catalog's pinned default. */
  def dedupSemantic(s: SparkSession, d: String): DataFrame = {
    val (_, assigned) = SimOps.ivfIndex(s, d)
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val pairs = cappedBucketPairs(
      assigned.select(col("centroid_id"), col("vec_id")),
      Seq("centroid_id"), "vec_id", "vec_a", "vec_b")
    val pruned = pairs
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")),
        Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")),
        Seq("vec_b"))
      .filter(round(CosineSimilarity.cosine_native(s,
        col("emb_a"), col("emb_b")), 6) >= 0.4)
      .select(col("vec_b").as("vec_id")).distinct()
      .withColumn("is_pruned", lit(1))
    assigned
      .join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"),
        col("centroid_id").cast("int").as("cluster_id"),
        col("is_pruned").isNull.cast("int").as("keep"))
      .orderBy(col("vec_id"))
  }

  /** Cluster assignment over the verified near-dup pairs — what a
    * production pipeline DOES with pairs: connected components, one
    * canonical doc kept per component. Pregel-style iterative
    * min-label propagation: every doc starts labeled with its own id,
    * each round takes the min of its own and its neighbors' labels,
    * fixpoint = component-minimum ids. Data never leaves the cluster —
    * the driver only checks the change count — and rounds are bounded
    * by component diameter (near-dup clusters are shallow). The oracle
    * computes the same components with a recursive CTE over the exact
    * ground-truth pair set. */
  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    // the shared memoized pair artifact — every clustering call pays
    // only the propagation
    val pairs = minhashPairs(s, d).select(col("doc_a"), col("doc_b"))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = Tables.documents(s, d)
      .select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val neigh = edges
        .join(labels.select(col("doc_id").as("src"),
          col("label").as("src_label")), Seq("src"))
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("src_label")).as("nmin"))
      val updated = labels.join(neigh, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nmin"), col("label")))
            .as("label"))
        .localCheckpoint(true) // cut lineage per round
      changed = updated
        .join(labels.select(col("doc_id"), col("label").as("old")),
          Seq("doc_id"))
        .filter(col("label") =!= col("old")).count()
      labels = updated
      rounds += 1
    }
    // a silent cap would return non-minimum labels that diverge from
    // the oracle's fixpoint — fail loudly instead (50 rounds = a
    // component of diameter 50, absurd for near-dup clusters)
    require(changed == 0,
      s"dedupClusters did not converge after $rounds rounds")
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("label"))
      .select(col("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** Jaccard THRESHOLD SWEEP — the dedup knob's operating curve (the
    * ann_nprobe_sweep idea aimed at near-dup): for thresholds 0.5–0.9,
    * how many verified pairs survive and how many documents they
    * touch — the panel that picks a threshold by looking at what it
    * would delete instead of folklore. One pass over the memoized
    * verified pair set: each pair/doc row explodes only the
    * thresholds it clears (filter on a 5-literal array), two bounded
    * aggs. Thresholds and jaccards are identical double literals in
    * both engines, so the ≤ compares are bit-exact. */
  def dedupThresholdSweep(s: SparkSession, d: String): DataFrame = {
    val pairs = minhashPairs(s, d)
    val tArr = "array(0.5D, 0.6D, 0.7D, 0.8D, 0.9D)"
    val pc = pairs
      .select(explode(expr(s"filter($tArr, t -> t <= jaccard)")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n_pairs"))
    val dc = pairs
      .select(col("jaccard"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      .select(col("doc"),
        explode(expr(s"filter($tArr, t -> t <= jaccard)")).as("t"))
      .groupBy("t").agg(countDistinct(col("doc")).as("n_docs"))
    pc.join(dc, Seq("t"))
      .select(col("t").as("threshold"), col("n_pairs"), col("n_docs"))
      .orderBy(col("threshold"))
  }

  /** Canonical-document selection by MEDOID — the upgrade over
    * [[dedupClusters]]' min-id pick: within each near-dup cluster,
    * keep the member with the highest summed similarity to its
    * cluster-mates (the most REPRESENTATIVE copy, not the one with
    * the luckiest id — min-id canonicalization happily keeps the one
    * truncated/mangled variant). Ties break to the smaller id.
    *
    * Reuses both memoized artifacts (verified pair set + converged
    * labels), so the marginal cost is one pair-table union + two
    * keyed aggregates. Scores are sums of already-6-rounded jaccards
    * as exact DECIMAL (order-free); the argmax is a struct-max, not
    * a window. */
  def dedupMedoid(s: SparkSession, d: String): DataFrame = {
    val clusters = dedupClusters(s, d)
    val pairs = minhashPairs(s, d)
    val contrib = pairs
      .select(col("doc_a").as("doc_id"), col("jaccard"))
      .unionAll(pairs.select(col("doc_b").as("doc_id"), col("jaccard")))
      .groupBy(col("doc_id"))
      .agg(sum(col("jaccard").cast("decimal(9,6)")).as("score"))
    clusters.filter(col("cluster_size") >= 2)
      .join(contrib, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(max(col("cluster_size")).as("cluster_size"),
        max(struct(col("score"), (-col("doc_id")).as("nid"))).as("m"))
      .select(col("cluster_id"), col("cluster_size"),
        (-col("m.nid")).as("medoid_doc_id"),
        round(col("m.score").cast("double"), 6).as("medoid_score"))
      .orderBy(col("cluster_id"))
  }

  /** Corpus-wide duplicated-passage coverage — the scalable
    * approximation of ExactSubstr dedup (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better") at a fixed gram
    * width: any word-8-gram that occurs anywhere else in the corpus
    * marks its 8 token positions as duplicated, and each doc reports
    * the fraction of its token stream so covered.
    *
    * Plan, in shuffle terms: posexplode the grams (narrow) → one
    * map-side-combined hash-agg on the gram to find grams with ≥2
    * occurrences → left-semi the occurrences back on the gram key →
    * explode each surviving occurrence into its 8 covered positions,
    * distinct, count per doc. Keys are grams and doc ids, never
    * payloads, and there is no pairwise blowup anywhere (this signal
    * deliberately avoids the O(dups²) pair table the near-dup family
    * produces). The `grams` subtree is consumed twice (agg + probe
    * side), so documents is scanned and tokenized twice, plus a third
    * column-pruned scan for the (doc_id, n_tokens) spine — deliberate:
    * a corpus-sized exploded gram table is the one index NOT worth
    * persisting, so two scans beat materializing it. Docs shorter than
    * the gram width can't be flagged; they're the exact-dedup family's
    * job. */
  private val substrW = 8

  /** The shared front of the passage-coverage family: per-doc token
    * arrays and the DISTINCT duplicated token positions (1-based). */
  private def substrCoverage(s: SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val toks = Tables.spread(Tables.documents(s, d))
      .select(col("doc_id"),
        graft.functions.TextAnalysis.wordTokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n_tokens"))
    val grams = toks.select(col("doc_id"), col("n_tokens"),
      posexplode(graft.functions.TextAnalysis.wordGrams(col("toks"), substrW)))
      .toDF("doc_id", "n_tokens", "pos", "gram")
    val dupGrams = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select(col("gram"))
    val covRows = grams.join(dupGrams, Seq("gram"), "left_semi")
      // posexplode pos is 0-based; token positions are 1-based
      .select(col("doc_id"),
        explode(sequence(col("pos") + 1, col("pos") + substrW)).as("cov"))
      .distinct()
    (toks, covRows)
  }

  def dedupSubstr(s: SparkSession, d: String): DataFrame = {
    val (toks, covRows) = substrCoverage(s, d)
    val covered = covRows
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_tokens"))
    toks.select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("n_dup_tokens", coalesce(col("n_dup_tokens"), lit(0L)))
      .withColumn("dup_frac", round(col("n_dup_tokens").cast("double") /
        greatest(col("n_tokens"), lit(1L)).cast("double"), 6))
      .orderBy(col("doc_id"))
  }

  /** The transformative form of [[dedupSubstr]] — what the ExactSubstr
    * treatment actually does to the corpus: REMOVE every duplicated
    * token position and re-join the survivors. Same coverage pipeline,
    * plus one sorted collect per doc and a positional filter (narrow). */
  def dedupSubstrClean(s: SparkSession, d: String): DataFrame = {
    val (toks, covRows) = substrCoverage(s, d)
    val covList = covRows.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("cov"))).as("cov"))
    toks.join(covList, Seq("doc_id"), "left")
      .withColumn("cov",
        coalesce(col("cov"), array().cast("array<int>")))
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        size(col("cov")).cast("long").as("n_dup_tokens"),
        concat_ws(" ", filter(col("toks"),
          // Spark's filter index is 0-based; coverage is 1-based
          (t, i) => !array_contains(col("cov"), i + 1))).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Bloom-prefiltered membership probe — the broadcast-sketch
    * restatement of cross-run corpus dedup (T32): "is this incoming
    * fingerprint already in the stored corpus?" without shuffling the
    * probe side. Build feeds (src0–src9) aggregate into ONE fixed
    * 4096-bit [[graft.functions.expressions.BloomSketch]] (512-byte
    * buffer at every stage, word-OR merge); the sketch is broadcast
    * and each probe doc (src10–src19) checks its 3 md5-nibble
    * positions narrowly. EVERY doc probes (members and non-members):
    * `maybe_dup` is the sketch verdict, `is_dup` the exact
    * broadcast-join truth — side by side, so the oracle pins BOTH the
    * replayed bit set (members force maybe_dup=1 row by row — no
    * false negatives; non-members pin engine-identical false
    * positives) and the ground truth.
    *
    * 100 TB posture: the stored-key scan reduces to one 512-byte
    * sketch (vs `storedKeys`' bucket-pruned parquet probe —
    * io/DocStore.scala:41); probe-side evaluation is a map-only
    * filter, and only "maybe" survivors (FP-rate-bounded) pay the
    * exact join. Production sizes m ∝ stored-key count; 4096 bits is
    * the oracle-replayable demo size. */
  def dedupBloom(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), md5(col("text")).as("fp"))
    val isBuild = substring(col("source"), 4, 10).cast("int") < 10
    val build = docs.where(isBuild)
    val bloom = build.agg(
      graft.functions.expressions.BloomSketch
        .bloom_native(s, col("fp")).as("bits"))
    docs
      .withColumn("pos", expr(
        "transform(sequence(0, 2), j -> " +
          "cast(conv(substring(md5(fp), j * 3 + 1, 3), 16, 10) as int))"))
      .crossJoin(broadcast(bloom))
      .withColumn("maybe_dup",
        expr("forall(pos, p -> array_contains(bits, p))").cast("int"))
      .join(broadcast(build.select(col("fp").as("bfp")).distinct()),
        col("fp") === col("bfp"), "left")
      .select(col("doc_id"), col("maybe_dup"),
        when(col("bfp").isNotNull, 1).otherwise(0).as("is_dup"))
      .orderBy("doc_id")
  }

  /** Fuzzy record linkage: entity names within edit distance 1 (the
    * registry/master-data dedup the reference performs when the same
    * committee or donor appears under slightly different spellings —
    * e.g. the normalize-then-match steps feeding its candidate and
    * committee merges; FecGraph.scala upper/trims before keying for
    * the same reason, this operator catches what normalization
    * misses).
    *
    * Blocking is the SymSpell deletion neighborhood: each name emits
    * itself plus every single-character deletion variant as block
    * keys. Two strings at Levenshtein distance ≤ 1 ALWAYS share a
    * key — equal strings share the full name; a substitution pair
    * shares the deletion at the substituted position; an indel pair
    * shares (longer side's deletion at the edit) = (shorter side's
    * full name). So candidate recall is exactly 1 by construction and
    * the all-pairs oracle must agree with the blocked plan.
    *
    * 100 TB posture: O(L) keys per record ride the shuffle (ids +
    * short key strings, never payloads); buckets are naturally tiny
    * (names sharing a deletion variant), with the shared
    * [[cappedBucketPairs]] cap as the adversarial-skew guard; the
    * per-pair Levenshtein verify runs on the candidate set only —
    * never the O(n²) cross product a naive fuzzy join implies. */
  def dedupFuzzy(s: SparkSession, d: String): DataFrame =
    fuzzyVerifiedPairs(s, d)
      .select(col("a_key"), col("b_key"), col("name_a"), col("name_b"),
        col("dist"))
      .orderBy(col("a_key"), col("b_key"))

  private val fuzzyPairsCache = new graft.SessionCache[DataFrame](df => {
    df.unpersist(); ()
  })

  /** The SymSpell-blocked, Levenshtein-verified candidate pipeline
    * shared by [[dedupFuzzy]] and [[dedupJaroWinkler]] — memoized per
    * (session, dataset) like [[minhashPairs]]: the deletion-
    * neighborhood sketch + verify runs once, both consumers read the
    * persisted pair set. */
  private def fuzzyVerifiedPairs(s: SparkSession, d: String): DataFrame =
    fuzzyPairsCache.getOrCompute(s, d) {
      fuzzyVerifiedPairsPlan(s, d).persist()
    }

  private def fuzzyVerifiedPairsPlan(s: SparkSession, d: String): DataFrame = {
    val names = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    val keyed = names.select(col("c_custkey"),
      explode(expr(
        """array_distinct(concat(array(c_name),
          |  transform(sequence(1, length(c_name)), i ->
          |    concat(substr(c_name, 1, i - 1), substr(c_name, i + 1)))))"""
          .stripMargin)).as("blk"))
    val pairs =
      cappedBucketPairs(keyed, Seq("blk"), "c_custkey", "a_key", "b_key")
        .distinct() // a pair can share several deletion variants
    // verify on candidates only; name lookup joins stay AQE's choice
    // (customer scales with SF — no forced broadcast)
    pairs
      .join(names.select(col("c_custkey").as("a_key"),
        col("c_name").as("name_a")), Seq("a_key"))
      .join(names.select(col("c_custkey").as("b_key"),
        col("c_name").as("name_b")), Seq("b_key"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 1)
  }

  /** Fuzzy linkage re-ranked by Jaro–Winkler similarity — the
    * record-linkage scoring stage layered on [[dedupFuzzy]]'s
    * provable-recall candidate set: the SymSpell deletion-neighborhood
    * block still guarantees every distance-≤1 pair is a candidate (so
    * the quadratic oracle must agree on the SET), and the native
    * [[graft.functions.expressions.JaroWinkler]] codegen expression
    * (DuckDB-pinned semantics) scores each surviving pair for
    * downstream match/review thresholds — Winkler's prefix boost
    * separates "edit in the id digits" from "edit up front", which a
    * raw edit distance cannot.
    *
    * 100 TB posture: identical to dedup_fuzzy (ids+short keys on the
    * shuffle, capped buckets, candidate-only verify); the JW score is
    * one narrow codegen'd expression over already-joined name pairs. */
  def dedupJaroWinkler(s: SparkSession, d: String): DataFrame =
    fuzzyVerifiedPairs(s, d)
      .select(col("a_key"), col("b_key"), col("name_a"), col("name_b"),
        col("dist"),
        round(graft.functions.expressions.JaroWinkler.jaro_winkler(s,
          col("name_a"), col("name_b")), 6).as("jw"))
      .orderBy(col("a_key"), col("b_key"))

  /** Winnowing-fingerprint dedup candidates — the MOSS pipeline as a
    * dedup operator, complementing MinHash: any pair sharing a
    * CONTIGUOUS run of ≥ w+k−1 = 8 tokens is GUARANTEED to share a
    * selected fingerprint ([[graft.functions.TextAnalysis.winnowSelect]]),
    * so passage-level overlap surfaces even when global Jaccard is far
    * below an LSH threshold — exactly the "same paragraph pasted into
    * two different documents" case pretraining decontamination cares
    * about. Pairs rank by shared-fingerprint count.
    *
    * 100 TB posture: the sketch is one narrow pass; only
    * (fingerprint, doc_id) rides the shuffle; pair generation is the
    * shared [[cappedBucketPairs]] hash-agg (ids-only, smallest-64 cap
    * against degenerate repeated passages); scores are exact integer
    * counts on a pair space bounded by bucket sizes. */
  def dedupWinnow(s: SparkSession, d: String): DataFrame = {
    val fps = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(TextAnalysis.winnow_fps(col("text"))).as("fp"))
    cappedBucketPairs(fps, Seq("fp"), "doc_id", "doc_a", "doc_b")
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .orderBy(col("n_shared").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(50)
  }

  /** The (scheme, doc_id, key) blocking-key table shared by
    * [[dedupBlockingEval]] and [[dedupFellegi]]: three candidate
    * blocking/comparison fields over document metadata — language,
    * source, and the 100-char length band. One metadata-only corpus
    * scan (text never read); keys are short strings. */
  private def blockingKeys(s: SparkSession, d: String): DataFrame = {
    val meta = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("cast(n_chars div 100 as bigint)").as("band"))
    meta.select(lit("lang").as("scheme"), col("doc_id"),
        col("lang").as("key"))
      .unionAll(meta.select(lit("len_band").as("scheme"), col("doc_id"),
        col("band").cast("string").as("key")))
      .unionAll(meta.select(lit("source").as("scheme"), col("doc_id"),
        col("source").as("key")))
  }

  /** Truth-pair field agreements: each verified MinHash near-dup pair
    * ([[minhashPairs]] — the corpus's ground-truth match set) joined to
    * both sides' blocking keys, folded to per-scheme (n_truth,
    * n_agree). The truth set is pair-count-sized (tiny next to the
    * corpus), so the two key joins are cheap. */
  private def truthAgreement(s: SparkSession, d: String): DataFrame = {
    val keyed = blockingKeys(s, d)
    minhashPairs(s, d).select(col("doc_a"), col("doc_b"))
      .join(keyed.select(col("scheme"), col("doc_id").as("doc_a"),
        col("key").as("key_a")), Seq("doc_a"))
      .join(keyed.select(col("scheme"), col("doc_id").as("doc_b"),
        col("key").as("key_b")), Seq("scheme", "doc_b"))
      .groupBy("scheme")
      .agg(count(lit(1)).as("n_truth"),
        sum(when(col("key_a") === col("key_b"), 1L).otherwise(0L))
          .as("n_agree"))
  }

  /** T223: BLOCKING-QUALITY evaluation — pair completeness vs
    * reduction ratio per candidate blocking scheme (the two numbers
    * every record-linkage/dedup deployment trades before committing to
    * a blocking key; Christen 2012's standard metrics). Ground truth =
    * the verified MinHash near-dup pair set; for each scheme the panel
    * reports how many truth pairs land in the same block (pair
    * completeness — the recall the blocking scheme would give a
    * downstream matcher) and what fraction of the all-pairs space the
    * scheme prunes (reduction ratio).
    *
    * 100 TB posture: candidate-pair counts come from block-size
    * aggregates (Σ c·(c−1)/2 — NO pair materialization anywhere); the
    * truth join touches only the pair-count-sized truth set; everything
    * else is exact integer arithmetic on panel-sized tables. */
  def dedupBlockingEval(s: SparkSession, d: String): DataFrame = {
    val cand = blockingKeys(s, d)
      .groupBy("scheme", "key").agg(count(lit(1)).as("c"))
      .groupBy("scheme")
      .agg(count(lit(1)).as("n_blocks"),
        sum(expr("c * (c - 1) div 2")).as("n_candidates"))
    val tot = broadcast(Tables.documents(s, d)
      .agg(count(lit(1)).as("n")))
    cand.join(truthAgreement(s, d), Seq("scheme"), "left")
      .crossJoin(tot)
      .select(col("scheme"), col("n_blocks"), col("n_candidates"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_agree"), lit(0L)).as("n_captured"),
        when(col("n_truth") > 0,
          round(col("n_agree").cast("double")
            / col("n_truth").cast("double"), 6)).as("pair_completeness"),
        round(lit(1.0) - col("n_candidates").cast("double")
          / (col("n").cast("double") * (col("n") - lit(1)) / lit(2.0)), 6)
          .as("reduction_ratio"))
      .orderBy("scheme")
  }

  /** T224: FELLEGI–SUNTER match/unmatch weights per comparison field
    * (Fellegi & Sunter 1969 — the probabilistic record-linkage scoring
    * the reference's donor entity-resolution implements by hand): for
    * each field, m = P(field agrees | pair is a true match) estimated
    * on the verified MinHash truth pairs, u = P(agrees | non-match)
    * from EXACT marginal birthday counts (Σ c_v·(c_v−1)/2 agreeing
    * pairs over the field's value histogram, minus the matched
    * agreements, over the non-match pair count), and the log-odds
    * agreement weight ln(m/u) a linkage engine adds per agreeing
    * field.
    *
    * 100 TB posture: u comes from value-marginal aggregates — the
    * all-pairs agreement count is a CLOSED FORM over group sizes, so
    * no pair space is ever materialized; m touches only the truth set;
    * the panel is field-cardinality. Counts are exact integers; the
    * two ratios and one ln round at 6dp off identical double ops. */
  def dedupFellegi(s: SparkSession, d: String): DataFrame = {
    val agreeAll = blockingKeys(s, d)
      .groupBy("scheme", "key").agg(count(lit(1)).as("c"))
      .groupBy("scheme")
      .agg(sum(expr("c * (c - 1) div 2")).as("a_all"))
    val tot = broadcast(Tables.documents(s, d)
      .agg(count(lit(1)).as("n"))
      .select(expr("n * (n - 1) div 2").as("p_all")))
    agreeAll.join(truthAgreement(s, d), Seq("scheme"), "left")
      .crossJoin(tot)
      .select(col("scheme").as("field"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_agree"), lit(0L)).as("n_truth_agree"),
        col("a_all").as("n_all_agree"),
        when(col("n_truth") > 0,
          round(col("n_agree").cast("double")
            / col("n_truth").cast("double"), 6)).as("m_prob"),
        round((col("a_all") - coalesce(col("n_agree"), lit(0L)))
          .cast("double")
          / (col("p_all") - coalesce(col("n_truth"), lit(0L)))
            .cast("double"), 6).as("u_prob"),
        when(col("n_truth") > 0 && col("n_agree") > 0 &&
            col("a_all") > coalesce(col("n_agree"), lit(0L)),
          round(log(
            (col("n_agree").cast("double") / col("n_truth").cast("double"))
            / ((col("a_all") - col("n_agree")).cast("double")
              / (col("p_all") - col("n_truth")).cast("double"))), 6))
          .as("log_weight"))
      .orderBy("field")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_blocking_eval" -> dedupBlockingEval _,
    "dedup_fellegi"    -> dedupFellegi _,
    "dedup_winnow"     -> dedupWinnow _,
    "dedup_fuzzy"      -> dedupFuzzy _,
    "dedup_jarowinkler" -> dedupJaroWinkler _,
    "dedup_bloom"      -> dedupBloom _,
    "dedup_semantic"   -> dedupSemantic _,
    "dedup_substr"     -> dedupSubstr _,
    "dedup_substr_clean" -> dedupSubstrClean _,
    "dedup_clusters"   -> dedupClusters _,
    "dedup_exact"      -> dedupExact _,
    "dedup_exact_keep" -> dedupExactKeep _,
    "dedup_minhash"    -> dedupMinhash _,
    "dedup_medoid"     -> dedupMedoid _,
    "dedup_threshold_sweep" -> dedupThresholdSweep _,
    "dedup_simhash"    -> dedupSimhash _,
    "dedup_ngram"      -> dedupNgram _,
    "dedup_containment" -> dedupContainment _,
    "dedup_embed"      -> dedupEmbed _,
    "dedup_embed_lsh"  -> dedupEmbedLsh _)

  /** The SymSpell deletion-neighborhood candidate CTEs (`cand` =
    * provable-recall-at-distance-1 pairs), shared verbatim by the
    * dedup_fuzzy and dedup_jarowinkler oracles — one copy, so the
    * recall argument can never desynchronize between them. */
  private lazy val symspellCandCtes: String =
    """WITH v AS MATERIALIZED (
        |  SELECT c_custkey, UNNEST(list_distinct(list_prepend(c_name,
        |    list_transform(range(1, len(c_name) + 1),
        |      i -> substr(c_name, 1, CAST(i AS INTEGER) - 1) ||
        |           substr(c_name, CAST(i AS INTEGER) + 1)))))
        |    AS del
        |  FROM customer),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.c_custkey AS a_key, b.c_custkey AS b_key
        |  FROM v a JOIN v b ON a.del = b.del
        |    AND a.c_custkey < b.c_custkey)""".stripMargin

  /** The verified near-dup TRUTH pair set (the dedup_minhash oracle's
    * pipeline, pairs only) + the (scheme, doc_id, key) blocking-key
    * table — shared verbatim by the dedup_blocking_eval and
    * dedup_fellegi oracles so the truth definition can never
    * desynchronize between them. */
  private lazy val truthKeyCtes: String =
    """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
        |    t -> t != '') AS toks
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, UNNEST(
        |      CASE WHEN len(toks) < 3 THEN
        |        CASE WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |             ELSE [] END
        |      ELSE list_transform(range(0, len(toks) - 2),
        |        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) END) AS shingle
        |    FROM toks)),
        |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |tp AS MATERIALIZED (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE round(CAST(n_inter AS DOUBLE)
        |    / (sa.set_size + sb.set_size - n_inter), 6) >= 0.5),
        |meta AS (
        |  SELECT doc_id, lang, source,
        |    CAST(n_chars // 100 AS BIGINT) AS band
        |  FROM documents),
        |keyed AS MATERIALIZED (
        |  SELECT 'lang' AS scheme, doc_id, lang AS key FROM meta
        |  UNION ALL
        |  SELECT 'len_band', doc_id, CAST(band AS VARCHAR) FROM meta
        |  UNION ALL
        |  SELECT 'source', doc_id, source FROM meta),
        |agree AS (
        |  SELECT ka.scheme,
        |    CAST(COUNT(*) AS BIGINT) AS n_truth,
        |    CAST(SUM(CASE WHEN ka.key = kb.key THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_agree
        |  FROM tp
        |  JOIN keyed ka ON ka.doc_id = tp.doc_a
        |  JOIN keyed kb ON kb.doc_id = tp.doc_b AND kb.scheme = ka.scheme
        |  GROUP BY 1),
        |marg AS (
        |  SELECT scheme, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS a_all
        |  FROM (SELECT scheme, key, COUNT(*) AS c
        |        FROM keyed GROUP BY 1, 2)
        |  GROUP BY scheme),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS p_all
        |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_blocking_eval" -> (truthKeyCtes +
      """
        |SELECT m.scheme, m.n_blocks, m.a_all AS n_candidates,
        |  COALESCE(a.n_truth, 0) AS n_truth,
        |  COALESCE(a.n_agree, 0) AS n_captured,
        |  CASE WHEN a.n_truth > 0 THEN
        |    round(CAST(a.n_agree AS DOUBLE) / CAST(a.n_truth AS DOUBLE), 6)
        |  END AS pair_completeness,
        |  round(1.0 - CAST(m.a_all AS DOUBLE)
        |    / (CAST(t.n AS DOUBLE) * (t.n - 1) / 2.0), 6)
        |    AS reduction_ratio
        |FROM marg m LEFT JOIN agree a USING (scheme), tot t
        |ORDER BY m.scheme""".stripMargin),
    "dedup_fellegi" -> (truthKeyCtes +
      """
        |SELECT m.scheme AS field,
        |  COALESCE(a.n_truth, 0) AS n_truth,
        |  COALESCE(a.n_agree, 0) AS n_truth_agree,
        |  m.a_all AS n_all_agree,
        |  CASE WHEN a.n_truth > 0 THEN
        |    round(CAST(a.n_agree AS DOUBLE) / CAST(a.n_truth AS DOUBLE), 6)
        |  END AS m_prob,
        |  round(CAST(m.a_all - COALESCE(a.n_agree, 0) AS DOUBLE)
        |    / CAST(t.p_all - COALESCE(a.n_truth, 0) AS DOUBLE), 6)
        |    AS u_prob,
        |  CASE WHEN a.n_truth > 0 AND a.n_agree > 0
        |      AND m.a_all > COALESCE(a.n_agree, 0) THEN
        |    round(ln(
        |      (CAST(a.n_agree AS DOUBLE) / CAST(a.n_truth AS DOUBLE))
        |      / (CAST(m.a_all - a.n_agree AS DOUBLE)
        |        / CAST(t.p_all - a.n_truth AS DOUBLE))), 6)
        |  END AS log_weight
        |FROM marg m LEFT JOIN agree a USING (scheme), tot t
        |ORDER BY field""".stripMargin),
    // the text_winnow fingerprint chain, then the exact fp-bucket pair
    // expansion (buckets stay below the 64 cap at test scale, so the
    // uncapped replay is the same set)
    "dedup_winnow" ->
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
        |  SELECT doc_id,
        |    CASE WHEN n_grams = 0 THEN CAST([] AS BIGINT[])
        |      WHEN n_grams <= 4 THEN [list_min(hs)]
        |      ELSE list_distinct(list_transform(range(1, n_grams - 2),
        |        j -> list_min(hs[j:j+3])))
        |    END AS fps
        |  FROM hashed),
        |fp AS MATERIALIZED (SELECT doc_id, UNNEST(fps) AS fp FROM sel),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_shared FROM pairs
        |ORDER BY n_shared DESC, doc_a ASC, doc_b ASC LIMIT 50""".stripMargin,
    // ground truth replicates the engine's SymSpell deletion-
    // neighborhood blocking IN the oracle (two strings at edit
    // distance <= 1 provably share a 0-or-1-char-deletion variant:
    // substitution at i -> both i-deletions match; insert/delete ->
    // the shorter string IS a deletion of the longer), then verifies
    // with exact levenshtein — so the result set is identical to the
    // all-pairs scan, at ~1/30 the DuckDB cost (round-6 gate fix)
    "dedup_fuzzy" ->
      s"""$symspellCandCtes
        |SELECT c.a_key, c.b_key, a.c_name AS name_a, b.c_name AS name_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM cand c
        |JOIN customer a ON a.c_custkey = c.a_key
        |JOIN customer b ON b.c_custkey = c.b_key
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY a_key, b_key""".stripMargin,
    // same provable-recall deletion-neighborhood candidate set;
    // DuckDB's native jaro_winkler_similarity replays the engine's
    // codegen expression (semantics pinned: window, transpositions,
    // 0.7 boost gate)
    "dedup_jarowinkler" ->
      s"""$symspellCandCtes
        |SELECT c.a_key, c.b_key, a.c_name AS name_a, b.c_name AS name_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist,
        |  round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw
        |FROM cand c
        |JOIN customer a ON a.c_custkey = c.a_key
        |JOIN customer b ON b.c_custkey = c.b_key
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY a_key, b_key""".stripMargin,
    // bit-exact Bloom replay: hash j of fingerprint fp = the 12-bit
    // integer at md5(fp) hex nibbles 3j..3j+2 (nibble-strpos
    // arithmetic, the a15_kmv idiom); the build side's distinct
    // positions ARE the sketch, list_has_all = the k-probe
    "dedup_bloom" ->
      """WITH docs AS (
        |  SELECT doc_id, md5(text) AS fp,
        |    CAST(substr(source, 4, 10) AS INT) < 10 AS is_build
        |  FROM documents),
        |bpos AS (
        |  SELECT DISTINCT CAST(list_sum(list_transform(range(3), i ->
        |      CAST(strpos('0123456789abcdef', substr(md5(fp),
        |        CAST(j AS INTEGER) * 3 + CAST(i AS INTEGER) + 1, 1)) - 1
        |        AS DOUBLE)
        |      * power(16.0, CAST(2 - i AS DOUBLE)))) AS INT) AS pos
        |  FROM docs, UNNEST(range(3)) AS t(j)
        |  WHERE is_build),
        |bits AS (SELECT list_sort(list(pos)) AS bl FROM bpos),
        |ppos AS (
        |  SELECT doc_id, fp, list_transform(range(3), j ->
        |    CAST(list_sum(list_transform(range(3), i ->
        |      CAST(strpos('0123456789abcdef', substr(md5(fp),
        |        CAST(j AS INTEGER) * 3 + CAST(i AS INTEGER) + 1, 1)) - 1
        |        AS DOUBLE)
        |      * power(16.0, CAST(2 - i AS DOUBLE)))) AS INT)) AS pos
        |  FROM docs)
        |SELECT p.doc_id,
        |  CAST(list_has_all(bits.bl, p.pos) AS INT) AS maybe_dup,
        |  CAST(EXISTS(SELECT 1 FROM docs b
        |              WHERE b.is_build AND b.fp = p.fp) AS INT) AS is_dup
        |FROM ppos p, bits ORDER BY doc_id""".stripMargin,
    // exact replay of the SemDeDup pipeline: sampled IVF quantizer
    // (lowest md5(vec_id) = centroids, nearest-centroid assignment,
    // ties to the lower centroid id — the ann_ivf CTEs), capped cell
    // posting (64 smallest ids), within-cell prune of any vector with
    // a lower-id τ-similar cell-mate
    "dedup_semantic" ->
      """WITH seeds AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
        |      AS centroid_id,
        |    embedding AS centroid
        |  FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |assign AS (
        |  SELECT vec_id, embedding, centroid_id FROM (
        |    SELECT e.vec_id, e.embedding, s.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(range(1, len(e.embedding) + 1),
        |            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(s.centroid[i] AS DOUBLE)))
        |          / (sqrt(list_sum(list_transform(e.embedding,
        |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |           * sqrt(list_sum(list_transform(s.centroid,
        |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC,
        |        s.centroid_id ASC) AS rn
        |    FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1),
        |m AS (
        |  SELECT vec_id, embedding, centroid_id,
        |    row_number() OVER (PARTITION BY centroid_id ORDER BY vec_id) AS rk
        |  FROM assign),
        |pruned AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM m a JOIN m b
        |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        |  WHERE a.rk <= 64 AND b.rk <= 64
        |    AND round(
        |      list_sum(list_transform(range(1, len(a.embedding) + 1),
        |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(a.embedding,
        |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(b.embedding,
        |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) >= 0.4)
        |SELECT a.vec_id, CAST(a.centroid_id AS INTEGER) AS cluster_id,
        |  CAST(CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM assign a LEFT JOIN pruned p USING (vec_id)
        |ORDER BY a.vec_id""".stripMargin,
    "dedup_substr" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x != '')
        |      AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t),
        |o AS (
        |  SELECT doc_id, pos, array_to_string(toks[pos:pos+7], ' ') AS gram
        |  FROM (
        |    SELECT doc_id, toks,
        |      unnest(CASE WHEN n_tokens < 8 THEN []::BIGINT[]
        |             ELSE range(1, n_tokens - 6) END) AS pos
        |    FROM n)),
        |dup AS (SELECT gram FROM o GROUP BY gram HAVING count(*) >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id, cp FROM (
        |    SELECT doc_id, unnest(range(pos, pos + 8)) AS cp
        |    FROM o WHERE gram IN (SELECT gram FROM dup))),
        |agg AS (SELECT doc_id, count(*) AS n_dup_tokens FROM cov GROUP BY doc_id)
        |SELECT n.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(coalesce(agg.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
        |  round(CAST(coalesce(agg.n_dup_tokens, 0) AS DOUBLE)
        |    / greatest(n.n_tokens, 1), 6) AS dup_frac
        |FROM n LEFT JOIN agg USING (doc_id) ORDER BY n.doc_id""".stripMargin,
    "dedup_substr_clean" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x != '')
        |      AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t),
        |o AS (
        |  SELECT doc_id, pos, array_to_string(toks[pos:pos+7], ' ') AS gram
        |  FROM (
        |    SELECT doc_id, toks,
        |      unnest(CASE WHEN n_tokens < 8 THEN []::BIGINT[]
        |             ELSE range(1, n_tokens - 6) END) AS pos
        |    FROM n)),
        |dup AS (SELECT gram FROM o GROUP BY gram HAVING count(*) >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id, cp FROM (
        |    SELECT doc_id, unnest(range(pos, pos + 8)) AS cp
        |    FROM o WHERE gram IN (SELECT gram FROM dup))),
        |cl AS (SELECT doc_id, list_sort(list(cp)) AS cov
        |       FROM cov GROUP BY doc_id)
        |SELECT n.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(coalesce(len(cl.cov), 0) AS BIGINT) AS n_dup_tokens,
        |  -- array_to_string([]) is NULL in DuckDB; Spark's concat_ws
        |  -- of an empty array is '' — pin the fully-covered case
        |  coalesce(array_to_string(list_filter(n.toks,
        |    (x, i) -> NOT list_contains(coalesce(cl.cov, []), i)), ' '), '')
        |    AS clean_text
        |FROM n LEFT JOIN cl USING (doc_id) ORDER BY n.doc_id""".stripMargin,
    // ground-truth pairs (the dedup_minhash oracle's CTEs) + recursive
    // min-label reachability = connected components
    // ground-truth pairs (the medoid oracle's jaccard CTE) exploded
    // over the identical threshold literals
    "dedup_threshold_sweep" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
        |    t -> t != '') AS toks
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, UNNEST(
        |      CASE WHEN len(toks) < 3 THEN
        |        CASE WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |             ELSE [] END
        |      ELSE list_transform(range(0, len(toks) - 2),
        |        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) END) AS shingle
        |    FROM toks)),
        |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b,
        |    round(CAST(n_inter AS DOUBLE)
        |      / (sa.set_size + sb.set_size - n_inter), 6) AS j
        |  FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE round(CAST(n_inter AS DOUBLE)
        |    / (sa.set_size + sb.set_size - n_inter), 6) >= 0.5),
        |pt AS (
        |  SELECT UNNEST(list_filter([0.5, 0.6, 0.7, 0.8, 0.9],
        |    t -> t <= j)) AS t, doc_a, doc_b
        |  FROM pairs),
        |pc AS (SELECT t, COUNT(*) AS n_pairs FROM pt GROUP BY 1),
        |dc AS (
        |  SELECT t, COUNT(DISTINCT doc) AS n_docs FROM (
        |    SELECT t, doc_a AS doc FROM pt
        |    UNION ALL SELECT t, doc_b FROM pt)
        |  GROUP BY 1)
        |SELECT pc.t AS threshold, pc.n_pairs, dc.n_docs
        |FROM pc JOIN dc USING (t) ORDER BY threshold""".stripMargin,
    // the clusters oracle extended with per-member summed jaccard and
    // the (score DESC, doc_id ASC) argmax
    "dedup_medoid" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
        |    t -> t != '') AS toks
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, UNNEST(
        |      CASE WHEN len(toks) < 3 THEN
        |        CASE WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |             ELSE [] END
        |      ELSE list_transform(range(0, len(toks) - 2),
        |        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) END) AS shingle
        |    FROM toks)),
        |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b,
        |    round(CAST(n_inter AS DOUBLE)
        |      / (sa.set_size + sb.set_size - n_inter), 6) AS j
        |  FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE round(CAST(n_inter AS DOUBLE)
        |    / (sa.set_size + sb.set_size - n_inter), 6) >= 0.5),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |cc AS (SELECT id AS doc_id, min(label) AS cluster_id
        |       FROM reach GROUP BY id),
        |cs AS (SELECT cluster_id, COUNT(*) AS cluster_size
        |       FROM cc GROUP BY cluster_id),
        |contrib AS (
        |  SELECT doc_id, SUM(CAST(j AS DECIMAL(9,6))) AS score FROM (
        |    SELECT doc_a AS doc_id, j FROM pairs
        |    UNION ALL SELECT doc_b, j FROM pairs)
        |  GROUP BY doc_id),
        |rk AS (
        |  SELECT cc.cluster_id, cs.cluster_size, cc.doc_id, contrib.score,
        |    row_number() OVER (PARTITION BY cc.cluster_id
        |      ORDER BY contrib.score DESC, cc.doc_id ASC) AS rn
        |  FROM cc JOIN cs USING (cluster_id)
        |  JOIN contrib USING (doc_id)
        |  WHERE cs.cluster_size >= 2)
        |SELECT cluster_id, cluster_size, doc_id AS medoid_doc_id,
        |  round(CAST(score AS DOUBLE), 6) AS medoid_score
        |FROM rk WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
        |    t -> t != '') AS toks
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, UNNEST(
        |      CASE WHEN len(toks) < 3 THEN
        |        CASE WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |             ELSE [] END
        |      ELSE list_transform(range(0, len(toks) - 2),
        |        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) END) AS shingle
        |    FROM toks)),
        |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE round(CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter), 6) >= 0.5),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |cc AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id)
        |SELECT c.doc_id, c.cluster_id, n.cluster_size
        |FROM cc c JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
        |                FROM cc GROUP BY cluster_id) n USING (cluster_id)
        |ORDER BY c.doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "dedup_exact_keep" ->
      """SELECT doc_id, fp FROM (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |    row_number() OVER (
        |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // same shingle/cap replay as dedup_ngram, containment denominator
    // = the SMALLER set (no length prefilter — asymmetry is the point)
    "dedup_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |    t -> t != '') AS toks
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, UNNEST(
        |      CASE WHEN len(toks) < 3 THEN
        |        CASE WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |             ELSE [] END
        |      ELSE list_transform(range(0, len(toks) - 2),
        |        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
        |      END) AS shingle
        |    FROM toks)),
        |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
        |capped AS MATERIALIZED (
        |  SELECT doc_id, shingle FROM (
        |    SELECT doc_id, shingle,
        |      row_number() OVER (PARTITION BY shingle ORDER BY doc_id) AS rn
        |    FROM sh) WHERE rn <= 64),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM capped a JOIN capped b ON a.shingle = b.shingle
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, sa.set_size AS size_a, sb.set_size AS size_b,
        |  round(CAST(n_inter AS DOUBLE) /
        |    least(sa.set_size, sb.set_size), 6) AS containment
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE round(CAST(n_inter AS DOUBLE) /
        |    least(sa.set_size, sb.set_size), 6) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_ngram" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |    t -> t != '') AS toks
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, UNNEST(
        |      CASE WHEN len(toks) < 3 THEN
        |        CASE WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |             ELSE [] END
        |      ELSE list_transform(range(0, len(toks) - 2),
        |        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
        |      END) AS shingle
        |    FROM toks)),
        |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
        |capped AS MATERIALIZED (
        |  SELECT doc_id, shingle FROM (
        |    SELECT doc_id, shingle,
        |      row_number() OVER (PARTITION BY shingle ORDER BY doc_id) AS rn
        |    FROM sh) WHERE rn <= 64),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM capped a JOIN capped b ON a.shingle = b.shingle
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter), 6)
        |    AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE round(CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter), 6) >= 0.4
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Ground truth for the LSH pipeline: ALL pairs with exact word-3-gram
    // jaccard >= 0.5. The MinHash banding (64 hashes / 16 bands) recovers
    // every such pair on this corpus — the recall contract the sketch is
    // deployed under — so the exact computation is the oracle.
    "dedup_minhash" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
        |    t -> t != '') AS toks
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, UNNEST(
        |      CASE WHEN len(toks) < 3 THEN
        |        CASE WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |             ELSE [] END
        |      ELSE list_transform(range(0, len(toks) - 2),
        |        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) END) AS shingle
        |    FROM toks)),
        |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter), 6)
        |    AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE round(CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter), 6) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Exact replay of the engine's sketch in SQL, restated over
    // integers (round-7 oracle-cost fix): per-feature 64-bit hash =
    // the SAME md5 nibble fold (MSB first), majority vote per bit as
    // 64 columnar SUMs (bit b == string position 64-b of the old
    // bit-string replay), candidate iff some 16-bit chunk matches
    // ((u >> s) & 0xFFFF == the substr chunk), verified at
    // bit_count(xor) <= 6 ≡ the old per-position hamming count.
    "dedup_simhash" -> {
      val votes = (0 until 64).map(b =>
        s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
        .mkString(",\n        |    ")
      val recon = (0 until 64).map { b =>
        val w = BigInt(2).pow(b)
        s"CASE WHEN v$b > 0 THEN $w::HUGEINT ELSE 0::HUGEINT END"
      }.mkString("\n        |    + ")
      s"""WITH feats AS (
        |  SELECT doc_id,
        |    CASE WHEN len(j) <= 4 THEN [j]
        |         ELSE list_transform(range(0, len(j) - 3), i -> substr(j, i+1, 4)) END AS fs
        |  FROM (SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9_]', '', 'g') AS j
        |        FROM documents)),
        |fx AS (SELECT doc_id, UNNEST(fs) AS f FROM feats),
        |hx AS MATERIALIZED (
        |  SELECT doc_id, CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |      THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT)
        |    AS h
        |  FROM (SELECT doc_id, list_reduce(list_prepend(0::HUGEINT,
        |      list_transform(string_split(substr(md5(f), 1, 16), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS HUGEINT))),
        |      (a, b) -> a * 16 + b) AS hu FROM fx)),
        |vt AS MATERIALIZED (
        |  SELECT doc_id,
        |    $votes
        |  FROM hx GROUP BY doc_id),
        |sk AS MATERIALIZED (
        |  SELECT doc_id, CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
        |      THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT)
        |    AS h64
        |  FROM (SELECT doc_id,
        |    $recon AS u
        |  FROM vt)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    bit_count(xor(a.h64, b.h64)) AS hd
        |  FROM sk a JOIN sk b ON a.doc_id < b.doc_id
        |  WHERE ((a.h64 >> 48) & 65535) = ((b.h64 >> 48) & 65535)
        |     OR ((a.h64 >> 32) & 65535) = ((b.h64 >> 32) & 65535)
        |     OR ((a.h64 >> 16) & 65535) = ((b.h64 >> 16) & 65535)
        |     OR (a.h64 & 65535) = (b.h64 & 65535))
        |SELECT doc_a, doc_b, CAST(hd AS INTEGER) AS hamming
        |FROM pairs WHERE hd <= 6
        |ORDER BY doc_a, doc_b""".stripMargin
    },
    "dedup_embed" ->
      """WITH nv AS MATERIALIZED (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |sims AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (a.nrm * b.nrm), 6) AS cos
        |  FROM nv a JOIN nv b ON a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, cos FROM sims
        |ORDER BY cos DESC, vec_a ASC, vec_b ASC LIMIT 20""".stripMargin,
    // exact replay of the md5 hyperplane sketch: uint32 from the first
    // 8 md5 hex digits (nibble positional fold) → [-1,1) component →
    // sign bits → bucket join → cosine verify, all in SQL
    "dedup_embed_lsh" ->
      """WITH hp AS MATERIALIZED (
        |  SELECT seed, p, list_transform(range(0, 64), i ->
        |      (list_sum(list_transform(range(1, 9), k ->
        |         (strpos('0123456789abcdef',
        |            substr(md5('hp:' || seed || ':' || p || ':' || i),
        |              k, 1)) - 1) * (16 ** (8 - k))))
        |       / 2147483648.0 - 1.0)) AS comps
        |  FROM (SELECT UNNEST([7, 21]) AS seed),
        |       (SELECT UNNEST(range(0, 8)) AS p)),
        |bits AS MATERIALIZED (
        |  SELECT e.vec_id, h.seed,
        |    CASE WHEN list_sum(list_transform(
        |        range(1, len(e.embedding) + 1), i ->
        |          CAST(e.embedding[i] AS DOUBLE) * h.comps[i])) >= 0
        |      THEN (2 ** h.p) ELSE 0 END AS bit
        |  FROM embeddings e, hp h),
        |sk AS MATERIALIZED (
        |  SELECT vec_id, seed, CAST(SUM(bit) AS BIGINT) AS bucket
        |  FROM bits GROUP BY vec_id, seed),
        |capped AS MATERIALIZED (
        |  SELECT seed, bucket, vec_id FROM (
        |    SELECT seed, bucket, vec_id,
        |      row_number() OVER (PARTITION BY seed, bucket ORDER BY vec_id) AS rk
        |    FROM sk) WHERE rk <= 64),
        |pairs AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM capped a JOIN capped b
        |    ON a.seed = b.seed AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |sims AS (
        |  SELECT p.vec_a, p.vec_b,
        |    round(list_sum(list_transform(range(1, len(ea.embedding) + 1),
        |        i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(ea.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(eb.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos
        |  FROM pairs p
        |  JOIN embeddings ea ON ea.vec_id = p.vec_a
        |  JOIN embeddings eb ON eb.vec_id = p.vec_b)
        |SELECT vec_a, vec_b, cos FROM sims WHERE cos >= 0.3
        |ORDER BY vec_a, vec_b""".stripMargin)
}
