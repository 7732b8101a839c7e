package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Vectors
import graft.functions.expressions.CosineSimilarity

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Baseline: brute-force cosine top-k (exact; one scan, one top-k —
  * the correctness reference). Scale path: IVF — k-means-lite coarse
  * centroids computed AS A DATAFRAME AGG (no driver-side loops over
  * rows), vectors assigned to their nearest centroid partition, queries
  * probe only the closest `nprobe` partitions. At 100 TB the IVF scan
  * touches nprobe/nlist of the data; the brute force touches all of it.
  */
object SimOps {

  /** The deterministic query vector: the embedding with vec_id = 0. */
  private def queryVec(s: SparkSession, d: String) =
    broadcast(Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb")))

  /** Brute-force exact cosine top-k against the vec_id=0 query.
    * Uses the native codegen CosineSimilarity expression (unboxed
    * float-array loop inside whole-stage codegen). */
  def annBrute(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    emb.crossJoin(queryVec(s, d))
      .select(col("vec_id"),
        round(CosineSimilarity.cosine_native(s,
          col("embedding"), col("q_emb")), 6).as("cos"))
      .filter(col("vec_id") =!= 0)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(20)
  }

  /** Per-label top-k: brute-force within group via window rank (the
    * "top-k neighbors per query batch" shape). */
  def annPerLabel(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    emb.crossJoin(queryVec(s, d))
      .select(col("vec_id"), col("label"),
        round(CosineSimilarity.cosine_native(s,
          col("embedding"), col("q_emb")), 6).as("cos"))
      .filter(col("vec_id") =!= 0)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("label"), col("rk"), col("vec_id"), col("cos"))
      .orderBy(col("label"), col("rk"))
  }

  private val ivfNList = 16
  private val ivfNProbe = 4
  private val ivfIters = 2

  /** IVF coarse quantizer: deterministic init (the vectors whose id
    * hashes lowest), then `ivfIters` Lloyd rounds, all as DataFrame
    * aggregations. Returns (centroid_id, centroid: array<double>). */
  def ivfCentroids(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    val dims = 64
    val toD = expr("transform(embedding, x -> cast(x as double))")
    // deterministic seeds: lowest md5(vec_id) — a pseudo-random sample
    var centroids = emb
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h").asc, col("vec_id").asc)
      .limit(ivfNList)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("h").asc, col("vec_id").asc)))
      .select((col("rk") - 1).as("centroid_id"), toD.as("centroid"))
    for (_ <- 1 to ivfIters) {
      val assigned = assignToCentroid(emb, centroids)
      // mean per dimension: explode with index, agg, regroup — scales
      // linearly, no driver collection of vectors
      centroids = assigned
        .select(col("centroid_id"),
          posexplode(expr("transform(embedding, x -> cast(x as double))"))
            .as(Seq("dim", "v")))
        .groupBy(col("centroid_id"), col("dim"))
        .agg(avg(col("v")).as("mean_v"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mean_v"))))
          .as("pairs"))
        .select(col("centroid_id"),
          expr("transform(pairs, p -> p.mean_v)").as("centroid"))
      val _ = dims // (documented fixed dimensionality)
    }
    centroids
  }

  private val cosineDD = udf((a: Seq[Float], b: Seq[Double]) => {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  })

  /** Assign every vector to its nearest centroid: broadcast centroids,
    * one pass, argmax via `max_by` hash-aggregate (partial map-side agg,
    * no per-key sort — strictly better than a row_number window here). */
  def assignToCentroid(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .withColumn("sim", cosineDD(col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(
        first(col("embedding")).as("embedding"),
        // ties break to the lowest centroid id (max of (sim, -id))
        max_by(col("centroid_id"),
          struct(col("sim"), (-col("centroid_id")).as("neg")))
          .as("centroid_id"))

  /** IVF index memo: the coarse quantizer + assignment are an INDEX —
    * built once per (session, dataset), reused by every query against
    * it (persisted; the amortization every ANN index relies on). */
  private val ivfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, DataFrame)]()

  def ivfIndex(s: SparkSession, d: String): (DataFrame, DataFrame) =
    ivfIndexCache.computeIfAbsent(s.hashCode() + "|" + d, { _ =>
      val emb = Tables.embeddings(s, d)
      val cents = ivfCentroids(emb).persist()
      val assigned = assignToCentroid(emb, cents).persist()
      assigned.count() // materialize once
      (cents, assigned)
    })

  /** IVF ANN: probe the nprobe closest centroid partitions only, then
    * exact cosine within the probed cells. Rows-only check (approximate
    * by construction); recall vs annBrute is asserted in the spec. */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val (cents, assigned) = ivfIndex(s, d)
    val q = queryVec(s, d)
    val probed = cents.crossJoin(q)
      .withColumn("sim", cosineDD(expr(
        "transform(centroid, x -> cast(x as float))"), expr(
        "transform(q_emb, x -> cast(x as double))")))
      .orderBy(col("sim").desc, col("centroid_id").asc)
      .limit(ivfNProbe)
      .select(col("centroid_id"))
    assigned
      .join(broadcast(probed), Seq("centroid_id"))
      .crossJoin(q)
      .select(col("vec_id"),
        round(CosineSimilarity.cosine_native(s,
          col("embedding"), col("q_emb")), 6).as("cos"))
      .filter(col("vec_id") =!= 0)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_brute"     -> annBrute _,
    "ann_per_label" -> annPerLabel _,
    "ann_ivf"       -> annIvf _)

  // cosine over float arrays: DuckDB's summation order inside
  // list-reduce matches a sequential loop, and both engines do the
  // arithmetic in double after the explicit casts — verified
  // empirically; round(.,6) guards the display value.
  val oracles: Map[String, String] = Map(
    "ann_brute" ->
      """WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        |sims AS (
        |  SELECT e.vec_id,
        |    round(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(q.q_emb,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos
        |  FROM embeddings e, q WHERE e.vec_id != 0)
        |SELECT vec_id, cos FROM sims
        |ORDER BY cos DESC, vec_id ASC LIMIT 20""".stripMargin,
    "ann_per_label" ->
      """WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        |sims AS (
        |  SELECT e.vec_id, e.label,
        |    round(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(q.q_emb,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos
        |  FROM embeddings e, q WHERE e.vec_id != 0)
        |SELECT label, rk, vec_id, cos FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY label ORDER BY cos DESC, vec_id ASC) AS rk
        |  FROM sims)
        |WHERE rk <= 3 ORDER BY label, rk""".stripMargin)
}
