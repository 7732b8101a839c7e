package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal catalog entries: binary payload → per-partition batched
  * feature extraction (decode stubbed behind FakeCodec — see
  * [[graft.multimodal.Multimodal]]). */
object MultimodalOps {

  /** Feature extraction over the synthesized media table; emits stable
    * scalar digests of the feature vector (rows-only check — the
    * decode path is JVM-only by construction). */
  def mmFeatures(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
    Multimodal.extractFeatures(media, new Multimodal.FakeCodec(32))
      .select(col("media_id"), col("ok"),
        round(expr("aggregate(features, cast(0.0 as double), (acc, x) -> acc + x)"), 4)
          .as("l1_mass"),
        size(col("features")).as("dim"))
      .orderBy(col("media_id"))
  }

  /** Frame sampling: payload split into 4 frames, per-frame byte count
    * (SQL-expressible digest of the explode shape → full oracle). */
  def mmFrames(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
    Multimodal.sampleFrames(media, 4)
      .select(col("media_id"), col("frame_no"),
        length(col("frame_bytes")).as("frame_len"))
      .orderBy(col("media_id"), col("frame_no"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> mmFeatures _,
    "mm_frames"   -> mmFrames _)

  val oracles: Map[String, String] = Map(
    "mm_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n
        |  FROM documents),
        |p AS (
        |  SELECT media_id, n, least(4, n) AS k, n // least(4, n) AS step
        |  FROM m WHERE n > 0)
        |SELECT media_id, CAST(i AS INTEGER) AS frame_no,
        |  CAST(CASE WHEN i = k - 1 THEN n - i * step ELSE step END AS INTEGER)
        |    AS frame_len
        |FROM p, UNNEST(range(0, k)) AS t(i)
        |ORDER BY media_id, frame_no""".stripMargin)
}
