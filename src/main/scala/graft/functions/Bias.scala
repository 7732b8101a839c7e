package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** News-source bias scoring and flags.
  *
  * Behavioral spec: `news_sources_ingest_get_crawls/main.py:93-118` —
  * label→score mapping for AllSides and MBFC, five content flags, and
  * the ±3 escalation when a flagged source also carries a left/right
  * image or tag; satire nulls the MBFC score. Pure when/otherwise
  * chains (codegen'd).
  */
object Bias {

  /** AllSides label → {-2..2}; unknown labels → null. */
  def allsidesScore(bias: Column): Column = {
    val b = lower(trim(bias))
    when(b === "left", lit(-2.0))
      .when(b === "lean left", lit(-1.0))
      .when(b === "center", lit(0.0))
      .when(b === "lean right", lit(1.0))
      .when(b === "right", lit(2.0))
  }

  /** MBFC label → base score {-2..2}; contains-match like the reference. */
  def mbfcBaseScore(bias: Column): Column = {
    val b = lower(trim(bias))
    when(b.contains("left bias"), lit(-2.0))
      .when(b.contains("left-center bias"), lit(-1.0))
      .when(b.contains("pro-science"), lit(0.0))
      .when(b.contains("least biased"), lit(0.0))
      .when(b.contains("right-center bias"), lit(1.0))
      .when(b.contains("right bias"), lit(2.0))
  }

  def questionableFlag(bias: Column): Column =
    when(lower(bias).contains("questionable source")
      || lower(bias).contains("conspiracy-pseudoscience"), lit(1))
      .otherwise(lit(0))

  def conspiracyFlag(bias: Column): Column =
    when(lower(bias).contains("conspiracy-pseudoscience"), lit(1)).otherwise(lit(0))

  def satireFlag(bias: Column): Column =
    when(lower(bias).contains("satire"), lit(1)).otherwise(lit(0))

  def hateFlag(tags: Column): Column =
    when(lower(tags).contains("hate"), lit(1)).otherwise(lit(0))

  def propagandaFlag(tags: Column): Column =
    when(lower(tags).contains("propaganda"), lit(1)).otherwise(lit(0))

  /** Full MBFC score with flag escalation and satire nulling.
    * `images`/`tags` participate in the left/right escalation probe. */
  def mbfcScore(bias: Column, images: Column, tags: Column): Column = {
    val base = mbfcBaseScore(bias)
    val flagged = questionableFlag(bias) === 1 || conspiracyFlag(bias) === 1 ||
      hateFlag(tags) === 1 || propagandaFlag(tags) === 1
    val leftEvidence = lower(images).contains("left") || lower(tags).contains("left")
    val rightEvidence = lower(images).contains("right") || lower(tags).contains("right")
    // the reference applies left then right escalation as sequential
    // overwrites, so a row with BOTH left and right evidence ends at +3 —
    // right is checked first here to preserve last-writer-wins
    val escalated = when(flagged && rightEvidence, lit(3.0))
      .when(flagged && leftEvidence, lit(-3.0))
      .otherwise(base)
    when(satireFlag(bias) === 1, lit(null).cast("double")).otherwise(escalated)
  }

  /** A4: average over the bias ratings present (null-aware mean of the
    * available scores — `news_sources_compute_load_graph/main.py:43-56`). */
  def avgPresent(scores: Column*): Column = {
    val presentCount = scores.map(s => when(s.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    val total = scores.map(s => coalesce(s, lit(0.0))).reduce(_ + _)
    when(presentCount === 0, lit(null).cast("double"))
      .otherwise(total / presentCount.cast("double"))
  }
}
