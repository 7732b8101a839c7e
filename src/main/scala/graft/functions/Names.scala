package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** FEC name canonicalization.
  *
  * Re-expresses the reference's `process_name` (behavioral spec at
  * `federal/fec/functions/federal_fec_compute_load_elastic_contributions/
  * utilities.py:1-86`, identical copies in the `_candidates` and
  * `_expenditures` utilities). This function defines Donor node identity
  * in the graph layer, so the quirks are deliberate and preserved:
  *
  *  - suffix-title stripping removes at most ONE title per call and is
  *    applied exactly 3× up front and 4× per name-part during the
  *    `LAST, FIRST [suffix]` flip;
  *  - the `", LLC"`/`", INC"` fixes only fire when the name *ends* with
  *    the pattern (then replace every occurrence);
  *  - double-space collapse is a single left-to-right pass, not a full
  *    collapse; leading "DR " is stripped only once, at the very end.
  *
  * Implemented as a JVM scalar function: string-branch logic with
  * per-call early exits — a `when`-chain Column expression would
  * evaluate all branches; a JVM UDF short-circuits and stays inside
  * Tungsten codegen'd pipelines (no interpreter boundary like Python).
  */
object Names {

  private val endTitles: Seq[String] = Seq(
    " MR", " MS", " MRS", " HON", " ESQ", " REV", " FR", " DR",
    " DR ND", " DR DO", " MD", " JD", " MBA", " PHD", " RET",
    " (RET)", " MSGT", " USAF", " USN", " CDR", " SGT", " MAJ", " THE")

  /** Strip at most one trailing honorific/military title (first match in
    * declaration order wins — mirrors the reference's elif chain). */
  def removeTitlesEnd(name: String): String = {
    endTitles.collectFirst {
      case t if name.endsWith(t) => name.substring(0, name.length - t.length)
    }.getOrElse(name)
  }

  def removeTitlesStart(name: String): String =
    if (name.startsWith("DR ")) name.substring(3) else name

  private def rte4(s: String): String =
    removeTitlesEnd(removeTitlesEnd(removeTitlesEnd(removeTitlesEnd(s))))

  private val generationSuffixes = Seq(" JR", " SR", " II", " III", " IV")

  /** Canonicalize an FEC entity name; see object doc for quirk list. */
  def processName(raw: String): String = {
    if (raw == null) return null
    var name = raw.toUpperCase
    name = name.replace(".", "")
    if (name.endsWith(", LLC")) name = name.replace(", LLC", " LLC")
    if (name.endsWith(", INC")) name = name.replace(", INC", " INC")
    name = removeTitlesEnd(removeTitlesEnd(removeTitlesEnd(name)))
    if (name.contains(",")) {
      val suffix = generationSuffixes.find(name.endsWith)
      suffix match {
        case Some(sfx) =>
          val base = name.substring(0, name.length - sfx.length)
          val parts = base.split(",", -1)
          val first = if (parts.length > 1) parts(1) else ""
          name = rte4(first) + " " + rte4(parts(0)) + sfx
        case None =>
          val parts = name.split(",", -1)
          val first = if (parts.length > 1) parts(1) else ""
          name = rte4(first) + " " + rte4(parts(0))
      }
    }
    name = name.replace("  ", " ")
    name = name.trim
    name = removeTitlesStart(name)
    name
  }

  val processNameUdf = udf(processName _)

  def process_name(c: Column): Column = processNameUdf(c)

  /** Register as a SQL function for `spark.sql` users. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("process_name", processName _)
}
