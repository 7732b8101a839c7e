package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Zip-code normalizations.
  *
  * Behavioral spec: `federal_fec_compute_load_graph_contributions/
  * main.py:41-50` (clean_zip) and `federal_fec_ingest_create_master_tables/
  * main.py:51,122` (SUBSTR truncation).
  */
object Zips {

  /** clean_zip: "" for null/empty/zero/non-numeric-zero; otherwise the
    * integer value zero-padded to 5 digits (drops leading alpha only via
    * int parse; non-numeric strings pass through zfilled like the
    * reference). Pure JVM version for tests and row-level use. */
  def cleanZip(zip: String): String = {
    if (zip == null || zip.isEmpty) return ""
    val asInt =
      try Some(zip.trim.toLong)
      catch { case _: NumberFormatException => None }
    asInt match {
      case Some(0L) => ""
      case Some(n)  => padTo5(n.toString)
      case None     => padTo5(zip)
    }
  }

  private def padTo5(s: String): String =
    if (s.length >= 5) s else ("0" * (5 - s.length)) + s

  /** Column form — expressed with built-ins (codegen-friendly, no UDF):
    * the when-chain mirrors cleanZip exactly for the engine hot path. */
  def clean_zip(c: Column): Column = {
    // lpad truncates inputs longer than the pad width; 9-digit zips must
    // pass through unchanged (zfill semantics), hence the length guards.
    def zfill5(s: Column): Column =
      when(length(s) >= 5, s).otherwise(lpad(s, 5, "0"))
    val asLong = trim(c).cast("long")
    when(c.isNull || c === "", lit(""))
      .when(asLong === 0L, lit(""))
      .when(asLong.isNotNull, zfill5(asLong.cast("string")))
      .otherwise(zfill5(c))
  }

  /** Master-table truncation: SUBSTR(zip_code, 1, 5). */
  def zip5(c: Column): Column = substring(c, 1, 5)
}
