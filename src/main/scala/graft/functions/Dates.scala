package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date normalizations.
  *
  * Behavioral specs: `federal_fec_ingest_create_master_tables/main.py:51`
  * (MMDDYYYY→ISO reshuffle), `:122,128` (PARSE_DATE with empty→null
  * guard), `federal_fec_compute_load_elastic_contributions/main.py:50-57`
  * (naive date → America/New_York → UTC), and the 10-format ladder at
  * `federal_house_lobbying_ingest_get_disclosures/main.py:238-309`
  * including the `02/31` day-overflow repair.
  *
  * All built-ins — `coalesce(try_to_timestamp...)` ladders stay inside
  * whole-stage codegen and are null-safe without ANSI exceptions.
  */
object Dates {

  /** FEC bulk date: 'MMDDYYYY' string → 'yyyy-MM-dd' string via pure
    * substring reshuffle (exactly the master-table CONCAT/SUBSTR). */
  def fec_date_iso(c: Column): Column =
    concat(substring(c, 5, 4), lit("-"), substring(c, 1, 2), lit("-"),
      substring(c, 3, 2))

  /** PARSE_DATE('%m/%d/%Y') with empty→null guard. */
  def parse_date_mdy(c: Column): Column =
    when(c.isNull || c === "", lit(null).cast("date"))
      .otherwise(try_to_timestamp(c, lit("M/d/yyyy")).cast("date"))

  /** PARSE_DATE('%d-%b-%y') (e.g. '03-JAN-22') with empty→null guard.
    * The two-digit year uses the POSIX `%y` pivot the reference's
    * strptime applies — 69-99 → 19xx, 00-68 → 20xx — NOT Java's
    * base-2000 reduced year ('97' must be 1997, not 2097). */
  def parse_date_dby(c: Column): Column = {
    val y2 = substring_index(c, "-", -1).try_cast("int")
    val c4 = concat(regexp_replace(c, "[0-9]{1,2}$", ""),
      when(y2 >= 69, lit("19")).otherwise(lit("20")),
      lpad(substring_index(c, "-", -1), 2, "0"))
    when(c.isNull || c === "", lit(null).cast("date"))
      .otherwise(try_to_timestamp(lower(c4), lit("dd-MMM-yyyy")).cast("date"))
  }

  /** Naive local datetime in America/New_York → UTC timestamp. */
  def est_to_utc(c: Column): Column =
    to_utc_timestamp(c, "America/New_York")

  /** UTC timestamp → America/New_York wall-clock (for EST day
    * attribution in the graph layer, F21). */
  def utc_to_est(c: Column): Column =
    from_utc_timestamp(c, "America/New_York")

  /** A naive America/New_York wall-clock timestamp rendered as the
    * reference's pytz `%z` string — `yyyy-MM-ddTHH:mm:ss-0500` /
    * `-0400`, DST-aware per date (IRS clean_xml dates, lobbying
    * contribution dates). Session tz is UTC, so the UTC delta IS the
    * zone offset. */
  def est_offset_string(d: Column): Column = {
    val utc = to_utc_timestamp(d, "America/New_York")
    val offHours =
      ((unix_timestamp(utc) - unix_timestamp(d)) / 3600).cast("int")
    concat(date_format(d, "yyyy-MM-dd'T'HH:mm:ss"),
      lit("-0"), offHours, lit("00"))
  }

  /** Multi-format parse ladder: try each format in order, first hit
    * wins; unparseable → null. Mirrors the lobbying date ladder.
    * Repairs the known bad day-overflow (e.g. '02/31/2008' → Feb 29 /
    * 28) by retrying with the day clamped when all formats miss. */
  def parse_date_ladder(c: Column, formats: Seq[String]): Column = {
    val attempts = formats.map(f => try_to_timestamp(c, lit(f)))
    val clamped = regexp_replace(c, "^(\\d{1,2})/(3[01]|29)/", "$1/28/")
    val repairAttempts = formats.map(f => try_to_timestamp(clamped, lit(f)))
    coalesce((attempts ++ repairAttempts): _*)
  }

  /** The house-lobbying ladder's format list, Spark-pattern spelling. */
  val lobbyingFormats: Seq[String] = Seq(
    "M/d/yyyy h:mm:ss a",
    "M/d/yyyy H:mm",
    "M/d/yyyy",
    "M-d-yyyy",
    "yyyy-M-d'T'H:mm:ss",
    "yyyy-M-d H:mm:ss",
    "yyyy-M-d",
    "MMM d, yyyy",
    "MMddyy",
    "MMddyyyy")

  /** Date-part explosion (F21): {year, month, day, hour, minute}. */
  def dateParts(c: Column, prefix: String = ""): Seq[(String, Column)] = Seq(
    s"${prefix}year" -> year(c),
    s"${prefix}month" -> month(c),
    s"${prefix}day" -> dayofmonth(c),
    s"${prefix}hour" -> hour(c),
    s"${prefix}minute" -> minute(c))

  /** Amount normalization (F13): strip '$', ',', spaces → double. */
  def parse_amount(c: Column): Column =
    regexp_replace(c, "[$, ]", "").try_cast("double")
}
