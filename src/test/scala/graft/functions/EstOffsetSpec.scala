package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** est_offset_string across the DST boundary — the helper renders
  * pytz-style `%z` strings whose offset flips per date (IRS clean_xml
  * dates, lobbying contribution dates). */
class EstOffsetSpec extends SparkFunSuite {
  import spark.implicits._

  private def render(dates: String*): Map[String, String] =
    dates.toDF("d")
      .select(col("d"), Dates.est_offset_string(
        to_timestamp(col("d"), "yyyy-MM-dd")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("EST/EDT offset flips on the 2022 transition days") {
    val r = render(
      "2022-03-13", // spring-forward day: midnight is still EST
      "2022-03-14", // first full EDT day
      "2022-11-06", // fall-back day: midnight is still EDT
      "2022-11-07", // first full EST day
      "2022-07-04", "2022-12-25")
    assert(r("2022-03-13") == "2022-03-13T00:00:00-0500")
    assert(r("2022-03-14") == "2022-03-14T00:00:00-0400")
    assert(r("2022-11-06") == "2022-11-06T00:00:00-0400")
    assert(r("2022-11-07") == "2022-11-07T00:00:00-0500")
    assert(r("2022-07-04") == "2022-07-04T00:00:00-0400")
    assert(r("2022-12-25") == "2022-12-25T00:00:00-0500")
  }
}
