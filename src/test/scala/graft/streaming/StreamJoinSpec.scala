package graft.streaming

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream interval join: the streaming attribution join over
  * watermarked MemoryStreams produces EXACTLY the batch join's rows,
  * with events fed out of order across micro-batches. */
class StreamJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-04-01 10:$min%02d:$sec%02d")

  // (user, event_id, ts): u1 view@10:00 → purchases 10:05 (in) and
  // 10:45 (out of the 30-min window); u2 view@10:20 → purchase 10:21;
  // u3 purchase with no view; u1 second view@10:40 → catches 10:45
  private val views = Seq(
    (1L, 100L, ts(0)), (2L, 200L, ts(20)), (1L, 101L, ts(40)))
  private val purchases = Seq(
    (1L, 900L, ts(5), 10.0), (1L, 901L, ts(45), 20.0),
    (2L, 902L, ts(21), 30.0), (3L, 903L, ts(30), 40.0))

  test("streaming attribution ≡ batch join, out-of-order arrival") {
    val vBatch = views.toDF("user_id", "event_id", "ts")
    val pBatch = purchases.toDF("user_id", "event_id", "ts", "value")
    val expected = StreamJoin.attributionJoin(vBatch, pBatch)
      .select("user_id", "view_id", "purchase_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // sanity on the fixture: windows in, windows out, no-view user out
    assert(expected == Set((1L, 100L, 900L, 10.0), (1L, 101L, 901L, 20.0),
      (2L, 200L, 902L, 30.0)))

    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Long, Long, Timestamp)]
    val pIn = MemoryStream[(Long, Long, Timestamp, Double)]
    // watermark = the promised lateness bound: the view fed two
    // micro-batches late (45 min behind the stream head) must sit
    // WITHIN it for batch≡stream to hold — with a 10 min watermark it
    // is correctly dropped as too-late data (verified: the pair
    // vanishes), which is the streaming contract, not a bug
    val joined = StreamJoin.attributionStream(
      vIn.toDF.toDF("user_id", "event_id", "ts"),
      pIn.toDF.toDF("user_id", "event_id", "ts", "value"),
      watermark = "2 hours")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: one view, one unrelated purchase; batch 2 delivers
      // the matching purchases BEFORE batch 3 delivers the late view
      vIn.addData(views(1)); pIn.addData(purchases(3))
      q.processAllAvailable()
      pIn.addData(purchases(0), purchases(2), purchases(1))
      q.processAllAvailable()
      vIn.addData(views(0), views(2))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("user_id", "view_id", "purchase_id", "value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got == expected)
    } finally q.stop()
  }
}
