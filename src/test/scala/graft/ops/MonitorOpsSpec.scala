package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Semantic properties of the corpus-maintenance / monitoring
  * operators (ev_anomaly, corpus_diff, text_topterms) on injected
  * fixtures — the catalog rows prove engine-vs-oracle agreement; this
  * proves the operators mean what they claim. */
class MonitorOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("monitorops").toString
    // 10 quiet days of 2 views + one spike day of 40: z of the spike
    // day is (40 - mean)/std >> 2, quiet days stay below threshold
    val quiet = for {
      day <- 1 to 10
      i <- 1 to (if (day == 7) 40 else 2)
    } yield (day * 1000L + i,
      Timestamp.valueOf(f"2024-02-$day%02d 12:00:${i % 60}%02d"),
      i.toLong, "view", 1.0, """{"k": 1}""")
    quiet.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val docs = Seq(
      // %10==3 → removed; %10==7 → added; %11==0 → changed (0, 11, 22)
      (0L, "alpha beta gamma", "en"), (3L, "dropped document", "en"),
      (7L, "fresh crawl result", "en"), (11L, "edited since last run", "en"),
      (22L, "also edited", "en"), (5L, "stable text shared words here", "en"),
      (8L, "more stable text", "en"),
      // topterms: src_x repeats a distinctive term absent elsewhere
      (31L, "quasar quasar quasar shared words here", "en"),
      (32L, "shared words here too", "en"))
      .map { case (id, t, l) =>
        val src = if (id >= 31L) "src_x" else "src_y"
        (id, t, l, src, t.length.toLong)
      }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("ev_anomaly flags exactly the injected spike day") {
    val out = EventOps.evAnomaly(spark, dir).collect()
    val spikes = out.filter(_.getAs[Int]("is_spike") == 1)
    assert(spikes.map(_.getAs[String]("day")).toSeq == Seq("2024-02-07"))
    assert(spikes.head.getAs[Long]("n_events") == 40L)
    // quiet days sit below the threshold on the same scale
    assert(out.filter(_.getAs[String]("day") != "2024-02-07")
      .forall(r => math.abs(r.getAs[Double]("z")) <= 2.0))
  }

  test("corpus_diff classifies per the snapshot derivation rules") {
    val m = TrainOps.corpusDiff(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(m(3L) == "removed")
    assert(m(7L) == "added")
    assert(m(0L) == "changed" && m(11L) == "changed" && m(22L) == "changed")
    assert(m(5L) == "unchanged" && m(8L) == "unchanged")
  }

  test("text_topterms surfaces the source-distinctive term first") {
    val rows = TextOps.textTopTerms(spark, dir).collect()
    val xTop = rows.filter(r => r.getAs[String]("source") == "src_x"
      && r.getAs[Int]("rk") == 1).head
    assert(xTop.getAs[String]("tok") == "quasar")
    // terms present in every source carry idf = ln(1) = 0 → never ranked
    assert(!rows.exists(_.getAs[String]("tok") == "shared"))
  }
}
