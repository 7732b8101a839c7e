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

  test("ev_merge_partials: monthly finals from daily state equal the direct answer") {
    val d = Files.createTempDirectory("partials").toString
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, "view", 10.0),
      (2L, Timestamp.valueOf("2024-03-02 10:00:00"), 1L, "view", 20.0),
      (3L, Timestamp.valueOf("2024-03-15 10:00:00"), 2L, "view", -5.0),
      (4L, Timestamp.valueOf("2024-04-01 10:00:00"), 2L, "view", 7.5),
      (5L, Timestamp.valueOf("2024-03-01 11:00:00"), 3L, "click", 1.25))
    ev.map { case (id, ts, u, t, v) => (id, ts, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val rows = EventOps.evMergePartials(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.keySet ==
      Set(("2024-03", "view"), ("2024-03", "click"), ("2024-04", "view")))
    val mv = rows(("2024-03", "view"))
    // three daily partials (two in one day-group's sibling days) merge:
    // counts add, decimal sums add, min/max fold, avg derived at the end
    assert(mv.getAs[Long]("n_events") == 3L)
    assert(mv.getAs[Double]("total_value") == 25.0)
    assert(mv.getAs[Double]("min_value") == -5.0)
    assert(mv.getAs[Double]("max_value") == 20.0)
    assert(mv.getAs[Double]("avg_value") == 8.333333)
    assert(rows(("2024-04", "view")).getAs[Double]("total_value") == 7.5)
    assert(rows(("2024-03", "click")).getAs[Double]("avg_value") == 1.25)
  }

  test("ev_transitions: successor pairs within users only, probabilities row-normalize") {
    val d = Files.createTempDirectory("transitions").toString
    // u1: view→click→purchase; u2: view→click→view — no cross-user pair
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, "view"),
      (2L, Timestamp.valueOf("2024-03-01 10:01:00"), 1L, "click"),
      (3L, Timestamp.valueOf("2024-03-01 10:02:00"), 1L, "purchase"),
      (4L, Timestamp.valueOf("2024-03-01 09:00:00"), 2L, "view"),
      (5L, Timestamp.valueOf("2024-03-01 09:01:00"), 2L, "click"),
      (6L, Timestamp.valueOf("2024-03-01 09:02:00"), 2L, "view"))
    ev.map { case (id, ts, u, t) => (id, ts, u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evTransitions(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      ("view", "click") -> ((2L, 1.0)),
      ("click", "purchase") -> ((1L, 0.5)),
      ("click", "view") -> ((1L, 0.5))))
    // the last event of each user emits no pair: purchase has no row
    assert(!got.keySet.exists(_._1 == "purchase"))
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
