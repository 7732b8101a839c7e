package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Hand-traced pins for T233-T235 (sample_group_kfold, dq_pk_unique,
  * ann_pq_recall). The k-fold pins use independently-computed md5
  * fold assignments (users 1,2 -> fold 0, 7 -> 1, 4 -> 2); the PQ
  * recall pin uses a corpus smaller than k so both rankings must
  * contain every candidate and recall is exactly 1. */
class Round8jOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  test("sample_group_kfold: md5 folds keep each user's events together") {
    val d = Files.createTempDirectory("kfold").toString
    // md5-prefix mod 5: users 1,2 -> fold 0; user 7 -> fold 1;
    // user 4 -> fold 2 (computed independently of the engine)
    Seq((1L, t0, 1L, "purchase", 1.0), (2L, t0, 1L, "view", 1.0),
      (3L, t0, 2L, "purchase", 1.0), (4L, t0, 4L, "view", 1.0),
      (5L, t0, 7L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = TrainOps.sampleGroupKfold(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq((0, 2L, 3L, 2L, 0.666667),
      (1, 1L, 1L, 1L, 1.0), (2, 1L, 1L, 0L, 0.0)))
  }

  test("dq_pk_unique: duplicate keys surface as dup-row counts") {
    val d = Files.createTempDirectory("pku").toString
    Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("c_custkey", "c_name")
      .write.parquet(s"$d/customer.parquet")
    Seq((1L, "t", "en", "s", 1L), (2L, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    Seq((1L, t0, 1L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    Seq((1L, 10L), (1L, 11L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$d/orders.parquet")
    val got = Profiling.dqPkUnique(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("customer.c_custkey", 3L, 2L, 1L),
      ("documents.doc_id", 2L, 2L, 0L),
      ("events.event_id", 1L, 1L, 0L),
      ("orders.o_orderkey", 2L, 1L, 1L)))
  }

  test("ev_elasticity: two traced points give slope 1, r2 1") {
    val d = Files.createTempDirectory("elast").toString
    // (qty 1, unit 1) -> (0, 0); (qty 2, unit 2 -> ext 4) ->
    // (ln 2, ln 2) on the 1e-6 grid: slope 1, intercept 0, r2 1
    Seq((1L, 10L, 1.0, 1.0), (2L, 11L, 4.0, 2.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")
    val got = StatsOps.evElasticity(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq((2L, 1.0, 0.0, 1.0)))
  }

  test("ev_adstock: half-decay carry-over on a 2-day spine") {
    val d = Files.createTempDirectory("adstock").toString
    // day 0: 2 views, day 1: 1 view -> adstock = [2, 1 + 0.5*2 = 2]
    Seq((1L, t0, 1L, "view", 1.0), (2L, t0, 2L, "view", 1.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 1L,
        "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = StatsOps.evAdstock(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq(("view", 0L, 2L, 2.0), ("view", 1L, 1L, 2.0)))
  }

  test("ev_srm_segments: a one-sided segment trips the df=1 flag") {
    val d = Files.createTempDirectory("srmseg").toString
    // 'click': users 2,4,6,8 all even -> chi2 = 4 > 3.84 -> flagged;
    // 'view': users 1,2 balanced -> chi2 0
    val rows = Seq(2L, 4L, 6L, 8L).zipWithIndex.map { case (u, i) =>
      ((i + 1).toLong, t0, u, "click", 1.0)
    } ++ Seq((10L, t0, 1L, "view", 1.0), (11L, t0, 2L, "view", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = StatsOps.evSrmSegments(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    assert(got.toSeq == Seq(("click", 4L, 0L, 4.0, 1),
      ("view", 1L, 1L, 0.0, 0)))
  }

  test("text_hapax: once-seen vocabulary fraction per source") {
    val d = Files.createTempDirectory("hapax").toString
    // src a: tokens x,x,y -> vocab 2, hapax {y} -> rate 0.5;
    // src b: token z -> vocab 1, hapax 1 -> rate 1.0
    Seq((1L, "x x y", "en", "a", 5L), (2L, "z", "en", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.textHapax(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(("a", 3L, 2L, 1L, 0.5),
      ("b", 1L, 1L, 1L, 1.0)))
  }

  test("ev_rolling_corr: proportional series correlate at exactly 1") {
    val d = Files.createTempDirectory("rollcorr").toString
    // days 1..3: clicks 2/4/6, purchases 1/2/3 -> perfectly linear;
    // day 1's window has one point (den 0 -> NULL)
    def day(dd: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$dd%d 10:00:00")
    var id = 0L
    val rows = (1 to 3).flatMap { t =>
      (1 to 2 * t).map { _ => id += 1; (id, day(t), 1L, "click", 1.0) } ++
        (1 to t).map { _ => id += 1; (id, day(t), 1L, "purchase", 1.0) }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = StatsOps.evRollingCorr(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L, 1L, 1, None),
      ("2024-01-02", 4L, 2L, 2, Some(1.0)),
      ("2024-01-03", 6L, 3L, 3, Some(1.0))))
  }

  test("dq_sequence_gaps: intra-bucket and boundary gaps both surface") {
    val d = Files.createTempDirectory("seqgap").toString
    // purchase ids {1,5,6,999,2001}: intra-bucket gaps 2-4 and 7-998;
    // the 1000-2000 gap crosses buckets 0 -> 2 (bucket 1 empty);
    // n_missing = 2001-1+1-5 = 1996 = 3+992+1001
    val rows = Seq(1L, 5L, 6L, 999L, 2001L).map(i =>
      (i, t0, 1L, "purchase", 1.0)) :+ (3L, t0, 1L, "view", 1.0)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = Profiling.dqSequenceGaps(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1000L, 2000L, 1001L, 1996L),
      (7L, 998L, 992L, 1996L), (2L, 4L, 3L, 1996L)))
  }

  test("ann_pq_recall: corpus smaller than k gives exact recall 1") {
    val d = Files.createTempDirectory("pqrec").toString
    // 9 candidates + query: both the exact and the ADC top-20 must
    // contain all 9 ids, so the panel pins (9, 9, 1.0)
    val rows = (0L to 9L).map { id =>
      val v = Array.tabulate(64)(i =>
        math.sin(id * 64.0 + i).toFloat)
      (id, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val got = SimOps.annPqRecall(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((9L, 9L, 1.0)))
  }
}
