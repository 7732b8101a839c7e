package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Hand-traced semantic pins for the T207–T211 additions: DoReMi
  * mix reweighting, TOST equivalence, delta-method ratio metrics,
  * per-dimension embedding health and the snapshot-drift monitor. */
class Round8cOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000L)

  private def writeEvents(
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): String = {
    val d = Files.createTempDirectory("r8c").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("mix_doremi: hard source gains share, easy source loses it") {
    // src A: 'a a a a' (all the common token, −ln ½ each);
    // src B: 'b c d e' (4 singletons, −ln ⅛ each). Equal 0.5 token
    // shares, excess = ∓ln 2 → weights 0.5·exp(∓ln2)/Z = 0.2 / 0.8
    val d = Files.createTempDirectory("doremi").toString
    Seq((1L, "a a a a", "en", "A", 7L), (2L, "b c d e", "en", "B", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TrainOps.mixDoremi(spark, d).collect()
    val a = got.find(_.getString(0) == "A").get
    val b = got.find(_.getString(0) == "B").get
    assert(a.getLong(1) == 4L && b.getLong(1) == 4L)
    assert(a.getDouble(2) == 0.5 && b.getDouble(2) == 0.5)
    assert(a.getDouble(3) == 0.693147 && b.getDouble(3) == 2.079442)
    assert(a.getDouble(4) == -0.693147 && b.getDouble(4) == 0.693147)
    assert(a.getDouble(5) == 0.2 && b.getDouble(5) == 0.8)
  }

  test("ev_tost: equal 10% arms at n=1300 prove equivalence at delta=0.02") {
    // se = √(2·0.09/1300) = 0.011767; zl = zu = 1.699673 > 1.645
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, java.sql.Timestamp, Long, String, Double)]
    var id = 0L
    for (u <- 1L to 2600L) {
      val converts = (u % 2 == 0 && u <= 260) || (u % 2 == 1 && u <= 259)
      val k = if (converts) 14 else 1
      val typ = if (converts) "purchase" else "view"
      for (i <- 0 until k) { id += 1; rows += ((id, ts(id), u, typ, 1.0)) }
    }
    // even converters: 2,4,…,260 → 130; odd: 1,3,…,259 → 130
    val r = StatsOps.evTost(spark, writeEvents(rows.toSeq)).collect().head
    assert(r.getLong(0) == 1300L && r.getLong(1) == 130L)
    assert(r.getLong(2) == 1300L && r.getLong(3) == 130L)
    assert(r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 0.011767)
    assert(r.getDouble(6) == 1.699673 && r.getDouble(7) == 1.699673)
    assert(r.getInt(8) == 1)
  }

  test("ev_ratio_delta: single-event users reduce to the plain mean test") {
    // k≡1 → vk = cxk = 0, R = mean cents: control {10,20}→15,
    // treat {10,30}→20; vr = vx/n → z = 500/√1.25e6 = 0.447214
    val d = writeEvents(Seq(
      (1L, ts(0), 1L, "purchase", 10.0), (2L, ts(1), 2L, "purchase", 10.0),
      (3L, ts(2), 3L, "purchase", 30.0), (4L, ts(3), 4L, "purchase", 20.0)))
    val r = StatsOps.evRatioDelta(spark, d).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 15.0 && r.getDouble(3) == 20.0)
    assert(r.getDouble(4) == 11.18034)
    assert(r.getDouble(5) == 0.447214)
    assert(r.getInt(6) == 0)
  }

  test("emb_dim_stats: hand-traced mean/sd/dead-fraction on 3 vectors") {
    val d = Files.createTempDirectory("dimstats").toString
    Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(3.0f, 0.005f), 0),
      (3L, Seq(2.0f, -0.02f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val got = SimOps.embDimStats(spark, d).collect()
    assert(got.length == 2)
    val d0 = got(0)
    assert(d0.getInt(0) == 0 && d0.getLong(1) == 3L)
    assert(d0.getDouble(2) == 2.0 && d0.getDouble(3) == 1.0
      && d0.getDouble(4) == 0.0)
    val d1 = got(1)
    // floats 0.0 / 0.005f / −0.02f quantize to 0, .005, −.02 on the
    // 1e-9 grid; sd = √(((425−225/3)/2)·1e-6) = 0.013229
    assert(d1.getDouble(2) == -0.005 && d1.getDouble(3) == 0.013229)
    assert(d1.getDouble(4) == 0.666667)
  }

  test("dq_snapshot_drift: one status vanishes from half B, prices shift") {
    val d = Files.createTempDirectory("drift").toString
    // half0 (even keys): O@20, O@40 → mean 30; half1: O@10, F@30 → 20
    // PSI: O term (1−.5)·ln2 = 0.346574, F term dropped (pa=0)
    Seq((1L, "O", 10.00), (2L, "O", 20.00),
      (3L, "F", 30.00), (4L, "O", 40.00))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")
    val r = Profiling.dqSnapshotDrift(spark, d).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.346574)
    assert(r.getDouble(3) == 30.0 && r.getDouble(4) == 20.0)
    assert(r.getDouble(5) == -33.333333)
  }
}
