package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Hand-traced pins for T219 (CDC-chunk near-dup pairs) and T220
  * (MDE curve). The CDC traces use sub-8-char texts — the cut rule
  * needs an 8-char gram, so short docs are single whole-text chunks
  * and the chunk-set algebra can be verified by hand without
  * replaying the Horner hash. */
class Round8fOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  test("dedup_cdc_share: exact-dup short docs pair at jaccard 1.0") {
    val d = Files.createTempDirectory("cdcshare").toString
    // all texts < 8 chars → one chunk each (the whole text): docs 1,2
    // share their only chunk; doc 3 is a singleton chunk (no pair)
    Seq((1L, "hello", "en", "a"),
      (2L, "hello", "en", "b"),
      (3L, "world", "en", "a"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.dedupCdcShare(spark, d).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L) // (d1, d2)
    assert(r.getLong(2) == 1L)                       // shared
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L) // n1, n2
    assert(r.getDouble(5) == 1.0)                    // jaccard
  }

  test("dedup_cdc_share: the 2..8 spread cap drops boilerplate chunks") {
    val d = Files.createTempDirectory("cdccap").toString
    // "spam" spans 9 docs (> 8 → capped out, contributes NO pairs);
    // "hello" spans exactly 2 → the only surviving pair is (20, 21)
    val spam = (1L to 9L).map(i => (i, "spam", "en", "x"))
    val rows = spam ++ Seq((20L, "hello", "en", "y"),
      (21L, "hello", "en", "y"))
    rows.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.dedupCdcShare(spark, d).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 20L && got(0).getLong(1) == 21L)
    assert(got(0).getDouble(5) == 1.0)
  }

  test("ev_mde_curve: traced 5-point curve at pooled rate 0.25") {
    val d = Files.createTempDirectory("mde").toString
    // u0 (control): 14 purchases → converted; u1 (treat): 13 → not;
    // u2 (control) / u3 (treat): non-purchase noise. n_control =
    // n_treat = 2, conv_all = 1, n_all = 4 → p̄ = 0.25;
    // n_base = max(2 div 4, 1) = 1 → panel n = 1,2,4,8,16;
    // MDE(n) = 2.8·√(2·0.25·0.75/n) = 2.8·√(0.375/n)
    val purchases =
      (0 until 14).map(i => (i.toLong, t0, 0L, "purchase", 1.0)) ++
        (0 until 13).map(i => (100L + i, t0, 1L, "purchase", 1.0)) ++
        Seq((200L, t0, 2L, "view", 1.0), (201L, t0, 3L, "click", 1.0))
    purchases.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = StatsOps.evMdeCurve(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1, 1L, 0.25, 1.714643),
      (2, 2L, 0.25, 1.212436),
      (4, 4L, 0.25, 0.857321),
      (8, 8L, 0.25, 0.606218),
      (16, 16L, 0.25, 0.428661)))
  }
}
