package graft.ops

import graft.SparkFunSuite

/** Round-9 operator pins. */
class Round9OpsSpec extends SparkFunSuite {

  test("plan_buildsides: census columns, one row per panel query, sane counts") {
    val rows = CoreRelational.planBuildSides(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("q02", "q09", "q18"))
    rows.foreach { r =>
      val (bhj, smj, bl, br) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // every join is SOME strategy and every strategy has a build side
      assert(bhj + smj >= 2, s"${r.getString(0)}: too few joins ($bhj+$smj)")
      assert(bl + br == bhj + smj,
        s"${r.getString(0)}: build sides ($bl+$br) != joins (${bhj + smj})")
      // at fixture scale AQE must broadcast every panel join — a
      // sort-merge here is the exact regression the census exists
      // to catch (lost stats, stray hint, disabled AQE rule)
      assert(smj == 0, s"${r.getString(0)}: lost a broadcast to sort-merge")
    }
  }

  test("plan_buildsides: the census is deterministic run-over-run") {
    val a = CoreRelational.planBuildSides(spark, sfDir).collect().toSeq
    val b = CoreRelational.planBuildSides(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("plan_shuffles: static census invariants hold at fixture scale") {
    val rows = CoreRelational.planShuffles(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("a02_keepoldest", "j01_enrich", "j06_anti", "o01_topk",
        "q01_pricing"))
    val byName = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the TakeOrdered head is shuffle-free; nothing re-scans its fact
    assert(byName("o01_topk")._1 == 0, "o01 grew a shuffle")
    rows.foreach { r =>
      assert(r.getLong(3) <= 3, s"${r.getString(0)} re-scans a table")
    }
    // the enrichment fact shuffles once and broadcasts both dims
    assert(byName("j01_enrich") == ((1L, 2L, 3L)), byName("j01_enrich"))
  }
}
