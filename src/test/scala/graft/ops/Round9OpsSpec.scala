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
}
