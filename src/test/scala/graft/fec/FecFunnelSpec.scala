package graft.fec

import graft.SparkFunSuite

/** The flagship-funnel fixture contract: line shapes match the S5
  * schemas, the quarantine/memo/dup mods actually fire, and the stage
  * table is a true funnel. The stage-count VALUES are hash-checked by
  * the driver oracle (fec_funnel); this spec pins the structural
  * invariants a fixture edit could silently break. */
class FecFunnelSpec extends SparkFunSuite {

  test("fixture lines carry exactly the registry field counts") {
    (0L to 60L).foreach { k =>
      assert(FecFunnel.indivLine(k).split("\\|", -1).length ==
        FecSchemas.registry("indiv22").fields.length,
        s"indivLine($k) field count")
    }
    (0L to 60L).filter(_ % 10 == 0).foreach { k =>
      assert(FecFunnel.othLine(k).split("\\|", -1).length ==
        FecSchemas.registry("oth22").fields.length,
        s"othLine($k) field count")
    }
  }

  test("the funnel is monotone, each engineered drop fires, and the " +
    "envelope stage is lossless") {
    val rows = FecFunnel.fecFunnel(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getInt(0))
    assert(rows.map(_.getString(1)).toSeq == Seq("raw_lines", "parsed",
      "master", "classified", "envelopes", "contributed_to_keys"))
    val n = rows.map(_.getLong(2))
    assert(n.zip(n.tail).forall { case (a, b) => a >= b },
      s"funnel must be non-increasing: ${n.toSeq}")
    // quarantine, memo+dup, and classification drops all engaged
    assert(n(0) > n(1), "corrupt lines must quarantine at parse")
    assert(n(1) > n(2), "memo exclusion + dedup must drop at master")
    assert(n(2) > n(3), "unclassifiable rows must drop at the views")
    assert(n(3) == n(4), "envelope generation must be lossless")
    assert(n(4) > n(5), "MERGE keys must dedup repeat donors")
    assert(rows.head.getDouble(3) == 1.0)
  }
}
