package graft.functions

import graft.SparkFunSuite
import graft.functions.expressions.MisraGries
import org.apache.spark.sql.functions._

/** Misra–Gries summary semantics: the survival guarantee under
  * arbitrary partitioning, and the sketch-then-recount contract the
  * text_heavyhitters catalog row relies on. */
class MisraGriesSpec extends SparkFunSuite {
  import spark.implicits._

  test("values above n/(k+1) survive every partitioning; recount equals ground truth") {
    // Zipf-ish stream: value i appears 1000/i times, i = 1..200;
    // n = sum ≈ 5878, k = 20 → floor n/21 ≈ 279: values 1..3 MUST
    // survive (freq 1000, 500, 333); the tail is fair game
    val rows = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"v$i"))
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.toDF("tok").repartition(parts)
      MisraGries.register(spark)
      val cands = df
        .agg(expr("mg_topk_native(tok)").as("c")) // DefaultK = 200 ≥ distinct → exact
        .select(explode($"c").as("tok")).as[String].collect().toSet
      // with k ≥ distinct count nothing is ever evicted
      assert(cands == (1 to 200).map(i => s"v$i").toSet)
      // now a tight k via the expression directly: aggregate in SQL
      // with a k far below the cardinality
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "mg20", es => expressions.MisraGries(es.head, 20), "built-in")
      val tight = df.agg(expr("mg20(tok)").as("c"))
        .select(explode($"c").as("tok")).as[String].collect().toSet
      assert(tight.size <= 20)
      assert(Set("v1", "v2", "v3").subsetOf(tight),
        s"guarantee violated at parts=$parts: $tight")
    }
  }

  test("merge shrink keeps at most k entries and destroys mass fairly") {
    val a = new java.util.HashMap[String, java.lang.Long]()
    a.put("x", 10L); a.put("y", 6L); a.put("z", 2L)
    val b = new java.util.HashMap[String, java.lang.Long]()
    b.put("x", 5L); b.put("w", 4L)
    // combine: x=15 y=6 w=4 z=2; shrink to k=2 → subtract 3rd largest
    // (4): x=11, y=2, w and z drop
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); a.merge(e.getKey, e.getValue, (p, q) => p + q)
    }
    MisraGries.shrink(a, 2)
    assert(a.size == 2 && a.get("x") == 11L && a.get("y") == 2L)
  }

  test("text_heavyhitters equals the brute-force groupBy on real documents") {
    val got = graft.ops.TextOps.textHeavyHitters(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    val toks = graft.Tables.documents(spark, sfDir).select(
      explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')")).as("tok"))
    val n = toks.count()
    val want = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= n * 0.01)
      .orderBy($"cnt".desc, $"tok".asc).as[(String, Long)].collect().toSeq
    assert(got == want)
  }
}
