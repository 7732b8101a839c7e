package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Hand-traced pins for T226-T228 (graph_bridges, layout_filesizing,
  * pack_sorted_batching). The bridge trace builds a path-plus-triangle
  * graph by hand; the batching trace interleaves long/short docs so
  * length-sorting provably zeroes the padding. */
class Round8hOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("graph_bridges: path edges are bridges, triangle edges are not") {
    val d = Files.createTempDirectory("bridges").toString
    // suppliers 1-2-3 form a path (edges (1,2),(2,3), each via 2
    // shared customers, no common neighbor -> both LOCAL BRIDGES);
    // suppliers 4,5,6 share 2 customers pairwise -> a triangle, all
    // three edges excluded. n_edges = 5, n_bridges = 2.
    val orders = Seq((1L, 10L), (2L, 11L), (3L, 12L), (4L, 13L),
      (5L, 14L), (6L, 15L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (1L, 1L, 50.0), (1L, 2L, 50.0),   // cust 10: {1,2}
      (2L, 1L, 50.0), (2L, 2L, 50.0),   // cust 11: {1,2}
      (3L, 2L, 50.0), (3L, 3L, 50.0),   // cust 12: {2,3}
      (4L, 2L, 50.0), (4L, 3L, 50.0),   // cust 13: {2,3}
      (5L, 4L, 50.0), (5L, 5L, 50.0), (5L, 6L, 50.0), // cust 14
      (6L, 4L, 50.0), (6L, 5L, 50.0), (6L, 6L, 50.0)) // cust 15
      .toDF("l_orderkey", "l_suppkey", "l_quantity")
    orders.write.parquet(s"$d/orders.parquet")
    li.write.parquet(s"$d/lineitem.parquet")
    val got = GraphOps.graphBridges(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq((1L, 2L, 1L, 2L, 5L, 2L),
      (2L, 3L, 2L, 1L, 5L, 2L)))
  }

  test("layout_filesizing: integer file ceiling and the 1.1x hot flag") {
    val d = Files.createTempDirectory("filesize").toString
    // srcA: 5000 bytes -> ceil(5000/4096) = 2 files, and
    // 10*5000*2 = 100000 > 11*5100 = 56100 -> hot; srcB: 100 bytes ->
    // 1 file, cold
    Seq((1L, "t", "en", "srcA", 3000L), (2L, "t", "en", "srcA", 2000L),
      (3L, "t", "en", "srcB", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = LayoutOlap.layoutFilesizing(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(got.toSeq == Seq(("srcA", 2L, 5000L, 2L, 1),
      ("srcB", 1L, 100L, 1L, 0)))
  }

  test("pack_sorted_batching: length-sorting zeroes the padding bill") {
    val d = Files.createTempDirectory("sortbatch").toString
    // 16 docs, one source: odd ids are 5-token docs, even ids 1-token.
    // Arrival batches (1-8, 9-16) each mix 4+4 -> pad to max 5:
    // 2*(40-24) = 32 pad on 48 tokens. Sorted batches separate the
    // 1s from the 5s -> zero padding.
    val rows = (1L to 16L).map { i =>
      val text = if (i % 2 == 1) "x x x x x" else "x"
      (i, text, "en", "s", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TrainOps.packSortedBatching(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(("arrival", 2L, 48L, 32L, 0.4),
      ("sorted", 2L, 48L, 0L, 0.0)))
  }
}
