package graft.streaming

import graft.SparkFunSuite
import graft.ops.SkewJoin
import graft.io.ZipUtil
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class CursorStateSpec extends SparkFunSuite {
  import CursorState._
  import spark.implicits._

  test("pure cursor transition: widen bounds, flip direction, pin on end") {
    val c1 = advance(None,
      Iterator(TweetEvent("u1", 100, end = false)), "u1").get
    assert(c1 == Cursor("u1", 100, 100, "newer", end = false))
    val c2 = advance(Some(c1),
      Iterator(TweetEvent("u1", 50, end = false),
        TweetEvent("u1", 150, end = false)), "u1").get
    assert(c2.min_id == 50 && c2.max_id == 150)
    assert(c2.direction == "older") // flipped from newer
    val c3 = advance(Some(c2),
      Iterator(TweetEvent("u1", 10, end = true)), "u1").get
    assert(c3.direction == "newer" && c3.end)
    // empty batch leaves state untouched
    assert(advance(Some(c3), Iterator.empty, "u1").contains(c3))
  }

  test("flatMapGroupsWithState keeps per-user cursors across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TweetEvent]
    val q = track(input.toDS).writeStream
      .format("memory").queryName("cursors")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(TweetEvent("u1", 100, end = false),
        TweetEvent("u2", 7, end = false))
      q.processAllAvailable()
      input.addData(TweetEvent("u1", 250, end = false))
      q.processAllAvailable()
      val out = spark.table("cursors").as[Cursor].collect()
      val u1 = out.filter(_.user_id == "u1").maxBy(_.max_id)
      assert(u1.min_id == 100 && u1.max_id == 250)
      assert(u1.direction == "older") // second batch flipped newer→older
      assert(out.count(_.user_id == "u2") == 1)
    } finally q.stop()
  }
}

class SkewJoinSpec extends SparkFunSuite {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // hot key: 90% of rows share key 1
    val big = (1L to 1000L).map(i =>
      (i, if (i <= 900) 1L else i % 10)).toDF("row_id", "k")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (0L, "z"))
      .toDF("k", "v")
    val plain = big.join(small, Seq("k")).select("row_id", "v")
      .collect().toSet
    val salted = SkewJoin.saltedJoin(big, small, "k", "row_id", 8)
      .select("row_id", "v").collect().toSet
    assert(salted == plain)
    assert(salted.size == plain.size && plain.size > 900)
  }

  test("salted aggregation equals direct aggregation") {
    val df = (1L to 500L).map(i => (i, i % 3, i.toDouble)).toDF("row_id", "k", "v")
    val direct = df.groupBy($"k")
      .agg(sum($"v").as("total"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedSumCount(df, "k", $"v", "row_id", 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}

class ZipUtilSpec extends SparkFunSuite {

  test("round-trip extract of a pipe-text archive, then spark reads it") {
    val dir = Files.createTempDirectory("zip").toString
    val zipPath = s"$dir/bulk.zip"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("cn22/cn.txt"))
    zos.write("H1|SMITH, JOHN|DEM|2022|CA|H|01|C|C|C1|||LA|CA|90001\n".getBytes)
    zos.closeEntry(); zos.close()
    val extracted = ZipUtil.unzip(zipPath, s"$dir/out")
    assert(extracted.size == 1)
    val df = graft.fec.FecSchemas.readBulkFile(spark, "cn22",
      extracted.head.toString)
    assert(df.count() == 1)
  }

  test("rejects path traversal") {
    val dir = Files.createTempDirectory("zip2").toString
    val zipPath = s"$dir/evil.zip"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("../../evil.txt"))
    zos.write("x".getBytes)
    zos.closeEntry(); zos.close()
    intercept[IllegalArgumentException] {
      ZipUtil.unzip(zipPath, s"$dir/out")
    }
  }
}
