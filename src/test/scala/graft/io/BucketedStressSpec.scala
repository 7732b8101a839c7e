package graft.io

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The bucketed stores at realistic width: 256 buckets under a
  * multi-batch index/upsert/delete interleaving (only touched buckets'
  * files ever change) and a mid-swap crash with a MULTI-bucket touched
  * set interrupted at every point of the two-move-per-bucket loop —
  * the end-to-end 100 TB incremental-write story. */
class BucketedStressSpec extends SparkFunSuite {
  import spark.implicits._

  private val N = 256

  private def snapshot(dir: String): Map[String, (Long, Long)] = {
    val root = Paths.get(dir)
    Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map { p: Path =>
        root.relativize(p).toString ->
          (Files.size(p), Files.getLastModifiedTime(p).toMillis)
      }.toMap
  }

  /** Every changed file must live under a bucket dir the batch's keys
    * hash into; every file outside them must be byte/mtime-identical. */
  private def assertOnlyTouched(before: Map[String, (Long, Long)],
      after: Map[String, (Long, Long)], keys: Seq[String]): Unit = {
    val touched = BucketedParquet.touchedBuckets(
      keys.toDF("doc_id"), Seq("doc_id"), N)
      .map(k => s"__bucket=$k").toSet
    val changed = (after.filter { case (f, m) => before.get(f) != Some(m) }
      .keySet ++ before.keySet.diff(after.keySet))
      .map(_.split("/")(0)).filter(_.startsWith("__bucket="))
    assert(changed.subsetOf(touched), s"changed outside batch: ${changed.diff(touched)}")
    before.keySet.intersect(after.keySet)
      .filterNot(f => touched.exists(f.startsWith))
      .foreach(f => assert(before(f) == after(f), s"$f was rewritten"))
  }

  test("256 buckets: interleaved index/upsert/delete touch only their buckets") {
    val d = Files.createTempDirectory("stress").toString
    val store = new DocStore(spark, d, numBuckets = N)
    val dir = s"$d/idx"
    var model = (1 to 2000).map(i => s"d$i" -> i).toMap
    store.index("idx", "doc_id", model.toSeq.toDF("doc_id", "v"))
    assert(Files.list(Paths.get(dir)).iterator().asScala
      .count(_.getFileName.toString.startsWith("__bucket=")) > 200)

    (0 until 3).foreach { round =>
      val base = round * 40
      // index: overwrite 5, insert 2 new
      val ik = (1 to 5).map(i => s"d${base + i}") ++
        Seq(s"n${round}a", s"n${round}b")
      val ib = ik.zipWithIndex.map { case (k, i) => (k, 10000 + i) }
      var s0 = snapshot(dir)
      store.index("idx", "doc_id", ib.toDF("doc_id", "v"))
      assertOnlyTouched(s0, snapshot(dir), ik)
      model = model ++ ib.toMap
      // upsert: partial update of 5 existing
      val uk = (6 to 10).map(i => s"d${base + i}")
      val ub = uk.map(k => (k, 20000 + round))
      s0 = snapshot(dir)
      store.upsert("idx", "doc_id", ub.toDF("doc_id", "v"))
      assertOnlyTouched(s0, snapshot(dir), uk)
      model = model ++ ub.toMap
      // delete: 5 existing keys + one never-stored key (no-op for it)
      val dk = (11 to 15).map(i => s"d${base + i}") :+ s"ghost$round"
      s0 = snapshot(dir)
      store.delete("idx", "doc_id", dk.toDF("doc_id"))
      assertOnlyTouched(s0, snapshot(dir), dk)
      model = model -- dk
      // replaying the drain (keys already gone) is a byte-level no-op:
      // only buckets that actually LOSE a row are ever rewritten
      val s1 = snapshot(dir)
      store.delete("idx", "doc_id", dk.toDF("doc_id"))
      assert(snapshot(dir) == s1, "no-op delete rewrote buckets")
      // the store equals the model after every round
      val got = store.read("idx").get.collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got == model, s"round $round diverged")
    }
  }

  private def copyTree(src: Path, dst: Path): Unit =
    Files.walk(src).iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }

  test("multi-bucket swap interrupted at every per-bucket move point recovers") {
    val base = (1 to 2000).map(i => (s"d$i", i)).toDF("doc_id", "v")
    // an update batch spanning several distinct buckets
    val updKeys = Seq("d1", "d2", "d3", "d4", "d5", "d6")
    val update = updKeys.zipWithIndex.map { case (k, i) => (k, 999 - i) }
      .toDF("doc_id", "v")
    val touched = BucketedParquet.touchedBuckets(update, Seq("doc_id"), N)
    assert(touched.size >= 3, "fixture must span several buckets")

    // reference: the completed write
    val dFull = Files.createTempDirectory("stressF").toString
    val full = new DocStore(spark, dFull, numBuckets = N)
    full.index("idx", "doc_id", base)
    full.index("idx", "doc_id", update)
    val expected = full.read("idx").get.collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap

    // crash state: bucket k0 fully swapped, k1 caught between its two
    // moves (old live in trash, staged not yet moved), the rest not
    // started — i.e. the loop interrupted before AND after the first
    // move of a bucket, with earlier buckets complete
    val d = Files.createTempDirectory("stressC").toString
    new DocStore(spark, d, numBuckets = N).index("idx", "doc_id", base)
    val staging = s"$d/idx.staging"
    touched.foreach { k =>
      copyTree(Paths.get(s"$dFull/idx/__bucket=$k"),
        Paths.get(s"$staging/__bucket=$k"))
    }
    val k0 = touched.head
    val k1 = touched(1)
    // k0: swap already finished — staged dir consumed, live replaced
    BucketedParquet.deleteTree(Paths.get(s"$d/idx/__bucket=$k0"))
    Files.move(Paths.get(s"$staging/__bucket=$k0"),
      Paths.get(s"$d/idx/__bucket=$k0"))
    // k1: first move done (live → trash), second not
    Files.createDirectories(Paths.get(s"$d/idx.trash"))
    Files.move(Paths.get(s"$d/idx/__bucket=$k1"),
      Paths.get(s"$d/idx.trash/__bucket=$k1"))
    Files.writeString(Paths.get(s"$d/idx.swap-journal"),
      touched.mkString(","))

    val got = new DocStore(spark, d, numBuckets = N).read("idx").get
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == expected)
    assert(!Files.exists(Paths.get(s"$d/idx.swap-journal")))
    assert(!Files.exists(Paths.get(s"$d/idx.staging")))
    assert(!Files.exists(Paths.get(s"$d/idx.trash")))
  }
}
