package graft.io

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** K1/K2 at scale: DocStore indices are hash-bucketed and every write
  * mode rewrites only the buckets its batch touches. */
class BucketedDocStoreSpec extends SparkFunSuite {
  import spark.implicits._

  private def snapshot(dir: String): Map[String, (Long, Long)] = {
    val root = Paths.get(dir)
    Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map { p: Path =>
        root.relativize(p).toString ->
          (Files.size(p), Files.getLastModifiedTime(p).toMillis)
      }.toMap
  }

  private def assertOneBucketChanged(before: Map[String, (Long, Long)],
      after: Map[String, (Long, Long)]): Unit = {
    val changed = after.filter { case (f, m) => before.get(f) != Some(m) }
      .keySet ++ before.keySet.diff(after.keySet)
    val buckets = changed.map(_.split("/")(0)).filter(_.startsWith("__bucket="))
    assert(buckets.size == 1, s"changed: $changed")
    before.keySet.intersect(after.keySet)
      .filterNot(f => buckets.exists(f.startsWith))
      .foreach(f => assert(before(f) == after(f), s"$f was rewritten"))
  }

  test("1-row index / upsert / insertNew each rewrite exactly one bucket") {
    val d = Files.createTempDirectory("bdocs").toString
    val store = new DocStore(spark, d, numBuckets = 8)
    val base = (1 to 200).map(i => (s"d$i", i)).toDF("doc_id", "v")
    store.index("idx", "doc_id", base)
    val dir = s"$d/idx"
    assert(Files.list(Paths.get(dir)).iterator().asScala
      .count(_.getFileName.toString.startsWith("__bucket=")) > 1)

    val s1 = snapshot(dir)
    store.index("idx", "doc_id", Seq(("d1", 999)).toDF("doc_id", "v"))
    val s2 = snapshot(dir)
    assertOneBucketChanged(s1, s2)
    assert(store.read("idx").get.count() == 200)
    assert(store.read("idx").get.filter($"doc_id" === "d1")
      .head().getAs[Int]("v") == 999)

    store.upsert("idx", "doc_id", Seq(("d2", 777)).toDF("doc_id", "v"))
    val s3 = snapshot(dir)
    assertOneBucketChanged(s2, s3)
    assert(store.read("idx").get.filter($"doc_id" === "d2")
      .head().getAs[Int]("v") == 777)

    val inserted = store.insertNew("idx", "doc_id",
      Seq(("d2", 1), ("d999", 42)).toDF("doc_id", "v"))
    // d2 exists → only d999 inserts; its bucket is the only change
    assert(inserted.collect().map(_.getString(0)).toList == List("d999"))
    val s4 = snapshot(dir)
    assertOneBucketChanged(s3, s4)
    assert(store.read("idx").get.count() == 201)
    assert(store.read("idx").get.filter($"doc_id" === "d2")
      .head().getAs[Int]("v") == 777) // insertNew never overwrites
  }

  test("stored bucket count is authoritative when reopened with a different N") {
    val d = Files.createTempDirectory("bn").toString
    new DocStore(spark, d, numBuckets = 8).index("idx", "doc_id",
      (1 to 100).map(i => (s"d$i", i)).toDF("doc_id", "v"))
    val before = snapshot(s"$d/idx")
    // a misconfigured reopen must still compute buckets with N=8
    val reopened = new DocStore(spark, d, numBuckets = 4)
    reopened.index("idx", "doc_id", Seq(("d1", 999)).toDF("doc_id", "v"))
    assertOneBucketChanged(before, snapshot(s"$d/idx"))
    assert(reopened.read("idx").get.count() == 100)
    assert(reopened.read("idx").get.filter($"doc_id" === "d1")
      .head().getAs[Int]("v") == 999)
  }

  private def copyTree(src: Path, dst: Path): Unit =
    Files.walk(src).iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }

  test("interrupted bucket swap rolls forward to the committed write") {
    import org.apache.spark.sql.functions.col
    val base = (1 to 200).map(i => (s"d$i", i)).toDF("doc_id", "v")
    val update = Seq(("d1", 999)).toDF("doc_id", "v")

    // reference store: the write completes normally
    val dFull = Files.createTempDirectory("crashF").toString
    val full = new DocStore(spark, dFull, numBuckets = 8)
    full.index("idx", "doc_id", base)
    full.index("idx", "doc_id", update)
    val expected = full.read("idx").get.collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val k = BucketedParquet.touchedBuckets(update, Seq("doc_id"), 8).head

    // crash state A: staging + journal written, NO moves done yet
    def buildInterrupted(): String = {
      val d = Files.createTempDirectory("crashA").toString
      new DocStore(spark, d, numBuckets = 8).index("idx", "doc_id", base)
      copyTree(Paths.get(s"$dFull/idx/__bucket=$k"),
        Paths.get(s"$d/idx.staging/__bucket=$k"))
      Files.writeString(Paths.get(s"$d/idx.swap-journal"), k.toString)
      d
    }
    val a = buildInterrupted()
    val gotA = new DocStore(spark, a, numBuckets = 8).read("idx").get
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(gotA == expected)
    assert(!Files.exists(Paths.get(s"$a/idx.swap-journal")))

    // crash state B: old live bucket already moved to trash
    val b = buildInterrupted()
    Files.createDirectories(Paths.get(s"$b/idx.trash"))
    Files.move(Paths.get(s"$b/idx/__bucket=$k"),
      Paths.get(s"$b/idx.trash/__bucket=$k"))
    val gotB = new DocStore(spark, b, numBuckets = 8).read("idx").get
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(gotB == expected)
    assert(!Files.exists(Paths.get(s"$b/idx.staging")))
  }

  test("crash state C: all-rows-deleted bucket rolls forward to empty, not stale") {
    // A merge can leave a touched bucket EMPTY (every row deleted).
    // Spark writes no partition dir for zero rows, so the writer stages
    // an explicit empty dir — otherwise a crash after journaling would
    // leave the old live data in place forever and recovery couldn't
    // tell "deleted" from "swap already finished".
    val base = (1 to 200).map(i => (s"d$i", i)).toDF("doc_id", "v")
    val d = Files.createTempDirectory("crashC").toString
    new DocStore(spark, d, numBuckets = 8).index("idx", "doc_id", base)
    val k = BucketedParquet.touchedBuckets(
      Seq(("d1", 0)).toDF("doc_id", "v"), Seq("doc_id"), 8).head
    // simulate the writer crashing right after the commit point of a
    // batch that deleted ALL of bucket k: empty staged dir + journal,
    // old live dir still in place
    Files.createDirectories(Paths.get(s"$d/idx.staging/__bucket=$k"))
    Files.writeString(Paths.get(s"$d/idx.swap-journal"), k.toString)
    val expected = base
      .withColumn("b", BucketedParquet.bucketOf(Seq("doc_id"), 8))
      .filter($"b" =!= k).select("doc_id").as[String].collect().toSet
    assert(expected.size < 200) // bucket k was non-empty
    val got = new DocStore(spark, d, numBuckets = 8).read("idx").get
      .select("doc_id").as[String].collect().toSet
    assert(got == expected)
    assert(!Files.exists(Paths.get(s"$d/idx.swap-journal")))
    assert(!Files.exists(Paths.get(s"$d/idx.staging")))
  }

  test("detachDelete that empties a bucket deletes its rows durably") {
    import graft.graph.GraphStore
    val d = Files.createTempDirectory("gdel").toString
    val g = new GraphStore(spark, d, numBuckets = 4)
    val people = (1 to 80).map(i => (s"p$i", i)).toDF("pid", "age")
    g.mergeVertices("Person", Seq("pid"), people)
    val withB = people
      .withColumn("b", BucketedParquet.bucketOf(Seq("pid"), 4))
    val k = withB.select("b").head().getInt(0)
    val victims = withB.filter($"b" === k).select("pid").localCheckpoint(true)
    val survivors = withB.filter($"b" =!= k)
      .select("pid").as[String].collect().toSet
    val before = snapshot(s"$d/vertices/Person")
    g.detachDelete("Person", Seq("pid"), victims, Seq.empty)
    // only bucket k changed; its rows are gone from the merged read
    val buckets = {
      val after = snapshot(s"$d/vertices/Person")
      (after.filter { case (f, m) => before.get(f) != Some(m) }.keySet ++
        before.keySet.diff(after.keySet))
        .map(_.split("/")(0)).filter(_.startsWith("__bucket="))
    }
    assert(buckets == Set(s"__bucket=$k"))
    val got = g.readVertices("Person").get
      .select("pid").as[String].collect().toSet
    assert(got == survivors)
  }

  test("schema-widening batch only rewrites its buckets; read merges schemas") {
    val d = Files.createTempDirectory("bwide").toString
    val store = new DocStore(spark, d, numBuckets = 8)
    store.index("idx", "doc_id",
      (1 to 100).map(i => (s"d$i", i)).toDF("doc_id", "v"))
    val before = snapshot(s"$d/idx")
    // one doc arrives with an extra column: only ITS bucket gains the
    // new schema on disk...
    store.index("idx", "doc_id",
      Seq(("d1", 5, "fresh")).toDF("doc_id", "v", "tag"))
    assertOneBucketChanged(before, snapshot(s"$d/idx"))
    // ...and the merged read surfaces it everywhere, null elsewhere
    val all = store.read("idx").get
    assert(all.columns.contains("tag"))
    assert(all.filter($"doc_id" === "d1").head().getAs[String]("tag") == "fresh")
    assert(all.filter($"tag".isNotNull).count() == 1)
    assert(all.count() == 100)
  }
}
