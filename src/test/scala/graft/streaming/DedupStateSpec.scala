package graft.streaming

import graft.{SparkFunSuite, Tables}
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stateful streaming exact dedup converges to the batch
  * `dedup_exact` result under ARBITRARY arrival order — min/count are
  * commutative, so unlike sessionization no ordering contract is
  * needed and the chunks here deliberately interleave doc_ids. */
class DedupStateSpec extends SparkFunSuite {
  import spark.implicits._

  test("streaming dedup over shuffled micro-batches == batch dedup_exact") {
    val tmp = Files.createTempDirectory("sdedup").toString
    // corpus + injected duplicates whose copies carry LARGER ids and
    // arrive in EARLIER chunks than some originals
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val dups = docs.orderBy("doc_id").limit(20)
      .withColumn("doc_id", col("doc_id") + 100000)
    val all = docs.union(dups)
    all.coalesce(1).write.parquet(s"$tmp/data/documents.parquet")

    // 4 interleaved chunks (doc_id mod 4), written with distinct mtimes
    val withFp = spark.read.parquet(s"$tmp/data/documents.parquet")
      .select(col("doc_id"), TextAnalysis.fingerprint_md5(col("text")).as("fp"))
    for (k <- 0 to 3) {
      withFp.filter(pmod(col("doc_id"), lit(4)) === k)
        .coalesce(1).write.mode("append").parquet(s"$tmp/src")
      Thread.sleep(1100)
    }
    val schema = spark.read.parquet(s"$tmp/src").schema

    val sink = scala.collection.mutable.Map.empty[String, (Long, Long)]
    var emitted = 0L
    IncrementalPipeline.runAvailableNow(
      spark, s"$tmp/src", schema, s"$tmp/ckpt",
      df => DedupState.dedup(df.as[DedupState.Doc]).toDF(),
      (batch, _) => batch.collect().foreach { r =>
        emitted += 1
        sink(r.getString(0)) = (r.getLong(1), r.getLong(2))
      },
      maxFilesPerTrigger = Some(1))

    val expected = graft.ops.DedupOps.dedupExact(spark, s"$tmp/data")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sink.toMap == expected)
    // duplicates actually exercised the state merge
    assert(expected.values.count(_._2 > 1) >= 20)
    // per-key-per-batch emission: keys emit only in batches where
    // they actually received rows, not once per batch each
    assert(emitted < 4L * expected.size)
  }

  test("bounded-state dedup: dropDuplicatesWithinWatermark emits each fp once") {
    // the built-in alternative to DedupState when duplicates arrive
    // within a bounded lateness: state EVICTS past the watermark
    // instead of growing one row per distinct fingerprint forever
    val tmp = Files.createTempDirectory("wdedup").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val dups = docs.orderBy("doc_id").limit(15)
      .withColumn("doc_id", col("doc_id") + 100000)
    docs.union(dups)
      .select(col("doc_id"),
        TextAnalysis.fingerprint_md5(col("text")).as("fp"))
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .coalesce(1).write.parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema

    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    IncrementalPipeline.runAvailableNow(
      spark, s"$tmp/src", schema, s"$tmp/ckpt",
      df => df.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("fp"),
      (batch, _) => out ++= batch.collect().map(_.getAs[String]("fp")))

    val distinctFps = spark.read.parquet(s"$tmp/src")
      .select("fp").distinct().count()
    assert(out.size == distinctFps)     // one survivor per fingerprint
    assert(out.toSet.size == out.size)  // never emitted twice
  }
}
