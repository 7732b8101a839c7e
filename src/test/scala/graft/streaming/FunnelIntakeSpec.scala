package graft.streaming

import graft.{SparkFunSuite, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming corpus intake converges to the batch funnel: same
  * survivors, same keeper per fingerprint, same exact-unique count —
  * under interleaved multi-batch arrival with injected duplicates. */
class FunnelIntakeSpec extends SparkFunSuite {

  test("streamed funnel intake == batch filter_funnel survivors") {
    val tmp = Files.createTempDirectory("funin").toString
    val docs = Tables.documents(spark, sfDir)
    // duplicate a slice of the corpus under larger ids: their copies
    // must lose to the originals in the keeper election
    val dups = docs.orderBy("doc_id").limit(25)
      .withColumn("doc_id", col("doc_id") + 100000)
    val all = docs.unionByName(dups)
    all.coalesce(1).write.parquet(s"$tmp/data/documents.parquet")

    // 3 interleaved chunks by doc_id mod 3 (arrival order != id order)
    val src = spark.read.parquet(s"$tmp/data/documents.parquet")
    for (k <- 0 to 2) {
      src.filter(pmod(col("doc_id"), lit(3)) === k)
        .coalesce(1).write.mode("append").parquet(s"$tmp/src")
      Thread.sleep(1100)
    }
    val schema = spark.read.parquet(s"$tmp/src").schema

    val sink = scala.collection.mutable.Map.empty[String, Long]
    IncrementalPipeline.runAvailableNow(
      spark, s"$tmp/src", schema, s"$tmp/ckpt",
      df => FunnelIntake.intake(df).toDF(),
      (batch, _) => batch.collect().foreach { r =>
        sink(r.getString(0)) = r.getLong(1)
      },
      maxFilesPerTrigger = Some(1))

    // batch truth: stage-5 survivors elect min(doc_id) per fingerprint
    val batchKeepers = graft.ops.TextOps
      .funnelFlags(spark.read.parquet(s"$tmp/data/documents.parquet"))
      .filter(col("s5"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keep"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batchKeepers.nonEmpty, "fixture produced no survivors")
    assert(sink.toMap == batchKeepers)

    // and the batch funnel's exact_unique row counts the same set
    val funnel = graft.ops.TextOps.filterFunnel(spark, s"$tmp/data")
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs"))
      .toMap
    assert(funnel("exact_unique") == sink.size.toLong)
  }
}
