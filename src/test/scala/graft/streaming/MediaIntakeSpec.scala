package graft.streaming

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming media intake: the mm_binary_intake path run
  * INCREMENTALLY — assets landing in a prefix decode exactly once
  * through the binaryFile stream + AutoCodec, and a second arrival
  * wave decodes only the new files (the checkpoint is the progress
  * table). The decoded ledger must equal the batch path's over the
  * same files, wave by wave. */
class MediaIntakeSpec extends SparkFunSuite {
  import spark.implicits._

  private def writeAssets(dir: String, ids: Seq[Long]): Unit =
    ids.foreach { id =>
      val bytes = graft.ops.MultimodalOps.buildAsset(id, (id % 5).toInt)
      Files.write(new java.io.File(dir, s"asset_$id.bin").toPath, bytes)
    }

  /** content → (media_id, ok, l1) via the sniffing dispatcher. */
  private def decodeLedger(df: DataFrame): DataFrame = {
    val media = df.select(
      regexp_extract(col("path"), "asset_(\\d+)\\.bin$", 1)
        .cast("long").as("media_id"),
      col("content").as("payload"))
      .withColumn("meta", struct(
        lit("mixed").as("media_type"), lit("auto").as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit("stream://asset").as("source_uri")))
    graft.multimodal.Multimodal
      .extractFeatures(media, new graft.multimodal.Codecs.AutoCodec)
      .select(col("media_id"), col("ok"),
        expr("aggregate(features, cast(0.0 as double), (acc, x) -> acc + x)")
          .cast("long").as("l1"))
  }

  test("streamed binaryFile intake decodes each asset exactly once " +
    "across arrival waves") {
    val tmp = Files.createTempDirectory("media_intake").toString
    val src = new java.io.File(tmp, "assets"); src.mkdirs()
    val sinkDir = s"$tmp/sink"

    val wave1 = (1L to 20L)
    writeAssets(src.getAbsolutePath, wave1)
    val store = new graft.io.DocStore(spark, sinkDir)
    def run(): Unit = IncrementalPipeline.runBinaryAvailableNow(
      spark, src.getAbsolutePath, s"$tmp/ckpt", decodeLedger,
      (batch, _) => store.upsert("ledger", "media_id", batch),
      maxFilesPerTrigger = Some(7)) // several micro-batches per wave

    run()
    val after1 = store.read("ledger").get.collect()
    assert(after1.length == 20, "wave 1 incomplete")
    assert(after1.forall(_.getAs[Boolean]("ok")), "clean assets quarantined")

    // wave 2: new assets + one deliberately corrupt one
    writeAssets(src.getAbsolutePath, 21L to 30L)
    val corrupt = graft.ops.MultimodalOps.buildAsset(31L, 1)
    Files.write(new java.io.File(src, "asset_31.bin").toPath,
      corrupt.take(corrupt.length / 2))
    run()
    val after2 = store.read("ledger").get.collect()
    assert(after2.length == 31, "wave 2 not incremental or lost rows")
    assert(after2.count(!_.getAs[Boolean]("ok")) == 1, "corrupt not quarantined")

    // the streamed ledger equals the batch path over the same files
    val batch = decodeLedger(
      spark.read.format("binaryFile").load(src.getAbsolutePath))
      .orderBy("media_id").collect().toSeq
    assert(after2.sortBy(_.getAs[Long]("media_id")).toSeq == batch)
  }
}
