package graft.streaming

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental WebDataset write end-to-end: binaryFile stream →
  * AutoCodec intake → byte-budget tar shards appended per micro-batch
  * (the mm_binary_intake → mm_tar_shards composition under
  * readStream). Pins: exactly-once asset coverage across two arrival
  * waves, wave-1 shard files byte-stable through wave 2 (append-only
  * units), bounded shard sizes, and ledger equality with the one-shot
  * batch path over the same files. */
class MediaShardsSpec extends SparkFunSuite {
  import spark.implicits._

  private val Budget = 4096L

  private def writeAssets(dir: String, ids: Seq[Long]): Unit =
    ids.foreach { id =>
      val bytes = graft.ops.MultimodalOps.buildAsset(id, (id % 7).toInt)
      Files.write(new java.io.File(dir, s"asset_$id.bin").toPath, bytes)
    }

  private def toMedia(df: DataFrame): DataFrame = df.select(
    regexp_extract(col("path"), "asset_(\\d+)\\.bin$", 1)
      .cast("long").as("media_id"),
    col("content").as("payload"))

  /** Unpack every shard in dir → (id, Some(decoded l1) | None for a
    * quarantined payload) through AutoCodec. */
  private def unpackAll(dir: String): Map[Long, Option[Long]] = {
    val codec = new graft.multimodal.Codecs.AutoCodec
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    files.flatMap { f =>
      val tar = Files.readAllBytes(f.toPath)
      assert(tar.length <= 2 * Budget + 8192,
        s"${f.getName}: ${tar.length} B blows the shard budget")
      graft.multimodal.Tar.parse(tar)
        .getOrElse(fail(s"${f.getName} failed to parse"))
        .map { case (n, b) =>
          val id = n.stripPrefix("asset_").stripSuffix(".bin").toLong
          (id, codec.decode(b, null).map(_.map(_.toLong).sum))
        }
    }.toMap
  }

  test("streamed shard packing: exactly-once across waves, append-only " +
    "shard files, ledger equals the batch path") {
    val tmp = Files.createTempDirectory("media_shards").toString
    val src = new java.io.File(tmp, "assets"); src.mkdirs()
    val shardDir = new java.io.File(tmp, "shards"); shardDir.mkdirs()

    val ledger = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int, Long, Long)]
    def run(): Unit = IncrementalPipeline.runBinaryAvailableNow(
      spark, src.getAbsolutePath, s"$tmp/ckpt", toMedia,
      (batch, id) => ledger ++=
        MediaShards.writeBatch(batch, id, shardDir.getAbsolutePath, Budget),
      maxFilesPerTrigger = Some(7)) // several micro-batches per wave

    writeAssets(src.getAbsolutePath, 1L to 20L)
    run()
    val wave1Files = shardDir.listFiles().map(f =>
      f.getName -> java.util.Arrays.hashCode(Files.readAllBytes(f.toPath)))
      .toMap
    assert(wave1Files.nonEmpty, "wave 1 wrote no shards")
    assert(unpackAll(shardDir.getAbsolutePath).keySet == (1L to 20L).toSet)

    writeAssets(src.getAbsolutePath, 21L to 30L)
    // a corrupt asset arrives mid-stream: the shard writer is a BYTE
    // archiver, so the payload still packs (and its name round-trips)
    // — quarantine is the DECODE layer's job, and both the writer
    // ledger and the unpack below must show it as undecodable, never
    // crash on it
    val corrupt = graft.ops.MultimodalOps.buildAsset(31L, 3)
    Files.write(new java.io.File(src, "asset_31.bin").toPath,
      corrupt.take(corrupt.length / 2))
    run()
    // wave-1 shards are append-only units: byte-identical after wave 2
    wave1Files.foreach { case (name, h) =>
      val now = java.util.Arrays.hashCode(Files.readAllBytes(
        new java.io.File(shardDir, name).toPath))
      assert(now == h, s"$name was rewritten by a later wave")
    }
    val all = unpackAll(shardDir.getAbsolutePath)
    assert(all.keySet == (1L to 31L).toSet,
      "assets lost or duplicated across waves")
    assert(all(31L).isEmpty, "truncated asset must quarantine at decode")
    assert((1L to 30L).forall(all(_).isDefined), "clean asset quarantined")

    // ledger equality with the one-shot batch path over the same files
    val batchLedger = graft.multimodal.Multimodal.extractFeatures(
      toMedia(spark.read.format("binaryFile").load(src.getAbsolutePath))
        .withColumn("meta", struct(
          lit("mixed").as("media_type"), lit("auto").as("format"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms"),
          lit("batch://asset").as("source_uri"))),
      new graft.multimodal.Codecs.AutoCodec)
      .select(col("media_id"), col("ok"),
        coalesce(
          expr("aggregate(features, cast(0.0 as double), (acc, x) -> acc + x)")
            .cast("long"), lit(0L)).as("l1"))
      .as[(Long, Boolean, Long)].collect()
      .map { case (id, ok, l1) => id -> (if (ok) Some(l1) else None) }
      .toMap
    assert(all == batchLedger,
      "streamed shard contents diverge from the batch decode ledger")
    // and the writer's own returned ledger tallies with the shards
    assert(ledger.map(_._2).sum == 31, "writer ledger entry count")
    assert(ledger.map(_._3).sum == (1L to 31L).sum, "writer ledger id sum")
    assert(ledger.map(_._4).sum == all.values.flatten.sum,
      "writer ledger l1 sum")
  }
}
