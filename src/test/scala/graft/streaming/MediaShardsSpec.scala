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
  // the compaction fixture's batch tars are 6-8 KiB files; the
  // smallness trigger reads FILE length (payload + tar overhead), so
  // the budget must put all three under half (24576/2 = 12288) while
  // the ~19 KiB compacted output lands over half (no churn)
  private val CompactBudget = 24576L

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

  /** Entry name → payload md5 across the LIVE shards — the
    * exactly-once content view a reader gets. */
  private def liveContent(dir: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    MediaShards.liveShards(fs, p).flatMap { st =>
      val bytes = Files.readAllBytes(
        new java.io.File(dir, st.getPath.getName).toPath)
      graft.multimodal.Tar.parse(bytes).get.map { case (n, b) =>
        n -> java.security.MessageDigest.getInstance("MD5").digest(b)
          .map("%02x".format(_)).mkString
      }
    }.toMap
  }

  test("compaction: small shards re-pack byte-identically under an " +
    "atomic manifest commit, exactly-once at every crash point, " +
    "idempotent re-run") {
    val tmp = Files.createTempDirectory("media_compact").toString
    val shardDir = new java.io.File(tmp, "shards"); shardDir.mkdirs()
    // three tiny micro-batches -> three+ sub-budget shards
    (0 until 3).foreach { b =>
      val ids = (b * 4 + 1).toLong to (b * 4 + 4).toLong
      val media = ids.map(id =>
        (id, graft.ops.MultimodalOps.buildAsset(id, (id % 7).toInt)))
        .toDF("media_id", "payload")
      MediaShards.writeBatch(media, b.toLong, shardDir.getAbsolutePath,
        CompactBudget)
    }
    val before = liveContent(shardDir.getAbsolutePath)
    assert(before.keySet == (1L to 12L).map(i => s"asset_$i.bin").toSet)
    val nBefore = shardDir.listFiles().count(_.getName.endsWith(".tar"))
    assert(nBefore >= 3, "fixture must produce several small shards")

    val (gen, tombs, ledger) = MediaShards.compact(spark,
      shardDir.getAbsolutePath, CompactBudget).get
    // content is byte-identical through the re-pack
    assert(liveContent(shardDir.getAbsolutePath) == before,
      "compaction changed the live content")
    assert(tombs.size == nBefore, "every small shard must compact")
    assert(ledger.map(_._2).sum == 12, "compacted entry count")
    val outFiles = shardDir.listFiles()
      .filter(_.getName.startsWith(s"compact-$gen-")).sortBy(_.getName)
    assert(outFiles.length == ledger.size && outFiles.length < nBefore,
      "compaction must reduce the file count")
    val outBytes = outFiles.map(f =>
      f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap

    // crash-window replay: restore the inputs, remove the manifest
    // (the state an interrupted run leaves before its atomic commit —
    // outputs on disk but INVISIBLE, inputs still live)...
    val manifest = new java.io.File(shardDir, s"_compact-$gen.manifest")
    val manifestBytes = Files.readAllBytes(manifest.toPath)
    assert(manifest.delete())
    // rebuild the original inputs exactly as the batches wrote them
    (0 until 3).foreach { b =>
      val ids = (b * 4 + 1).toLong to (b * 4 + 4).toLong
      val media = ids.map(id =>
        (id, graft.ops.MultimodalOps.buildAsset(id, (id % 7).toInt)))
        .toDF("media_id", "payload")
      MediaShards.writeBatch(media, b.toLong, shardDir.getAbsolutePath,
        CompactBudget)
    }
    // pre-commit state: outputs exist but are NOT live; inputs are
    assert(liveContent(shardDir.getAbsolutePath) == before,
      "uncommitted compact outputs leaked into the live view")

    // idempotent re-run: same inputs -> same gen -> same bytes
    val (gen2, _, _) = MediaShards.compact(spark,
      shardDir.getAbsolutePath, CompactBudget).get
    assert(gen2 == gen, "re-run must derive the same generation")
    outBytes.foreach { case (name, bytes) =>
      val now = Files.readAllBytes(
        new java.io.File(shardDir, name).toPath).toSeq
      assert(now == bytes, s"$name not byte-identical on re-run")
    }
    assert(java.util.Arrays.equals(
      Files.readAllBytes(manifest.toPath), manifestBytes),
      "manifest not byte-identical on re-run")
    assert(liveContent(shardDir.getAbsolutePath) == before)
    // nothing small remains -> no further compaction trips
    assert(MediaShards.compact(spark, shardDir.getAbsolutePath,
      CompactBudget).isEmpty)
  }

  test("compaction fails LOUDLY on an unparseable candidate shard: " +
    "no manifest, no tombstone, every input stays live") {
    val tmp = Files.createTempDirectory("media_compact_bad").toString
    val shardDir = new java.io.File(tmp, "shards"); shardDir.mkdirs()
    (0 until 2).foreach { b =>
      val ids = (b * 4 + 1).toLong to (b * 4 + 4).toLong
      val media = ids.map(id =>
        (id, graft.ops.MultimodalOps.buildAsset(id, (id % 7).toInt)))
        .toDF("media_id", "payload")
      MediaShards.writeBatch(media, b.toLong, shardDir.getAbsolutePath,
        CompactBudget)
    }
    // corrupt ONE small shard in place (a bitrot/torn-write event —
    // writeShards' temp+rename means the writer itself can no longer
    // produce a truncated live shard, but an unreadable candidate
    // must still abort, never tombstone): smash its first header
    // block so the tar checksum fails
    val victim = shardDir.listFiles()
      .filter(_.getName.endsWith(".tar")).minBy(_.getName)
    val bytes = Files.readAllBytes(victim.toPath)
    java.util.Arrays.fill(bytes, 0, 512, 0xff.toByte)
    Files.write(victim.toPath, bytes)
    assert(graft.multimodal.Tar.parse(bytes).isEmpty,
      "fixture must actually be unparseable")
    val filesBefore = shardDir.listFiles().map(_.getName).toSet

    val e = intercept[Exception] {
      MediaShards.compact(spark, shardDir.getAbsolutePath, CompactBudget)
    }
    assert(Option(e.getMessage)
      .exists(_.contains("compaction aborted before manifest commit")),
      s"abort must state the no-tombstone contract, got: $e")
    // the failed run must leave NO manifest (nothing tombstoned) and
    // no committed compact outputs — every original input still live
    val after = shardDir.listFiles().map(_.getName).toSet
    assert(!after.exists(_.endsWith(".manifest")),
      "a failed compaction must not commit a manifest")
    assert(filesBefore.subsetOf(after),
      "a failed compaction deleted an input shard")
    val p = new org.apache.hadoop.fs.Path(shardDir.getAbsolutePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(MediaShards.liveShards(fs, p).map(_.getPath.getName).toSet
      == filesBefore.filter(_.endsWith(".tar")),
      "live view changed after a failed compaction")
  }

  test("shard writes commit via temp+rename: no dot-temp residue and " +
    "every live shard parses") {
    val tmp = Files.createTempDirectory("media_tmprename").toString
    val shardDir = new java.io.File(tmp, "shards"); shardDir.mkdirs()
    val media = (1L to 8L).map(id =>
      (id, graft.ops.MultimodalOps.buildAsset(id, (id % 7).toInt)))
      .toDF("media_id", "payload")
    MediaShards.writeBatch(media, 0L, shardDir.getAbsolutePath, Budget)
    val names = shardDir.listFiles().map(_.getName).toSet
    // Hadoop's local ChecksumFileSystem leaves .crc sidecars — those
    // are the FS's, not ours; the assertion targets OUR temp names
    assert(!names.exists(_.contains(".tmp")),
      s"temp files must be renamed away on success: $names")
    names.filter(_.endsWith(".tar")).foreach { n =>
      assert(graft.multimodal.Tar.parse(Files.readAllBytes(
        new java.io.File(shardDir, n).toPath)).isDefined,
        s"$n does not parse after temp+rename commit")
    }
    // replay rewrites byte-identically through the same rename path
    val before = names.filter(_.endsWith(".tar")).map(n =>
      n -> Files.readAllBytes(new java.io.File(shardDir, n).toPath).toSeq)
      .toMap
    MediaShards.writeBatch(media, 0L, shardDir.getAbsolutePath, Budget)
    before.foreach { case (n, b) =>
      assert(Files.readAllBytes(
        new java.io.File(shardDir, n).toPath).toSeq == b,
        s"$n not byte-identical on replay")
    }
  }
}
