package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WebDataset-style INCREMENTAL tar-shard writer — the production
  * write pattern behind mm_tar_shards (T262) run under Structured
  * Streaming: each micro-batch's assets pack into byte-budget USTAR
  * shards ([[graft.ops.MultimodalOps.byteBudgetLayout]] plans the
  * cut; [[graft.multimodal.Tar]] writes the archive) named
  * `shard-<batchId>-<shardId>.tar`, so a REPLAYED batch rewrites the
  * same files byte-identically — idempotent, which composes with the
  * binaryFile source's checkpointed file tracking into exactly-once
  * shards end-to-end. Shards are append-only units: a later arrival
  * wave adds new files and never rewrites an earlier wave's (the
  * spec pins wave-1 files byte-stable across wave 2).
  *
  * Scale posture: the layout shuffles only (media_id, n_bytes);
  * payloads ride the ONE shard-assembly shuffle (the write pattern
  * itself), each assembler holds at most budget + one straddling
  * asset, and every assembler writes its own shard through the
  * Hadoop FileSystem API — no driver collection of payload bytes
  * (only the tiny per-shard ledger returns).
  */
object MediaShards {

  /** Pack one micro-batch of (media_id, payload) rows into tar shards
    * under `outDir`; returns the per-shard ledger (file name, entry
    * count, Σ ids, Σ decoded units via the AutoCodec round trip on
    * the written bytes). */
  def writeBatch(batch: DataFrame, batchId: Long, outDir: String,
      budget: Long): Seq[(String, Int, Long, Long)] = {
    val spark = batch.sparkSession
    import spark.implicits._
    // the batch has two consumers (the length-only layout branch and
    // the payload-bearing shard branch): persist for the call so each
    // source file is read once per batch, not twice
    val pinned = batch.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the SESSION's Hadoop conf must reach the executor-side writes —
    // spark.hadoop.* (object-store credentials, fs.defaultFS) never
    // lands in a bare `new Configuration()`
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    try {
      val layout = graft.ops.MultimodalOps.byteBudgetLayout(
        pinned.select(col("media_id"), length(col("payload")).as("n_bytes")),
        budget).select(col("media_id"), col("shard_id"))
      pinned.join(layout, Seq("media_id"))
        .select(col("shard_id"), col("media_id"), col("payload"))
        .as[(Long, Long, Array[Byte])]
        .groupByKey(_._1)
        .mapGroups { (shard, it) =>
          val entries = it.map { case (_, id, b) => (id, b) }
            .toArray.sortBy(_._1)
          val tar = graft.multimodal.Tar.build(
            entries.map { case (id, b) => (s"asset_$id.bin", b) }.toSeq)
          val name = f"shard-$batchId%05d-$shard%05d.tar"
          val p = new org.apache.hadoop.fs.Path(outDir, name)
          val fs = p.getFileSystem(hconf.value)
          val out = fs.create(p, true)
          try out.write(tar) finally out.close()
          // the ledger derives from the WRITTEN unit: re-parse +
          // decode so a packing bug in this very writer cannot
          // self-certify
          val codec = new graft.multimodal.Codecs.AutoCodec
          val unpacked = graft.multimodal.Tar.parse(tar).getOrElse(
            throw new IllegalStateException(s"shard $name failed to re-parse"))
          var idSum = 0L; var l1 = 0L
          unpacked.foreach { case (n, bytes) =>
            idSum += n.stripPrefix("asset_").stripSuffix(".bin").toLong
            codec.decode(bytes, null).foreach(f => l1 += f.map(_.toLong).sum)
          }
          (name, unpacked.length, idSum, l1)
        }.collect().toSeq
    } finally pinned.unpersist()
  }
}
