package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

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
  * COMPACTION (round 12): successive small micro-batches produce
  * sub-budget shards — the small-files problem layout_filesizing
  * models for tables. [[compact]] re-packs the accumulated small
  * shards into full ones under an ATOMIC manifest commit:
  *  - outputs are named `compact-<gen>-<shardId>.tar` where `gen` is
  *    a digest of the SORTED input names — a deterministic function
  *    of what is being compacted, so a crashed run re-executes to
  *    byte-identical files (no timestamps anywhere);
  *  - a `compact-` output is LIVE only once its generation's manifest
  *    `_compact-<gen>.manifest` exists; the manifest (written via
  *    temp + rename, the atomic-commit idiom) simultaneously
  *    TOMBSTONES the inputs — so at every crash point [[liveShards]]
  *    sees each asset exactly once: before the rename the inputs are
  *    live and the outputs invisible, after it the reverse;
  *  - input files are then deleted lazily (best-effort; a leftover
  *    tombstoned file is dead weight, never duplicate data);
  *  - compaction FAILS LOUDLY if any candidate shard does not parse:
  *    no manifest is written and every input stays live — an
  *    unreadable shard is an operator problem to surface, never a
  *    name to tombstone (that would be silent permanent data loss).
  *    Shard writes themselves go through temp + rename, so a crash
  *    mid-write cannot leave a truncated live shard to trip this.
  *
  * Scale posture: the layout shuffles only (media_id, n_bytes);
  * payloads ride the ONE shard-assembly shuffle (the write pattern
  * itself), each assembler holds at most budget + one straddling
  * asset, and every assembler writes its own shard through the
  * Hadoop FileSystem API — no driver collection of payload bytes
  * (only the tiny per-shard ledger returns; the scaladoc bound: at a
  * pathological budget the ledger is rows≈bytes/budget — size the
  * budget so that stays small). Compaction reads candidates through
  * the distributed binaryFile source, so payload bytes never visit
  * the driver there either.
  */
object MediaShards {

  /** Pack one micro-batch of (media_id, payload) rows into tar shards
    * under `outDir`; returns the per-shard ledger (file name, entry
    * count, Σ ids, Σ decoded units via the AutoCodec round trip on
    * the written bytes). */
  def writeBatch(batch: DataFrame, batchId: Long, outDir: String,
      budget: Long): Seq[(String, Int, Long, Long)] = {
    // the batch has two consumers (the length-only layout branch and
    // the payload-bearing shard branch): persist for the call so each
    // source file is read once per batch, not twice
    val pinned = batch.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try writeShards(pinned, outDir, budget,
      shard => f"shard-$batchId%05d-$shard%05d.tar")
    finally pinned.unpersist()
  }

  /** The shared assembler behind [[writeBatch]] and [[compact]]: plan
    * the byte-budget layout, shuffle payloads once to their shard
    * assembler, write each shard executor-side through the Hadoop FS
    * API, and derive the ledger from the WRITTEN bytes (re-parse +
    * decode, so a packing bug cannot self-certify). */
  private def writeShards(media: DataFrame, outDir: String, budget: Long,
      namer: Long => String): Seq[(String, Int, Long, Long)] = {
    val spark = media.sparkSession
    import spark.implicits._
    // the SESSION's Hadoop conf must reach the executor-side writes —
    // spark.hadoop.* (object-store credentials, fs.defaultFS) never
    // lands in a bare `new Configuration()`
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val layout = graft.ops.MultimodalOps.byteBudgetLayout(
      media.select(col("media_id"), length(col("payload")).as("n_bytes")),
      budget).select(col("media_id"), col("shard_id"))
    media.join(layout, Seq("media_id"))
      .select(col("shard_id"), col("media_id"), col("payload"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val entries = it.map { case (_, id, b) => (id, b) }
          .toArray.sortBy(_._1)
        val tar = graft.multimodal.Tar.build(
          entries.map { case (id, b) => (s"asset_$id.bin", b) }.toSeq)
        val name = namer(shard)
        val p = new org.apache.hadoop.fs.Path(outDir, name)
        val fs = p.getFileSystem(hconf.value)
        // temp + rename so a crash mid-write can never leave a
        // TRUNCATED shard under a live name (a truncated `shard-*`
        // would both short-change readers and qualify as a compaction
        // candidate); the dot-prefixed temp name is invisible to
        // [[liveShards]] and carries the TASK ATTEMPT id so a
        // speculative duplicate or post-retry zombie attempt can never
        // truncate another attempt's in-flight temp file.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmpP = new org.apache.hadoop.fs.Path(outDir,
          s".$name.$attempt.tmp")
        val out = fs.create(tmpP, true)
        try out.write(tar) finally out.close()
        if (!fs.rename(tmpP, p)) {
          // no pre-delete: the live name must never blink out of
          // existence (a reader mid-listing would miss its assets).
          // A failed rename is fine ONLY when a byte-identical replay
          // already committed this shard — verified by CONTENT (tar
          // lengths are 512-block quantized, so a length check alone
          // would let a stale different-content shard self-certify
          // through the ledger below); shards are budget-bounded, so
          // the read-back is small.
          val prior =
            try {
              val in = fs.open(p)
              try {
                val buf = new java.io.ByteArrayOutputStream()
                val chunk = new Array[Byte](8192)
                var n = in.read(chunk)
                while (n >= 0 && buf.size <= tar.length) {
                  buf.write(chunk, 0, n); n = in.read(chunk)
                }
                Some(buf.toByteArray)
              } finally in.close()
            } catch { case _: Throwable => None }
          if (!prior.exists(java.util.Arrays.equals(_, tar)))
            throw new IllegalStateException(
              s"shard commit rename failed for $name and the existing " +
                "file does not match this batch's bytes")
          fs.delete(tmpP, false)
        }
        // best-effort sweep of this shard's own temp residue from
        // earlier failed/zombie attempts (attempt-unique names never
        // self-overwrite, so without this they would accumulate)
        try fs.globStatus(new org.apache.hadoop.fs.Path(outDir,
            s".$name.*.tmp")).foreach(st =>
          try fs.delete(st.getPath, false)
          catch { case _: Throwable => () })
        catch { case _: Throwable => () }
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
  }

  private def genOf(compactName: String): String =
    compactName.stripPrefix("compact-").takeWhile(_ != '-')

  /** The shard files a READER must consume for exactly-once content:
    * regular `shard-*` files unless tombstoned by a committed
    * compaction manifest; `compact-*` files only once their
    * generation's manifest exists (the atomic cut-over). */
  def liveShards(fs: FileSystem, dir: Path): Seq[FileStatus] = {
    val all =
      if (fs.exists(dir)) fs.listStatus(dir).toSeq else Seq.empty
    val manifests = all.filter(_.getPath.getName
      .matches("_compact-[0-9a-f]+\\.manifest"))
    val committed = manifests.map(m => m.getPath.getName
      .stripPrefix("_compact-").stripSuffix(".manifest")).toSet
    val tombstoned = manifests.flatMap { m =>
      val in = fs.open(m.getPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.startsWith("tomb:")).map(_.stripPrefix("tomb:")).toList
      finally in.close()
    }.toSet
    all.filter { st =>
      val n = st.getPath.getName
      if (!n.endsWith(".tar") || tombstoned.contains(n)) false
      else if (n.startsWith("compact-")) committed.contains(genOf(n))
      else n.startsWith("shard-")
    }.sortBy(_.getPath.getName)
  }

  /** Compact accumulated SMALL shards — entry payload sum under HALF
    * the budget (the standard min-fill criterion: a planner-produced
    * non-tail shard holds at least budget − maxAsset, so half-budget
    * keeps healthy shards out and re-running on the compacted output
    * cannot churn) — into full ones, preserving exactly-once through
    * the manifest commit described in the object scaladoc. Triggers
    * only when at least `minSmall` live shards qualify; returns None
    * when nothing tripped, else (gen, tombstoned inputs, output
    * ledger). Deterministic end to end: same live inputs → same gen →
    * same output bytes, so a crashed run is safely re-run. */
  def compact(spark: SparkSession, outDir: String, budget: Long,
      minSmall: Int = 2): Option[(String, Seq[String],
        Seq[(String, Int, Long, Long)])] = {
    import spark.implicits._
    val dir = new Path(outDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // smallness from FileStatus metadata alone — the tar FILE length
    // (payload + 512 B/entry headers + end padding) upper-bounds the
    // payload sum, so `file < budget/2` is a conservative trigger and
    // the check costs one directory listing, never a driver read of
    // shard bytes (a healthy directory would otherwise re-download the
    // whole corpus per trigger check, and a >2 GiB shard would not
    // even fit an Int-sized buffer)
    val small = liveShards(fs, dir).filter(_.getLen * 2 < budget)
    if (small.size < minSmall) return None
    val names = small.map(_.getPath.getName).sorted
    val gen = java.security.MessageDigest.getInstance("MD5")
      .digest(names.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    // distributed re-read of the candidate shards: payloads stay on
    // executors, exactly as they did on the way in
    val paths = small.map(_.getPath.toString)
    val media = spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, tar) =>
        // FAIL-LOUD: an unparseable candidate (corrupt, truncated)
        // must abort the whole compaction BEFORE any manifest exists —
        // getOrElse(Seq.empty) here would contribute zero assets yet
        // still tombstone the input name, i.e. silent permanent data
        // loss. Throwing fails the Spark job, compact() propagates,
        // no manifest is written, and every input stays live.
        graft.multimodal.Tar.parse(tar).getOrElse(
          throw new IllegalStateException(
            s"compaction aborted: candidate shard failed to parse: $path"
          )).map { case (n, b) =>
            (n.stripPrefix("asset_").stripSuffix(".bin").toLong, b)
        }
      }.toDF("media_id", "payload")
      // two consumers inside writeShards (layout + payload branch):
      // pin so each candidate shard is read and un-tarred once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ledger =
      try writeShards(media, outDir, budget,
        shard => f"compact-$gen-$shard%05d.tar")
      catch {
        // any job failure here (an unparseable candidate, an I/O
        // error) aborts BEFORE the manifest exists: nothing is
        // tombstoned, every input stays live — surface that contract
        // in the exception itself
        case e: Throwable => throw new IllegalStateException(
          s"compaction aborted before manifest commit (gen $gen): no " +
            "input was tombstoned; fix the failing shard and re-run", e)
      }
      finally media.unpersist()
    // the ATOMIC ledger commit: tombstone the inputs and publish the
    // outputs in one rename
    val manifest = new Path(dir, s"_compact-$gen.manifest")
    val tmp = new Path(dir, s"_compact-$gen.manifest.tmp")
    val body = (names.map("tomb:" + _) ++
      ledger.map("out:" + _._1)).mkString("", "\n", "\n")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, manifest)) {
      // a committed manifest from the identical re-run already exists;
      // anything else is a real failure
      if (!fs.exists(manifest)) throw new IllegalStateException(
        s"compaction manifest commit failed for gen $gen")
      fs.delete(tmp, false)
    }
    // lazy cleanup: a tombstoned input is already dead to readers
    small.foreach(st =>
      try fs.delete(st.getPath, false)
      catch { case _: Throwable => () })
    Some((gen, names, ledger))
  }

}
