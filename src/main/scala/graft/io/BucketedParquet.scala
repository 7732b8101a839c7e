package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** Hash-bucketed parquet layout shared by the keyed stores
  * ([[GraphStore|graft.graph.GraphStore]] vertices/edges,
  * [[DocStore]] indices): each table lives as `__bucket=K`
  * subdirectories with K = murmur3(normalized key) % numBuckets.
  *
  * The point is incremental read-modify-write at 100 TB: a batch
  * computes the buckets it touches (a bounded ≤numBuckets-value
  * collect — metadata, not data), reads ONLY those via partition
  * pruning, merges, and swaps ONLY those directories through a staging
  * dir; every other bucket's files stay byte-identical on disk. A
  * 1k-row batch against a 100 TB table rewrites ~batch-sized buckets,
  * not the store. Rows are repartitioned on the bucket id before the
  * write so each bucket directory stays one file per write.
  */
object BucketedParquet {

  val B = "__bucket"

  def exists(dir: String): Boolean = Files.exists(Paths.get(dir))

  /** Null-safe normalized key strings (null → single space, so a null
    * key still buckets deterministically). */
  def keyStrings(keyCols: Seq[String]): Seq[Column] =
    keyCols.map(c => coalesce(col(c).cast("string"), lit(" ")))

  /** murmur3 over the normalized key strings, mod numBuckets. */
  def bucketOf(keyCols: Seq[String], numBuckets: Int): Column =
    pmod(hash(keyStrings(keyCols): _*), lit(numBuckets))

  /** The touched bucket ids of a batch: bounded by numBuckets, so the
    * collect is metadata-sized regardless of batch size. */
  def touchedBuckets(df: DataFrame, keyCols: Seq[String],
      numBuckets: Int): Seq[Int] =
    df.select(bucketOf(keyCols, numBuckets).as(B)).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

  /** Whole-table read. mergeSchema because buckets written in
    * different eras may carry different column sets (a batch with new
    * columns only rewrites the buckets it touches). */
  def readAll(spark: SparkSession, dir: String): Option[DataFrame] = {
    recover(dir)
    if (exists(dir))
      Some(spark.read.option("mergeSchema", "true").parquet(dir).drop(B))
    else None
  }

  /** Read only the given buckets — partition pruning keeps the scan
    * off the untouched N−k directories. `keepBucket` retains the
    * stored bucket id for writers that must preserve the layout. */
  def readBuckets(spark: SparkSession, dir: String, touched: Seq[Int],
      keepBucket: Boolean = false): Option[DataFrame] = {
    recover(dir)
    if (!exists(dir)) None
    else {
      val pruned = spark.read.option("mergeSchema", "true").parquet(dir)
        .filter(col(B).isin(touched.map(Integer.valueOf): _*))
      Some(if (keepBucket) pruned else pruned.drop(B))
    }
  }

  private def journalPath(dir: String) = Paths.get(dir + ".swap-journal")

  /** Complete a bucket swap interrupted mid-loop. The journal is
    * written only AFTER the staging dir is fully materialized, so the
    * staged buckets are the commit point and recovery ROLLS FORWARD:
    * a touched bucket whose staged dir still exists has not had its
    * second move (stage→live) yet — the old live (if any) goes to
    * trash and the staged version moves in; a touched bucket with no
    * staged dir has unambiguously finished its swap (the writer stages
    * an explicit EMPTY dir for touched buckets with zero surviving
    * rows, so "missing" can never mean "legitimately empty").
    * Idempotent, crash-safe to re-crash inside, and a no-op without a
    * journal — called from every read/write entry point. */
  def recover(dir: String): Unit = {
    val j = journalPath(dir)
    if (!Files.exists(j)) return
    val staging = dir + ".staging"
    val trash = Paths.get(dir + ".trash")
    Files.createDirectories(trash)
    val touched = Files.readString(j).trim.split(",")
      .filter(_.nonEmpty).map(_.toInt)
    touched.foreach { k =>
      val live = Paths.get(s"$dir/$B=$k")
      val staged = Paths.get(s"$staging/$B=$k")
      if (Files.exists(staged)) {
        if (Files.exists(live)) {
          val t = trash.resolve(s"$B=$k")
          if (Files.exists(t)) deleteTree(t)
          Files.move(live, t)
        }
        Files.move(staged, live)
      }
    }
    deleteTree(Paths.get(staging))
    deleteTree(trash)
    Files.delete(j)
  }

  /** The key columns this table's buckets were laid out by (persisted
    * at first write so later callers can tell compute-pruning from
    * scan-discovery). */
  def layoutKey(dir: String): Option[Seq[String]] = {
    val p = Paths.get(s"$dir/_BUCKET_KEY")
    if (Files.exists(p)) Some(Files.readString(p).split(",").toSeq) else None
  }

  /** The bucket count this table was laid out with. Persisted at first
    * write and AUTHORITATIVE from then on: a caller reopening the
    * store with a different `numBuckets` would otherwise compute wrong
    * touched sets and merge against the wrong directories. */
  def layoutBuckets(dir: String, default: Int): Int = {
    val p = Paths.get(s"$dir/_NUM_BUCKETS")
    if (Files.exists(p)) Files.readString(p).trim.toInt else default
  }

  /** Stage the touched buckets, then swap ONLY their directories in.
    * `rows` must carry the bucket-id column [[B]]. */
  def writeBuckets(dir: String, rows: DataFrame, touched: Seq[Int],
      markerKey: Seq[String], numBuckets: Int = -1): Unit = {
    recover(dir)
    val staging = dir + ".staging"
    rows.repartition(col(B))
      .write.mode("overwrite").partitionBy(B).parquet(staging)
    if (!exists(dir)) {
      Files.move(Paths.get(staging), Paths.get(dir))
      Files.writeString(Paths.get(s"$dir/_BUCKET_KEY"),
        markerKey.mkString(","))
      if (numBuckets > 0)
        Files.writeString(Paths.get(s"$dir/_NUM_BUCKETS"),
          numBuckets.toString)
      return
    }
    // Spark writes no partition dir for an empty bucket; materialize an
    // empty staged dir for every touched bucket so that during recovery
    // "no staged dir" can only mean "this bucket's swap already
    // finished" — otherwise a crash after journaling would leave an
    // all-rows-deleted bucket's old live dir in place forever.
    touched.foreach { k =>
      val staged = Paths.get(s"$staging/$B=$k")
      if (!Files.exists(staged)) Files.createDirectories(staged)
    }
    // commit point: staging is complete — journal the touched set so a
    // crash inside the move loop rolls FORWARD on next open instead of
    // leaving silently-missing buckets (see recover)
    Files.writeString(journalPath(dir), touched.mkString(","))
    val trash = Paths.get(dir + ".trash")
    if (Files.exists(trash)) deleteTree(trash)
    Files.createDirectories(trash)
    touched.foreach { k =>
      val live = Paths.get(s"$dir/$B=$k")
      val staged = Paths.get(s"$staging/$B=$k")
      if (Files.exists(live)) Files.move(live, trash.resolve(s"$B=$k"))
      // every touched bucket has a staged dir (empty if zero surviving
      // rows — an empty live dir reads as zero rows); the exists check
      // only guards re-entry after a recover already moved it
      if (Files.exists(staged)) Files.move(staged, live)
    }
    deleteTree(Paths.get(staging))
    deleteTree(trash)
    Files.delete(journalPath(dir))
  }

  def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
