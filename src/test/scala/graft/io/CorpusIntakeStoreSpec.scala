package graft.io

import graft.{SparkFunSuite, Tables}
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Cross-RUN incremental corpus dedup: each crawl batch admits only
  * docs whose content fingerprint was never stored, via
  * DocStore.insertNew on the fingerprint key — the between-runs form
  * of dedup_exact (DedupState covers within-stream). At 100 TB the
  * fingerprint store is bucketed, so a daily batch reads and rewrites
  * only its own fp-buckets, never the historical corpus. */
class CorpusIntakeStoreSpec extends SparkFunSuite {

  private def fingerprinted(ids: (Long, Long)) = {
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id").between(ids._1, ids._2))
    docs.select(col("doc_id"),
      TextAnalysis.fingerprint_md5(col("text")).as("fp"))
  }

  test("a re-crawl admits only novel content; history is never rescanned") {
    val base = Files.createTempDirectory("corpusintake").toString
    val store = new DocStore(spark, base, numBuckets = 8)

    // run 1: docs 0-29
    val run1 = store.insertNew("corpus_fps", "fp", fingerprinted(0L -> 29L))
    assert(run1.count() == 30)

    // run 2: docs 20-39 under NEW ids but 20-29's exact content —
    // content dedup must reject the 10 re-crawled docs
    val recrawl = fingerprinted(20L -> 39L)
      .withColumn("doc_id", col("doc_id") + 500000)
    val snap0 = Files.walk(Paths.get(s"$base/corpus_fps")).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    val run2 = store.insertNew("corpus_fps", "fp", recrawl)
    assert(run2.count() == 10, "only the 10 genuinely new docs admitted")
    assert(run2.collect().forall(_.getAs[Long]("doc_id") >= 500030))
    // buckets not hit by the batch's novel rows are untouched on disk
    val snap1 = Files.walk(Paths.get(s"$base/corpus_fps")).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    val untouched = snap0.keySet.intersect(snap1.keySet)
      .count(f => snap0(f) == snap1(f))
    assert(untouched > 0, "expected at least one bucket left byte-identical")

    // replaying run 2 admits nothing (idempotent re-runs)
    assert(store.insertNew("corpus_fps", "fp", recrawl).count() == 0)

    // the store holds exactly one row per distinct fingerprint
    val stored = spark.read.parquet(s"$base/corpus_fps")
    assert(stored.select("fp").distinct().count() == stored.count())
    assert(stored.count() == 40)
  }
}
