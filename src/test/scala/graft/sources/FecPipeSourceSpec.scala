package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkFunSuite
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DataSource V2 connector contract, proven end to end: schema
  * dispatch, per-file partition planning, column pruning reaching the
  * reader, and filter pushdown that Spark does NOT re-evaluate. */
class FecPipeSourceSpec extends SparkFunSuite {

  // three cn22-shaped candidates; BBB has an empty election year
  private lazy val dir: String = {
    val d = Files.createTempDirectory("fecpipe")
    Files.writeString(d.resolve("cn_a.txt"),
      "C001|ALPHA, A|DEM|2022|CA|H|12|I|C|PCC1|1 MAIN||LA|CA|90001\n" +
        "C002|BRAVO, B|REP||TX|S|00|C|C|PCC2|2 OAK||AUS|TX|73301\n")
    Files.writeString(d.resolve("cn_b.txt"),
      "C003|CHARLIE, C|DEM|2024|NY|P|00|O|N|PCC3|3 ELM||NYC|NY|10001\n")
    d.toString
  }

  private def read() = spark.read.format("fecpipe")
    .option("table", "cn22").load(dir)

  private def scanOf(df: org.apache.spark.sql.DataFrame): FecPipeScan = {
    df.collect() // force planning
    df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }.get
      .scan.asInstanceOf[FecPipeScan]
  }

  test("schema dispatch + empty-field nulls + per-file partitions") {
    val df = read()
    assert(df.schema.fieldNames.take(3).toSeq ==
      Seq("cand_id", "cand_name", "cand_pty_affiliation"))
    val rows = df.orderBy("cand_id").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).toSeq == Seq("C001", "C002", "C003"))
    // empty pipe field -> NULL, typed column -> long
    assert(rows(1).isNullAt(3) && rows(0).getLong(3) == 2022L)
    // one input partition per file
    val scan = scanOf(df)
    assert(scan.toBatch.planInputPartitions().length == 2)
  }

  test("column pruning reaches the reader's schema") {
    val df = read().select("cand_name", "cand_st")
    val scan = scanOf(df)
    assert(scan.readSchema().fieldNames.toSeq ==
      Seq("cand_name", "cand_st"))
    assert(df.collect().map(_.getString(1)).sorted.toSeq ==
      Seq("CA", "NY", "TX"))
  }

  test("supported filters push into the reader; Spark drops its copy") {
    val df = read().filter(col("cand_pty_affiliation") === "DEM")
      .select("cand_id")
    val scan = scanOf(df)
    assert(scan.description().contains("EqualTo(cand_pty_affiliation,DEM)"))
    // fully handled: no FilterExec remains above the scan
    assert(!df.queryExecution.executedPlan.toString.contains("Filter ("))
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("C001", "C003"))
    // range pushdown on a numeric column skips the null year
    val r = read().filter(col("cand_election_yr") >= 2023).select("cand_id")
    assert(scanOf(r).description().contains("GreaterThanOrEqual"))
    assert(r.collect().map(_.getString(0)).toSeq == Seq("C003"))
  }

  test("unsupported filters stay on Spark's side and still apply") {
    val df = read().filter(col("cand_name").contains("ALPHA"))
      .select("cand_id")
    val scan = scanOf(df)
    assert(!scan.description().contains("StringContains"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("C001"))
  }

  test("micro-batch streaming: file-offset checkpoint replays only new files") {
    val sd = Files.createTempDirectory("fecstream")
    val ckpt = Files.createTempDirectory("fecckpt").toString
    Files.writeString(sd.resolve("f001.txt"),
      "C001|ALPHA, A|DEM|2022|CA|H|12|I|C|P|1 A||LA|CA|90001\n")
    Files.writeString(sd.resolve("f002.txt"),
      "C002|BRAVO, B|REP|2022|TX|S|00|C|C|P|2 B||AU|TX|73301\n" +
        "C003|CHARLIE, C|DEM|2024|NY|P|00|O|N|P|3 C||NY|NY|10001\n")
    val out = Files.createTempDirectory("fecout").toString
    def runBatch(): Unit = {
      val q = spark.readStream.format("fecpipe").option("table", "cn22")
        .load(sd.toString)
        .select("cand_id", "cand_pty_affiliation")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    runBatch()
    assert(spark.read.parquet(out).collect().map(_.getString(0)).sorted
      .toSeq == Seq("C001", "C002", "C003"))
    // a third file lands; the checkpointed offset (2 files) skips the
    // consumed ones — the restarted stream appends ONLY the new file
    Files.writeString(sd.resolve("f003.txt"),
      "C004|DELTA, D|REP|2024|FL|H|09|I|C|P|4 D||MI|FL|33101\n")
    runBatch()
    assert(spark.read.parquet(out).collect().map(_.getString(0)).sorted
      .toSeq == Seq("C001", "C002", "C003", "C004"))
  }

  test("write path: two-phase commit round-trips; overwrite truncates") {
    val outDir = Files.createTempDirectory("fecwrite").toString
    val src = read().filter(col("cand_pty_affiliation") === "DEM")
    src.write.format("fecpipe").option("table", "cn22")
      .mode("append").save(outDir)
    // no .tmp litter after commit; data files are final .txt
    val names = Files.list(Paths.get(outDir)).iterator()
    val files = Iterator.continually(names)
      .takeWhile(_.hasNext).map(_.next().getFileName.toString).toList
    assert(files.nonEmpty && files.forall(_.endsWith(".txt")))
    // round-trip through the reader: same rows, nulls preserved
    val back = spark.read.format("fecpipe").option("table", "cn22")
      .load(outDir)
    assert(back.orderBy("cand_id").collect().map(_.getString(0)).toSeq ==
      Seq("C001", "C003"))
    // append adds, overwrite truncates the previous generation
    src.write.format("fecpipe").option("table", "cn22")
      .mode("append").save(outDir)
    assert(spark.read.format("fecpipe").option("table", "cn22")
      .load(outDir).count() == 4)
    read().limit(1).write.format("fecpipe").option("table", "cn22")
      .mode("overwrite").save(outDir)
    assert(spark.read.format("fecpipe").option("table", "cn22")
      .load(outDir).count() == 1)
  }

  test("single-file path load and unknown table rejection") {
    val one = spark.read.format("fecpipe").option("table", "cn22")
      .load(Paths.get(dir, "cn_b.txt").toString)
    assert(one.count() == 1)
    intercept[IllegalArgumentException] {
      spark.read.format("fecpipe").option("table", "nope").load(dir)
    }
  }
}
