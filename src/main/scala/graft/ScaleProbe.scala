package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-probe main (round-12 ask #5): measured evidence beyond
  * sf0.1 that the plans SCALE, not just that they look right. The
  * probe self-scales the bench corpus ~`factor`× by KEY-SHIFTED
  * unions into a scratch directory (TESTDATA.md forbids touching
  * /root/testdata — a derived copy is fine; every key column shifts
  * by k·10⁹ per copy so referential integrity and join fan-outs are
  * preserved instead of manufacturing k-way hot keys), then times the
  * N slowest catalog queries once at the base scale and once at the
  * scaled corpus, and records per-query scaling exponents
  * log(t_f/t_1)/log(f) as a `label: scaling-probe` line appended to
  * SCALING_DETAIL.json (its own history file — never BENCH_DETAIL,
  * whose takeRight(12) cap a probe line would otherwise drain one
  * clean bench median at a time) plus a human-readable SCALING.md
  * table. The slowest-query SELECTION still reads BENCH_DETAIL.
  *
  * Methodology mirrors graft.Bench: an untimed warm-up pass of every
  * probed query at BOTH directories first (whole-stage-codegen
  * classes JIT once; the memoized per-(session, dataset) indexes —
  * shingle tables, IVF cells, graph edge snapshots — build outside
  * the timed window), so the exponents reflect steady-state engine
  * throughput.
  *
  * Reading the exponents: ~1.0 is linear, anything ≤ ~1.3 is within
  * O(n log n)+noise at an 8× step (log₈(8·log-factor) and timer noise
  * on second-scale runs land there); a query beyond that without a
  * documented reason is a scale bug to fix, not to explain away.
  *
  * SATURATED mode (round-13 ask #2): measuring sf0.1 → 8× leaves the
  * small end below CPU saturation, so those exponents conflate
  * core-fill-up with real scaling and are only LOWER bounds. Passing
  * a 5th argument `baseFactor` > 1 builds TWO scaled corpora
  * (baseFactor× and factor×) and measures between them — e.g.
  * `... 32 10 8` probes 8× → 32× (effective step 4×) with both
  * measurement points saturating the host, so the exponent reflects
  * steady-state complexity, not scheduler fill.
  *
  * Usage: ScaleProbe [baseDir] [scratchDir] [factor] [nQueries]
  * [baseFactor] (defaults: /root/testdata/sf0.1, /tmp/graft_scale8,
  * 8, 25, 1). */
object ScaleProbe {

  /** Key columns to shift per copy — FKs shift with their PKs so each
    * copy is a self-consistent shard of the same star schema; the two
    * tiny dims stay single-copy (joins keep working, exactly like a
    * dimension table at 100 TB). */
  private val shiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "nation" -> Seq.empty, "region" -> Seq.empty)

  private val KeyStride = 1000000000L

  def buildScaled(spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Unit =
    shiftCols.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$baseDir/$t.parquet")
      val scaled =
        if (keys.isEmpty) df
        else (0 until factor).map { k =>
          keys.foldLeft(df)((d, c) =>
            d.withColumn(c, col(c) + lit(k * KeyStride)))
        }.reduce(_ unionAll _)
      scaled.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }

  /** Median per-query seconds from clean BENCH_DETAIL lines at the
    * base sf (any host — this only RANKS queries to pick the slow
    * ones; the probe measures its own times). */
  private def slowest(detailPath: String, sfDir: String,
      n: Int): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val lines =
      try {
        val p = java.nio.file.Paths.get(detailPath)
        if (java.nio.file.Files.exists(p))
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
            .linesIterator.filter(_.nonEmpty).toSeq
        else Seq.empty
      } catch { case _: Throwable => Seq.empty[String] }
    val times = lines.flatMap { line =>
      try {
        val j = JsonMethods.parse(line)
        val sfOk = (j \ "sf") match {
          case JString(v) => v == sfDir
          case _          => false
        }
        val clean = (j \ "contaminated") match {
          case JBool(b) => !b
          case _        => true
        }
        if (!sfOk || !clean) Nil
        else (j \ "queries") match {
          case JObject(fields) => fields.collect {
            case (k, JDouble(v))  => k -> v
            case (k, JInt(v))     => k -> v.toDouble
            case (k, JDecimal(v)) => k -> v.toDouble
          }
          case _ => Nil
        }
      } catch { case _: Throwable => Nil }
    }.groupBy(_._1).map { case (k, vs) => k -> Bench.median(vs.map(_._2)) }
    times.toSeq.sortBy(-_._2).take(n).map(_._1)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scratch = args.lift(1).getOrElse("/tmp/graft_scale8")
    val factor = args.lift(2).map(_.toInt).getOrElse(8)
    val nQueries = args.lift(3).map(_.toInt).getOrElse(25)
    val baseFactor = args.lift(4).map(_.toInt).getOrElse(1)
    require(baseFactor >= 1 && factor > baseFactor,
      "need baseFactor >= 1 and factor > baseFactor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "BENCH_DETAIL.json")
    val spark = Sessions.local(cpus) // same confs as Bench/Verify (r14)
    spark.sparkContext.setLogLevel("WARN")

    // a history line may name a query that was since renamed/removed:
    // rank only what the current catalog can run
    val names = slowest(detailPath, baseDir, nQueries)
      .filter(SparkEntry.queries.contains)
    require(names.nonEmpty,
      s"no clean BENCH_DETAIL history for $baseDir — run graft.Bench first")
    val queries = names.map(n => n -> SparkEntry.queries(n))

    // the marker records WHAT was built — a stale scratch dir from a
    // different base corpus or factor must rebuild, not silently feed
    // exponents computed with the wrong divisor
    def ensureBuilt(dir: String, f: Int): Unit = {
      val marker = new java.io.File(dir, "_built_ok")
      val stamp = s"base=$baseDir factor=$f"
      val fresh = marker.exists() &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath),
          "UTF-8") == stamp
      if (!fresh) {
        System.err.println(s"[probe] building ${f}x corpus at $dir")
        buildScaled(spark, baseDir, dir, f)
        marker.getParentFile.mkdirs()
        java.nio.file.Files.write(marker.toPath, stamp.getBytes("UTF-8"))
      }
    }
    // saturated mode: the LOW measurement point is itself a scaled
    // corpus (suffix-named next to the high one); classic mode keeps
    // the low point at baseDir
    val (lowDir, highDir) =
      if (baseFactor == 1) (baseDir, scratch)
      else (s"$scratch-x$baseFactor", s"$scratch-x$factor")
    if (baseFactor > 1) ensureBuilt(lowDir, baseFactor)
    ensureBuilt(highDir, factor)
    val effFactor = factor.toDouble / baseFactor

    // steady-state warm-up at both scales (JIT + per-dataset memos)
    queries.foreach { case (n, fn) =>
      fn(spark, lowDir).count()
      fn(spark, highDir).count()
    }

    // a failure must ABORT the probe loudly: recording time-to-throw
    // would publish a bogus (often flattering) exponent for exactly
    // the query that broke at scale — the one the probe exists to find
    def time(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      try fn(spark, dir).count()
      catch {
        case e: Throwable => throw new IllegalStateException(
          s"scaling probe: $name FAILED at $dir — fix before trusting " +
            "any exponent", e)
      }
      (System.nanoTime() - t0) / 1e9
    }
    val rows = queries.map { case (n, fn) =>
      val t1 = time(n, fn, lowDir)
      val tf = time(n, fn, highDir)
      val exp = math.log(tf / t1) / math.log(effFactor)
      System.err.println(f"[probe] $n%-24s t1=$t1%7.2f tf=$tf%8.2f exp=$exp%5.2f")
      (n, t1, tf, exp)
    }
    val qjson = rows.map { case (n, t1, tf, e) =>
      s""""$n":{"t1":$t1,"tf":$tf,"exp":${math.rint(e * 100) / 100}}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"scaling","label":"scaling-probe","factor":$factor,"base_factor":$baseFactor,"base_sf":"$baseDir","low_dir":"$lowDir","scaled_dir":"$highDir","n_queries":${rows.size},"queries":$qjson}"""
    println(line)
    // probe lines get their OWN history file: appending them to
    // BENCH_DETAIL.json under its shared takeRight(12) cap would evict
    // one clean bench line per probe run — repeated probes could drain
    // the same-host median history and silently re-open the inert
    // drift/inflation window Bench's medians.isEmpty warning surfaces
    try {
      val p = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_SCALING_DETAIL", "SCALING_DETAIL.json"))
      val prior =
        if (java.nio.file.Files.exists(p))
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
            .linesIterator.filter(_.nonEmpty).toSeq
        else Seq.empty
      java.nio.file.Files.write(p,
        ((prior :+ line).takeRight(12).mkString("\n") + "\n")
          .getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
