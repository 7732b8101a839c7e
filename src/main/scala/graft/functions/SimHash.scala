package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** 64-bit Charikar simhash over character shingles.
  *
  * The reference fingerprints Facebook ad bodies with
  * `Simhash(text).value` next to a sha512
  * (`facebook_compute_load_graph/main.py:149-154`); the pair
  * (sha512, simhash) is the Message node key. This is a from-scratch
  * implementation of the same scheme (feature extraction mirrors the
  * python library's default: lowercase `\w+` tokens concatenated, then
  * 4-char sliding shingles), with a 64-bit feature hash taken from the
  * first 8 bytes of md5 (an engine-independent hash: the DuckDB oracle
  * replays the identical sketch in SQL). Values are deterministic but
  * NOT bit-identical to the python library (identity only has to be
  * stable within the engine; near-duplicate semantics — small hamming
  * distance for small edits — are preserved).
  */
object SimHash {

  val Bits = 64

  private val md5tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 8 bytes of md5, big-endian — the same value the oracle gets
    * by folding the first 16 hex chars of `md5(s)`. */
  private def hash64(s: String): Long = {
    val d = md5tl.get(); d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(b, 0, 8).getLong
  }

  /** Lowercase \w+ tokens, concatenated, then width-4 shingles. */
  def features(text: String, width: Int = 4): Iterator[String] = {
    val joined = "\\w+".r.findAllIn(text.toLowerCase).mkString
    if (joined.length <= width) Iterator.single(joined)
    else joined.sliding(width)
  }

  def simhash64(text: String): Long = {
    if (text == null) return 0L
    val v = new Array[Int](Bits)
    for (f <- features(text)) {
      val h = hash64(f)
      var i = 0
      while (i < Bits) {
        if (((h >>> i) & 1L) == 1L) v(i) += 1 else v(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < Bits) {
      if (v(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  def hammingDistance(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  val simhashUdf = udf(simhash64 _)
  def simhash(c: Column): Column = simhashUdf(c)

  val hammingUdf = udf(hammingDistance _)

  /** Column form via built-ins — `bit_count(a XOR b)` stays inside
    * whole-stage codegen (no UDF boundary on the verify hot path). */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("simhash64", simhash64 _)
    spark.udf.register("hamming64", hammingDistance _)
  }
}
