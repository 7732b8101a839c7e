package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Embedding-vector primitives for similarity search and near-dup
  * detection over `Array[Float]` columns.
  *
  * Dot products and norms are JVM scalar functions over the raw array
  * (single pass, no per-element Catalyst expression tree — `aggregate`/
  * `zip_with` build one BinaryExpression per step and fall out of
  * whole-stage codegen for 64-dim vectors; a primitive-array loop is
  * both faster and allocation-free). Deterministic hyperplane LSH uses
  * seeded murmur-derived pseudo-random projections so plans are
  * reproducible across runs and engines.
  */
object Vectors {

  def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Seq[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  val cosineUdf = udf(cosine _)
  def cosine_sim(a: Column, b: Column): Column = cosineUdf(a, b)

  val normUdf = udf(norm _)
  def l2_norm(c: Column): Column = normUdf(c)

  // --------------------------------------------------- hyperplane LSH

  /** Deterministic pseudo-random unit-ish hyperplane component:
    * hash(seed, planeId, dim) mapped to [-1, 1). */
  private def planeComponent(plane: Int, dim: Int, seed: Int): Double = {
    val h = MurmurHash3.productHash((plane, dim, seed))
    (h.toDouble / Int.MaxValue.toDouble)
  }

  /** nBits-bit sign sketch of a vector under seeded random hyperplanes.
    * Small hamming distance ⇒ high cosine similarity (Charikar). */
  def hyperplaneSketch(vec: Seq[Float], nBits: Int, seed: Int): Long = {
    var out = 0L
    var p = 0
    while (p < nBits) {
      var s = 0.0
      var i = 0
      while (i < vec.length) {
        s += vec(i).toDouble * planeComponent(p, i, seed)
        i += 1
      }
      if (s >= 0) out |= (1L << p)
      p += 1
    }
    out
  }

  def hyperplane_sketch(c: Column, nBits: Int, seed: Int): Column = {
    val f = udf((v: Seq[Float]) => hyperplaneSketch(v, nBits, seed))
    f(c)
  }

  // ------------------------------------- md5-derived hyperplane LSH
  // Same Charikar sign-sketch, but the plane components derive from
  // md5("hp:seed:plane:dim") instead of murmur — md5 exists in every
  // SQL engine, so the sketch (hence the whole LSH candidate set) is
  // exactly replayable by the DuckDB oracle.

  /** First 4 md5 bytes as uint32, mapped to [-1, 1). */
  def md5PlaneComponent(plane: Int, dim: Int, seed: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"hp:$seed:$plane:$dim".getBytes("UTF-8"))
    val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    u.toDouble / 2147483648.0 - 1.0
  }

  private val maxSketchDims = 512

  def md5_hyperplane_sketch(c: Column, nBits: Int, seed: Int): Column = {
    // components are data-independent constants: precompute the matrix
    // once per plan instead of hashing per row
    val comps = Array.tabulate(nBits, maxSketchDims)(
      (p, i) => md5PlaneComponent(p, i, seed))
    val f = udf((v: Seq[Float]) => {
      require(v.length <= maxSketchDims, s"vector dims > $maxSketchDims")
      var out = 0L
      var p = 0
      while (p < nBits) {
        var s = 0.0
        var i = 0
        val row = comps(p)
        while (i < v.length) { s += v(i).toDouble * row(i); i += 1 }
        if (s >= 0) out |= (1L << p)
        p += 1
      }
      out
    })
    f(c)
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("cosine_sim", cosine _)
    spark.udf.register("l2_norm", norm _)
  }
}

/** MinHash signatures + shingling for Jaccard-based near-dup detection
  * (the MinHash→LSH band→bucket-join pipeline).
  */
object MinHash {

  /** Word n-gram shingles of normalized text. */
  def shingles(text: String, n: Int = 3): Set[String] = {
    if (text == null) return Set.empty
    val toks = text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
    if (toks.length < n) {
      if (toks.isEmpty) Set.empty else Set(toks.mkString(" "))
    } else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** k-hash MinHash signature over word-n-gram shingles. One murmur pass
    * per (shingle, i) — k×|shingles| int hashes, allocation-free. */
  private val maxK = 256
  // cheap universal-ish family: h_i(x) = murmur(x) * A_i + B_i, with the
  // (A_i, B_i) coefficients fixed once (seeded, deterministic)
  private val coefA: Array[Long] =
    Array.tabulate(maxK)(i => 2L * MurmurHash3.productHash((i, 0x1234)) + 1L)
  private val coefB: Array[Long] =
    Array.tabulate(maxK)(i => MurmurHash3.productHash((i, 0x5678)).toLong)

  def signature(text: String, k: Int = 64, n: Int = 3): Array[Long] = {
    require(k <= maxK, s"k must be <= $maxK")
    val sh = shingles(text, n)
    val sig = Array.fill(k)(Long.MaxValue)
    for (s <- sh) {
      val base = MurmurHash3.stringHash(s, 0x2545f491).toLong
      var i = 0
      while (i < k) {
        val h = base * coefA(i) + coefB(i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** Estimated Jaccard similarity from two signatures. */
  def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    if (a.isEmpty || a.length != b.length) return 0.0
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Exact Jaccard over shingle sets (the LSH verify step). */
  def exactJaccard(t1: String, t2: String, n: Int = 3): Double = {
    val a = shingles(t1, n); val b = shingles(t2, n)
    if (a.isEmpty && b.isEmpty) return 1.0
    val inter = a.intersect(b).size
    val union = a.size + b.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** LSH band keys: signature split into `bands` bands of `rows` hashes,
    * each band hashed to one bucket key. Equal band key ⇒ candidate. */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      val slice = sig.slice(b * rows, (b + 1) * rows)
      var h = b.toLong // band id in the key avoids cross-band collisions
      for (v <- slice) h = h * 1000003L + v
      h
    }
  }

  val signatureUdf = udf((t: String) => signature(t))
  val estJaccardUdf = udf(estJaccard _)
  val exactJaccardUdf = udf((a: String, b: String) => exactJaccard(a, b))
  val bandKeysUdf = udf((sig: Seq[Long], bands: Int) => bandKeys(sig.toArray, bands))

  def minhash_signature(c: Column): Column = signatureUdf(c)
  def est_jaccard(a: Column, b: Column): Column = estJaccardUdf(a, b)
  def exact_jaccard(a: Column, b: Column): Column = exactJaccardUdf(a, b)
  def band_keys(sig: Column, bands: Int): Column = bandKeysUdf(sig, lit(bands))
}
