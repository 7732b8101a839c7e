package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Everything except the trigram language model and the rolling-hash
  * fingerprint is expressed with built-in functions (codegen'd,
  * pushdown-friendly); the two exceptions are JVM scalar functions.
  */
object TextAnalysis {

  // ---------------------------------------------------------------- tokens

  /** Whitespace token count (documents with no word chars count 0). */
  def token_count_ws(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword token count: word chars in runs of ≤4 plus
    * standalone punctuation — a cheap, deterministic proxy for a BPE
    * vocabulary's token count (ratio ~chars/3.5 for English).
    * Computed by the native single-pass
    * [[graft.functions.expressions.BpeTokenCount]] expression (one
    * branch per UTF-8 byte, stays in whole-stage codegen): the
    * equivalent `regexp_count(text, '\w{1,4}|[^\w\s]')` re-enters the
    * regex engine at every position and measured ~4× slower on the
    * corpus scan. [[token_count_bpe_regex]] keeps the regex form for
    * the equivalence spec. */
  def token_count_bpe(s: SparkSession, text: Column): Column =
    graft.functions.expressions.BpeTokenCount.bpe_token_count(s, text)

  /** The regex formulation of [[token_count_bpe]] — retained as the
    * executable spec the native expression is asserted against. */
  def token_count_bpe_regex(text: Column): Column =
    // regexp_count, not size(regexp_extract_all): counting must not
    // materialize every match as a string — this runs on every byte of
    // a 100 TB corpus
    regexp_count(text, lit("\\w{1,4}|[^\\w\\s]"))

  // --------------------------------------------------------------- quality

  /** Heuristic quality features (length, punctuation/stopword/digit
    * ratios) — the standard pre-training quality gates. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val words = split(trim(text), "\\s+")
    val nWords = when(length(trim(text)) === 0, lit(0)).otherwise(size(words))
    val nPunct = regexp_count(text, lit("[^\\w\\s]"))
    val nDigit = regexp_count(text, lit("[0-9]"))
    val stopRe = "\\b(the|a|an|of|to|in|and|is|it|that|for|on|was|with|as|at|be|this|are|or)\\b"
    val nStop = regexp_count(lower(text), lit(stopRe))
    val safeWords = greatest(nWords, lit(1)).cast("double")
    Seq(
      "n_chars_m"   -> nChars.cast("long"),
      "n_words"     -> nWords.cast("long"),
      "punct_ratio" -> round(nPunct.cast("double") / greatest(nChars, lit(1)).cast("double"), 6),
      "digit_ratio" -> round(nDigit.cast("double") / greatest(nChars, lit(1)).cast("double"), 6),
      "stop_ratio"  -> round(nStop.cast("double") / safeWords, 6),
      "mean_word_len" -> round(
        (nChars - (nWords - 1)).cast("double") / safeWords, 6))
  }

  /** Scalar quality score in [0,1]: product of soft gates. */
  def quality_score(text: Column): Column = {
    val cols = qualityColumns(text).toMap
    val lenGate = least(cols("n_words").cast("double") / lit(20.0), lit(1.0))
    val stopGate = least(cols("stop_ratio") * lit(4.0), lit(1.0))
    val punctGate = greatest(lit(0.0),
      lit(1.0) - cols("punct_ratio") * lit(4.0))
    round(lenGate * stopGate * punctGate, 6)
  }

  // --------------------------------------------------------------- lang id

  /** Tiny per-language character/stopword profiles. Public-knowledge
    * heuristic (profiles hand-authored): score = stopword hits +
    * script-specific character evidence; highest score wins, "und" when
    * nothing scores. Covers the langs in the synthetic corpus plus the
    * usual web set. */
  private val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "une", "dans", "que", "pour", "qui"),
    "pt" -> Seq("o", "os", "um", "uma", "do", "da", "em", "para", "com", "não", "por"),
    "it" -> Seq("il", "lo", "gli", "che", "di", "e", "un", "una", "per", "con", "del"))

  def detectLanguage(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val lower = text.toLowerCase
    // script evidence first: CJK / Cyrillic / Arabic dominate instantly
    var cjk = 0; var cyr = 0; var ar = 0; var latin = 0
    lower.foreach { ch =>
      val b = Character.UnicodeScript.of(ch)
      if (b == Character.UnicodeScript.HAN || b == Character.UnicodeScript.HIRAGANA ||
        b == Character.UnicodeScript.KATAKANA) cjk += 1
      else if (b == Character.UnicodeScript.CYRILLIC) cyr += 1
      else if (b == Character.UnicodeScript.ARABIC) ar += 1
      else if (b == Character.UnicodeScript.LATIN) latin += 1
    }
    val scripted = Seq("zh" -> cjk, "ru" -> cyr, "ar" -> ar)
      .filter(_._2 > latin / 2).sortBy(-_._2)
    if (scripted.nonEmpty) return scripted.head._1
    if (latin == 0) return "und"
    val tokens = lower.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (tokens.isEmpty) return "und"
    val tokSet = tokens.groupBy(identity).map { case (k, v) => k -> v.length }
    val scores = langStopwords.map { case (lang, sws) =>
      lang -> sws.map(w => tokSet.getOrElse(w, 0)).sum
    }
    val (best, score) = scores.maxBy { case (l, s) => (s, l) }
    if (score == 0) "und" else best
  }

  val detectLanguageUdf = udf(detectLanguage _)
  def detect_language(c: Column): Column = detectLanguageUdf(c)

  // ----------------------------------------------------------- fingerprint

  /** Exact content fingerprint: md5 of whitespace-normalized lowercase
    * text (SQL-expressible; used as the exact-dedup key). */
  def fingerprint_md5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit polynomial rolling hash of the normalized text — the cheap
    * streaming fingerprint (non-cryptographic, order-sensitive). */
  def rollingHash64(text: String): Long = {
    if (text == null) return 0L
    val norm = text.toLowerCase.trim.replaceAll("\\s+", " ")
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < norm.length) {
      h = 31 * h + norm.charAt(i)
      i += 1
    }
    h
  }

  val rollingHashUdf = udf(rollingHash64 _)
  def fingerprint_rolling(c: Column): Column = rollingHashUdf(c)

  /** Winnowing fingerprint panel (Schleimer–Wilkerson–Aiken, the MOSS
    * scheme): 5-token k-grams hashed with the [[rollingHash64]]
    * polynomial, then every window of 4 consecutive gram hashes
    * contributes its minimum — the guarantee that any shared run of
    * ≥ w+k−1 tokens between two documents shares a fingerprint, at
    * ~1/w the storage of full gram sets. Selected values are
    * distinct-ed; the panel reports counts and the signed min/max
    * (membership itself is what a dedup join would use). Documents
    * shorter than one k-gram contribute a single whole-text gram;
    * empty documents contribute nothing. */
  final case class WinnowStats(nGrams: Int, nFp: Int,
      fpMin: Option[Long], fpMax: Option[Long])

  private def gramHash(g: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < g.length) { h = 31 * h + g.charAt(i); i += 1 }
    h
  }

  /** (gram count, distinct selected fingerprints) — the shared core of
    * [[winnowStats]] and the dedup candidate generator [[winnow_fps]]. */
  def winnowSelect(text: String): (Int, Array[Long]) = {
    val toks =
      if (text == null) Array.empty[String]
      else text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val k = 5; val w = 4
    val grams: Array[Long] =
      if (toks.isEmpty) Array.empty
      else if (toks.length < k) Array(gramHash(toks.mkString(" ")))
      else Array.tabulate(toks.length - k + 1)(i =>
        gramHash(toks.slice(i, i + k).mkString(" ")))
    val sel: Array[Long] =
      if (grams.isEmpty) Array.empty
      else if (grams.length <= w) Array(grams.min)
      else Array.tabulate(grams.length - w + 1)(j =>
        grams.slice(j, j + w).min).distinct
    (grams.length, sel)
  }

  def winnowStats(text: String): WinnowStats = {
    val (nGrams, sel) = winnowSelect(text)
    WinnowStats(nGrams, sel.length,
      if (sel.isEmpty) None else Some(sel.min),
      if (sel.isEmpty) None else Some(sel.max))
  }

  val winnowUdf = udf(winnowStats _)
  def winnow_stats(c: Column): Column = winnowUdf(c)

  val winnowFpsUdf = udf((t: String) => winnowSelect(t)._2)
  /** The distinct selected winnow fingerprints themselves — the
    * per-document candidate keys for fingerprint-bucket dedup. */
  def winnow_fps(c: Column): Column = winnowFpsUdf(c)

  // ------------------------------------------------------- normalization

  /** Unicode accent folding: NFD-decompose, drop combining marks —
    * the JVM twin of DuckDB/ICU `strip_accents` on Latin text. A
    * genuinely algorithmic scalar (Unicode tables), so a JVM function
    * rather than built-ins; everything around it stays codegen'd. */
  def stripAccents(text: String): String = {
    if (text == null) null
    else java.text.Normalizer
      .normalize(text, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", "")
  }

  val stripAccentsUdf = udf(stripAccents _)
  def strip_accents(c: Column): Column = stripAccentsUdf(c)

  /** Whitespace-collapsed form (the exact-dedup normalization). */
  def norm_ws(text: Column): Column =
    regexp_replace(trim(text), "\\s+", " ")

  /** Lowercased alphanumeric-only form (the shingling normalization). */
  def norm_alnum(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  // ---------------------------------------------------------- repetition
  // Within-document repetition signals (the Gopher/MassiveText family):
  // a doc dominated by one repeated bigram, or whose 5-grams mostly
  // occur more than once, is boilerplate/spam. All pure higher-order
  // array expressions — narrow, no shuffle, scan-speed at 100 TB. The
  // per-row cost is O(distinct-grams × grams); bounded in practice by
  // document length, and the signals are meant for the short-to-medium
  // docs a quality gate sees (cap inputs upstream for pathological docs).

  /** Non-empty whitespace tokens (split of "" yields [""], so filter). */
  def wordTokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** All word n-grams of the token array, space-joined, in order. */
  def wordGrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Occurrence count of each DISTINCT gram, aligned with
    * array_distinct(grams). Callers should materialize this as its own
    * projection column: higher-order-function subtrees are excluded
    * from Spark's subexpression elimination, so a fraction expression
    * that inlines both the grams and the counts would rebuild the gram
    * array several times per row. */
  def gram_counts(grams: Column): Column =
    transform(array_distinct(grams),
      g => size(filter(grams, x => x === g)))

  /** Fraction of n-gram occurrences claimed by the single most frequent
    * n-gram (0.0 for docs shorter than the gram width). `grams` and
    * `counts` must be MATERIALIZED columns (see [[gram_counts]]). */
  def topFracOf(grams: Column, counts: Column): Column =
    when(size(grams) === 0, lit(0.0)).otherwise(
      round(array_max(counts).cast("double") /
        size(grams).cast("double"), 6))

  /** Fraction of n-gram occurrences belonging to n-grams that appear
    * more than once in the document; same materialization contract. */
  def dupFracOf(grams: Column, counts: Column): Column = {
    val dupOcc = aggregate(
      filter(counts, c => c >= 2),
      lit(0), (acc, c) => acc + c)
    when(size(grams) === 0, lit(0.0)).otherwise(
      round(dupOcc.cast("double") / size(grams).cast("double"), 6))
  }

  // ----------------------------------------------------------- PII scan
  // RE2-safe patterns (no lookaround/backrefs) so the Java regex engine
  // and the DuckDB oracle match identically. Order matters in the
  // redaction: SSN before phone (an SSN is a substring shape a loose
  // phone pattern could otherwise claim).

  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val ssnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val phonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Per-doc PII features: counts + redacted text. Derive `has_pii`
    * from the named count columns (`pii_flag`) instead of re-running
    * the regexes. */
  def piiColumns(text: Column): Seq[(String, Column)] = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, emailPattern, "[EMAIL]"),
          ssnPattern, "[SSN]"),
        phonePattern, "[PHONE]")
    Seq(
      "n_emails" -> regexp_count(text, lit(emailPattern)).cast("int"),
      "n_ssns" -> regexp_count(text, lit(ssnPattern)).cast("int"),
      "n_phones" -> regexp_count(
        regexp_replace(text, ssnPattern, "[SSN]"), lit(phonePattern))
        .cast("int"),
      "redacted" -> redacted)
  }

  /** has_pii over the ALREADY-COMPUTED count columns — the regexes
    * run once per doc, not twice. */
  def pii_flag: Column =
    (col("n_emails") + col("n_ssns") + col("n_phones") > 0).cast("int")

  def register(spark: SparkSession): Unit = {
    spark.udf.register("detect_language", detectLanguage _)
    spark.udf.register("rolling_hash64", rollingHash64 _)
    spark.udf.register("strip_accents", stripAccents _)
  }
}
