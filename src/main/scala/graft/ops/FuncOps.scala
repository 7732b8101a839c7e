package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Bias, Dates, Names, Urls, Zips}
import graft.functions.expressions.SimHash64

/** Scalar-function operators (SURVEY §2.8) exercised over the testdata
  * tables with synthesized inputs, each with a DuckDB oracle (the JVM
  * functions are replayed in SQL; process_name's replay covers this
  * input domain, with the quirk branches unit-tested exhaustively).
  */
object FuncOps {

  /** F1: name canonicalization over synthesized `LAST, FIRST TITLE`
    * forms (SQL replay in the oracle; unit-tested exhaustively). */
  def f01ProcessName(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        concat(upper(col("c_name")), lit(", "),
          upper(col("c_mktsegment")), lit(" DR")).as("raw"))
      .withColumn("name", Names.process_name(col("raw")))
      .orderBy(col("c_custkey"))

  /** F2: clean_zip over synthesized numeric zips incl zero + 9-digit. */
  def f02CleanZip(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit("0"))
          .when(col("c_custkey") % 7 === 0,
            concat(lit("9411012"), (col("c_custkey") % 100).cast("string")))
          .otherwise((col("c_custkey") * 37 % 100000).cast("string"))
          .as("raw_zip"))
      .withColumn("zip", Zips.clean_zip(col("raw_zip")))
      .orderBy(col("c_custkey"))

  /** F4: FEC MMDDYYYY → ISO reshuffle (pure substring concat). */
  def f04FecDate(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "MMddyyyy").as("raw"))
      .withColumn("iso", Dates.fec_date_iso(col("raw")))
      .orderBy(col("o_orderkey"))

  /** F7: multi-format parse ladder over 3 synthesized formats. */
  def f07DateLadder(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val raw = when(col("event_id") % 3 === 0,
        date_format(col("ts"), "M/d/yyyy H:mm"))
      .when(col("event_id") % 3 === 1,
        date_format(col("ts"), "yyyy-MM-dd"))
      .otherwise(date_format(col("ts"), "MMM d, yyyy"))
    ev.select(col("event_id"), raw.as("raw"))
      .withColumn("parsed", date_format(
        Dates.parse_date_ladder(col("raw"),
          Seq("M/d/yyyy H:mm", "yyyy-MM-dd", "MMM d, yyyy")),
        "yyyy-MM-dd HH:mm"))
      .orderBy(col("event_id"))
  }

  /** F13: amount normalization `$1,234.50` → double round-trip. */
  def f13Amount(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        concat(lit("$"), (col("o_orderkey") / 1000).cast("long").cast("string"),
          lit(","),
          lpad((col("o_orderkey") % 1000).cast("string"), 3, "0"),
          lit(".50")).as("raw"))
      .withColumn("amount", Dates.parse_amount(col("raw")))
      .orderBy(col("o_orderkey"))

  /** F15: domain normalization over synthesized urls (built-ins only →
    * full oracle). */
  def f15Domain(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        concat(lit("HTTPS://WWW."),
          regexp_replace(lower(col("p_brand")), "[^a-z0-9]", ""),
          lit(".com/"), lower(col("p_type")), lit("  ")).as("raw"))
      .withColumn("domain", Urls.normalize_domain(col("raw")))
      .orderBy(col("p_partkey"))

  /** F16: name join (concat_ws skips nulls) + upper. */
  def f16NameJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        upper(concat_ws(" ", col("c_name"),
          when(col("c_custkey") % 2 === 0, col("c_mktsegment")),
          lit("JR"))).as("full_name"))
      .orderBy(col("c_custkey"))

  /** F5: PARSE_DATE('%m/%d/%Y') / ('%d-%b-%y') with empty→null guard,
    * over raws synthesized from the order date (so the oracle can state
    * the expected value without strptime round-trips). */
  def f05ParseDates(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 11 === 0, lit(""))
          .otherwise(date_format(col("o_orderdate"), "M/d/yyyy")).as("raw_mdy"),
        date_format(col("o_orderdate"), "dd-MMM-yy").as("raw_dby"))
      .select(col("o_orderkey"), col("raw_mdy"), col("raw_dby"),
        date_format(Dates.parse_date_mdy(col("raw_mdy")), "yyyy-MM-dd")
          .as("parsed_mdy"),
        date_format(Dates.parse_date_dby(col("raw_dby")), "yyyy-MM-dd")
          .as("parsed_dby"))
      .orderBy(col("o_orderkey"))

  /** F6: naive local date → America/New_York-localized → UTC (the
    * contribution-date normalization; EST/EDT both occur in the data). */
  def f06TzLocalize(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("raw"))
      .select(col("o_orderkey"), col("raw"),
        date_format(Dates.est_to_utc(to_timestamp(col("raw"))),
          "yyyy-MM-dd HH:mm:ss").as("utc_ts"))
      .orderBy(col("o_orderkey"))

  /** F9+F10: strip_url (args/fragment dropped, `v=` kept for YouTube
    * watch urls, scheme+www stripped) then get_domain, over urls
    * synthesized from the documents table. */
  def f09StripUrl(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(lit("https://www.youtube.com/watch?v=abc"), col("doc_id"),
            lit("&t=9#x")))
          .otherwise(concat(lit("https://www."), col("source"),
            lit(".com/articles/"), col("doc_id"), lit("?utm=1&x=2#top")))
          .as("raw_url"))
      .select(col("doc_id"), col("raw_url"),
        Urls.strip_url(col("raw_url")).as("stripped"),
        Urls.get_domain(Urls.strip_url(col("raw_url"))).as("domain"))
      .orderBy(col("doc_id"))

  /** F11: recover the target url from a scraper-proxy wrapper (strip
    * everything through `&url=`; pass-through when absent). */
  def f11ParseProxy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(lit("http://proxy.example/api?key=K&url=https://www."),
            col("source"), lit(".com/x")))
          .otherwise(concat(lit("https://"), col("source"), lit(".com/y")))
          .as("raw_url"))
      .withColumn("target",
        when(col("raw_url").contains("&url="),
          substring_index(col("raw_url"), "&url=", -1))
          .otherwise(col("raw_url")))
      .orderBy(col("doc_id"))

  /** F19: reddit self-text key/value parser over synthesized ad markup
    * (HTML strip, key snake_casing incl. -/ replacement, M/d/yy date
    * normalization); the map rides the compare as a sorted k=v digest. */
  def f19RedditKv(s: SparkSession, d: String): DataFrame = {
    val html = concat(
      lit("<p>Ad Buyer Information and Related Data:</p>"),
      lit("<p>Buyer: Acme "), col("doc_id"), lit("</p>"),
      lit("<p>Paid-By/Agency: Org "), col("source"), lit("</p>"),
      lit("<p>Start Date: 1/15/22</p>"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.reddit.Reddit.parse_selftext(html).as("kv"))
      .select(col("doc_id"),
        concat_ws(";", sort_array(expr(
          "transform(map_entries(kv), e -> concat(e.key, '=', e.value))")))
          .as("kv_digest"))
      .orderBy(col("doc_id"))
  }

  /** F12: message-identity pair — cryptographic hash + simhash sketch
    * of the body (the Facebook Message node key (sha, simhash)). */
  def f12HashPair(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        sha2(col("text"), 256).as("sha"),
        SimHash64.simhash_native(s, col("text")).as("simhash"))
      .orderBy(col("doc_id"))

  /** F17: tweet-text flatten — collapse newline runs to one space. */
  def f17Flatten(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(regexp_replace(col("text"), "\\n+", " ")).as("flat_len"),
        md5(regexp_replace(col("text"), "\\n+", " ")).as("flat_md5"))
      .orderBy(col("doc_id"))

  /** F21: date-part explosion incl. the EST day-attribution variant
    * (graph Day nodes are keyed on America/New_York wall-clock). */
  def f21DateParts(s: SparkSession, d: String): DataFrame = {
    val est = from_utc_timestamp(col("ts"), "America/New_York")
    Tables.events(s, d)
      .select(col("event_id"),
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"), hour(col("ts")).as("h"),
        minute(col("ts")).as("mi"),
        dayofmonth(est).as("d_est"), hour(est).as("h_est"))
      .orderBy(col("event_id"))
  }

  /** F14/A4: bias scoring + null-aware average over present ratings. */
  def f14Bias(s: SparkSession, d: String): DataFrame = {
    val labeled = Tables.customer(s, d).select(col("c_custkey"),
      when(col("c_mktsegment") === "BUILDING", "left")
        .when(col("c_mktsegment") === "AUTOMOBILE", "lean left")
        .when(col("c_mktsegment") === "MACHINERY", "center")
        .when(col("c_mktsegment") === "HOUSEHOLD", "lean right")
        .otherwise("right").as("label"),
      when(col("c_custkey") % 3 === 0, col("c_acctbal")).as("score2"))
    labeled
      .select(col("c_custkey"),
        Bias.allsidesScore(col("label")).as("score1"), col("score2"))
      .withColumn("avg_present",
        round(Bias.avgPresent(col("score1"), col("score2")), 6))
      .orderBy(col("c_custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f01_process_name" -> f01ProcessName _,
    "f05_parse_dates"  -> f05ParseDates _,
    "f06_tzlocalize"   -> f06TzLocalize _,
    "f09_strip_url"    -> f09StripUrl _,
    "f11_parse_proxy"  -> f11ParseProxy _,
    "f19_reddit_kv"    -> f19RedditKv _,
    "f12_hash_pair"    -> f12HashPair _,
    "f17_flatten"      -> f17Flatten _,
    "f21_dateparts"    -> f21DateParts _,
    "f02_clean_zip"    -> f02CleanZip _,
    "f04_fec_date"     -> f04FecDate _,
    "f07_date_ladder"  -> f07DateLadder _,
    "f13_amount"       -> f13Amount _,
    "f15_domain"       -> f15Domain _,
    "f16_name_join"    -> f16NameJoin _,
    "f14_bias"         -> f14Bias _)

  val oracles: Map[String, String] = Map(
    "f05_parse_dates" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 11 = 0 THEN ''
        |       ELSE strftime(o_orderdate, '%-m/%-d/%Y') END AS raw_mdy,
        |  strftime(o_orderdate, '%d-%b-%y') AS raw_dby,
        |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |       ELSE strftime(o_orderdate, '%Y-%m-%d') END AS parsed_mdy,
        |  strftime(o_orderdate, '%Y-%m-%d') AS parsed_dby
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f06_tzlocalize" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS raw,
        |  strftime(timezone('UTC',
        |    timezone('America/New_York', CAST(o_orderdate AS TIMESTAMP))),
        |    '%Y-%m-%d %H:%M:%S') AS utc_ts
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f09_strip_url" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0
        |    THEN 'https://www.youtube.com/watch?v=abc' || doc_id || '&t=9#x'
        |    ELSE 'https://www.' || source || '.com/articles/' || doc_id || '?utm=1&x=2#top'
        |  END AS raw_url,
        |  CASE WHEN doc_id % 10 = 0
        |    THEN 'youtube.com/watch?v=abc' || doc_id
        |    ELSE source || '.com/articles/' || doc_id
        |  END AS stripped,
        |  CASE WHEN doc_id % 10 = 0 THEN 'youtube.com'
        |    ELSE source || '.com' END AS domain
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f11_parse_proxy" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN 'http://proxy.example/api?key=K&url=https://www.' || source || '.com/x'
        |    ELSE 'https://' || source || '.com/y' END AS raw_url,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN 'https://www.' || source || '.com/x'
        |    ELSE 'https://' || source || '.com/y' END AS target
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f19_reddit_kv" ->
      """SELECT doc_id,
        |  'buyer=Acme ' || doc_id ||
        |  ';paid_by_agency=Org ' || source ||
        |  ';start_date=2022-01-15' AS kv_digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    // sha256 is native in both engines; the simhash sketch is replayed
    // as in the dedup_simhash oracle, folded back to a signed 64-bit.
    // integer restatement of the bit-string sketch replay (round-7
    // oracle-cost fix): the per-feature 64-bit hash is the SAME md5
    // nibble fold (MSB nibble first), bit votes become 64 columnar
    // SUM aggregates over the exploded feature rows (bit b of the
    // integer == string position 64-b, so v$b replays the substr
    // vote exactly), and the sketch is rebuilt from exact 2^b terms
    "f12_hash_pair" -> {
      val votes = (0 until 64).map(b =>
        s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
        .mkString(",\n        |    ")
      val recon = (0 until 64).map { b =>
        val w = BigInt(2).pow(b)
        s"CASE WHEN v$b > 0 THEN $w::HUGEINT ELSE 0::HUGEINT END"
      }.mkString("\n        |    + ")
      s"""WITH feats AS (
        |  SELECT doc_id,
        |    CASE WHEN len(j) <= 4 THEN [j]
        |         ELSE list_transform(range(0, len(j) - 3), i -> substr(j, i+1, 4)) END AS fs
        |  FROM (SELECT doc_id,
        |          regexp_replace(lower(text), '[^a-z0-9_]', '', 'g') AS j
        |        FROM documents)),
        |fx AS (SELECT doc_id, UNNEST(fs) AS f FROM feats),
        |hx AS MATERIALIZED (
        |  SELECT doc_id, CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |      THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT)
        |    AS h
        |  FROM (SELECT doc_id, list_reduce(list_prepend(0::HUGEINT,
        |      list_transform(string_split(substr(md5(f), 1, 16), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS HUGEINT))),
        |      (a, b) -> a * 16 + b) AS hu FROM fx)),
        |vt AS MATERIALIZED (
        |  SELECT doc_id,
        |    $votes
        |  FROM hx GROUP BY doc_id),
        |sk AS (
        |  SELECT doc_id,
        |    $recon AS u
        |  FROM vt)
        |SELECT s.doc_id, sha256(d.text) AS sha,
        |  CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
        |       THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT)
        |    AS simhash
        |FROM sk s JOIN documents d ON d.doc_id = s.doc_id
        |ORDER BY s.doc_id""".stripMargin
    },
    "f17_flatten" ->
      """SELECT doc_id,
        |  CAST(length(regexp_replace(text, '\n+', ' ', 'g')) AS INT)
        |    AS flat_len,
        |  md5(regexp_replace(text, '\n+', ' ', 'g')) AS flat_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f21_dateparts" ->
      """SELECT event_id,
        |  CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m,
        |  CAST(day(ts) AS INTEGER) AS d, CAST(hour(ts) AS INTEGER) AS h,
        |  CAST(minute(ts) AS INTEGER) AS mi,
        |  CAST(day(est) AS INTEGER) AS d_est, CAST(hour(est) AS INTEGER) AS h_est
        |FROM (SELECT event_id, ts,
        |        timezone('America/New_York', timezone('UTC', CAST(ts AS TIMESTAMP))) AS est
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    // process_name replayed in SQL for this input domain: uppercase,
    // strip up to three trailing honorific titles (one per pass, the
    // elif chain as an anchored alternation), flip "LAST, FIRST",
    // collapse double spaces once, trim, strip one leading "DR ". The
    // ", LLC"/", INC" and generation-suffix branches never fire on
    // these inputs and are covered by the exhaustive unit suite.
    "f01_process_name" ->
      """WITH base AS (
        |  SELECT c_custkey,
        |    upper(c_name) || ', ' || upper(c_mktsegment) || ' DR' AS raw
        |  FROM customer),
        |stripped AS (
        |  SELECT c_custkey, raw,
        |    regexp_replace(regexp_replace(regexp_replace(replace(raw, '.', ''),
        |      '( MR| MS| MRS| HON| ESQ| REV| FR| DR ND| DR DO| DR| MD| JD| MBA| PHD| RET| MSGT| USAF| USN| CDR| SGT| MAJ| THE)$', ''),
        |      '( MR| MS| MRS| HON| ESQ| REV| FR| DR ND| DR DO| DR| MD| JD| MBA| PHD| RET| MSGT| USAF| USN| CDR| SGT| MAJ| THE)$', ''),
        |      '( MR| MS| MRS| HON| ESQ| REV| FR| DR ND| DR DO| DR| MD| JD| MBA| PHD| RET| MSGT| USAF| USN| CDR| SGT| MAJ| THE)$', '') AS s
        |  FROM base),
        |flipped AS (
        |  SELECT c_custkey, raw,
        |    CASE WHEN contains(s, ',')
        |      THEN split_part(s, ',', 2) || ' ' || split_part(s, ',', 1)
        |      ELSE s END AS f
        |  FROM stripped)
        |SELECT c_custkey, raw,
        |  CASE WHEN starts_with(t, 'DR ') THEN substr(t, 4) ELSE t END AS name
        |FROM (SELECT c_custkey, raw, trim(replace(f, '  ', ' ')) AS t FROM flipped)
        |ORDER BY c_custkey""".stripMargin,
    "f02_clean_zip" ->
      """WITH z AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN '0'
        |         WHEN c_custkey % 7 = 0 THEN '9411012' || CAST(c_custkey % 100 AS VARCHAR)
        |         ELSE CAST(c_custkey * 37 % 100000 AS VARCHAR) END AS raw_zip
        |  FROM customer)
        |SELECT c_custkey, raw_zip,
        |  CASE WHEN CAST(raw_zip AS BIGINT) = 0 THEN ''
        |       WHEN length(CAST(CAST(raw_zip AS BIGINT) AS VARCHAR)) >= 5
        |         THEN CAST(CAST(raw_zip AS BIGINT) AS VARCHAR)
        |       ELSE lpad(CAST(CAST(raw_zip AS BIGINT) AS VARCHAR), 5, '0')
        |  END AS zip
        |FROM z ORDER BY c_custkey""".stripMargin,
    "f04_fec_date" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%m%d%Y') AS raw,
        |  substring(strftime(o_orderdate, '%m%d%Y'), 5, 4) || '-' ||
        |  substring(strftime(o_orderdate, '%m%d%Y'), 1, 2) || '-' ||
        |  substring(strftime(o_orderdate, '%m%d%Y'), 3, 2) AS iso
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f07_date_ladder" ->
      """WITH r AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%-m/%-d/%Y %-H:%M')
        |         WHEN event_id % 3 = 1 THEN strftime(ts, '%Y-%m-%d')
        |         ELSE strftime(ts, '%b %-d, %Y') END AS raw
        |  FROM events)
        |SELECT event_id, raw,
        |  strftime(COALESCE(
        |    try_strptime(raw, '%-m/%-d/%Y %-H:%M'),
        |    try_strptime(raw, '%Y-%m-%d'),
        |    try_strptime(raw, '%b %-d, %Y')), '%Y-%m-%d %H:%M') AS parsed
        |FROM r ORDER BY event_id""".stripMargin,
    "f13_amount" ->
      """SELECT o_orderkey,
        |  '$' || CAST(o_orderkey // 1000 AS VARCHAR) || ',' ||
        |    lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0') || '.50' AS raw,
        |  CAST(o_orderkey AS DOUBLE) + 0.5 AS amount
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f15_domain" ->
      """WITH r AS (
        |  SELECT p_partkey,
        |    'HTTPS://WWW.' || regexp_replace(lower(p_brand), '[^a-z0-9]', '', 'g')
        |      || '.com/' || lower(p_type) || '  ' AS raw
        |  FROM part)
        |SELECT p_partkey, raw,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    split_part(regexp_replace(lower(trim(raw)),
        |      '^[a-z][a-z0-9+.-]*://', ''), '/', 1),
        |    '^www\.', ''), ',[^,]*$', ''), '^\.', '') AS domain
        |FROM r ORDER BY p_partkey""".stripMargin,
    "f16_name_join" ->
      """SELECT c_custkey,
        |  upper(concat_ws(' ', c_name,
        |    CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment END, 'JR'))
        |    AS full_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f14_bias" ->
      """WITH l AS (
        |  SELECT c_custkey,
        |    CASE c_mktsegment WHEN 'BUILDING' THEN 'left'
        |      WHEN 'AUTOMOBILE' THEN 'lean left' WHEN 'MACHINERY' THEN 'center'
        |      WHEN 'HOUSEHOLD' THEN 'lean right' ELSE 'right' END AS label,
        |    CASE WHEN c_custkey % 3 = 0 THEN c_acctbal END AS score2
        |  FROM customer),
        |s AS (
        |  SELECT c_custkey,
        |    CASE label WHEN 'left' THEN -2.0 WHEN 'lean left' THEN -1.0
        |      WHEN 'center' THEN 0.0 WHEN 'lean right' THEN 1.0
        |      WHEN 'right' THEN 2.0 END AS score1, score2
        |  FROM l)
        |SELECT c_custkey, score1, score2,
        |  round((COALESCE(score1, 0) + COALESCE(score2, 0)) /
        |    ((CASE WHEN score1 IS NOT NULL THEN 1 ELSE 0 END) +
        |     (CASE WHEN score2 IS NOT NULL THEN 1 ELSE 0 END)), 6) AS avg_present
        |FROM s ORDER BY c_custkey""".stripMargin)
}
