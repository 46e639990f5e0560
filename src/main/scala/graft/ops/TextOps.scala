package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language-ID, document
  * fingerprinting. Everything is built-in `Column` trees (whole-stage
  * codegen, no UDFs) so the operators pipeline with the parquet scan in
  * ONE narrow stage — at 100 TB these run at scan speed with zero
  * shuffle (the only shuffles in this file's callers are the explicit
  * groupBys of the dedup/aggregation consumers).
  *
  * Counting-style outputs are kept as exact integers (not float ratios)
  * so results are bit-reproducible across engines and partitionings —
  * the same lexical-form discipline the KG side uses (SURVEY.md §1.2).
  */
object TextOps {

  /** Whitespace tokenizer — `\S+` runs. regexp_extract_all is
    * codegen'd.
    */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** BPE-style pre-tokenization (GPT-2-family segmentation, minus the
    * RE2-incompatible lookahead so the same pattern runs in the SQL
    * oracle): space-prefixed letter runs, digit runs, punctuation runs.
    * This is the unit LLM tokenizers subdivide, so its count is the
    * budget-relevant "token count" for training-data curation.
    */
  val bpeRegex = " ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeRegex), lit(0))

  /** Per-document token statistics. All counts BIGINT. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      size(array_distinct(tokens(col("text")))).cast("long").as("n_distinct_tokens"),
      size(bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"),
      length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long").as("n_alpha_chars"))

  /** The quality gate as a pure boolean Column — composable into any
    * projection without a join (the curation pipeline stacks it with
    * lang-ID and the fingerprint in ONE narrow stage). Integer
    * arithmetic only (`2*t <= chars-(t-1)` instead of float means) —
    * deterministic under any engine.
    */
  def qualityKeep(text: Column,
      minTokens: Int = 10, maxTokens: Int = 100000): Column = {
    val nTok = size(tokens(text)).cast("long")
    val nChars = length(text).cast("long")
    val nStop = size(regexp_extract_all(text,
      lit(langMarkers.head._2), lit(0))).cast("long")
    nTok >= minTokens && nTok <= maxTokens &&
      // mean token length in [2, 12]: 2*t <= chars-(t-1) <= 12*t
      (nChars - nTok + 1) >= nTok * 2 &&
      (nChars - nTok + 1) <= nTok * 12 &&
      nStop >= 1
  }

  /** Heuristic quality score (Gopher/C4-style cheap filters): doc
    * length bounds, mean token length bounds, stopword presence. The
    * gate itself is [[qualityKeep]]; codegen's subexpression
    * elimination shares the regex scans with the reported counts.
    */
  def qualityScore(docs: DataFrame,
      minTokens: Int = 10, maxTokens: Int = 100000): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nChars = length(col("text")).cast("long")
    val nStop = size(regexp_extract_all(col("text"),
      lit(langMarkers.head._2), lit(0))).cast("long")
    val nPunct = size(regexp_extract_all(col("text"),
      lit("[\\.,;:!\\?]"), lit(0))).cast("long")
    docs.select(
      col("doc_id"), nTok.as("n_tokens"), nChars.as("n_chars"),
      nStop.as("n_stopwords"), nPunct.as("n_punct"),
      qualityKeep(col("text"), minTokens, maxTokens).as("keep"))
  }

  /** Language-ID markers: tiny per-language function-word sets (the
    * classic n-gram/stopword-voting heuristic, shrunk to be exactly
    * reproducible in the SQL oracle). Order = deterministic tie-break
    * priority.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|to|in)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht)\\b",
    "fr" -> "\\b(le|la|les|et|est|une)\\b",
    "es" -> "\\b(el|los|las|es|una|que)\\b",
    "zh" -> "[\\u4e00-\\u9fff]")

  /** The language vote as a pure string Column (argmax over marker
    * hits; ties → marker-list order; all-zero → "und") — composable
    * like [[qualityKeep]].
    */
  def predLang(text: Column): Column = {
    val scores = langMarkers.map { case (l, re) =>
      l -> size(regexp_extract_all(text, lit(re), lit(0))).cast("long")
    }
    val best = scores.map(_._2).reduce(greatest(_, _))
    // when-chain in marker-list order: the FIRST language hitting the
    // max wins, matching the SQL CASE the oracle uses
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Stopword-voting language ID: per-language hit counts plus the
    * [[predLang]] argmax.
    */
  def langId(docs: DataFrame): DataFrame =
    docs.select(
      (col("doc_id") +: langMarkers.map { case (l, re) =>
        size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long").as(s"score_$l")
      }) :+ predLang(col("text")).as("pred_lang"): _*)

  /** Content fingerprint: md5 over the case/punct-normalized text —
    * the cheap canonical-form fingerprint used for fuzzy-exact dedup
    * (whitespace/caps/punct-insensitive).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]+", ""))

  /** Rolling Karp-Rabin hash over tokens — a locality-preserving
    * fingerprint for shift-tolerant chunk identity:
    * h := (h·1009 + polyhash31(token) mod 2^20) mod (2^31−1).
    * Round 3 swapped the token hash from xxhash64 to the PORTABLE
    * 31-bit polynomial so the DuckDB oracle re-derives it exactly
    * (`text_rolling_hash` — the last rows-only text op is now
    * hash-checked). [[rollingHashOf]] is the production path (tight
    * JVM loop in a typed mapPartitions — HOF lambdas evaluate
    * interpreted); this Column formulation is its composable
    * validation twin, property-checked equal. All arithmetic stays
    * inside [0, 2^41]: Spark 4 ANSI mode raises on long overflow, so
    * the classic wrap-around formulation is off limits.
    */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(
        acc * lit(1009L) + pmod(polyhash31Col(t), lit(1048576L)),
        lit(2147483647L)))

  /** Column twin of [[Portable.polyhash31]] (ASCII-exact, like the SQL
    * twin — Portable scaladoc documents the non-BMP caveat).
    */
  private def polyhash31Col(s: Column): Column =
    aggregate(filter(split(s, ""), ch => ch =!= ""), lit(0L),
      (a, ch) => pmod(a * 31 + ascii(ch).cast("long"), lit(2147483647L)))

  /** Executor-side rolling hash — identical arithmetic to
    * [[rollingHash]], as a tight loop for the scan-speed path.
    */
  def rollingHashOf(text: String): Long = {
    if (text == null) return 0L
    var h = 0L
    for (t <- text.split("\\s+") if t.nonEmpty)
      h = (h * 1009L + Portable.polyhash31(t) % 1048576L) % Portable.P31
    h
  }

  // ---------- intra-document repetition (Gopher-style) ----------

  /** Executor-side repetition statistics for one document:
    * (n_tokens, dup_token_n, top_token_n, n_2grams, top_2gram_n).
    * `dup_token_n` is the duplicate-token mass (n − |distinct|),
    * `top_token_n` / `top_2gram_n` the count of the most frequent
    * token / word-2-gram. One pass, two hash maps — O(tokens) per doc.
    */
  def repetitionStatsOf(text: String): (Long, Long, Long, Long, Long) = {
    val toks =
      if (text == null) Array.empty[String]
      else text.split("\\s+").filter(_.nonEmpty)
    val n = toks.length.toLong
    val tc = scala.collection.mutable.HashMap.empty[String, Long]
    var topTok = 0L
    var i = 0
    while (i < toks.length) {
      val c = tc.getOrElse(toks(i), 0L) + 1L
      tc(toks(i)) = c
      if (c > topTok) topTok = c
      i += 1
    }
    val gc = scala.collection.mutable.HashMap.empty[String, Long]
    var topG = 0L
    i = 0
    while (i + 1 < toks.length) {
      val g = toks(i) + " " + toks(i + 1)
      val c = gc.getOrElse(g, 0L) + 1L
      gc(g) = c
      if (c > topG) topG = c
      i += 1
    }
    (n, n - tc.size, topTok, math.max(n - 1L, 0L), topG)
  }

  /** Repetition-filter gate (Gopher-style, token-count variant):
    * duplicate-token fraction ≤ 0.3 AND top-2-gram fraction ≤ 0.2,
    * spelled in integers (`10·dup ≤ 3·n`, `5·top2 ≤ n2`) so the gate
    * is bit-reproducible. Empty documents are dropped.
    */
  def repetitionKeep(n: Long, dup: Long, top2: Long, n2: Long): Boolean =
    n > 0L && 10L * dup <= 3L * n && 5L * top2 <= n2

  /** Per-document repetition statistics + the [[repetitionKeep]] gate.
    * Production path is a typed mapPartitions (per-doc hash-map
    * counting in a tight JVM loop — the Column HOF spelling would
    * evaluate interpreted), so this runs scan-local with ZERO shuffle:
    * at 100 TB it is a narrow pass over the corpus, embarrassingly
    * parallel, nothing crosses executors.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val (n, dup, topT, n2, topG) = repetitionStatsOf(t)
        (id, n, dup, topT, n2, topG, repetitionKeep(n, dup, topG, n2))
      })
      .toDF("doc_id", "n_tokens", "dup_token_n", "top_token_n",
        "n_2grams", "top_2gram_n", "rep_keep")
  }

  // ---------- PII scrubbing (C4-style web-corpus cleanup) ----------

  /** PII patterns, restricted to syntax java.util.regex and RE2
    * (DuckDB) evaluate identically on ASCII input — the oracle applies
    * the same literals.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phoneRe = "\\+1 \\d{3}-\\d{4}"

  /** Redact emails, IPv4 addresses, then NANP-style phone numbers with
    * typed placeholders — fixed application ORDER, because redaction
    * is not commutative (the oracle applies the same sequence).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Per-document PII counts (on the RAW text) + fingerprint/length of
    * the redacted text. Pure Column trees — codegen'd, scan-local,
    * zero shuffle; the 100 TB shape is "free with the scan", like the
    * other text gates.
    */
  def piiStats(docs: DataFrame): DataFrame = {
    val red = redactPii(col("text"))
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).cast("long").as("n_phones"),
      md5(red).as("red_fp"),
      length(red).cast("long").as("red_len"))
  }
}
