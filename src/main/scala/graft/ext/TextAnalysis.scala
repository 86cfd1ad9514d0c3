package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * language-ID (stopword-hit heuristic), quality scoring, token counting,
 * and document fingerprinting.
 *
 * 100 TB design: every operator is a narrow, per-row Column expression —
 * no shuffles, no UDFs, fully inside whole-stage codegen. A pipeline
 * applying all of them is a single scan → project over the corpus; filters
 * on the derived columns push down nothing extra but fuse into the same
 * stage.
 */
object TextAnalysis {

  /** Whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Whitespace token count (0 for null text — a missing doc has no
    * tokens, and under ANSI `size(null)` is null, which would otherwise
    * leak through every ratio built on top of this). */
  def tokenCount(text: Column): Column =
    when(text.isNull, 0L).otherwise(size(tokens(text)).cast("long"))

  /** BPE-ish subword count approximation: runs of letters, digits, or
    * single non-alphanumeric marks — the usual pre-tokenizer split. */
  def bpeTokenCountApprox(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long")

  /** Ratio of punctuation/symbol chars to total chars (0 for empty or
    * null text). */
  def punctRatio(text: Column): Column =
    when(text.isNull || length(text) === 0, 0.0).otherwise(
      regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") / length(text))

  /** Default English stopword sample used by the heuristics. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that")

  /** [[stopwordRatio]] over a precomputed LOWERCASED token array. The
    * `...Of` kernels exist because Spark's higher-order functions are
    * interpreted (CodegenFallback) — codegen subexpression elimination
    * never deduplicates repeated `tokens(...)` subtrees, so multi-metric
    * queries should stage the token array in its own projection once and
    * pass it here by reference (see q_text_quality / repetitionStats). */
  def stopwordRatioOf(toks: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    when(toks.isNull || size(toks) === 0, 0.0)
      .otherwise(hits.cast("double") / size(toks))
  }

  /** Fraction of tokens that are stopwords (null-safe, 0 for empty docs). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    stopwordRatioOf(tokens(lower(text)), stopwords)

  /** [[meanTokenLength]] over a precomputed token array. */
  def meanTokenLengthOf(toks: Column): Column =
    when(toks.isNull || size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))

  /** Mean token length (0 for empty or null docs). */
  def meanTokenLength(text: Column): Column = meanTokenLengthOf(tokens(text))

  /**
   * Composite quality score in [0,1]: rewards documents that are long
   * enough, mostly alphanumeric, and contain function words — the standard
   * cheap pre-filter before expensive model-based scoring. Deterministic
   * and SQL-expressible so it can be oracle-checked.
   *
   *   0.25 * min(n_tokens/100, 1)     — length signal
   * + 0.25 * (1 - min(punct_ratio*5, 1)) — symbol-noise signal
   * + 0.25 * min(stopword_ratio*4, 1) — naturalness signal
   * + 0.25 * clamp((mean_tok_len-2)/8) — vocabulary signal
   */
  /** [[qualityScore]] over precomputed lowercased + original-case token
    * arrays (`toksLower` feeds the stopword signal, `toksOrig` the length
    * signals — lengths are computed on the ORIGINAL text so exotic
    * case-mapping expansions cannot shift them).
    *
    * INVARIANT (caller-checked): `toksLower` and `toksOrig` must both be
    * tokenizations of this same `text` — `tokens(lower(text))` and
    * `tokens(text)` respectively. The null guard keys off `text` while
    * the signals key off the arrays, so a mismatched caller gets silently
    * skewed scores, not an error. Callers that don't already hold staged
    * token arrays should use [[qualityScore]], which derives both. */
  def qualityScoreOf(text: Column, toksLower: Column, toksOrig: Column,
                     stopwords: Seq[String] = EnglishStopwords): Column = {
    val lengthS = least(coalesce(size(toksOrig).cast("double"), lit(0.0)) / 100.0, lit(1.0))
    val punctS = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopS = least(stopwordRatioOf(toksLower, stopwords) * 4.0, lit(1.0))
    val vocabS = greatest(least((meanTokenLengthOf(toksOrig) - 2.0) / 8.0, lit(1.0)), lit(0.0))
    // truncate, don't round: the *0.25 makes exact binary .5 boundaries
    // common, where round-half-up (Spark) and half-even (DuckDB) disagree.
    // Null text scores 0 (fails any quality gate) — least/greatest SKIP
    // null arguments, so without the guard a missing doc would score 0.75
    when(text.isNull, 0.0).otherwise(
      floor((lengthS + punctS + stopS + vocabS) * 0.25 * 1e6) / 1e6)
  }

  def qualityScore(text: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    qualityScoreOf(text, tokens(lower(text)), tokens(text), stopwords)

  /**
   * Per-document Shannon token entropy (nats): H = −Σ p_i · ln(p_i) over
   * the doc's token distribution — the diversity signal the dup-fraction
   * heuristics miss (a doc cycling 3 tokens has LOW entropy but may dodge
   * fixed-n dup-gram thresholds). Returns (idCol, n_tokens, entropy·4dp);
   * docs with no tokens are absent.
   *
   * Scale shape: one map-side explode reduces straight to (doc, token)
   * counts, then ONE per-doc aggregation folds them into the entropy —
   * both partial-aggregatable, shuffles carry counts, never token text
   * beyond the first. Deliberately NOT a per-row HOF (counting each
   * token's occurrences inside the array is O(len²) per doc — fine at 50
   * tokens, quadratic pain at book-length documents).
   */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol),
        explode(tokens(normalized(col(textCol)))).alias("__t"))
      .groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).alias("__c"))
    counts.groupBy(col(idCol))
      .agg(sum("__c").alias("n_tokens"),
        round(
          log(sum(col("__c")).cast("double"))
            - sum(col("__c").cast("double") * log(col("__c").cast("double")))
              / sum(col("__c")).cast("double"),
          4).alias("entropy"))
  }

  /** Language marker words for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "avec"),
    "es" -> Seq("el", "la", "los", "y", "es", "con"))

  /** Per-language marker-hit count over a precomputed lowercased token
    * array. */
  def langScoreOf(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers))).cast("long")

  /** Per-language marker-hit count. */
  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreOf(tokens(lower(text)), markers)

  /** Heuristic language ID: argmax of marker-hit counts; "und" when no
    * marker hits at all. Ties break in LangMarkers order (en first) —
    * deterministic, so oracle-checkable.
    *
    * Implemented as an `array_sort` argmax over (−score, rank, lang)
    * structs: each langScore appears exactly once in the expression tree.
    * A when/otherwise max-fold would embed earlier scores twice per step —
    * 2^langs copies of the tokenization pipeline. */
  /** [[langId]] over a precomputed lowercased token array. */
  def langIdOf(toks: Column, markers: Seq[(String, Seq[String])] = LangMarkers): Column = {
    val entries = markers.zipWithIndex.map { case ((lang, ms), i) =>
      struct((-langScoreOf(toks, ms)).alias("neg"), lit(i).alias("rank"),
        lit(lang).alias("lang"))
    }
    val best = get(array_sort(array(entries: _*)), lit(0))
    // null text propagates null scores; null >= 0 is null (falsy) and would
    // fall through to "en" — classify null/absent text as "und" explicitly
    when(toks.isNull || best.getField("neg") >= 0, "und")
      .otherwise(best.getField("lang"))
  }

  def langId(text: Column, markers: Seq[(String, Seq[String])] = LangMarkers): Column =
    langIdOf(tokens(lower(text)), markers)

  /** All word n-grams of `toks` IN ORDER, duplicates preserved (a doc with
    * fewer than n tokens yields its single joined gram). Built by n-1
    * zip_with folds — zip_with pads the shorter side with null, so after
    * the folds the first `len-n+1` entries are complete n-grams and the
    * tail is null; the slice drops the tail. Per-row, codegen-friendly,
    * no shuffle. */
  def ngramsOf(toks: Column, n: Int): Column = graft.ColExprs.once(toks) { t =>
    // let-bound: the fold below references the token array ~2n+2 times
    // (sizes, slices, the when-branch), and when the caller passes a
    // COMPUTED tokenization — ngramsAll does — each reference would
    // re-evaluate the regex pipeline (HOFs are interpreted, no codegen CSE)
    val count = size(t) - (n - 1)
    val grams = (1 until n).foldLeft(t) { (acc, k) =>
      zip_with(acc, slice(t, lit(k + 1), greatest(size(t) - k, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(count <= 0, array(concat_ws(" ", t))).otherwise(slice(grams, lit(1), count))
  }

  /** All word n-grams of the normalized text, duplicates preserved. */
  def ngramsAll(text: Column, n: Int): Column = ngramsOf(tokens(normalized(text)), n)

  /** Canonical text: lowercase, collapse whitespace, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** HTML → text: drop script/style blocks and comments wholesale, strip
    * remaining tags, decode the six ubiquitous entities, collapse
    * whitespace — the regex-tier boilerplate cleaner every crawl pipeline
    * runs before quality scoring (a full DOM extractor is out of scope;
    * this is the deterministic 95% that is also cross-engine derivable:
    * every pattern below is RE2-compatible, no backreferences, so a SQL
    * oracle can restate it verbatim). Entity order matters: `&amp;` is
    * decoded LAST so `&amp;lt;` yields the literal `&lt;`, not `<`
    * (single-pass decoding, the standard non-recursive rule). Pure
    * per-row projection — zero shuffles at any corpus size. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Content fingerprint: md5 of the normalized text — md5 exists in both
    * Spark and DuckDB so exact-dedup results are oracle-checkable. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Rolling-hash fingerprint (polynomial over tokens mod a 31-bit prime —
    * ANSI-safe, no long overflow) for shift-tolerant near-dup grouping:
    * order-sensitive but whitespace-normalization-insensitive. */
  def rollingHash(text: Column): Column = {
    val p = lit(1000000007L)
    aggregate(tokens(normalized(text)), lit(1469598103L),
      (acc, t) => pmod(acc * 31L + pmod(xxhash64(t), p), p))
  }

  /** One-pass per-document stats frame. */
  def docStats(df: DataFrame, textCol: String): DataFrame =
    df.select(col("*"),
      tokenCount(col(textCol)).alias("n_tokens"),
      bpeTokenCountApprox(col(textCol)).alias("n_subtokens"),
      round(punctRatio(col(textCol)), 6).alias("punct_ratio"),
      round(stopwordRatio(col(textCol)), 6).alias("stopword_ratio"),
      qualityScore(col(textCol)).alias("quality"),
      langId(col(textCol)).alias("lang_pred"),
      fingerprint(col(textCol)).alias("fingerprint"))
}
