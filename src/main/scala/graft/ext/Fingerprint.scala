package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
 * the MOSS algorithm): hash every token k-gram, slide a window of w
 * consecutive gram hashes over the document, and keep each window's
 * MINIMUM hash. The selected set is a position-robust fingerprint with
 * the winnowing guarantee: any shared run of at least w+k-1 tokens
 * between two documents yields at least one shared fingerprint, while
 * the expected density is only 2/(w+1) of the grams — the standard
 * local fingerprinting scheme for overlap/plagiarism detection, used
 * here as the shift-tolerant complement to [[Dedup.minhashNearDuplicates]]
 * (which estimates whole-document Jaccard, not local overlap).
 *
 * Reference behavior modeled: the fingerprint/near-dup surface of
 * polars-nexpresso's dedup benchmarks (benchmarks/dedup_bench.py) — the
 * reference has no winnowing operator; this is the scale-path extension
 * the task brief's "document fingerprinting (rolling hash)" line asks
 * for, expressed Spark-first.
 *
 * Scale shape: fingerprint extraction is a pure per-row projection
 * (zero shuffles — HOF chain over the token array, each computed value
 * let-bound via [[graft.ColExprs.once]] so nothing re-evaluates per
 * element). The pair phase is the banded-join shape shared with
 * MinHash/SimHash: explode → one (fp) groupBy for document frequency
 * (map-side combinable; a boilerplate fingerprint in a billion docs
 * crosses the wire as one partial count per map partition) → frequency
 * cap drops degenerate fingerprints BEFORE the self-join, bounding the
 * join's per-key fan-out by `maxDocFreq`², exactly like the hot-bucket
 * cap in the LSH path.
 *
 * Cross-engine exactness: gram hashes are the first 15 hex chars of
 * md5 parsed as a 60-bit integer — md5 is the one hash Spark and DuckDB
 * compute identically, so fingerprint VALUES (not just equivalence
 * classes) are oracle-checkable.
 */
object Fingerprint {

  /** 60-bit gram hash both engines can derive: md5 hex prefix → BIGINT.
    * (DuckDB: `('0x' || substr(md5(g), 1, 15))::BIGINT`.) */
  private[ext] def gramHash(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long")

  /** The winnowing fingerprint set of `text` as a sorted distinct
    * `array<long>`: token k-grams ([[TextAnalysis.ngramsOf]] — zip_with
    * form, tokenization evaluated once), md5-derived 60-bit hashes, then
    * the minimum of every w-window of consecutive gram hashes. A doc with
    * fewer than k tokens contributes its single joined gram; fewer grams
    * than w → one window over all of them (both engines agree: slicing
    * past the end truncates). Tie values inside a window collapse in the
    * distinct set, so no tie-break rule is needed for value identity. */
  def winnowFingerprints(text: Column, k: Int = 5, w: Int = 4): Column = {
    require(k >= 1, s"winnowFingerprints: k must be >= 1, got $k")
    require(w >= 1, s"winnowFingerprints: w must be >= 1, got $w")
    val grams = TextAnalysis.ngramsOf(
      TextAnalysis.tokens(TextAnalysis.normalized(text)), k)
    val hashes = transform(grams, g => gramHash(g))
    graft.ColExprs.once(hashes) { h =>
      val nWin = greatest(size(h) - (w - 1), lit(1))
      array_sort(array_distinct(
        transform(sequence(lit(1), nWin), i => array_min(slice(h, i, lit(w))))))
    }
  }

  /** Per-document fingerprint summary — (id, n_grams, n_fps, fp_min,
    * fp_max), all integral and order-free, so the row set is
    * hash-comparable across engines. One narrow scan, zero shuffles. */
  def winnowStats(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 5, w: Int = 4): DataFrame = {
    val grams = TextAnalysis.ngramsOf(
      TextAnalysis.tokens(TextAnalysis.normalized(col(textCol))), k)
    df.select(col(idCol),
        winnowFingerprints(col(textCol), k, w).alias("__fp"),
        size(grams).cast("long").alias("n_grams"))
      .select(col(idCol), col("n_grams"),
        size(col("__fp")).cast("long").alias("n_fps"),
        array_min(col("__fp")).alias("fp_min"),
        array_max(col("__fp")).alias("fp_max"))
  }

  /** Document pairs sharing at least `minShared` winnowing fingerprints —
    * the local-overlap candidate generator. Fingerprints held by more
    * than `maxDocFreq` documents are boilerplate and are dropped BEFORE
    * the self-join (two-pass frequency cap, not a window — see
    * [[Dedup]] hot-bucket rationale), so per-fingerprint join fan-out is
    * bounded. Output: (id_a, id_b, n_shared) with id_a < id_b. */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 5, w: Int = 4, minShared: Int = 2,
                  maxDocFreq: Int = 100): DataFrame = {
    require(minShared >= 1, s"winnowPairs: minShared must be >= 1, got $minShared")
    require(maxDocFreq >= 2, s"winnowPairs: maxDocFreq must be >= 2, got $maxDocFreq")
    // fence: fingerprints compute once pre-shuffle (the shingleFrame
    // idiom); the id-hash exchange is reused by both join sides
    val fps = df
      .select(col(idCol).alias("__id"),
        winnowFingerprints(col(textCol), k, w).alias("__fp"))
      .repartition(col("__id"))
      .select(col("__id"), explode(col("__fp")).alias("fp"))
    // document frequency per fingerprint: map-side combinable partial agg;
    // only fingerprints shared by >= 2 docs (and <= maxDocFreq) can form
    // pairs, so everything else is dropped before the join
    val eligible = fps.groupBy(col("fp"))
      .agg(count(lit(1)).alias("__df"))
      .filter(col("__df") >= 2 && col("__df") <= maxDocFreq)
      .select(col("fp"))
    val matched = fps.join(eligible, Seq("fp"))
    val a = matched.select(col("fp"), col("__id").alias("id_a"))
    val b = matched.select(col("fp"), col("__id").alias("id_b"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).alias("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
