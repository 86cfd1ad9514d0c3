package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-statistical language modeling for training-data curation:
 * PMI collocation mining (phrase detection) and a self-trained bigram
 * language-model perplexity filter (the model-free stand-in for the
 * classic KenLM quality gate — no external model artifact, the corpus
 * scores itself).
 *
 * 100 TB design: every statistic starts from ONE map-side bigram
 * explode (≈ 1 row per corpus token) that immediately partial-aggregates
 * to PAIR COUNTS — from there on, every join and aggregation is
 * vocabulary-bounded (pairs, unigrams), never corpus-bounded. The only
 * corpus-sized exchange in the perplexity path is the per-doc score
 * join, which carries (doc_id, bigram) pairs — narrow rows, partial-agg
 * reduced before the join where possible.
 *
 * Determinism: all counts are exact integers; `ln` enters only in the
 * final projection; scores are rounded (PMI to 6 dp; per-doc NLL to 4 dp
 * — a per-doc float sum is engine-order-dependent at ~1e-12, so 4 dp
 * leaves 8 orders of magnitude of slack) so DuckDB re-derives them
 * bit-identically.
 */
object LangModel {

  /** (doc_id, w1, w2) bigram rows from the corpus tokenization (same
    * normalization as q_vocab_topk): zip the token array with its own
    * tail, explode map-side. */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val staged = docs.select(col(idCol),
      TextAnalysis.tokens(TextAnalysis.normalized(col(textCol))).alias("__toks"))
    staged
      .select(col(idCol), explode(arrays_zip(
        slice(col("__toks"), lit(1), greatest(size(col("__toks")) - 1, lit(0))),
        slice(col("__toks"), lit(2), greatest(size(col("__toks")) - 1, lit(0)))
      )).alias("__bg"))
      .select(col(idCol), col("__bg.0").alias("w1"), col("__bg.1").alias("w2"))
  }

  /**
   * Pointwise mutual information over corpus bigrams:
   * `pmi(a,b) = ln(c_ab * N / (c_a* * c_*b))` where all four counts are
   * taken over the SAME bigram table (c_a* = a as first element,
   * c_*b = b as second) — one consistent probability space, no
   * doc-boundary edge cases. Pairs below `minCount` are dropped BEFORE
   * the stat joins (rare-pair PMI is noise, and the filter keeps the
   * join inputs dense). Output: (w1, w2, cnt, pmi·6dp).
   */
  def pmiBigrams(docs: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 5L): DataFrame = {
    val pairs = docBigrams(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).alias("cnt"))
    // vocabulary-sized derivations off the pair table — no second corpus
    // scan, and each is partial-aggregatable
    val firsts = pairs.groupBy("w1").agg(sum("cnt").alias("c1"))
    val seconds = pairs.groupBy("w2").agg(sum("cnt").alias("c2"))
    val total = pairs.agg(sum("cnt").alias("n_bigrams"))
    pairs.filter(col("cnt") >= minCount)
      .join(firsts, "w1").join(seconds, "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("cnt"),
        round(log(col("cnt").cast("double") * col("n_bigrams")
          / (col("c1").cast("double") * col("c2"))), 6).alias("pmi"))
  }

  /**
   * Per-document mean negative log-likelihood under the corpus's own
   * add-one-smoothed bigram LM: `P(b|a) = (c_ab + 1) / (c_a* + V)` with
   * V = distinct tokens appearing as a bigram FIRST element. Documents
   * with fewer than 2 tokens have no bigrams — no evidence — and are
   * absent from the output.
   * Output: (idCol, n_bigrams, avg_nll·4dp). High avg_nll = improbable
   * text under the corpus distribution — the perplexity quality gate.
   *
   * Scale shape: the LM (pair counts + first-counts + V scalar) is
   * vocabulary-bounded; the per-doc join streams (doc_id, w1, w2, k)
   * rows — k pre-reduced per (doc, bigram) so repeated bigrams join
   * once, then ONE per-doc aggregation.
   */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docBigrams(docs, idCol, textCol)
    val lm = bg.groupBy("w1", "w2").agg(count(lit(1)).alias("c_ab"))
    val firsts = lm.groupBy("w1").agg(sum("c_ab").alias("c_a"))
    val vocab = lm.select(countDistinct(col("w1")).alias("v"))
    // pre-reduce: each (doc, bigram) joins the LM once with multiplicity k
    val docPairs = bg.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).alias("k"))
    docPairs
      .join(lm, Seq("w1", "w2"))
      .join(firsts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("__nll", -col("k") * log(
        (col("c_ab").cast("double") + 1.0) / (col("c_a").cast("double") + col("v"))))
      .groupBy(col(idCol))
      .agg(sum("k").alias("n_bigrams"),
        round(sum(col("__nll")) / sum(col("k")), 4).alias("avg_nll"))
  }
}
