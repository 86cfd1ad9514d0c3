package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ranked retrieval over a document corpus: Okapi BM25 scoring for a
 * fixed query-term set (Robertson & Spärck Jones probabilistic
 * relevance framework — the standard lexical baseline next to the
 * embedding ANN path in [[Similarity]]).
 *
 * 100 TB design:
 *  - tokenization is staged ONCE per document (one narrow projection,
 *    whole-stage codegen; see the TextAnalysis `...Of` kernel note);
 *  - per-term tf is computed against the staged token array with
 *    `size(filter(...))` — per-row, NO explode, NO (doc x term) shuffle;
 *  - corpus statistics (N, sum dl, per-term document frequencies) reduce
 *    in ONE partial-aggregatable pass to a single row that joins back as
 *    a broadcast scalar — the only exchange in the whole plan;
 *  - the top-k is `orderBy().limit()` → TakeOrderedAndProject, a bounded
 *    per-partition heap + driver merge of k rows, never a global sort.
 *
 * Determinism (what makes it oracle-checkable): tf, dl, df, N are exact
 * integers; avgdl is sum(dl)/N with an EXACT long numerator; idf uses
 * the +1-smoothed form ln(1 + (N - df + 0.5)/(df + 0.5)) (non-negative,
 * Lucene-style); the final score sums the per-term contributions in the
 * caller's term order and is rounded to 6 decimals on both sides.
 */
object Retrieval {

  /** Per-term BM25 contribution given staged token array `toks`, doc
    * length `dl`, and broadcast scalars. */
  private def termScore(toks: Column, dl: Column, term: String,
                        dfT: Column, nDocs: Column, sumDl: Column,
                        k1: Double, b: Double): Column = {
    val tf = size(filter(toks, t => t === lit(term))).cast("double")
    val idf = log(lit(1.0) + (nDocs.cast("double") - dfT + lit(0.5)) / (dfT + lit(0.5)))
    val avgdl = sumDl.cast("double") / nDocs.cast("double")
    val norm = lit(k1) * (lit(1.0) - lit(b) + lit(b) * dl.cast("double") / avgdl)
    idf * tf * (lit(k1) + 1.0) / (tf + norm)
  }

  /**
   * BM25 top-k: the `topK` highest-scoring documents for `queryTerms`
   * (ties broken by ascending id). Output: (idCol, score) with score
   * rounded to 6 decimals. Documents matching no term score 0 and are
   * still rankable (standard BM25: the query's OR-semantics).
   *
   * Tokenization = whitespace tokens of the NFC-normalized, lowercased
   * text — the same corpus tokenization as q_vocab_topk, so corpus stats
   * line up across the text operators.
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], topK: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(queryTerms.distinct == queryTerms, "duplicate query terms")
    val staged = docs.select(
      col(idCol),
      TextAnalysis.tokens(TextAnalysis.normalized(col(textCol))).alias("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("long"))
    // ONE corpus-stats pass: N, sum(dl), and df per query term (count of
    // docs containing the term) — all partial-aggregatable sums.
    val statAggs =
      count(lit(1)).alias("__n") +: sum(col("__dl")).alias("__sumdl") +:
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("__toks"), t), 1L).otherwise(0L)).alias(s"__df_$i")
      }
    val stats = staged.agg(statAggs.head, statAggs.tail: _*)
    val scored = staged.crossJoin(broadcast(stats))
    val score = queryTerms.zipWithIndex.map { case (t, i) =>
      termScore(col("__toks"), col("__dl"), t, col(s"__df_$i").cast("double"),
        col("__n"), col("__sumdl"), k1, b)
    }.reduce(_ + _)
    scored.select(col(idCol), round(score, 6).alias("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
  }

  /**
   * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009): fuse
   * N ranked lists into one by `score(d) = Σ_lists 1/(rrfK + rank_d)` —
   * the standard way to combine the lexical ([[bm25TopK]]) and semantic
   * ([[Similarity.bruteForceTopK]]/ivf/pq) retrieval paths without score
   * calibration, since only RANKS enter the formula.
   *
   * Input frames carry (idCol, rankCol) with rank 1-based; a document
   * absent from a list simply contributes nothing for it (the standard
   * RRF convention). Output: (idCol, rrf_score, n_lists) — the fused
   * top-k by (score DESC, id ASC), score rounded to 6 decimals.
   *
   * Scale shape: the inputs are already top-k-bounded lists, so the
   * union + groupBy shuffles N×k rows regardless of corpus size, and the
   * final cut is `orderBy().limit()` → TakeOrderedAndProject (bounded
   * heap, no global sort). Determinism note: with ≤2 lists the fp sum is
   * order-free (double addition is commutative); beyond that the 6-dp
   * rounding absorbs association drift for any realistic rrfK.
   */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              topK: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    val tagged = rankings.map(_.select(col(idCol),
      col(rankCol).cast("long").alias("__rank")))
    tagged.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(round(sum(lit(1.0) / (lit(rrfK.toDouble) + col("__rank"))), 6)
          .alias("rrf_score"),
        count(lit(1)).alias("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK)
  }
}
