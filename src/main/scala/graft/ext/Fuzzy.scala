package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fuzzy (edit-distance) joins for entity resolution over SHORT strings —
 * names, titles, codes — via the SymSpell deletion neighborhood: if
 * `levenshtein(a, b) <= k` then deleting at most `k` characters from each
 * side yields a COMMON string (every edit op is repaired by one deletion
 * on one side), so blocking on the deletion variants has provably TOTAL
 * recall and the exact `levenshtein` verify on candidates makes the join
 * exact.
 *
 * Scale shape: variants explode map-side (|s|^k per row — the operator is
 * scoped to short strings), candidates form via an EQUI-join on the
 * variant (keyed shuffle, AQE-handled), then one distinct + one
 * `levenshtein` per candidate pair. No cartesian anywhere. Caveat: very
 * common variants (e.g. 1-2 char strings) fan out; pre-filter degenerate
 * keys if the corpus has them.
 */
object Fuzzy {

  /** One-deletion neighborhood of `s` (NOT including `s` itself):
    * every string obtained by deleting exactly one character. */
  private def deleteOne(s: Column): Column =
    transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))

  /** All strings obtainable from `s` by deleting AT MOST `k` characters
    * (k in 0..2), including `s` itself; deduplicated. Empty/short strings
    * degrade gracefully (deleting from "" yields nothing new). */
  def deletionVariants(s: Column, k: Int): Column = {
    require(k >= 0 && k <= 2, s"deletion distance 0..2 supported, got $k")
    var acc = array(s)
    (1 to k).foreach { _ =>
      val grown = array_union(acc,
        flatten(transform(acc, v =>
          when(length(v) >= 1, deleteOne(v)).otherwise(array()))))
      acc = grown
    }
    acc
  }

  /** Exact edit-distance join: all pairs with
    * `levenshtein(leftStr, rightStr) <= maxDist`. Output:
    * (lid, rid, ls, rs, dist). Total recall by the deletion-neighborhood
    * pigeonhole; exactness by the final verify. For a self-join pass the
    * same frame twice and filter `lid < rid` on the result. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                leftId: String, leftStr: String,
                rightId: String, rightStr: String,
                maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 2,
      s"maxDist 0..2 supported, got $maxDist")
    val q = (n: String) => graft.ColName.quote(n)
    val lv = left.select(col(q(leftId)).alias("lid"), col(q(leftStr)).alias("ls"))
      .withColumn("__v", explode(deletionVariants(col("ls"), maxDist)))
    val rv = right.select(col(q(rightId)).alias("rid"), col(q(rightStr)).alias("rs"))
      .withColumn("__v", explode(deletionVariants(col("rs"), maxDist)))
    lv.join(rv, "__v")
      .select(col("lid"), col("rid"), col("ls"), col("rs"))
      .distinct() // a pair can match through many variants — verify ONCE
      .withColumn("dist", levenshtein(col("ls"), col("rs")))
      .filter(col("dist") <= maxDist)
  }
}
