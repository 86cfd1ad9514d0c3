package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class FuzzySpec extends SparkSpec {

  private def frame(pairs: Seq[(Long, String)], id: String, s: String) =
    spark.createDataFrame(
      pairs.map { case (i, v) => Row(i, v) }.asJava,
      StructType(Seq(StructField(id, LongType), StructField(s, StringType))))

  test("deletionVariants: exact neighborhoods for k = 0, 1, 2") {
    val df = frame(Seq((1L, "abc")), "id", "s")
    def vars(k: Int) = df.select(Fuzzy.deletionVariants(col("s"), k).alias("v"))
      .collect()(0).getSeq[String](0).toSet
    assert(vars(0) == Set("abc"))
    assert(vars(1) == Set("abc", "bc", "ac", "ab"))
    assert(vars(2) == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
  }

  test("deletionVariants: empty and single-char strings degrade gracefully") {
    val df = frame(Seq((1L, ""), (2L, "x")), "id", "s")
    val out = df.select(col("id"), Fuzzy.deletionVariants(col("s"), 2).alias("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(out(1L) == Set(""))
    assert(out(2L) == Set("x", ""))
  }

  // words engineered so substitutions, insertions, deletions, and
  // unrelated strings all occur
  private val corpus = Seq(
    1L -> "kitten", 2L -> "sitten", 3L -> "sittin", 4L -> "kittens",
    5L -> "mitten", 6L -> "kitte", 7L -> "flamingo", 8L -> "flamingos",
    9L -> "abc", 10L -> "xyz")

  test("fuzzyJoin ≡ exhaustive levenshtein pairs at k = 1 and k = 2") {
    val l = frame(corpus, "id_a", "sa")
    val r = frame(corpus.map { case (i, s) => (i + 100, s) }, "id_b", "sb")
    (1 to 2).foreach { k =>
      val fuzzy = Fuzzy.fuzzyJoin(l, r, "id_a", "sa", "id_b", "sb", k)
        .select(col("lid"), col("rid")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val exhaustive = l.crossJoin(r)
        .filter(levenshtein(col("sa"), col("sb")) <= k)
        .select(col("id_a"), col("id_b")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(fuzzy == exhaustive, s"k=$k")
      // sanity: the blocking actually finds cross-string matches
      if (k == 1) assert(fuzzy.contains((1L, 105L)), "kitten↔mitten at k=1")
    }
  }

  test("reported dist is the exact levenshtein distance") {
    val l = frame(Seq(1L -> "kitten"), "id_a", "sa")
    val r = frame(Seq(2L -> "sitten", 3L -> "kitten"), "id_b", "sb")
    val out = Fuzzy.fuzzyJoin(l, r, "id_a", "sa", "id_b", "sb", 1)
      .collect().map(x => x.getLong(1) -> x.getInt(4)).toMap
    assert(out == Map(2L -> 1, 3L -> 0))
  }

  test("no cartesian in the plan: candidates form via an equi-join on the variant") {
    val l = frame(corpus, "id_a", "sa")
    val r = frame(corpus, "id_b", "sb")
    val plan = Fuzzy.fuzzyJoin(l, r, "id_a", "sa", "id_b", "sb", 2)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.toLowerCase.contains("crossjoin"),
      plan)
  }
}
