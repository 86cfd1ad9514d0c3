package graft

import graft.ext.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class MixtureSampleSpec extends SparkSpec {

  private def corpus = {
    val sp = spark; import sp.implicits._
    (1L to 600L).map(i => (i, s"d${i % 4}", (i % 37) + 1L))
      .toDF("id", "domain", "chars")
  }

  /** The windowed definition the bucketed implementation must reproduce:
    * keep iff the prefix measure sum (hash order within domain) < budget. */
  private def windowed(df: DataFrame, budgets: Map[String, Long],
                       defaultBudget: Long = 0L): Set[Long] = {
    val budget = budgets.foldLeft(lit(defaultBudget.toDouble)) {
      case (acc, (k, b)) => when(col("domain") === k, lit(b.toDouble)).otherwise(acc)
    }
    val w = Window.partitionBy(col("domain"))
      .orderBy(Curation.hashUnit(col("id")), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cb", coalesce(sum(col("chars").cast("double")).over(w), lit(0.0)))
      .filter(col("__cb") < budget)
      .collect().map(_.getLong(0)).toSet
  }

  test("bucketed selection ≡ the per-domain window definition") {
    val budgets = Map("d0" -> 800L, "d1" -> 1L, "d2" -> 100000L)
    for (buckets <- Seq(1, 7, 64, 4096)) {
      val got = Curation.mixtureSample(corpus, "domain", "id", "chars",
        budgets, defaultBudget = 300L, buckets = buckets)
        .collect().map(_.getLong(0)).toSet
      assert(got == windowed(corpus, budgets, 300L), s"buckets=$buckets")
    }
  }

  test("zero/absent budget drops the domain; huge budget keeps it whole") {
    val got = Curation.mixtureSample(corpus, "domain", "id", "chars",
      Map("d1" -> 1000000L), defaultBudget = 0L)
    val byDomain = got.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain.keySet == Set("d1"))
    assert(byDomain("d1") == 150L) // d1 has 600/4 rows, all kept
  }

  test("a positive budget keeps at least one row, and the crossing row is kept") {
    // budget 1 with every measure > 1: exactly the hash-first row survives
    val got = Curation.mixtureSample(corpus, "domain", "id", "chars",
      Map.empty, defaultBudget = 1L)
    val counts = got.groupBy("domain").count().collect().map(_.getLong(1))
    assert(counts.length == 4 && counts.forall(_ == 1L))
  }

  test("kept measure never exceeds budget by more than the crossing row") {
    val budgets = Map("d0" -> 500L, "d1" -> 500L, "d2" -> 500L, "d3" -> 500L)
    val kept = Curation.mixtureSample(corpus, "domain", "id", "chars", budgets)
    val sums = kept.groupBy("domain").agg(sum("chars").alias("s"),
      max("chars").alias("mx")).collect()
    sums.foreach { r =>
      val (s, mx) = (r.getLong(1), r.getLong(2))
      assert(s < 500L + mx, s"domain ${r.getString(0)}: kept $s, max row $mx")
    }
  }

  test("zero-measure rows: kept inside budget, dropped at/after the cut") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "a", 0L), (2L, "a", 5L), (3L, "a", 0L), (4L, "a", 9L))
      .toDF("id", "domain", "chars")
    for (buckets <- Seq(1, 16, 1024)) {
      val got = Curation.mixtureSample(df, "domain", "id", "chars",
        Map("a" -> 6L), buckets = buckets).collect().map(_.getLong(0)).toSet
      assert(got == windowed(df, Map("a" -> 6L)), s"buckets=$buckets")
    }
  }

  test("negative measure fails loudly") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "a", -3L)).toDF("id", "domain", "chars")
    val e = intercept[Exception] {
      Curation.mixtureSample(df, "domain", "id", "chars", Map("a" -> 10L)).collect()
    }
    assert(e.getMessage.contains("mixtureSample"))
  }

  test("deterministic across runs and output schema = input schema") {
    val budgets = Map("d0" -> 700L)
    val a = Curation.mixtureSample(corpus, "domain", "id", "chars", budgets)
    val b = Curation.mixtureSample(corpus, "domain", "id", "chars", budgets)
    assert(a.schema == corpus.schema)
    assert(a.collect().map(_.getLong(0)).sorted.toSeq ==
      b.collect().map(_.getLong(0)).sorted.toSeq)
  }
}
