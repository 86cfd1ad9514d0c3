package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  // tiny corpus with known token counts
  private def docs = Seq(
    (1L, "spark engine for big data processing"),
    (2L, "polars is a fast dataframe engine engine"),
    (3L, "data data data everywhere"),
    (4L, "completely unrelated text here"),
    (5L, "")).toDF("doc_id", "text")

  /** Independent Scala re-derivation of the BM25 formula over the same
    * whitespace tokenization. */
  private def bm25Truth(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75) = {
    val toks = Seq(
      1L -> "spark engine for big data processing",
      2L -> "polars is a fast dataframe engine engine",
      3L -> "data data data everywhere",
      4L -> "completely unrelated text here",
      5L -> "").map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    toks.map { case (id, ts) =>
      val dl = ts.size.toDouble
      val score = terms.map { term =>
        val tf = ts.count(_ == term).toDouble
        val df = toks.count(_._2.contains(term)).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      id -> BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("bm25TopK matches the independent formula re-derivation") {
    val terms = Seq("data", "engine")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", terms, topK = 5)
      .as[(Long, Double)].collect().toMap
    val want = bm25Truth(terms)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-6, s"doc $id: $s vs ${want(id)}")
    }
  }

  test("ranking: multi-term docs outrank single-term; no-match docs score 0") {
    val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("data", "engine"), 5)
      .as[(Long, Double)].collect()
    val scores = ranked.toMap
    // doc 4 (no match) and doc 5 (empty) score exactly 0
    assert(scores(4L) == 0.0 && scores(5L) == 0.0)
    // every matching doc outranks the zero-score docs
    assert(Seq(1L, 2L, 3L).forall(id => scores(id) > 0.0))
    // order is score desc, id asc — zero-score ties broken by id
    val zeroTail = ranked.dropWhile(_._2 > 0.0).map(_._1).toSeq
    assert(zeroTail == Seq(4L, 5L), s"tie-break order wrong: $zeroTail")
  }

  test("topK truncates to the k best") {
    val top2 = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("data"), 2)
      .as[(Long, Double)].collect()
    assert(top2.length == 2)
    // doc 3 has tf=3 of "data" in 4 tokens — the clear winner
    assert(top2.head._1 == 3L)
  }

  test("rarer term gets higher idf: unique term beats common term at equal tf") {
    // "polars" df=1, "data" df=2 — doc 2's polars hit outweighs doc 1's
    // data hit IF doc lengths were equal; verify via the formula instead
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("polars"), 5)
      .as[(Long, Double)].collect().toMap
    val want = bm25Truth(Seq("polars"))
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-6, s"doc $id: $s vs ${want(id)}")
    }
    assert(got(2L) > 0.0 && got(1L) == 0.0)
  }

  test("plan shape: TakeOrdered top-k, no Window, no explode") {
    val plan = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("data", "engine"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), s"unexpected Window:\n$plan")
    assert(!plan.toLowerCase.contains("generate"), s"unexpected explode:\n$plan")
  }

  test("duplicate query terms are rejected") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "doc_id", "text", Seq("a", "a"), 3)
    }
  }

  test("rrfFuse: hand-computed fusion of two lists, absent docs included") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank", topK = 10, rrfK = 60)
      .as[(Long, Double, Long)].collect().toSeq
    def r(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Seq(
      (20L, r(1.0 / 62 + 1.0 / 61), 2L), // both lists: must win
      (10L, r(1.0 / 61), 1L),
      (40L, r(1.0 / 62), 1L),
      (30L, r(1.0 / 63), 1L))
    assert(got == want, s"$got vs $want")
  }

  test("rrfFuse: topK cut and id tiebreak at equal scores") {
    val a = Seq((5L, 1L), (3L, 1L)).toDF("doc_id", "rank") // same rank in 2 frames
    val got = Retrieval.rrfFuse(Seq(a), "doc_id", "rank", topK = 1)
      .as[(Long, Double, Long)].collect()
    assert(got.length == 1 && got(0)._1 == 3L) // equal score -> lowest id
  }

  test("rrfFuse plan shape: no Window, limit applied") {
    // the final cut may plan as TakeOrderedAndProject or (under AQE with a
    // result stage) as a sort whose limit applies at executeCollect — both
    // are bounded since the INPUT is already N x k rows; what must never
    // appear is a rank Window
    val fused = Retrieval.rrfFuse(Seq(
      (1L to 50L).map(i => (i, i)).toDF("doc_id", "rank"),
      (1L to 50L).map(i => (i + 25L, i)).toDF("doc_id", "rank")),
      "doc_id", "rank", 5)
    assert(!fused.queryExecution.executedPlan.toString.contains("Window"))
    assert(fused.collect().length == 5)
  }
}
