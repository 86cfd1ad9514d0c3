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
}
