package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (1L, "new york new york city"),
    (2L, "san francisco and new york"),
    (3L, "york new haven"),
    (4L, "one"),
    (5L, "")).toDF("doc_id", "text")

  /** Scala re-derivation of the bigram table. */
  private def bigramsTruth: Seq[(Long, String, String)] = Seq(
    1L -> "new york new york city",
    2L -> "san francisco and new york",
    3L -> "york new haven",
    4L -> "one",
    5L -> "").flatMap { case (id, t) =>
    val ts = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    ts.zip(ts.drop(1)).map { case (a, b) => (id, a, b) }
  }

  test("docBigrams emits exactly the adjacent pairs; short docs emit none") {
    val got = LangModel.docBigrams(docs, "doc_id", "text")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(got == bigramsTruth.sorted)
    assert(!got.exists(r => r._1 == 4L || r._1 == 5L))
  }

  test("pmiBigrams matches the formula on hand-counted pairs") {
    val pairs = bigramsTruth.map(r => (r._2, r._3))
    val n = pairs.size.toDouble
    val cAb = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val c2 = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = LangModel.pmiBigrams(docs, "doc_id", "text", minCount = 2L)
      .as[(String, String, Long, Double)].collect()
    // only pairs with cnt >= 2 appear ("new york" x3 is the only one)
    assert(got.map(r => (r._1, r._2)).toSet ==
      cAb.filter(_._2 >= 2L).keySet)
    got.foreach { case (a, b, cnt, pmi) =>
      assert(cnt == cAb((a, b)))
      val want = math.log(cnt * n / (c1(a).toDouble * c2(b)))
      val wantR = BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(pmi - wantR) < 1e-9, s"($a,$b): $pmi vs $wantR")
    }
  }

  test("collocation ordering: the true phrase outranks a chance pair") {
    // corpus where "ice cream" always co-occurs but "the a" is incidental
    val d = Seq(
      (1L, "ice cream is good the a b"),
      (2L, "ice cream melts the b a"),
      (3L, "ice cream again the a c")).toDF("doc_id", "text")
    val pmi = LangModel.pmiBigrams(d, "doc_id", "text", minCount = 2L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(pmi(("ice", "cream")) > pmi.getOrElse(("the", "a"), Double.NegativeInfinity))
  }

  test("bigramNll matches the add-one-smoothed formula; short docs absent") {
    val pairs = bigramsTruth.map(r => (r._2, r._3))
    val cAb = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cA = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = pairs.map(_._1).distinct.size.toDouble
    val want = bigramsTruth.groupBy(_._1).view.mapValues { bs =>
      val nll = bs.map { case (_, a, b) =>
        -math.log((cAb((a, b)) + 1.0) / (cA(a) + v))
      }.sum / bs.size
      (bs.size.toLong,
        BigDecimal(nll).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = LangModel.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // 4 and 5 have no bigrams
    got.foreach { case (id, (nb, nll)) =>
      assert(nb == want(id)._1)
      assert(math.abs(nll - want(id)._2) < 1e-9, s"doc $id: $nll vs ${want(id)._2}")
    }
  }

  test("perplexity gate: an out-of-distribution doc scores higher avg_nll") {
    val d = ((1 to 20).map(i => (i.toLong, "alpha beta gamma delta")) :+
      (21L, "zeta eta theta iota")).toDF("doc_id", "text")
    val nll = LangModel.bigramNll(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(nll(21L) > nll(1L),
      s"OOD doc not penalized: ${nll(21L)} <= ${nll(1L)}")
  }

  test("partition-count invariance (4-decimal rounding absorbs sum order)") {
    val a = LangModel.bigramNll(docs.repartition(1), "doc_id", "text")
    val b = LangModel.bigramNll(docs.repartition(7), "doc_id", "text")
    assertSameRows(a, b)
  }
}
