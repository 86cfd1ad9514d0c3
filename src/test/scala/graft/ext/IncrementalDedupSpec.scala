package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  // 2-shingle Jaccard fixture, threshold 0.35:
  //  - d100 ≈ c1 (0.6)                      → rejected by corpus
  //  - d101 ≈ d102 (high)                   → d101 kept, d102 rejected
  //  - d103 unique                          → kept
  //  - d104 ≈ c2 (0.375), d105 ≈ c2 (0.375), d104 vs d105 = 0.273 < thr
  //    → BOTH rejected: the corpus doc bridges them into a mixed
  //    component (the case that proves corpus-delta pairs must feed the
  //    clustering even though corpus-corpus pairs are skipped)
  private val Thr = 0.35
  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "one two three four five"),
    (3L, "totally different words here now")).toDF("doc_id", "text")
  private def delta = Seq(
    (100L, "alpha beta gamma delta zeta"),
    (101L, "red orange yellow green blue indigo"),
    (102L, "red orange yellow green blue violet"),
    (103L, "unique standalone content nothing shared"),
    (104L, "one two three four six seven eight nine"),
    (105L, "ten one two three four eleven twelve thirteen"))
    .toDF("doc_id", "text")

  private def incr = Dedup.incrementalNearDup(corpus, delta, "text", "doc_id",
    threshold = Thr, shingleN = 2, numHashes = 128, bands = 128)

  test("survivors: corpus dups and transitive-via-corpus dups rejected") {
    val keep = incr.as[Long].collect().toSet
    assert(keep == Set(101L, 103L),
      s"expected {101, 103}, got $keep")
  }

  test("≡ full nearDupSurvivors(corpus ∪ delta) restricted to delta ids") {
    val full = Dedup.nearDupSurvivors(corpus.unionByName(delta), "text",
        "doc_id", threshold = Thr, shingleN = 2, numHashes = 128, bands = 128)
      .filter(col("doc_id") >= 100L)
    assertSameRows(incr, full)
  }

  test("empty corpus degenerates to plain survivors of the delta") {
    val none = corpus.filter(lit(false))
    val got = Dedup.incrementalNearDup(none, delta, "text", "doc_id",
      Thr, 2, 128, 128)
    val want = Dedup.nearDupSurvivors(delta, "text", "doc_id", Thr, 2, 128, 128)
    assertSameRows(got, want)
  }

  test("id-ordering precondition is validated") {
    val badCorpus = Seq((500L, "alpha beta gamma")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.incrementalNearDup(badCorpus, delta, "text", "doc_id", Thr, 2, 128, 128)
        .collect()
    }
  }

  test("delta doc identical to a corpus doc is rejected; corpus stays untouched") {
    val d = Seq((200L, "one two three four five"), // byte-identical to c2
      (201L, "fresh novel text entirely")).toDF("doc_id", "text")
    val keep = Dedup.incrementalNearDup(corpus, d, "text", "doc_id",
      Thr, 2, 128, 128).as[Long].collect().toSet
    assert(keep == Set(201L))
  }
}
