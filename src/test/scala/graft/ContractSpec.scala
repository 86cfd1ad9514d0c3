package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: the correctness gate compares
  * oracle SQL by query NAME and hashes columns sorted by NAME, so a typo'd
  * oracle key or duplicate/empty column list silently weakens or breaks the
  * gate. Fail here instead. */
class ContractSpec extends AnyFunSuite with SparkSpec {

  test("every oracle key references an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query plans at sf0.001 with unique non-empty column names") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      val cols = df.schema.fieldNames.toSeq
      assert(cols.nonEmpty, s"$name has no columns")
      assert(cols.distinct.size == cols.size, s"$name has duplicate columns: $cols")
    }
  }

  test("every query has an oracle (no rows-only gaps)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // round 2 closed the hash-dependent set with strategy-equivalence
    // queries (minhash ≡ exact Jaccard, exact-mode IVF ≡ brute force,
    // pigeonhole simhash ≡ exhaustive, md5-derived multimodal features)
    assert(rowsOnly.isEmpty, s"queries without an oracle: $rowsOnly")
  }
}
