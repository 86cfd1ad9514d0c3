package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.StatsResetShim

/** Regression pin for the Spark 4 localCheckpoint stats-compounding
  * hazard (VERDICT r13 #3). StatsResetShim is load-bearing for every
  * iterative checkpoint loop in the repo (connected components, incremental
  * dedup) yet reaches a private[sql] API by construction — so the behavior
  * it exists to fix, and the fix itself, are pinned here where a Spark
  * minor bump fails LOUDLY instead of hanging a 100 TB driver in
  * million-digit BigInteger multiplication ten rounds into a CC loop.
  *
  * Loop shape mirrors Dedup.connectedComponents: each round 1:1-self-joins
  * the current frame (row count CONSTANT — only the stats estimate can
  * grow, since the size-only visitor estimates every join as the product
  * of its children's sizeInBytes) and re-checkpoints. */
class ShimSpec extends SparkSpec {

  private def seed: DataFrame = spark.range(64)
    .select(col("id").alias("a"), (col("id") % 8).alias("b"))

  /** One CC-shaped round: 1:1 equi-join on the unique key, same schema out. */
  private def round(cur: DataFrame): DataFrame = cur
    .join(cur.select(col("a"), col("b").alias("b2")), Seq("a"))
    .select(col("a"), greatest(col("b"), col("b2")).alias("b"))

  private def statsDigits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.toString.length

  test("WITH the shim, checkpoint-loop plan stats stay bounded across " +
    "12 rounds (digit count constant — the 100 TB CC-loop guarantee)") {
    var cur = StatsResetShim.resetStats(
      seed.localCheckpoint(true))
    val d0 = statsDigits(cur)
    val digits = (1 to 12).map { _ =>
      cur = StatsResetShim.resetStats(
        round(cur).localCheckpoint(true))
      statsDigits(cur)
    }
    // every round's checkpointed leaf must carry the SAME default-sized
    // stats as round 0 — any growth at all means a Spark change
    // re-attached carried statistics through internalCreateDataFrame and
    // the compounding hazard is back
    assert(digits.forall(_ == d0),
      s"stats digit count drifted across rounds: $d0 -> $digits " +
        "(localCheckpoint stats compounding is back — see StatsResetShim)")
    assert(cur.count() == 64L)
  }

  test("WITHOUT the shim, the same loop's stats COMPOUND geometrically " +
    "(the hazard exists in this Spark — if this fails, Spark fixed " +
    "localCheckpoint stats carrying and the shim can be retired)") {
    var cur = seed.localCheckpoint(true)
    val d0 = statsDigits(cur)
    // 6 rounds is plenty: the join-product estimate roughly squares per
    // round, so digit count grows ~2x per round once compounding starts
    // (and stays tiny long before the ToomCook3 regime — this arm proves
    // the INSTRUMENT detects the hazard, cheaply)
    val d6 = (1 to 6).foldLeft(d0) { (_, _) =>
      cur = round(cur).localCheckpoint(true)
      statsDigits(cur)
    }
    assert(d6 > 2 * d0,
      s"unshimmed loop stats did NOT compound ($d0 -> $d6 digits): Spark " +
        "appears to have fixed localCheckpoint stats carrying — re-evaluate " +
        "whether StatsResetShim is still needed")
  }

  test("resetStats preserves rows, schema, and zero data movement semantics") {
    val df = seed.localCheckpoint(true)
    val reset = StatsResetShim.resetStats(df)
    assert(reset.schema == df.schema)
    assertSameRows(reset, df)
  }
}
