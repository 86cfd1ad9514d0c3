package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation joins. Spark's AQE already splits skewed SHUFFLE join
 * partitions at runtime, but two shapes stay out of its reach:
 * deliberately pre-salted co-partitioning (when the same skewed key
 * distribution feeds several downstream stages and you want ONE
 * repartitioning decision, not per-join runtime splits), and engines/
 * configs with AQE off. `saltedJoin` is the classic replicate-and-salt
 * rewrite with provably identical inner-join semantics: every left row
 * gets a deterministic salt in [0, buckets); the right side is replicated
 * once per salt value; the join adds the salt to the equi-keys, so each
 * hot key's pairs spread over `buckets` reducers instead of one.
 *
 * Cost model: right side is scanned once and exploded `buckets`× through
 * the shuffle — use for hot-left/small-right joins (the exact shape where
 * one reducer otherwise strangles the stage). The replication factor is
 * explicit, not hidden.
 */
object Skew {

  private val SaltCol = "__salt"

  /** Inner equi-join of `left` and `right` on `keys`, salted across
    * `buckets` reducers per key. Result is EXACTLY `left.join(right,
    * keys, "inner")` (row multiset; output columns = left's then right's
    * non-key columns). The salt is deterministic — `xxhash64` of the
    * left row's full column set — so retries and replays shard
    * identically. Right columns clashing with left's are prefixed with
    * `rightPrefix`. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int, rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val q = (n: String) => graft.ColName.quote(n)
    val lSalted = left.withColumn(SaltCol,
      pmod(xxhash64(left.columns.map(c => left(q(c))).toSeq: _*), lit(buckets)))
    val clash = right.columns.filterNot(keys.contains).filter(left.columns.contains)
    val rRenamed = clash.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, rightPrefix + c))
    // replicate right once per salt value; the explode is map-side and
    // feeds the shuffle already sharded
    val rSalted = rRenamed.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(buckets - 1L))))
    val cond = (keys :+ SaltCol).map(k =>
      lSalted(q(k)) === rSalted(q(k))).reduce(_ && _)
    val dropped = keys.foldLeft(lSalted.join(rSalted, cond))((df, k) =>
      df.drop(rSalted(q(k))))
    dropped.drop(lSalted(q(SaltCol))).drop(rSalted(q(SaltCol)))
  }
}
