package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot diff — the data-validation primitive every pipeline upgrade
 * needs: "what changed between yesterday's table and today's?". Classifies
 * every key present in either snapshot as added / removed / changed /
 * unchanged in ONE full-outer equi-join on the keys (a single keyed
 * shuffle; AQE handles skewed keys and broadcasts a small side). No
 * window functions, no collect — the classification is a per-row
 * expression over the joined pair, so the operator streams at any scale.
 */
object Diff {

  val ChangeCol = "change"
  val ChangedColsCol = "changed_cols"
  private val LMark = "__diff_present_l"
  private val RMark = "__diff_present_r"

  /** Row-level diff of `right` (new) vs `left` (old), keyed by `keys`.
    * Output: the key columns (coalesced across sides — present for every
    * row whichever side it came from), `change` in
    * {"added","removed","changed","unchanged"}, and `changed_cols` — the
    * comma-joined names (in `compareCols` order) of compared columns
    * whose values differ under null-safe equality (empty string unless
    * change = "changed").
    *
    * `compareCols` defaults to the non-key columns present on BOTH
    * sides; columns existing on only one side can't be compared row-wise
    * and are ignored (a schema diff is a different question). Both sides
    * must be key-unique — like any keyed snapshot; duplicate keys would
    * make "the" row for a key ambiguous (and the join a pair explosion). */
  def tableDiff(left: DataFrame, right: DataFrame, keys: Seq[String],
                compareCols: Option[Seq[String]] = None): DataFrame = {
    require(keys.nonEmpty, "tableDiff needs at least one key column")
    val q = (n: String) => graft.ColName.quote(n)
    val cmp = compareCols.getOrElse(
      left.columns.filterNot(keys.contains).toSeq
        .filter(right.columns.contains))
    val bad = cmp.filter(c => !left.columns.contains(c) || !right.columns.contains(c))
    require(bad.isEmpty, s"compareCols absent from a side: ${bad.mkString(", ")}")

    // prefix-alias every column per side BEFORE the join: fresh exprIds
    // make the plan self-join-safe (old and new snapshots are typically
    // two filters of ONE source), and unique names make resolution
    // trivial. The literal markers are the only reliable row-existence
    // witness after a full-outer join (key columns can be legitimately
    // null on a real row).
    val lp = "__dl_"; val rp = "__dr_"
    def pre(df: DataFrame, p: String, mark: String) =
      df.select(df.columns.toSeq.map(c => df(q(c)).alias(p + c)) :+
        lit(true).alias(mark): _*)
    val l = pre(left, lp, LMark)
    val r = pre(right, rp, RMark)
    // null-safe key equality: a null-keyed row on each side still pairs up
    val cond = keys.map(k => col(q(lp + k)) <=> col(q(rp + k))).reduce(_ && _)
    val joined = l.join(r, cond, "full_outer")

    val lPresent = col(q(LMark)).isNotNull
    val rPresent = col(q(RMark)).isNotNull
    val diffs = cmp.map(c => c -> !(col(q(lp + c)) <=> col(q(rp + c))))
    val anyDiff = diffs.map(_._2).foldLeft(lit(false))(_ || _)
    val change = when(!lPresent, lit("added"))
      .when(!rPresent, lit("removed"))
      .when(anyDiff, lit("changed"))
      .otherwise(lit("unchanged"))
    val changedCols = concat_ws(",",
      diffs.map { case (n, d) =>
        when(lPresent && rPresent && d, lit(n)).otherwise(lit(null)) }: _*)
    joined.select(
      keys.map(k => coalesce(col(q(lp + k)), col(q(rp + k))).alias(k)) ++
        Seq(change.alias(ChangeCol), changedCols.alias(ChangedColsCol)): _*)
  }

  /** Aggregate form: row counts per change class (one extra reduce over
    * [[tableDiff]] — partial-aggregated map-side). */
  def diffSummary(left: DataFrame, right: DataFrame, keys: Seq[String],
                  compareCols: Option[Seq[String]] = None): DataFrame =
    tableDiff(left, right, keys, compareCols)
      .groupBy(col(ChangeCol)).agg(count(lit(1)).alias("n"))

  /** Changelog compaction (CDC apply): collapse an upsert/delete change
    * log to the current snapshot — the latest version per key wins, and
    * keys whose latest op is `deleteOp` vanish (tombstones). The
    * materialize step of any incremental-ingest pipeline.
    *
    * ONE partial-aggregatable shuffle: `max(struct(version, payload))`
    * per key — each map task pre-reduces its rows to one candidate per
    * key, so the exchange carries keys, not log entries (a window
    * `row_number` would ship and sort the entire log per key instead).
    * Ties on version break lexicographically on the remaining columns
    * (struct ordering) — deterministic even on a malformed log, though a
    * sane log has a strictly-ordered version per key. Output: the input
    * columns, one row per surviving key.
    */
  def cdcApply(log: DataFrame, keys: Seq[String], versionCol: String,
               opCol: String, deleteOp: String = "D"): DataFrame = {
    require(keys.nonEmpty, "cdcApply needs at least one key column")
    require(!keys.contains(versionCol), "version column cannot be a key")
    val q = (n: String) => graft.ColName.quote(n)
    val payload = log.columns.filterNot(keys.contains).toSeq
    val ordered = versionCol +: payload.filterNot(_ == versionCol)
    val latest = log.groupBy(keys.map(k => col(q(k))): _*)
      .agg(max(struct(ordered.map(c => col(q(c))): _*)).alias("__r"))
    latest
      .select(keys.map(k => col(q(k))) ++
        payload.map(c => col(s"__r.${q(c)}").alias(c)): _*)
      .filter(col(q(opCol)) =!= deleteOp)
      .select(log.columns.map(c => col(q(c))).toIndexedSeq: _*)
  }
}
