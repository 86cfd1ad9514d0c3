package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal joins for event data at scale — the two shapes every
 * training-data / attribution pipeline needs and plain equi-joins can't
 * express:
 *
 *  - [[asofJoin]]: "attach the most recent prior state" (feature stores,
 *    market data, last-touch attribution). Implemented as union + ONE
 *    window pass over (keys, time): one shuffle total, no range probe,
 *    no pair explosion — at 100 TB the naive join-then-rank does a keys
 *    shuffle of the full CROSS-range pairs first; this moves each row
 *    exactly once and sorts per key.
 *  - [[intervalJoin]]: "all pairs within a time band" (funnels,
 *    sessionized attribution windows). An equi-shuffle on the keys with
 *    the band evaluated inside the join — pair output is the answer, so
 *    the explosion is inherent; the band bounds it.
 *
 * Both operate on event time as epoch MICROSECONDS longs (see
 * `EventStreams.eventMicros` for encoding-adaptive extraction), keeping
 * them orthogonal to the source's physical timestamp encoding.
 * [[intervalJoinStreams]] is the Structured Streaming form of
 * [[intervalJoin]] (TimestampType event-time + watermarks on both sides
 * so the join state buffer is bounded).
 */
object Temporal {

  /** As-of join: for every left row, the single right row with the
    * LARGEST `rightTs <= leftTs` for the same `keys` (inclusive ties
    * match). Left-join semantics: `rightCols` come back null when no
    * prior right row exists, or — with `toleranceUs` — when the match is
    * older than the tolerance.
    *
    * Determinism caveat: if several right rows share (keys, rightTs),
    * "the" latest is ambiguous; pre-aggregate the right side to one row
    * per (keys, ts) when exact reproducibility matters (the
    * q_asof_join oracle does).
    *
    * Plan shape: union both sides → window over keys ordered by
    * (ts, side) with rights-before-lefts on ties → running
    * `last(ignoreNulls)` of each right column → keep left rows. ONE
    * hash exchange on `keys`, per-key sort, zero joins. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightCols: Seq[String],
               toleranceUs: Option[Long] = None,
               direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val fwd = direction == "forward"
    val clash = rightCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"rightCols collide with left columns: $clash")
    val leftCols = left.columns.toSeq
    val ts = "__asof_ts"
    val side = "__asof_side" // right=0 < left=1: equal-ts rights match
    val rts = "__asof_rts"
    val l = left.select(
      leftCols.map(c => graft.ColName.topCol(c)) ++
        Seq(graft.ColName.topCol(leftTs).alias(ts), lit(1).alias(side),
          lit(null).cast("long").alias(rts)) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).alias(c)): _*)
    val r = right.select(
      keys.map(k => graft.ColName.topCol(k)) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).alias(c)) ++
        Seq(graft.ColName.topCol(rightTs).alias(ts), lit(0).alias(side),
          graft.ColName.topCol(rightTs).alias(rts)) ++
        rightCols.map(c => graft.ColName.topCol(c)): _*)
    // backward: ascending time, running-last right = LATEST rts <= ts.
    // forward: DESCENDING time — preceding rows have rts >= ts and the
    // most recently seen is the SMALLEST such, i.e. the next right.
    // Ties: side asc keeps rights before lefts at equal ts either way
    // (equal-ts rights match inclusively in both directions).
    val w = Window.partitionBy(keys.map(graft.ColName.topCol): _*)
      .orderBy(if (fwd) col(ts).desc else col(ts).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r.select(l.columns.map(graft.ColName.topCol): _*))
      .withColumns((rightCols :+ rts).map(c =>
        c -> last(graft.ColName.topCol(c), ignoreNulls = true).over(w)).toMap)
    val inTol = toleranceUs match {
      case None => col(rts).isNotNull
      case Some(t) =>
        val gap = if (fwd) col(rts) - col(ts) else col(ts) - col(rts)
        col(rts).isNotNull && (gap <= t)
    }
    carried.filter(col(side) === 1)
      .select(leftCols.map(graft.ColName.topCol) ++ rightCols.map(c =>
        when(inTol, graft.ColName.topCol(c)).otherwise(lit(null)).alias(c)): _*)
  }

  /** Interval (band) join: inner-join pairs with equal `keys` and
    * `rightTs` in `[leftTs + lowerUs, leftTs + upperUs]`. The band rides
    * inside the equi-join on `keys`, so Catalyst plans a plain keyed
    * shuffle (broadcast if one side is small) and evaluates the range as
    * the join residual — never a cartesian. Column-name collisions:
    * right's non-key columns are renamed with `rightPrefix`. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   lowerUs: Long, upperUs: Long,
                   rightPrefix: String = "r_"): DataFrame = {
    require(lowerUs <= upperUs, s"empty band: [$lowerUs, $upperUs]")
    val renamed = right.columns.foldLeft(right)((df, c) =>
      if (keys.contains(c)) df
      else df.withColumnRenamed(c, rightPrefix + c))
    val rTs = if (keys.contains(rightTs)) rightTs else rightPrefix + rightTs
    // alias both sides and resolve the condition through the aliases:
    // when left and right are filters of the SAME base frame (a
    // self-join), dataset-resolved columns can land on identical
    // attribute IDs — Spark warns "trivially true equals predicate" and
    // the resolution is only correct by luck. Alias-scoped names are
    // unambiguous by construction.
    val lA = left.alias("__ij_l")
    val rA = renamed.alias("__ij_r")
    def lc(n: String) = col(s"__ij_l.${graft.ColName.quote(n)}")
    def rc(n: String) = col(s"__ij_r.${graft.ColName.quote(n)}")
    val cond = keys.map(k => lc(k) === rc(k)).reduce(_ && _) &&
      rc(rTs) >= lc(leftTs) + lowerUs &&
      rc(rTs) <= lc(leftTs) + upperUs
    keys.foldLeft(lA.join(rA, cond))((df, k) => df.drop(rc(k)))
  }

  /** SCD2 (slowly-changing-dimension type 2) interval builder: collapse a
    * change-event log into validity intervals — one row per maximal run of
    * consecutive events (per `keys`, ordered by `tsCol` then `tieBreak`)
    * whose tracked `attrs` are all unchanged. Output: keys, attrs (the
    * run's value), `valid_from_us` (first event of the run),
    * `valid_to_us` (start of the NEXT run; null = still current).
    *
    * Plan shape: two window passes over the SAME (keys × order)
    * partitioning — Catalyst reuses one exchange + sort (the second
    * window only filters rows first); no joins, no self-union. At 100 TB
    * the state per key is one sort run — skew-bound like any keyed
    * window.
    *
    * Null semantics: attribute comparison is null-safe (a null attr value
    * is a value; null → null is NOT a change), matching SQL
    * `IS DISTINCT FROM` — the DuckDB oracle restates it that way. */
  def scd2(events: DataFrame, keys: Seq[String], tsCol: String,
           attrs: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "scd2 needs keys and attrs")
    val q = (n: String) => graft.ColName.topCol(n)
    val order = (q(tsCol).asc +: tieBreak.map(q(_).asc)).toSeq
    val w = Window.partitionBy(keys.map(q): _*).orderBy(order: _*)
    val cur = struct(attrs.map(q): _*)
    // run boundary: first event of a key, or attrs differ from the
    // previous event (struct <=> is field-wise null-safe)
    val boundary = lag(cur, 1).over(w).isNull || !(lag(cur, 1).over(w) <=> cur)
    val starts = events
      .withColumn("__scd_boundary", boundary)
      .filter(col("__scd_boundary"))
      .withColumn("valid_from_us", q(tsCol).cast("long"))
    // next run's start over the SAME partitioning (exchange reused)
    val w2 = Window.partitionBy(keys.map(q): _*)
      .orderBy((col("valid_from_us").asc +: tieBreak.map(q(_).asc)).toSeq: _*)
    starts.withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w2))
      .select(keys.map(q) ++ attrs.map(q) ++
        Seq(col("valid_from_us"), col("valid_to_us")): _*)
  }

  /** Structured Streaming form of [[intervalJoin]]: both sides carry
    * TimestampType event-time columns (`leftTime`/`rightTime`), both get
    * watermarked with `delay`, and the band is expressed on event time so
    * Spark can BOUND the join state buffer (state older than
    * watermark − band is evicted). Works identically on batch frames
    * (watermark is a no-op there). */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
                          keys: Seq[String], leftTime: String,
                          rightTime: String, lowerSec: Long, upperSec: Long,
                          delay: String = "1 hour",
                          rightPrefix: String = "r_"): DataFrame = {
    val lw = if (left.isStreaming) left.withWatermark(leftTime, delay) else left
    val rw0 = if (right.isStreaming) right.withWatermark(rightTime, delay) else right
    val rw = rw0.columns.foldLeft(rw0)((df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, rightPrefix + c))
    val rTime = rightPrefix + rightTime
    // alias-scoped resolution for the same self-join reason as
    // [[intervalJoin]] — both streams are commonly selections of one
    // source frame
    val lA = lw.alias("__ijs_l")
    val rA = rw.alias("__ijs_r")
    def lc(n: String) = col(s"__ijs_l.${graft.ColName.quote(n)}")
    def rc(n: String) = col(s"__ijs_r.${graft.ColName.quote(n)}")
    val cond = keys.map(k => lc(k) === rc(k)).reduce(_ && _) &&
      rc(rTime) >= lc(leftTime) + expr(s"INTERVAL $lowerSec SECOND") &&
      rc(rTime) <= lc(leftTime) + expr(s"INTERVAL $upperSec SECOND")
    keys.foldLeft(lA.join(rA, cond))((df, k) => df.drop(rc(k)))
  }

  /** Trailing time-window features: for each row, the count and sum of
    * `measure` over every event of the same `keyCol` in the last
    * `spanUs` microseconds INCLUDING the row itself — the classic
    * "activity in the trailing hour/day/week" feature block of a
    * behavioral model, one (`n_<name>`, `sum_<name>`) pair per requested
    * window.
    *
    * All windows share one partition/order spec (`keyCol`, event time),
    * so however many spans are requested Spark plans a SINGLE exchange +
    * sort and evaluates every frame in the same WindowExec pass — the
    * per-entity history is shuffled once, never per-feature. RANGE
    * framing is value-based, so simultaneous events (ties on `tsUs`)
    * are frame-peers and count in each other's features — the same
    * convention as SQL `RANGE BETWEEN x PRECEDING AND CURRENT ROW`,
    * which makes the operator oracle-checkable verbatim.
    *
    * Scale note: one entity's history lands in one task per the usual
    * window-function contract — fine for per-user streams (bounded by
    * human activity); for a pathological whale key, pre-bucket by
    * coarse time like [[graft.ext.Skew]] does for joins.
    *
    * `tsUs` must be integral event-time micros (see
    * [[graft.streaming.EventStreams.eventMicros]]); `measure` is summed
    * as-is — feed an integral measure when bit-exact cross-engine
    * comparison matters (double sums associate differently under
    * different frame implementations).
    */
  def rollingFeatures(df: DataFrame, keyCol: String, tsUs: org.apache.spark.sql.Column,
                      measure: org.apache.spark.sql.Column,
                      spans: Seq[(String, Long)]): DataFrame = {
    require(spans.nonEmpty, "rollingFeatures: at least one window span")
    require(spans.forall(_._2 > 0), s"rollingFeatures: spans must be > 0 us: $spans")
    val base = df.withColumn("__rf_us", tsUs.cast("long"))
      .withColumn("__rf_m", measure)
    val withFeatures = spans.foldLeft(base) { case (acc, (name, spanUs)) =>
      val w = Window.partitionBy(graft.ColName.topCol(keyCol))
        .orderBy(col("__rf_us")).rangeBetween(-spanUs, 0)
      acc.withColumn(s"n_$name", count(lit(1)).over(w))
        .withColumn(s"sum_$name", sum(col("__rf_m")).over(w))
    }
    withFeatures.drop("__rf_us", "__rf_m")
  }

  /** Fixed-width time-bucket resample with zero-filled gaps: per
    * (`keyCol`, bucket of `bucketUs` micros) event count and `measure`
    * sum, DENSIFIED so every key emits a row for every bucket between
    * its first and last event — the "regular time series" a forecasting
    * or anomaly model consumes (a missing hour must be an explicit zero,
    * not an absent row).
    *
    * Three bounded stages, no window functions: (1) the raw bucket
    * aggregation — ONE partial-aggregatable shuffle over the corpus,
    * carrying ≤ keys×buckets rows; (2) per-key [min,max] bucket bounds
    * folded from stage 1's SMALL output (keys×buckets rows, not the
    * corpus); (3) the dense grid exploded from the bounds via
    * `sequence()` and left-joined back. The corpus itself is touched
    * exactly once. Grid size = keys × span/bucketUs — pick `bucketUs`
    * so a key's span stays within `maxBucketsPerKey` (enforced per-row
    * inside `sequence`'s argument, failing loudly rather than exploding
    * a runaway array at a pathological key).
    *
    * `tsUs` must be integral event-time micros; `measure` should be
    * integral for bit-exact cross-engine sums. Output: (key, bucket,
    * bucket_start_us, n_events, sum_<measure alias>m) with n_events = 0
    * rows for the gaps.
    */
  def resampleGapFill(df: DataFrame, keyCol: String,
                      tsUs: org.apache.spark.sql.Column,
                      measure: org.apache.spark.sql.Column, bucketUs: Long,
                      maxBucketsPerKey: Int = 1000000): DataFrame = {
    require(bucketUs > 0, s"resampleGapFill: bucketUs must be > 0: $bucketUs")
    val k = graft.ColName.topCol(keyCol)
    val bucketed = df
      // Column `/` on longs is DOUBLE division (a 1.7e15 us value divided
      // near a bucket boundary can round across it) — stage the micros
      // and use integer DIV, exact at any magnitude
      .select(k.alias("__k"), tsUs.cast("long").alias("__us"),
        measure.alias("__m"))
      .select(col("__k"), expr(s"__us DIV $bucketUs").alias("__b"),
        col("__m"))
      .groupBy(col("__k"), col("__b"))
      .agg(count(lit(1)).alias("n_events"), sum(col("__m")).alias("__sum"))
    val bounds = bucketed.groupBy(col("__k"))
      .agg(min(col("__b")).alias("__lo"), max(col("__b")).alias("__hi"))
    val guarded = bounds.withColumn("__span", col("__hi") - col("__lo") + 1)
      .withColumn("__hi_ok",
        when(col("__span") <= maxBucketsPerKey, col("__hi"))
          .otherwise(raise_error(concat(lit(
            s"resampleGapFill: key "), col("__k").cast("string"),
            lit(s" spans more than $maxBucketsPerKey buckets ("),
            col("__span").cast("string"), lit(") — widen bucketUs")))))
    val grid = guarded.select(col("__k"),
      explode(sequence(col("__lo"), col("__hi_ok"))).alias("__b"))
    grid.join(bucketed, Seq("__k", "__b"), "left")
      .select(col("__k").alias(keyCol), col("__b").alias("bucket"),
        (col("__b") * bucketUs).alias("bucket_start_us"),
        coalesce(col("n_events"), lit(0L)).alias("n_events"),
        coalesce(col("__sum"), lit(0L)).alias("sum_measure"))
  }

  /** Retention cohorts — the classic "of the users who first appeared in
    * bucket C, how many were active again C+k buckets later" matrix
    * behind DAU/WAU retention curves. Cohort = the user's FIRST activity
    * bucket (integral `div` on event-time micros); one output row per
    * observed (cohort, offset ≥ 0) with its distinct-user count (offset 0
    * row = the cohort's size). Gaps are absent rows, like [[resampleGapFill]]
    * before the fill.
    *
    * `tsUs` must be integral event-time micros (float division would
    * 1-ulp-drift bucket edges; same contract as resampleGapFill).
    *
    * 100 TB shape: one map-combinable (user, bucket) DISTINCT pass
    * collapses the raw event mass first, so everything downstream — the
    * per-user cohort min, the user-keyed self-join, the (cohort, offset)
    * count — moves one tiny row per ACTIVE user-bucket, never per event.
    * No window, no user × buckets cross product. */
  def retentionCohorts(df: DataFrame, userCol: String,
                       tsUs: org.apache.spark.sql.Column,
                       bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"retentionCohorts: bucketUs must be > 0, got $bucketUs")
    val u = graft.ColName.topCol(userCol)
    val active = df.filter(u.isNotNull)
      .select(u.alias("__u"), tsUs.cast("long").alias("__us"))
      // exact integer FLOOR division (DIV truncates toward zero, which
      // diverges from DuckDB's // for pre-epoch negative micros; the
      // pmod-adjusted numerator is an exact multiple of bucketUs, so
      // DIV on it is exact floor division — and never DOUBLE `/`,
      // which 1-ulp-drifts bucket edges at e15-magnitude micros)
      .select(col("__u"),
        expr(s"(__us - pmod(__us, ${bucketUs}L)) DIV ${bucketUs}L").alias("__b"))
      .distinct()
    val cohorts = active.groupBy(col("__u")).agg(min(col("__b")).alias("__c"))
    active.join(cohorts, Seq("__u"))
      .groupBy(col("__c").alias("cohort"),
        (col("__b") - col("__c")).alias("offset_buckets"))
      .agg(count(lit(1)).alias("n_users"))
  }
}
