package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** One event, with event time as epoch MICROSECONDS (whatever the source's
  * physical encoding — see [[EventStreams.eventMicros]] — we standardize on
  * micros internally). */
final case class Event(userId: Long, eventId: Long, us: Long, value: Double)

/** Per-user session summary emitted by the stateful sessionizer. */
final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

/** Running per-user state: number of sessions opened so far and the event
  * time of the latest event seen. */
final case class SessionState(nSessions: Long, nEvents: Long, lastUs: Long)

/**
 * Event-stream operators, Spark-first: every transform here works on BOTH a
 * batch DataFrame and a `readStream` DataFrame, so the same code path is
 * oracle-checked in batch (SparkEntry) and exercised with watermarks over
 * `MemoryStream` in StreamingSpec.
 *
 * Scale notes (100 TB): all aggregations key on `user_id`, so state is
 * hash-partitioned across executors; watermarks bound state size; the
 * stateful sessionizer keeps O(1) state per user.
 */
object EventStreams {

  /** Epoch-microseconds expression for `tsCol`, adapting to its PHYSICAL
    * encoding — real event-time sources arrive in several shapes and the
    * operators must not care which:
    *   - `TimestampType` → `unix_micros` (native epoch-micros).
    *   - `TimestampNTZType` (e.g. parquet TIMESTAMP_MICROS with
    *     isAdjustedToUTC=false, Spark 4's default inference) → cast to
    *     TimestampType then `unix_micros`; the session time zone is pinned
    *     to UTC by every graft entrypoint, so the naive value IS the UTC
    *     epoch value — same convention DuckDB's `epoch_us` applies.
    *   - `LongType` → raw int64 epoch-NANOS (parquet TIMESTAMP(NANOS) read
    *     via spark.sql.legacy.parquet.nanosAsLong). `div` (integral
    *     divide), NOT `/`: float division of epoch-nanos longs
    *     (~1.7e18 > 2^53) loses up to 256 ns and shifts micro boundaries. */
  def eventMicros(df: DataFrame, tsCol: String = "ts"): Column =
    eventMicrosFor(df.schema(tsCol).dataType, tsCol)

  private def eventMicrosFor(dt: DataType, tsCol: String): Column = {
    val c = col(graft.ColName.quote(tsCol))
    dt match {
      case TimestampType    => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case LongType => expr(s"${graft.ColName.quote(tsCol)} div 1000").cast("long")
      case other => throw new IllegalArgumentException(
        s"event-time column `$tsCol` has unsupported type $other; " +
          "expected TIMESTAMP, TIMESTAMP_NTZ, or INT64 epoch-nanos")
    }
  }

  /** Attach a proper TimestampType event-time column from `tsCol`,
    * whatever its physical encoding (see [[eventMicros]]). */
  def withEventTime(df: DataFrame, tsCol: String = "ts",
                    out: String = "event_time"): DataFrame =
    df.withColumn(out, timestamp_micros(eventMicros(df, tsCol)))

  /** Session aggregation via the built-in `session_window`: an event merges
    * into the previous session when its inter-event gap is <= `gap`
    * (touching windows merge — verified in StreamingSpec); a strictly
    * greater gap starts a new session. Works in batch and, with
    * [[watermarked]], in streaming append mode. */
  def sessionAgg(df: DataFrame, gap: String,
                 tsCol: String = "event_time"): DataFrame =
    df.groupBy(col("user_id"), session_window(col(tsCol), gap))
      .agg(count(lit(1)).alias("n_events"), sum(col("value")).alias("total_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).alias("session_start_us"),
        col("n_events"), col("total_value"))

  /** Tumbling-window event counts per user. */
  def tumblingCounts(df: DataFrame, width: String,
                     tsCol: String = "event_time"): DataFrame =
    df.groupBy(col("user_id"), window(col(tsCol), width))
      .agg(count(lit(1)).alias("n_events"))
      .select(col("user_id"), unix_micros(col("window.start")).alias("window_start_us"),
        col("n_events"))

  /** Watermark helper for streaming inputs (no-op on batch frames). */
  def watermarked(df: DataFrame, tsCol: String = "event_time",
                  delay: String = "1 hour"): DataFrame =
    if (df.isStreaming) df.withWatermark(tsCol, delay) else df

  /** Streaming exact-dedup by id columns with state bounded by the
    * watermark (`dropDuplicatesWithinWatermark`); plain dropDuplicates on
    * batch frames. */
  def dedupStream(df: DataFrame, idCols: Seq[String],
                  tsCol: String = "event_time", delay: String = "1 hour"): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(idCols)
    else df.dropDuplicates(idCols)

  /** Multi-level pack over a STREAM via foreachBatch: a K-level pack is K
    * chained aggregations, which a single streaming query cannot express —
    * so each micro-batch is packed as a batch DataFrame and written to the
    * sink. Entities whose rows span micro-batches produce one packed row
    * per batch; for ONE exact packed table across batches use
    * [[packUpsertEachBatch]] instead (mergePacked-based upsert sink).
    * Single-level packs can also run directly as a streaming aggregation
    * (see StreamingSpec).
    *
    * Replay-idempotent: each batch overwrites its own `batch_id=N`
    * partition directory, so a restarted/replayed micro-batch rewrites the
    * same data instead of appending duplicates. Pass `checkpointLocation`
    * for restartable progress tracking. */
  def packEachBatch(flat: DataFrame, packer: graft.Packer, toLevel: String,
                    sinkPath: String,
                    checkpointLocation: Option[String] = None
                   ): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = flat.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        packer.pack(batch, toLevel).write.mode("overwrite")
          .parquet(s"$sinkPath/batch_id=$batchId")
      }
    checkpointLocation.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** EXACT cross-batch streaming pack: maintain one packed table across
    * micro-batches by merging each batch into the previous version with
    * [[graft.Packer.mergePacked]] — entities whose rows span micro-batches
    * end up in ONE packed row, unlike [[packEachBatch]]'s
    * one-row-per-batch contract.
    *
    * Versioned sink layout: each batch writes `sinkPath/v=<batchId>` by
    * merging the delta into the LATEST version strictly below its own
    * batchId. Replay-idempotent: a restarted batch N re-reads the same
    * predecessor and overwrites its own `v=N` — never compounds. Old
    * versions are retained for `keepVersions` batches (readers of a
    * superseded version finish their scan; a vacuum can drop older dirs).
    * Single-writer per sinkPath, like any file-based upsert sink.
    * Read the current state with [[readPackedSink]]. */
  def packUpsertEachBatch(flat: DataFrame, packer: graft.Packer, toLevel: String,
                          sinkPath: String,
                          checkpointLocation: Option[String] = None,
                          keepVersions: Int = 2
                         ): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = flat.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val merged = listPackVersions(spark, sinkPath).filter(_ < batchId)
          .sorted.lastOption match {
          case Some(prev) =>
            packer.mergePacked(spark.read.parquet(s"$sinkPath/v=$prev"), batch, toLevel)
          case None => packer.pack(batch, toLevel)
        }
        merged.write.mode("overwrite").parquet(s"$sinkPath/v=$batchId")
        // vacuum versions older than the retention window
        listPackVersions(spark, sinkPath).sorted.dropRight(keepVersions + 1)
          .foreach { v =>
            val p = new org.apache.hadoop.fs.Path(s"$sinkPath/v=$v")
            p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
          }
      }
    checkpointLocation.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Streaming near-duplicate dedup with an accumulated survivor corpus:
    * each micro-batch is deduplicated against everything already kept via
    * [[graft.ext.Dedup.incrementalNearDup]] (corpus–corpus pairs never
    * regenerated — each batch pays only corpus–batch + batch–batch
    * candidate generation), and the surviving rows are appended to the
    * same versioned parquet sink layout as [[packUpsertEachBatch]]
    * (`sinkPath/v=<batchId>`, replay-idempotent: a restarted batch
    * re-reads the latest version strictly below its own id and overwrites
    * its own directory). Read the accumulated survivors with
    * [[readPackedSink]].
    *
    * Contract inherited from incrementalNearDup: ids must be monotone
    * across batches (every batch's ids above the accumulated corpus max —
    * the natural shape of log-offset / snowflake ids), so "first
    * occurrence survives" is well-defined under replay. */
  def nearDupUpsertEachBatch(docs: DataFrame, textCol: String, idCol: String,
                             sinkPath: String, threshold: Double,
                             shingleN: Int = 3, numHashes: Int = 32,
                             bands: Int = 8,
                             checkpointLocation: Option[String] = None,
                             keepVersions: Int = 2
                            ): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val survivors = listPackVersions(spark, sinkPath).filter(_ < batchId)
          .sorted.lastOption match {
          case Some(prev) =>
            val corpus = spark.read.parquet(s"$sinkPath/v=$prev")
            val keepIds = graft.ext.Dedup.incrementalNearDup(corpus, batch,
              textCol, idCol, threshold, shingleN, numHashes, bands)
            corpus.unionByName(batch.join(keepIds, Seq(idCol), "left_semi"))
          case None =>
            val ids = graft.ext.Dedup.nearDupSurvivors(batch, textCol, idCol,
              threshold, shingleN, numHashes, bands)
            batch.join(ids, Seq(idCol), "left_semi")
        }
        survivors.write.mode("overwrite").parquet(s"$sinkPath/v=$batchId")
        listPackVersions(spark, sinkPath).sorted.dropRight(keepVersions + 1)
          .foreach { v =>
            val p = new org.apache.hadoop.fs.Path(s"$sinkPath/v=$v")
            p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
          }
      }
    checkpointLocation.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Latest packed state written by [[packUpsertEachBatch]]. */
  def readPackedSink(spark: org.apache.spark.sql.SparkSession,
                     sinkPath: String): DataFrame =
    listPackVersions(spark, sinkPath).sorted.lastOption match {
      case Some(v) => spark.read.parquet(s"$sinkPath/v=$v")
      case None => throw new IllegalStateException(s"no packed versions under $sinkPath")
    }

  private def listPackVersions(spark: org.apache.spark.sql.SparkSession,
                               sinkPath: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(sinkPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
  }

  /** Custom sessionization with explicit per-user state
    * (`flatMapGroupsWithState`) — the reference has no streaming at all;
    * this is the Spark-native "custom state" path. Gap semantics match
    * [[sessionAgg]]: a new session starts only when the inter-event gap is
    * STRICTLY greater than `gapUs` (touching sessions merge). Emits one
    * updated [[UserSessions]] row per user per batch. */
  def statefulSessionCounts(ds: Dataset[Event], gapUs: Long): Dataset[UserSessions] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (userId, events, state: GroupState[SessionState]) =>
          // events within a group arrive unordered — sort by (time, id);
          // per-group data is one user's events, so this is a small local sort
          val sorted = events.toSeq.sortBy(e => (e.us, e.eventId))
          if (sorted.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
            sorted.foreach { e =>
              val newSession = st.lastUs == Long.MinValue || e.us - st.lastUs > gapUs
              // max, not e.us: a LATE event must not regress the frontier —
              // otherwise the next on-time event measures its gap against
              // the stale timestamp and wrongly opens a new session
              st = SessionState(st.nSessions + (if (newSession) 1 else 0),
                st.nEvents + 1, math.max(st.lastUs, e.us))
            }
            state.update(st)
            Iterator.single(UserSessions(userId, st.nSessions, st.nEvents))
          }
      }
  }
}
