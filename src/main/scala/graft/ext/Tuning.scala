package graft.ext

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Shuffle-partition sizing from ACTUAL input bytes — the first thing a
 * real cluster job does and the lesson of the sf10 (100x) proof run: a
 * partition count tuned for one scale factor goes super-linear at the
 * next (q_pack_split_join degraded 16.2x for 10x data at 32 partitions
 * because ~2M-row reduce partitions spill; at ~128MB-sized partitions it
 * scaled sub-linearly at 5.4x — BASELINE.md "sf10 proof run").
 *
 * The heuristic is the classic per-reducer target (~128MB, the same
 * advisory size AQE coalescing uses): `ceil(inputBytes / target)`,
 * clamped below by the cluster's parallelism (fewer partitions than
 * cores idles executors even when data is tiny) and above by a sanity
 * cap (a million 1KB partitions is scheduler abuse). Parquet bytes are
 * COMPRESSED, so for shuffle payloads that decompress badly (wide
 * strings, packed lists) callers pass an `expansion` factor — the
 * measured on-wire/on-disk ratio — rather than a guessed count.
 *
 * Deliberately NOT automatic inside operators: partition sizing follows
 * the operator's shuffle payload, not a global constant (the same sf10
 * run showed q_pack_salted PREFERS coarse partitions — its phase-1 salt
 * spread already bounds reducer payloads and finer partitions only
 * multiply phase-2 list-merge overhead). This is a session-level tool
 * the pipeline author applies once per input scale, exactly like
 * setting `spark.sql.shuffle.partitions` on a cluster.
 */
object Tuning {

  /** 128MB — AQE's `advisoryPartitionSizeInBytes` default and the
    * standard healthy-reducer target. */
  val DefaultBytesPerPartition: Long = 128L << 20

  /** Scheduler-sanity cap: beyond this, per-task overhead dominates any
    * spill savings. Matches the largest shuffle widths seen in practice
    * on O(10k)-core clusters. */
  val DefaultMaxPartitions: Int = 20000

  /** Total file bytes under `paths` (recursive, Hadoop FS — works for
    * local, HDFS, and object-store URIs alike). Missing paths raise:
    * sizing a shuffle from a typo'd input must fail loudly, not return
    * the minimum. */
  def inputBytes(paths: Seq[String], conf: Configuration): Long =
    paths.map { p =>
      val path = new Path(p)
      path.getFileSystem(conf).getContentSummary(path).getLength
    }.sum

  def inputBytes(spark: SparkSession, paths: Seq[String]): Long =
    inputBytes(paths, spark.sessionState.newHadoopConf())

  /** The pure sizing rule: `ceil(bytes x expansion / bytesPerPartition)`
    * clamped to [minPartitions, maxPartitions]. Separated from the FS
    * walk so the arithmetic is spec-testable on exact byte values. */
  def partitionsForBytes(bytes: Long,
                         bytesPerPartition: Long = DefaultBytesPerPartition,
                         minPartitions: Int = 1,
                         maxPartitions: Int = DefaultMaxPartitions,
                         expansion: Double = 1.0): Int = {
    require(bytes >= 0, s"partitionsForBytes: negative input bytes $bytes")
    require(bytesPerPartition > 0,
      s"partitionsForBytes: bytesPerPartition must be positive, got $bytesPerPartition")
    require(minPartitions >= 1 && maxPartitions >= minPartitions,
      s"partitionsForBytes: need 1 <= min <= max, got [$minPartitions, $maxPartitions]")
    require(expansion > 0, s"partitionsForBytes: expansion must be positive, got $expansion")
    val raw = math.ceil(bytes * expansion / bytesPerPartition.toDouble)
    math.min(maxPartitions.toLong, math.max(minPartitions.toLong, raw.toLong)).toInt
  }

  /** Recommended `spark.sql.shuffle.partitions` for jobs reading `paths`,
    * floored at the session's default parallelism. */
  def shufflePartitionsFor(spark: SparkSession, paths: Seq[String],
                           bytesPerPartition: Long = DefaultBytesPerPartition,
                           maxPartitions: Int = DefaultMaxPartitions,
                           expansion: Double = 1.0): Int =
    partitionsForBytes(inputBytes(spark, paths), bytesPerPartition,
      minPartitions = spark.sparkContext.defaultParallelism,
      maxPartitions = maxPartitions, expansion = expansion)

  /** The harness mains' `SPARK_GRAFT_SHUFFLE` contract: a literal count
    * passes through; `auto` sizes from the parquet tables under `sfDir`
    * via [[partitionsForBytes]] floored at `minPartitions` — so scale
    * sweeps (sf1.0/sf10) get data-proportional widths without hand-picked
    * constants, and the driver's fixed-count contract is untouched. */
  def resolveShuffleSetting(setting: String, sfDir: String,
                            minPartitions: Int): String =
    if (setting != "auto") setting
    else {
      // Hadoop FS listing (consistent with [[inputBytes]]) so an
      // hdfs:// / s3a:// / local sfDir all resolve; the layout contract
      // is still an sf-style directory of top-level <table>.parquet
      // entries (files or directories)
      val conf = new Configuration()
      val dir = new Path(sfDir)
      val fs = dir.getFileSystem(conf)
      require(fs.exists(dir), s"SPARK_GRAFT_SHUFFLE=auto: $sfDir does not exist")
      val tables = fs.listStatus(dir)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString).toSeq
      require(tables.nonEmpty,
        s"SPARK_GRAFT_SHUFFLE=auto: no top-level *.parquet tables under " +
          s"$sfDir (auto expects an sf-style directory of <table>.parquet " +
          "files or directories)")
      partitionsForBytes(inputBytes(tables, conf),
        minPartitions = minPartitions).toString
    }

  /** Apply the recommendation to the session: sets
    * `spark.sql.shuffle.partitions` AND AQE's
    * `coalescePartitions.initialPartitionNum` (so AQE still coalesces
    * small stages DOWN from the scaled width instead of being pinned to
    * it). Returns the count it set. */
  def scaleShuffleTo(spark: SparkSession, paths: Seq[String],
                     bytesPerPartition: Long = DefaultBytesPerPartition,
                     maxPartitions: Int = DefaultMaxPartitions,
                     expansion: Double = 1.0): Int = {
    val n = shufflePartitionsFor(spark, paths, bytesPerPartition,
      maxPartitions, expansion)
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum", n.toString)
    n
  }
}
