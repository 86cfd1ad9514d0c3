package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column support: image/audio/video as opaque `binary` payloads
 * with typed metadata, plus decode / feature-extract / resize /
 * frame-sample stages.
 *
 * The decode step is STUBBED with a deterministic fake (this container has
 * no image/audio codecs): features are derived from seeded xxhash64 of the
 * payload, so every test is reproducible. The Spark-side plumbing —
 * schema, partitioning, batch shape — is real:
 *
 *  - assets are `(asset_id, payload: binary, meta: struct)` rows;
 *  - decode stages are per-row Column expressions where possible
 *    (codegen'd, no serialization), and a `mapPartitions` batch path
 *    ([[decodeBatches]]) mirrors how a real codec (JNI/FFI) would be
 *    driven: one decoder instance per partition, rows streamed through;
 *  - 100 TB: payloads dominate size, so stages select-project only the
 *    columns they need (column pruning keeps payload bytes out of
 *    shuffles), and [[repartitionBySize]] balances skewed payload sizes
 *    across tasks before the expensive decode.
 */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Build an asset table from any (id, text) frame — the text bytes stand
    * in for an encoded image payload. */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String,
                     mime: String = "image/fake"): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.select(
      col(idCol).cast(LongType).alias("asset_id"),
      payload.alias("payload"),
      struct(
        lit(mime).alias("mime"),
        octet_length(payload).cast(LongType).alias("n_bytes"),
        // fake dimensions derived from content length — deterministic
        (pmod(octet_length(payload), lit(64)) + 32).cast(IntegerType).alias("width"),
        (pmod(octet_length(payload), lit(48)) + 24).cast(IntegerType).alias("height"))
        .alias("meta"))
  }

  /** STUB decode → feature vector: dim doubles in [0,1) derived from the
    * md5 digest of the payload (byte i of the digest / 256; digests chain
    * as md5(payload ++ blockIdx) past 16 dims). md5 — unlike xxhash — is
    * bit-identical across engines, so the fake decode is fully
    * DuckDB-oracle-checkable. A real pipeline swaps only this expression
    * for the codec call; schema and plan shape are unchanged. */
  def fakeDecodeFeatures(payload: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim (sequence(0, dim-1) would " +
      "count DOWN for dim <= 0)")
    val nBlocks = (dim + 15) / 16
    val allHex = concat((0 until nBlocks).map { b =>
      if (b == 0) md5(payload)
      else md5(concat(payload, encode(lit(b.toString), "UTF-8")))
    }: _*)
    // split the digest into hex pairs FIRST so the md5 chain is the
    // transform's CHILD (evaluated once per row). Referencing allHex
    // inside the lambda would re-evaluate the digests once per output
    // element (the free-variable hazard documented at Dedup.wordShingles).
    // regexp_replace pairs up chars ("ab12" -> "ab,12,"); slice drops the
    // trailing empty split cell.
    val hexPairs = slice(split(regexp_replace(allHex, "(..)", "$1,"), ","), 1, dim)
    transform(hexPairs, h => conv(h, 16, 10).cast("double") / 256.0)
  }

  /** STUB resize: new meta dims, payload truncated proportionally —
    * exercises the withField/binary plumbing of a real resize. */
  def fakeResize(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", col("meta")
        .withField("width", lit(w).cast(IntegerType))
        .withField("height", lit(h).cast(IntegerType)))
      .withColumn("payload", substring(col("payload"), 1, w * h))

  /** STUB frame sampling for video-like payloads: every `step`-th frame
    * index with a per-frame content hash. */
  def fakeFrameSample(payload: Column, nFrames: Column, step: Int): Column = {
    require(step >= 1, s"step must be >= 1, got $step " +
      "(sequence() would reject a zero step per-row at execution time)")
    when(nFrames <= 0, array().cast("array<struct<frame_idx:long,frame_hash:long>>"))
      .otherwise(transform(sequence(lit(0L), (nFrames - 1).cast("long"), lit(step.toLong)),
        i => struct(i.alias("frame_idx"), xxhash64(payload, i).alias("frame_hash"))))
  }

  /** Feature extraction as a single narrow projection. */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame =
    assets.select(col("asset_id"), col("meta.n_bytes").alias("n_bytes"),
      fakeDecodeFeatures(col("payload"), dim).alias("features"))

  /** Codec seam for [[decodeBatches]]: ONE instance per partition — the
    * shape per-executor state (JNI decoder handles, GPU contexts)
    * requires. The codec itself is constructed ON the executor by the
    * factory closure; only the factory crosses the wire, so codec state
    * (native handles) never needs to be serializable. */
  trait AssetCodec {
    def decode(payload: Array[Byte]): Array[Double]
  }

  /** The deterministic fake codec (no image/audio libs in this
    * container): features from the payload's JVM array hash. A real
    * pipeline swaps this factory for one that opens a native decoder. */
  private[ext] def fakeCodec(dim: Int): AssetCodec = new AssetCodec {
    def decode(payload: Array[Byte]): Array[Double] = {
      val h = java.util.Arrays.hashCode(payload).toLong
      Array.tabulate(dim)(i => math.abs((h * 31 + i) % 1000000L).toDouble / 1000000.0)
    }
  }

  /**
   * Batch decode via mapPartitions — the pattern for codecs that need
   * per-executor state (decoder handles, GPU contexts). The decoder is
   * the deterministic fake; a real implementation swaps the factory only.
   */
  def decodeBatches(assets: DataFrame, dim: Int = 16): DataFrame =
    decodeBatches(assets, dim, () => fakeCodec(dim))

  /** [[decodeBatches]] with an explicit codec factory. The factory runs
    * exactly once per partition (property-tested), each row streams
    * through that one instance — never an init per row. */
  def decodeBatches(assets: DataFrame, dim: Int,
                    codecFactory: () => AssetCodec): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val rows = assets.select(col("asset_id"), col("payload")).rdd.mapPartitions { it =>
      val codec = codecFactory() // init-once per partition
      // null ids/payloads pass through as nulls (schema declares nullable)
      it.map { r =>
        val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
        val payload = if (r.isNullAt(1)) null else codec.decode(r.getAs[Array[Byte]](1))
        Row(id, payload)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Spread assets uniformly across tasks before an expensive decode so no
    * task inherits a clump of heavy payloads. Hash-spread gives equal
    * EXPECTED bytes per task (range-partitioning on size would do the
    * opposite — it concentrates the largest payloads into one range).
    * True byte-budget bin-packing needs a size-sorted striping pass and
    * belongs in offline layout, not per-query. */
  def repartitionBySize(assets: DataFrame, partitions: Int): DataFrame =
    // repartition's own HashPartitioning over the full id space IS the
    // hash-spread; pre-folding ids into `partitions` distinct salt values
    // (pmod(xxhash64(id), n)) and re-hashing those would leave ~1/e of
    // the partitions empty and stack heavies on the collisions
    assets.repartition(partitions, col("asset_id"))
}
