package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/**
 * Fused robust-outlier statistics: exact median, exact MAD (median
 * absolute deviation), row count, and the count of rows beyond
 * `k · 1.4826 · MAD` of the median — in ONE buffered aggregation pass.
 *
 * The chained formulation ([[graft.ext.Profile.madOutliers]]'s previous
 * body) needed THREE corpus passes because each exact order statistic
 * depends on the previous one: median → MAD(|v − median|) → outlier
 * count. But Spark's own exact `percentile` already BUFFERS every value
 * of the group in its aggregation buffer — so one buffer of the raw
 * values supports all three statistics at eval time, for the same
 * memory envelope the first `percentile` pass paid anyway (the
 * `winsorize` scaladoc's documented exact-mode tradeoff; at truly
 * unbounded group sizes the approx path remains the escape hatch).
 * 3 scans + 3 buffered shuffles → 1 scan + 1 buffered shuffle.
 *
 * Value identity with the chained form is BIT-EXACT by construction:
 * `percentileSorted` reproduces `Percentile.getPercentile`'s
 * interpolation formula term-for-term
 * (`(higher − pos) · lowerKey + (pos − lower) · higherKey`, with the
 * equal-key and integral-position short-circuits), deviations are the
 * same `math.abs(v − med)` double arithmetic codegen produced, and the
 * outlier threshold multiplies in the same order
 * (`(k · 1.4826) · mad`). Gated ≡ the three-pass DataFrame form in
 * ProfileSpec (odd/even counts, duplicate values, constant and
 * two-value groups, planted outliers).
 *
 * Null values must be filtered by the caller (matching the previous
 * `filter(v.isNotNull)` shape); NaN sorts greatest (java.util.Arrays
 * ordering — the same total order Spark's percentile map sort uses) and
 * never counts as an outlier (`NaN > t` is false), both identical to
 * the chained form.
 *
 * Output: struct(med double, mad double, n long, n_outliers long);
 * an empty group evals to null (groupBy never produces one — an empty
 * input produces no group — but partial frames can).
 */
case class MadStats(
    value: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MadStats.Buf] {

  private lazy val kTimesC: Double =
    kExpr.eval().asInstanceOf[Number].doubleValue() * 1.4826

  override def children: Seq[Expression] = Seq(value, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (value.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"mad_stats: value must be double, got ${value.dataType.simpleString}")
    else if (!kExpr.foldable || kExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure("mad_stats: k must be a double literal")
    else if (kExpr.eval() == null ||
      kExpr.eval().asInstanceOf[Number].doubleValue() < 0.0)
      TypeCheckResult.TypeCheckFailure("mad_stats: k must be >= 0")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("med", DoubleType, nullable = true),
    StructField("mad", DoubleType, nullable = true),
    StructField("n", LongType, nullable = true),
    StructField("n_outliers", LongType, nullable = true)))

  override def nullable: Boolean = true

  override def createAggregationBuffer(): MadStats.Buf = new MadStats.Buf()

  override def update(buf: MadStats.Buf, input: InternalRow): MadStats.Buf = {
    val v = value.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: MadStats.Buf, other: MadStats.Buf): MadStats.Buf = {
    buf.addAll(other); buf
  }

  override def eval(buf: MadStats.Buf): Any = {
    val n = buf.n
    if (n == 0) return null
    val sorted = java.util.Arrays.copyOf(buf.arr, n)
    java.util.Arrays.sort(sorted)
    val med = MadStats.percentileSorted(sorted, 0.5)
    val devs = new Array[Double](n)
    var i = 0
    while (i < n) { devs(i) = math.abs(buf.arr(i) - med); i += 1 }
    java.util.Arrays.sort(devs)
    val mad = MadStats.percentileSorted(devs, 0.5)
    val threshold = kTimesC * mad
    var outliers = 0L
    i = 0
    while (i < n) { if (devs(i) > threshold) outliers += 1; i += 1 }
    InternalRow(med, mad, n.toLong, outliers)
  }

  override def serialize(buf: MadStats.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MadStats.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MadStats.Buf(math.max(n, 8))
    var i = 0
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MadStats =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MadStats =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MadStats =
    copy(value = c(0), kExpr = c(1))
  override def prettyName: String = "mad_stats"
}

object MadStats {

  /** Unboxed growable double buffer (ArrayBuffer[Double] would box). */
  final class Buf(initial: Int = 8) {
    var arr: Array[Double] = new Array[Double](initial)
    var n: Int = 0
    def add(v: Double): Unit = {
      if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(n) = v; n += 1
    }
    def addAll(o: Buf): Unit = {
      var i = 0
      while (i < o.n) { add(o.arr(i)); i += 1 }
    }
  }

  /** Spark `Percentile.getPercentile` over a SORTED array with unit
    * frequencies, formula reproduced term-for-term: position =
    * p · (N − 1); integral position or equal boundary keys return the
    * lower key without interpolation; otherwise
    * `(higher − pos) · lowerKey + (pos − lower) · higherKey`. */
  def percentileSorted(sorted: Array[Double], p: Double): Double = {
    val pos = (sorted.length - 1) * p
    val lower = math.floor(pos).toLong
    val higher = math.ceil(pos).toLong
    val lowerKey = sorted(lower.toInt)
    if (lower == higher) return lowerKey
    val higherKey = sorted(higher.toInt)
    if (higherKey == lowerKey) return lowerKey
    (higher - pos) * lowerKey + (pos - lower) * higherKey
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    _root_.graft.GraftExtensions.ensureRegistered(spark, "mad_stats",
      exprs => MadStats(exprs(0), exprs(1)))

  /** Aggregate Column: struct(med, mad, n, n_outliers) per group. */
  def madStats(spark: org.apache.spark.sql.SparkSession,
               value: Column, k: Double): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "mad_stats", value, org.apache.spark.sql.functions.lit(k))
  }
}
