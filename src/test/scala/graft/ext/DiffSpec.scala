package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class DiffSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("a", StringType),
    StructField("b", DoubleType)))

  private def frame(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, schema)

  private val old = Seq(
    Row(1L, "x", 1.0),  // unchanged
    Row(2L, "x", 2.0),  // changed: b
    Row(3L, "x", 3.0),  // removed
    Row(4L, null, 4.0), // null → value on a: changed
    Row(5L, null, 5.0), // null → null on a: unchanged
    Row(null, "n", 6.0)) // null KEY present on both sides
  private val neu = Seq(
    Row(1L, "x", 1.0),
    Row(2L, "x", 2.5),
    Row(4L, "y", 4.0),
    Row(5L, null, 5.0),
    Row(6L, "z", 6.0),  // added
    Row(null, "n", 7.0)) // null key pairs up, b changed

  test("classification: added/removed/changed/unchanged incl. null keys and null values") {
    val out = Diff.tableDiff(frame(old), frame(neu), Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        (r.getString(1), r.getString(2))).toMap
    assert(out == Map(
      1L -> ("unchanged", ""),
      2L -> ("changed", "b"),
      3L -> ("removed", ""),
      4L -> ("changed", "a"),
      5L -> ("unchanged", ""),
      6L -> ("added", ""),
      -1L -> ("changed", "b")))
  }

  test("multi-column change lists every differing column in compare order") {
    val o = frame(Seq(Row(1L, "x", 1.0)))
    val n = frame(Seq(Row(1L, "y", 9.0)))
    val r = Diff.tableDiff(o, n, Seq("k")).collect()(0)
    assert(r.getString(1) == "changed" && r.getString(2) == "a,b")
  }

  test("compareCols subset: out-of-scope changes read as unchanged") {
    val o = frame(Seq(Row(1L, "x", 1.0)))
    val n = frame(Seq(Row(1L, "x", 9.0)))
    val r = Diff.tableDiff(o, n, Seq("k"), compareCols = Some(Seq("a"))).collect()(0)
    assert(r.getString(1) == "unchanged")
  }

  test("diffSummary counts per class") {
    val m = Diff.diffSummary(frame(old), frame(neu), Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("unchanged" -> 2L, "changed" -> 3L, "removed" -> 1L, "added" -> 1L))
  }

  test("single keyed shuffle: plan has exactly one join and no window/generate") {
    val plan = Diff.tableDiff(frame(old), frame(neu), Seq("k"))
      .queryExecution.optimizedPlan.toString
    assert(plan.split("Join ").length == 2, s"expected ONE join:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Generate"), plan)
  }
}
