package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class Scd2Spec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("uid", LongType), StructField("eid", LongType),
    StructField("us", LongType), StructField("st", StringType)))

  private def events(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, schema)

  private def run(rows: Seq[Row]) =
    Temporal.scd2(events(rows), Seq("uid"), "us", Seq("st"), tieBreak = Seq("eid"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(t => (t._1, t._3, Option(t._2).getOrElse(""))).toSeq

  test("revisited value opens a NEW interval (A,A,B,A → three intervals)") {
    val out = run(Seq(
      Row(1L, 1L, 100L, "A"), Row(1L, 2L, 200L, "A"),
      Row(1L, 3L, 300L, "B"), Row(1L, 4L, 400L, "A")))
    assert(out == Seq(
      (1L, "A", 100L, 300L), (1L, "B", 300L, 400L), (1L, "A", 400L, -1L)))
  }

  test("intervals chain exactly: valid_to = next valid_from; last open (null)") {
    val out = run(Seq(
      Row(1L, 1L, 10L, "X"), Row(1L, 2L, 20L, "Y"), Row(2L, 3L, 5L, "Z")))
    assert(out == Seq((1L, "X", 10L, 20L), (1L, "Y", 20L, -1L), (2L, "Z", 5L, -1L)))
  }

  test("null attribute values are values: null→null is no change, null→A is") {
    val out = run(Seq(
      Row(1L, 1L, 10L, null), Row(1L, 2L, 20L, null), Row(1L, 3L, 30L, "A")))
    assert(out.map(t => (t._1, Option(t._2), t._3, t._4)).toSeq ==
      Seq((1L, None, 10L, 30L), (1L, Some("A"), 30L, -1L)))
  }

  test("same-timestamp events break ties by tieBreak deterministically") {
    val out = run(Seq(
      Row(1L, 2L, 100L, "B"), Row(1L, 1L, 100L, "A"), Row(1L, 3L, 200L, "B")))
    // order is (us, eid): A@(100,e1), B@(100,e2), B@(200,e3) → A then B
    assert(out == Seq((1L, "A", 100L, 100L), (1L, "B", 100L, -1L)))
  }

  test("one exchange: both windows reuse a single partitioning (no second shuffle)") {
    val df = events(Seq(Row(1L, 1L, 10L, "A"), Row(1L, 2L, 20L, "B")))
    val plan = Temporal.scd2(df, Seq("uid"), "us", Seq("st"), Seq("eid"))
      .queryExecution.executedPlan.toString
    val exchanges = plan.split("Exchange hashpartitioning").length - 1
    assert(exchanges == 1, s"expected one hash exchange, plan:\n$plan")
  }
}
