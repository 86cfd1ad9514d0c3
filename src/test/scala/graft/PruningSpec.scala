package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scan-efficiency checks: partition pruning and filter/column pushdown
  * must reach the parquet source — at 100 TB these decide whether a query
  * reads terabytes or gigabytes. */
class PruningSpec extends AnyFunSuite with SparkSpec {

  test("hive-partitioned write prunes partitions on filter") {
    val sp = spark
    sp.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = "target/tmp/events_by_type"
    sp.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)

    val q = sp.read.parquet(out).filter(col("event_type") === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition filter in plan:\n$plan")
    // pruned scan must list only the one matching partition directory
    val scanned = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("event_type=error"))
    assert(q.count() ==
      sp.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(col("event_type") === "purchase").count())
  }

  test("filter and projection push into the parquet scan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"filters not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$scan")
  }

  test("pack input scan reads only the columns the query needs") {
    // q_enrich_aggs touches o_orderkey + lineitem measures; the orders scan
    // must collapse to the single join key column (nested-column pruning
    // through pack's aggregate)
    val q = SparkEntry.queries("q_enrich_aggs")(spark, "/root/testdata/sf0.001")
    val scans = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val ordersScan = scans.find(_.contains("orders.parquet")).get
    assert(ordersScan.contains("ReadSchema: struct<o_orderkey:bigint>"),
      s"orders scan should read only the key:\n$ordersScan")
  }
}
