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

  test("choosePackStrategy probe scans never read payload columns") {
    // the probe's stated cost model ("keys-only pass", "bounded width
    // sample") only holds if column pruning actually reaches the source —
    // capture every probe job's scan via a QueryExecutionListener
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val sp = spark
    val out = "target/tmp/probe_pruning_src"
    val spec = HierarchySpec(Seq(
      LevelSpec("p", Seq(NamedField("id"))),
      LevelSpec("c", Seq(NamedField("id")))))
    sp.range(2000).select(
      (col("id") / 20).cast("long").alias("p.id"),
      concat_ws("", (0 until 256).map(_ => lit("x")): _*).alias("p.payload"),
      col("id").alias("p.c.id"),
      concat_ws("", (0 until 64).map(_ => lit("y")): _*).alias("p.c.blob"))
      .write.mode("overwrite").parquet(out)
    val scans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        qe.executedPlan.collectLeaves().foreach(l => scans.add(l.toString))
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    sp.listenerManager.register(listener)
    try {
      val strategy = new Packer(spec).choosePackStrategy(
        sp.read.parquet(out), sampleFraction = 0.5)
      assert(strategy == PackStrategy.SplitJoin) // 20 children, fat root attr
      // listener bus is async — wait for the probe jobs to be reported
      val deadline = System.currentTimeMillis() + 10000
      while (scans.size() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      import scala.jdk.CollectionConverters._
      val probeScans = scans.asScala.filter(_.contains("probe_pruning_src"))
      assert(probeScans.nonEmpty, "no probe scans captured")
      // the skew probe (leaf keys) and children-per-root pass (root keys)
      // must not read either payload column; only the bounded width
      // sample may (it reads everything by design, but is capped at
      // WidthProbeRows rows). At least one keys-only scan must exist and
      // no scan may read payload WITHOUT the width probe's limit shape.
      val keysOnly = probeScans.filter(s =>
        !s.contains("payload") && !s.contains("blob"))
      assert(keysOnly.nonEmpty,
        s"expected keys-only probe scans, got:\n${probeScans.mkString("\n---\n")}")
    } finally sp.listenerManager.unregister(listener)
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
