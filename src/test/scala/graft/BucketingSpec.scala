package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 100 TB co-location story: pre-bucketing fact tables on the join/group key
  * lets repeated joins and packs run WITHOUT a shuffle on the bucketed side.
  * This is the cluster-scale replacement for the reference's single-process
  * locality — verified here by asserting the physical plan has no Exchange. */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed tables join with zero shuffle exchanges") {
    val sp = spark
    val dir = "/root/testdata/sf0.001"
    val prevThreshold = sp.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      sp.sql("DROP TABLE IF EXISTS b_orders")
      sp.sql("DROP TABLE IF EXISTS b_lineitem")
      sp.read.parquet(s"$dir/orders.parquet").write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
      sp.read.parquet(s"$dir/lineitem.parquet").write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

      val joined = sp.table("b_orders").join(sp.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() ==
        sp.read.parquet(s"$dir/lineitem.parquet").count())

      // a pack grouping on the bucket key also skips the shuffle
      val o = sp.table("b_orders")
      val l = sp.table("b_lineitem")
      val flat = o.join(l, col("o_orderkey") === col("l_orderkey")).select(
        (Tpch.orderCols.map(c => col(c).alias(s"order.$c")) ++
          Tpch.lineCols.map(c => col(c).alias(s"order.lineitem.$c"))): _*)
      val p = new Packer(Tpch.orderSpec, preserveChildOrder = false)
      val packedPlan = p.pack(flat, "lineitem").queryExecution.executedPlan.toString
      // pack's repartition only triggers for multi-stage packs; a leaf-level
      // pack grouped on the join key reuses the bucketed distribution
      assert(!packedPlan.contains("Exchange hashpartitioning"),
        s"pack on bucketed key should not shuffle:\n$packedPlan")
    } finally {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      sp.sql("DROP TABLE IF EXISTS b_orders")
      sp.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
