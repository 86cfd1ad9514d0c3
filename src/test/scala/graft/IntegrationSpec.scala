package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end workflows over the driver's testdata, mirroring the
  * reference's tests/test_integration.py: relational build → cross-level
  * analytics, normalize → transform → denormalize, conditional transforms
  * through the nested-expression builder. */
class IntegrationSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")

  test("database tables → nested analytics → filtered report") {
    val p = new Packer(Tpch.regionSpec)
    val nested = p.buildFromTables(Map(
      "region" -> t("region"), "nation" -> t("nation"), "customer" -> t("customer")),
      Some("customer"), joinType = "inner")
    // nested is at nation granularity with a customer list per nation
    val enriched = p.enrich(nested, "nation",
      LevelAttribute("c_acctbal", "customer", Agg.Max, Some("top_bal")),
      LevelAttribute("c_custkey", "customer", Agg.Count, Some("n_cust")))
    val report = enriched
      .filter(ColName.topCol("region.nation.n_cust") >= 5)
      .select(ColName.topCol("region.nation.n_name").alias("n_name"),
        ColName.topCol("region.nation.n_cust").alias("n_cust"),
        ColName.topCol("region.nation.top_bal").alias("top_bal"))
    val rows = report.collect()
    assert(rows.nonEmpty)
    // cross-check one nation against a plain SQL aggregation
    val expect = t("customer").groupBy("c_nationkey")
      .agg(count(lit(1)).alias("n"), max("c_acctbal").alias("m"))
      .join(t("nation"), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n") >= 5)
      .select(col("n_name"), col("n").alias("n_cust"), col("m").alias("top_bal"))
    assertSameRows(report, expect)
  }

  test("normalize → per-level transform → denormalize roundtrip") {
    val p = new Packer(Tpch.orderSpec)
    val flat = Tpch.flatOrderLines(spark, dir)
    val levels = p.normalize(flat)
    assert(levels.keySet == Set("order", "lineitem"))
    // transform one level table independently (what normalize is FOR),
    // then denormalize back and verify the new column landed in the nest
    val taxed = levels("lineitem").withColumn("order.lineitem.gross",
      ColName.topCol("order.lineitem.l_extendedprice") *
        (lit(1.0) + ColName.topCol("order.lineitem.l_tax")))
    val rebuilt = p.denormalize(Map("order" -> levels("order"), "lineitem" -> taxed))
    val back = p.unpack(rebuilt, "lineitem")
    val check = back.select(
      ColName.topCol("order.lineitem.l_extendedprice").alias("p"),
      ColName.topCol("order.lineitem.l_tax").alias("tx"),
      ColName.topCol("order.lineitem.gross").alias("g"))
      .filter(abs(col("g") - col("p") * (lit(1.0) + col("tx"))) > 1e-9)
    assert(check.count() == 0)
    assert(back.count() == flat.count())
  }

  test("conditional transform inside packed lists (e-commerce style)") {
    val p = new Packer(Tpch.orderSpec)
    val packed = p.pack(Tpch.flatOrderLines(spark, dir), "lineitem")
    val flagged = NestedExprs(packed, Seq(
      "order.lineitem" -> Nested(
        "band" -> Derive(x =>
          when(x.getField("l_quantity") >= 40, "bulk")
            .when(x.getField("l_quantity") >= 10, "mid")
            .otherwise("small")))), WithFieldsMode)
    val flat = p.unpack(flagged, "lineitem")
    val dist = flat.groupBy(ColName.topCol("order.lineitem.band").alias("band"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist.keySet == Set("bulk", "mid", "small"))
    assert(dist.values.sum == Tpch.flatOrderLines(spark, dir).count())
    // bands agree with a flat computation
    val expect = Tpch.flatOrderLines(spark, dir)
      .select(when(ColName.topCol("order.lineitem.l_quantity") >= 40, "bulk")
        .when(ColName.topCol("order.lineitem.l_quantity") >= 10, "mid")
        .otherwise("small").alias("band"))
      .groupBy("band").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist == expect)
  }
}
