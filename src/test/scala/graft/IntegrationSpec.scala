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

  test("pack → enrich → unpack plan construction triggers no Spark jobs " +
    "(laziness parity; reference test_lazyframe_throughout_workflow, " +
    "test_integration.py:258-302)") {
    // The reference asserts the whole workflow stays a LazyFrame; the Spark
    // equivalent is that building the plan schedules NO jobs — everything
    // runs on the single terminal action. Jobs are counted via listener;
    // a marker job flushes the async listener bus (events are ordered, so
    // once the marker is observed every earlier job start was delivered).
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var sawMarker = false
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (Option(js.properties)
          .exists(_.getProperty("spark.job.description", "") == "graft-lazy-marker"))
          sawMarker = true
        else jobCount.incrementAndGet()
      }
    }
    // source construction first: spark.read.parquet schema inference runs
    // its own small job, which is not what this test is about
    val p = new Packer(Tpch.orderSpec)
    val flat = Tpch.flatOrderLines(spark, dir)
    flat.schema // force footer-read/inference jobs BEFORE counting
    spark.sparkContext.addSparkListener(listener)
    try {
      val packed = p.pack(flat, "lineitem")
      val enriched = p.enrich(packed, "order",
        LevelAttribute("l_quantity", "lineitem", Agg.Sum, Some("total_qty")))
      val back = p.unpack(enriched, "lineitem")
      assert(back.columns.nonEmpty) // schema-only access — still no job
      spark.sparkContext.setJobDescription("graft-lazy-marker")
      try spark.range(1).count()
      finally spark.sparkContext.setJobDescription(null)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!sawMarker && System.nanoTime() < deadline) Thread.sleep(20)
      assert(sawMarker, "listener bus did not deliver the marker job in 10s")
      assert(jobCount.get() == 0,
        s"plan construction ran ${jobCount.get()} Spark job(s); expected none")
      // and the deferred plan is correct when finally executed
      assert(back.count() == flat.count())
    } finally spark.sparkContext.removeSparkListener(listener)
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

  test("geographic 3-level buildFromTables → unpack → continent rollup " +
    "(reference test_geographic_data_analysis / test_three_level_build_from_tables)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val spec = HierarchySpec(Seq(
      LevelSpec("continent", Seq(NamedField("code"))),
      LevelSpec("country", Seq(NamedField("code")), parentKeys = Seq("continent_code")),
      LevelSpec("city", Seq(NamedField("id")), parentKeys = Seq("country_code"))))
    val p = new Packer(spec)
    def mk(rows: Seq[Row], fields: (String, DataType)*) =
      spark.createDataFrame(rows.asJava,
        StructType(fields.map { case (n, t) => StructField(n, t) }))
    val continents = mk(Seq(Row("NA", "North America"), Row("EU", "Europe")),
      "code" -> StringType, "name" -> StringType)
    val countries = mk(Seq(
      Row("US", "United States", "NA"), Row("CA", "Canada", "NA"),
      Row("UK", "United Kingdom", "EU"), Row("DE", "Germany", "EU")),
      "code" -> StringType, "name" -> StringType, "continent_code" -> StringType)
    val cities = mk(Seq(
      Row("NYC", "New York", 8000000L, "US"), Row("LA", "Los Angeles", 4000000L, "US"),
      Row("TOR", "Toronto", 3000000L, "CA"), Row("LON", "London", 9000000L, "UK"),
      Row("BER", "Berlin", 3500000L, "DE")),
      "id" -> StringType, "name" -> StringType, "population" -> LongType,
      "country_code" -> StringType)
    val geo = p.buildFromTables(Map(
      "continent" -> continents, "country" -> countries, "city" -> cities))
    assert(geo.count() == 2)
    val flat = p.unpack(geo, "city")
    assert(flat.count() == 5)
    val pops = flat.groupBy(ColName.topCol("continent.code").alias("code"))
      .agg(sum(ColName.topCol("continent.country.city.population")).alias("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pops == Map("EU" -> 12500000L, "NA" -> 15000000L))
  }

  test("chained with_fields transformations see earlier derived fields " +
    "(reference test_multiple_transformations_same_data)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val mtype = StructType(Seq(StructField("views", LongType),
      StructField("clicks", LongType), StructField("conversions", LongType)))
    val df = spark.createDataFrame(Seq(
      Row(Row(1000L, 50L, 10L)), Row(Row(2000L, 100L, 25L))).asJava,
      StructType(Seq(StructField("metrics", mtype))))
    val rates = NestedExprs(df, Seq(
      "metrics" -> Nested(
        "click_rate" -> Derive(m =>
          m.getField("clicks").cast("double") / m.getField("views") * 100),
        "conv_rate" -> Derive(m =>
          m.getField("conversions").cast("double") / m.getField("clicks") * 100))),
      WithFieldsMode)
    val normalized = NestedExprs(rates, Seq(
      "metrics" -> Nested(
        "views_normalized" -> Derive(m => m.getField("views").cast("double") / 1000),
        "performance_score" -> Derive(m =>
          (m.getField("click_rate") + m.getField("conv_rate")) / 2))),
      WithFieldsMode)
    val r0 = normalized.select(col("metrics")).collect()(0).getStruct(0)
    assert(r0.getAs[Double]("click_rate") == 5.0)
    assert(r0.getAs[Double]("conv_rate") == 20.0)
    assert(r0.getAs[Double]("views_normalized") == 1.0)
    assert(r0.getAs[Double]("performance_score") == 12.5)
  }
}
