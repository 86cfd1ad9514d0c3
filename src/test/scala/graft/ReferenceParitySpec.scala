package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/**
 * Round-3 reference-parity battery: one test per remaining reference test
 * not yet mirrored elsewhere in the suite, cited by name. Blocks:
 *
 *  - split_levels / normalize / denormalize on the apartment fixture
 *    (test_hierarchical_packer.py:140-179)
 *  - preserve_child_order=False (test_hierarchical_packer.py:181-190)
 *  - attribute_expr on the CROSS_LEVEL fixture
 *    (test_hierarchical_packer.py:1006-1130)
 *  - validate_schema result-shape tests (test_hierarchical_packer.py:1743-1813)
 *  - nested-helper remainders (test_nested_helper.py:238,494,635,663,682)
 *  - structuring remainders (test_structuring_utils.py:73,418,435)
 *  - expression-builder-on-packed-data integration
 *    (test_integration.py:307-396)
 */
class ReferenceParitySpec extends SparkSpec {
  import Fixtures._

  private lazy val p = new Packer(apartmentSpec)

  /** Count Spark jobs triggered by `f` (plan construction should be lazy —
    * the Spark analogue of the reference's LazyFrame-preservation asserts).
    * Same marker-flush idiom as IntegrationSpec's laziness test. */
  private def jobsDuring(f: => Unit): Int = {
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
    spark.sparkContext.addSparkListener(listener)
    try {
      f
      spark.sparkContext.setJobDescription("graft-lazy-marker")
      try spark.range(1).count()
      finally spark.sparkContext.setJobDescription(null)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!sawMarker && System.nanoTime() < deadline) Thread.sleep(20)
      assert(sawMarker, "listener bus did not deliver the marker job in 10s")
      jobCount.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  // ------------------------------------------------ split / (de)normalize
  // (reference test_hierarchical_packer.py:140-179)

  test("split_levels outputs one table per level with the expected columns " +
    "(reference test_split_levels_outputs_expected_tables)") {
    val flat = apartmentDf(spark)
    val cityPacked = p.pack(flat, "city")
    val tables = p.splitLevels(cityPacked)
    assert(tables.keySet == Set("city", "street", "building", "apartment"))
    // leaf table reproduces the full flat frame
    assertSameRows(tables("apartment"), flat)
    // street table carries nothing from the building level down
    assert(tables("street").schema.fieldNames
      .forall(!_.startsWith("country.city.street.building")))
    // one street row per distinct (city id, street name)
    val expectedStreets = flat
      .select(ColName.topCol("country.city.id"), ColName.topCol("country.city.street.name"))
      .distinct().count()
    assert(tables("street").count() == expectedStreets)
    // city table: country.* columns only, nothing street-ward
    assert(tables("city").schema.fieldNames.forall(c =>
      c.startsWith("country.") && !c.startsWith("country.city.street")))
  }

  test("normalize equals pack-to-root + split_levels per level " +
    "(reference test_normalize_matches_manual_split)") {
    val flat = apartmentDf(spark)
    val normalized = p.normalize(flat)
    val manual = p.splitLevels(p.pack(flat, "country"))
    assert(normalized.keySet == manual.keySet)
    manual.foreach { case (level, table) =>
      assertSameRows(normalized(level), table)
    }
  }

  test("denormalize reconstructs the nested frame from normalized tables " +
    "(reference test_denormalize_reconstructs_nested)") {
    val flat = apartmentDf(spark)
    val normalized = p.normalize(flat)
    val rebuilt = p.denormalize(normalized, Some("apartment"))
    val expected = p.pack(flat, "apartment")
    assertSameRows(rebuilt, expected)
  }

  test("pack without preserve_child_order emits no row-id column and still " +
    "roundtrips contents (reference test_pack_without_preserve_order)") {
    val relaxed = new Packer(apartmentSpec, preserveChildOrder = false)
    val flat = apartmentDf(spark)
    val packed = relaxed.pack(flat, "street")
    assert(packed.schema.fieldNames.forall(!_.startsWith("__hier")))
    assertSameRows(relaxed.unpack(packed, "apartment"), flat)
  }

  // ------------------------------------------------------- attribute_expr
  // CROSS_LEVEL fixture (reference test_hierarchical_packer.py:1006-1028)

  private val clSpec = HierarchySpec(Seq(
    LevelSpec("country", Seq(NamedField("code"))),
    LevelSpec("city", Seq(NamedField("id"))),
    LevelSpec("street", Seq(NamedField("name")))))

  private lazy val clPacker = new Packer(clSpec)

  private def clDf: DataFrame = {
    val schema = StructType(Seq(
      StructField("country.code", StringType),
      StructField("country.name", StringType),
      StructField("country.city.id", StringType),
      StructField("country.city.population", LongType),
      StructField("country.city.street.name", StringType),
      StructField("country.city.street.length_km", DoubleType)))
    val rows = Seq(
      Row("US", "United States", "NYC", 8000000L, "Broadway", 21.0),
      Row("US", "United States", "NYC", 8000000L, "5th Ave", 10.0),
      Row("US", "United States", "LA", 4000000L, "Sunset Blvd", 35.0),
      Row("CA", "Canada", "TOR", 3000000L, "Queen St", 5.0),
      Row("CA", "Canada", "TOR", 3000000L, "King St", 3.0))
    spark.createDataFrame(rows.asJava, schema)
  }

  private def byCountry(df: DataFrame, expr: org.apache.spark.sql.Column): Map[String, Any] =
    df.select(ColName.topCol("country.code"), expr.alias("v"))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap

  test("attribute_expr same-level access returns the plain column " +
    "(reference test_same_level_returns_column)") {
    val packed = clPacker.pack(clDf, "city")
    val vals = packed.select(clPacker.attributeExpr("name", "country", "country"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(vals == Seq("Canada", "United States"))
  }

  test("attribute_expr sums an immediate child attribute " +
    "(reference test_immediate_child_sum)") {
    val vals = byCountry(clPacker.pack(clDf, "city"),
      clPacker.attributeExpr("population", "city", "country", Agg.Sum))
    assert(vals("US") == 12000000.0 && vals("CA") == 3000000.0)
  }

  test("attribute_expr counts immediate child entities " +
    "(reference test_immediate_child_count)") {
    val vals = byCountry(clPacker.pack(clDf, "city"),
      clPacker.attributeExpr("id", "city", "country", Agg.Count))
    assert(vals("US") == 2L && vals("CA") == 1L)
  }

  test("attribute_expr sums across two hops (reference test_two_hop_sum)") {
    val vals = byCountry(clPacker.pack(clDf, "city"),
      clPacker.attributeExpr("length_km", "street", "country", Agg.Sum))
    assert(math.abs(vals("US").asInstanceOf[Double] - 66.0) < 1e-9)
    assert(math.abs(vals("CA").asInstanceOf[Double] - 8.0) < 1e-9)
  }

  test("attribute_expr counts across two hops as sum-of-counts " +
    "(reference test_two_hop_count)") {
    val vals = byCountry(clPacker.pack(clDf, "city"),
      clPacker.attributeExpr("name", "street", "country", Agg.Count))
    assert(vals("US") == 3L && vals("CA") == 2L)
  }

  test("multi-hop mean/last kernels reference the nested chain exactly once " +
    "(let-binding regression — a kernel referencing its argument k times " +
    "costs k^hops evaluations of the interpreted HOF cascade)") {
    for (agg <- Seq(Agg.Mean, Agg.Last)) {
      val expr = clPacker.attributeExpr("length_km", "street", "country", agg)
      val occurrences = "length_km".r.findAllIn(expr.toString).length
      assert(occurrences == 1,
        s"$agg: inner chain appears $occurrences times in\n${expr.toString.take(800)}")
    }
    // and the let-bound mean still produces the reference's mean-of-means
    // (BY DESIGN at >1 hop): US = mean(NYC (21+10)/2, LA 35) = 25.25,
    // CA = mean(TOR (5+3)/2) = 4.0
    val vals = byCountry(clPacker.pack(clDf, "city"),
      clPacker.attributeExpr("length_km", "street", "country", Agg.Mean))
    assert(math.abs(vals("US").asInstanceOf[Double] - ((21.0 + 10.0) / 2 + 35.0) / 2) < 1e-9)
    assert(math.abs(vals("CA").asInstanceOf[Double] - 4.0) < 1e-9)
  }

  test("two attribute_exprs compose with plain Column arithmetic " +
    "(reference test_expression_arithmetic)") {
    val packed = clPacker.pack(clDf, "city")
    val cityCount = clPacker.attributeExpr("id", "city", "country", Agg.Count)
    val totalPop = clPacker.attributeExpr("population", "city", "country", Agg.Sum)
    val avg = packed.withColumn("avg_pop", totalPop / cityCount)
      .filter(ColName.topCol("country.code") === "US")
      .select(col("avg_pop")).collect()(0).getDouble(0)
    assert(math.abs(avg - 6000000.0) < 1e-6)
  }

  // ------------------------------------------------------ validate_schema
  // (reference test_hierarchical_packer.py:1743-1813)

  test("validate_schema reports missing levels for a truncated schema " +
    "(reference test_partial_levels_missing)") {
    val truncated = apartmentDf(spark).drop(
      "country.city.street.building.apartment.id",
      "country.city.street.building.apartment.area")
    val result = p.validateSchema(truncated.schema)
    assert(result.missingLevels.contains("apartment"))
  }

  test("validate_schema populates every result field " +
    "(reference test_result_fields_populated)") {
    val result = p.validateSchema(apartmentDf(spark).schema)
    assert(result.isCompatible)
    assert(result.inferredLevel.contains("apartment"))
    assert(result.presentLevels.size == 5)
    assert(result.errors.isEmpty)
    // warnings is a populated (possibly empty) list, never null
    assert(result.warnings != null && result.missingLevels.isEmpty)
  }

  test("present and missing levels are disjoint on full AND partial schemas " +
    "(reference test_present_and_missing_levels_disjoint)") {
    val full = p.validateSchema(apartmentDf(spark).schema)
    assert(full.presentLevels.toSet.intersect(full.missingLevels.toSet).isEmpty)
    val partial = p.validateSchema(apartmentDf(spark).drop(
      "country.city.street.building.apartment.id",
      "country.city.street.building.apartment.area").schema)
    assert(partial.presentLevels.toSet.intersect(partial.missingLevels.toSet).isEmpty)
  }

  // ------------------------------------------------- nested-helper remainder
  // (reference test_nested_helper.py:238,494,635,663,682)

  test("NestedExprBuilder used directly with with_fields mode " +
    "(reference test_nested_expression_builder_direct)") {
    val df = spark.createDataFrame(
      Seq(Row(Row(10L, 20L)), Row(Row(11L, 21L))).asJava,
      StructType(Seq(StructField("struct_col", StructType(Seq(
        StructField("x", LongType), StructField("y", LongType)))))))
    val builder = new NestedExprBuilder(df.schema, WithFieldsMode)
    val exprs = builder.build(Seq("struct_col" -> Nested("x" -> Fn(_ * 2))))
    val row = df.select(exprs: _*).select(
      col("struct_col").getField("x"), col("struct_col").getField("y"))
      .collect()(0)
    assert(row.getLong(0) == 20L && row.getLong(1) == 20L)
  }

  test("top-level Fn reverses a whole list column " +
    "(reference test_list_with_callable_transformation)") {
    val df = spark.createDataFrame(
      Seq(Row(Seq(Row(1L), Row(2L))), Row(Seq(Row(3L), Row(4L)))).asJava,
      StructType(Seq(StructField("items", ArrayType(StructType(Seq(
        StructField("value", LongType))))))))
    val out = NestedExprs(df, Seq("items" -> Fn(c => reverse(c))), select = true)
    val first = out.select(col("items").getField("value")).collect()(0)
      .getSeq[Long](0)
    assert(first == Seq(2L, 1L))
  }

  test("apply_nested_operations convenience path adds a derived struct field " +
    "(reference test_apply_nested_operations_convenience)") {
    val df = spark.createDataFrame(
      Seq(Row(Row(1L, 2L)), Row(Row(3L, 4L))).asJava,
      StructType(Seq(StructField("data", StructType(Seq(
        StructField("a", LongType), StructField("b", LongType)))))))
    val out = NestedExprs(df,
      Seq("data" -> Nested("c" -> Derive(s => s.getField("a") + s.getField("b")))),
      WithFieldsMode)
    val c = out.select(col("data").getField("c")).collect().map(_.getLong(0)).toSeq
    assert(c == Seq(3L, 7L))
  }

  test("fixed-size array of structs transforms element-wise like a list " +
    "(reference test_array_type; Array ≡ List, SURVEY §1.2)") {
    val df = spark.createDataFrame(
      Seq(Row(Seq(Row(1L, 2L), Row(3L, 4L))), Row(Seq(Row(5L, 6L), Row(7L, 8L)))).asJava,
      StructType(Seq(StructField("items", ArrayType(StructType(Seq(
        StructField("value", LongType), StructField("count", LongType))), false), false))))
    val out = NestedExprs(df, Seq("items" -> Nested(
      "value" -> Fn(_ * 2), "count" -> Keep)), WithFieldsMode, select = true)
    val rows = out.select(col("items").getField("value"), col("items").getField("count"))
      .collect()
    assert(rows(0).getSeq[Long](0) == Seq(2L, 6L) && rows(0).getSeq[Long](1) == Seq(2L, 4L))
    assert(rows(1).getSeq[Long](0) == Seq(10L, 14L))
  }

  test("building and applying nested exprs schedules no Spark jobs " +
    "(laziness parity; reference test_lazyframe_support)") {
    val df = spark.createDataFrame(
      Seq(Row(Row(1L, 2L)), Row(Row(3L, 4L))).asJava,
      StructType(Seq(StructField("data", StructType(Seq(
        StructField("a", LongType), StructField("b", LongType)))))))
    var out: DataFrame = null
    val jobs = jobsDuring {
      out = NestedExprs(df,
        Seq("data" -> Nested("doubled" -> Derive(s => s.getField("a") * 2))),
        WithFieldsMode)
      out.schema // schema-only access stays planning-side
    }
    assert(jobs == 0, s"expression build ran $jobs job(s); expected none")
    assert(out.select(col("data").getField("doubled")).collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 6L))
  }

  // ------------------------------------------------- structuring remainder
  // (reference test_structuring_utils.py:73,418,435)

  test("unnest_rename flattens ONE level: inner structs stay structs " +
    "(reference test_unnest_with_nested_struct)") {
    val df = spark.createDataFrame(
      Seq(Row(1L, Row("Alice", Row("123 Main", "NYC"))),
          Row(2L, Row("Bob", Row("456 Oak", "LA")))).asJava,
      StructType(Seq(
        StructField("id", LongType),
        StructField("person", StructType(Seq(
          StructField("name", StringType),
          StructField("address", StructType(Seq(
            StructField("street", StringType), StructField("city", StringType))))))))))
    val out = Structuring.unnestRename(df, "person")
    val names = out.schema.fieldNames.toSeq
    assert(!names.contains("person"))
    assert(names.contains("person.name") && names.contains("person.address"))
    assert(out.schema("person.address").dataType.isInstanceOf[StructType])
    assert(out.select(ColName.topCol("person.name")).collect()
      .map(_.getString(0)).toSeq == Seq("Alice", "Bob"))
  }

  test("unnest_all plan construction schedules no Spark jobs " +
    "(reference test_unnest_all_returns_lazyframe)") {
    val df = spark.createDataFrame(
      Seq(Row(1L, Row("Alice", 30L)), Row(2L, Row("Bob", 25L))).asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("person", StructType(Seq(
          StructField("name", StringType), StructField("age", LongType)))))))
    var out: DataFrame = null
    val jobs = jobsDuring { out = Structuring.unnestAll(df); out.schema }
    assert(jobs == 0, s"unnestAll ran $jobs job(s); expected none")
    assert(out.schema.fieldNames.toSet == Set("id", "person.name", "person.age"))
  }

  test("unnest_all on a single-row frame (reference test_unnest_all_with_single_row)") {
    val df = spark.createDataFrame(
      Seq(Row(1L, Row("Alice", 30L))).asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("person", StructType(Seq(
          StructField("name", StringType), StructField("age", LongType)))))))
    val out = Structuring.unnestAll(df)
    val row = out.collect()(0)
    assert(out.count() == 1)
    assert(row.getLong(out.schema.fieldIndex("id")) == 1L)
    assert(row.getString(out.schema.fieldIndex("person.name")) == "Alice")
  }

  // ----------------------------------- expression builder × packed hierarchy
  // (reference test_integration.py:307-396)

  test("generate_nested_exprs transforms a PACKED hierarchy in place " +
    "(reference test_generate_exprs_on_packed_data)") {
    val spec2 = HierarchySpec(Seq(
      LevelSpec("category", Seq(NamedField("id"))),
      LevelSpec("product", Seq(NamedField("sku")))))
    val packer2 = new Packer(spec2)
    val schema = StructType(Seq(
      StructField("category.id", StringType),
      StructField("category.name", StringType),
      StructField("category.product.sku", StringType),
      StructField("category.product.name", StringType),
      StructField("category.product.price", DoubleType)))
    val rows = Seq(
      Row("electronics", "Electronics", "E001", "Laptop", 1000.0),
      Row("electronics", "Electronics", "E002", "Phone", 500.0))
    val packed = packer2.pack(spark.createDataFrame(rows.asJava, schema), "category")
    val out = NestedExprs(packed, Seq("category" -> Nested(
      "id" -> Keep,
      "name" -> Fn(c => upper(c)),
      "product" -> Nested(
        "price_with_tax" -> Derive(e => e.getField("price") * 1.08)))),
      WithFieldsMode)
    val row = out.select(
      col("category").getField("name"),
      col("category").getField("product").getField("price_with_tax")).collect()(0)
    assert(row.getString(0) == "ELECTRONICS")
    val taxed = row.getSeq[Double](1)
    assert(math.abs(taxed.head - 1080.0) < 1e-9)
  }

  test("chained with_fields passes see earlier derived fields " +
    "(reference test_multiple_transformations_same_data)") {
    val df = spark.createDataFrame(
      Seq(Row(Row(1000L, 50L, 10L)), Row(Row(2000L, 100L, 25L))).asJava,
      StructType(Seq(StructField("metrics", StructType(Seq(
        StructField("views", LongType), StructField("clicks", LongType),
        StructField("conversions", LongType)))))))
    val rates = NestedExprs(df, Seq("metrics" -> Nested(
      "click_rate" -> Derive(m => m.getField("clicks") / m.getField("views") * 100),
      "conv_rate" -> Derive(m => m.getField("conversions") / m.getField("clicks") * 100))),
      WithFieldsMode)
    val r0 = rates.select(
      col("metrics").getField("click_rate"), col("metrics").getField("conv_rate"))
      .collect()(0)
    assert(r0.getDouble(0) == 5.0 && r0.getDouble(1) == 20.0)
    // second pass sees click_rate/conv_rate as ORIGINAL fields of its input
    val scored = NestedExprs(rates, Seq("metrics" -> Nested(
      "views_normalized" -> Derive(m => m.getField("views") / 1000),
      "performance_score" -> Derive(m =>
        (m.getField("click_rate") + m.getField("conv_rate")) / 2))),
      WithFieldsMode)
    val s0 = scored.select(
      col("metrics").getField("views_normalized"),
      col("metrics").getField("performance_score")).collect()(0)
    assert(s0.getDouble(0) == 1.0 && s0.getDouble(1) == 12.5)
  }
}
