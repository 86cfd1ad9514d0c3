package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Parity with the reference's tests/test_complex_hierarchies.py and the
  * attribute-expr composability examples: 6-level-deep hierarchies, the same
  * field name at different levels, boundary shapes, and cross-level
  * expressions used inside filters / sorts / arithmetic. */
class ComplexHierarchySpec extends SparkSpec {

  /** 6 levels: a→b→c→d→e→f, one id each, plus a same-named `name` field at
    * every level (reference: same field name at different levels, :373). */
  private val deepSpec = HierarchySpec(
    (0 until 6).map { i =>
      val n = ('a' + i).toChar.toString
      LevelSpec(n, Seq(NamedField("id")),
        parentKeys = if (i == 0) Nil else Seq("parent_id"))
    })

  private def deepDf: DataFrame = {
    val paths = (0 until 6).map(i => ('a' to ('a' + i).toChar).mkString("."))
    val fields = paths.flatMap { p =>
      Seq(StructField(s"$p.id", LongType), StructField(s"$p.name", StringType)) ++
        (if (p == "a") Nil else Seq(StructField(s"$p.parent_id", LongType)))
    }
    // 2 roots × 2 children per level at the deepest two levels = 8 leaves
    val rows = for {
      a <- Seq(0L, 1L); b = a; c = a; d = a
      e <- Seq(0L, 1L); f <- Seq(0L, 1L)
    } yield {
      val vals = Seq(a -> "a", b -> "b", c -> "c", d -> "d", e * 2 + a -> "e",
        f * 4 + e * 2 + a -> "f")
      Row.fromSeq(vals.zipWithIndex.flatMap { case ((id, n), i) =>
        Seq(id, s"$n$id") ++ (if (i == 0) Nil else Seq(vals(i - 1)._1))
      })
    }
    spark.createDataFrame(new java.util.ArrayList(rows.asJava), StructType(fields))
  }

  test("six-level pack/unpack roundtrip with same-named fields at every level") {
    val p = new Packer(deepSpec)
    val df = deepDf
    val packed = p.pack(df, "a")
    assert(packed.schema.fieldNames.toSeq == Seq("a"))
    assert(packed.count() == 2)
    val unpacked = p.unpack(packed, "f")
    assertSameRows(unpacked, df)
  }

  test("pack to every intermediate level and back") {
    val p = new Packer(deepSpec)
    val df = deepDf
    for (lvl <- Seq("e", "d", "c", "b")) {
      val packed = p.pack(df, lvl)
      assertSameRows(p.unpack(packed, "f"), df)
    }
  }

  test("single-row and single-level boundary shapes") {
    val p = new Packer(deepSpec)
    val one = deepDf.limit(1)
    assertSameRows(p.unpack(p.pack(one, "a"), "f"), one)

    val soloSpec = HierarchySpec(Seq(LevelSpec("x", Seq(NamedField("id")))))
    val soloP = new Packer(soloSpec)
    val solo = spark.createDataFrame(
      new java.util.ArrayList(Seq(Row(1L, "v")).asJava),
      StructType(Seq(StructField("x.id", LongType), StructField("x.val", StringType))))
    val packedSolo = soloP.pack(solo, "x")
    assert(packedSolo.schema.fieldNames.toSeq == Seq("x"))
    assertSameRows(soloP.unpack(packedSolo, "x"), solo)
  }

  test("non-hierarchy struct columns pass through pack untouched") {
    val p = new Packer(Fixtures.streamingSpec)
    val df = Fixtures.streamingDf(spark)
      .withColumn("meta", struct(lit(7).alias("n"), lit("z").alias("s")))
    val packed = p.pack(df, "city")
    assert(packed.schema.fieldNames.contains("meta"))
    assert(packed.select(col("meta.n")).distinct().collect().map(_.getInt(0)).toSeq == Seq(7))
  }

  test("attributeExpr composes into filter, sort, and arithmetic (reference examples.py)") {
    val p = new Packer(Fixtures.streamingSpec)
    // pack to "street": streets fold into lists, rows stay at city granularity
    val packed = p.pack(Fixtures.streamingDf(spark), "street")
    val nStreets = p.attributeExpr("id", "street", "city", Agg.Count)
    // filter: cities with more than one street → counts 3,2,4,2
    val filtered = packed.filter(nStreets > 1)
    assert(filtered.count() == 4)
    // arithmetic + sort: double the count, order desc
    val top = packed
      .withColumn("n2", nStreets * 2)
      .orderBy(col("n2").desc, ColName.topCol("country.city.id"))
      .select(ColName.topCol("country.city.id"), col("n2"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head == (("city3", 8L)))
    assert(top.map(_._2).toSeq == Seq(8L, 6L, 4L, 4L, 2L, 2L))
  }

  test("attributeExpr cascades across five hops (a←f in the 6-level spec)") {
    val p = new Packer(deepSpec)
    // pack to "b": b..f fold into nested lists, rows stay at `a` granularity
    val packed = p.pack(deepDf, "b")
    val out = packed.select(
      ColName.topCol("a.id").alias("a_id"),
      p.attributeExpr("id", "f", "a", Agg.Count).alias("n_f"),
      p.attributeExpr("id", "f", "a", Agg.Sum).alias("sum_f"),
      p.attributeExpr("id", "f", "a", Agg.Max).alias("max_f"))
      .orderBy("a_id").collect()
    // each root has 4 leaves; count cascades as sum-of-counts through
    // the 4 intermediate hops and stays LongType
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 4L))
    // leaf ids per root a: f = f*4 + e*2 + a for e,f in {0,1}
    assert(out.map(_.getDouble(2)).toSeq == Seq(0 + 4 + 2 + 6.0, 1 + 5 + 3 + 7.0))
    assert(out.map(_.getLong(3)).toSeq == Seq(6L, 7L))
  }

  test("set/single kernels and null attribute handling") {
    val p = new Packer(Fixtures.streamingSpec)
    val df = Fixtures.streamingDf(spark)
      .withColumn("country.city.street.tag",
        when(ColName.topCol("country.city.street.id").endsWith("_0"), lit("t0")))
    val packed = p.pack(df, "street")
    val tags = p.attributeExpr("tag", "street", "city", Agg.Set)
    val singles = p.attributeExpr("tag", "street", "city", Agg.Single)
    val out = packed.select(ColName.topCol("country.city.id").alias("c"),
      tags.alias("tags"), singles.alias("single")).collect()
    out.foreach { r =>
      // every city has exactly one street ending in _0 → set == ["t0"]
      assert(r.getSeq[String](1) == Seq("t0"))
      assert(r.getString(2) == "t0")
    }
  }

  // ---- null-handling + orphan parity (reference
  // test_complex_hierarchies.py:313-368, :608-633) ----

  private val pcSpec = HierarchySpec(Seq(
    LevelSpec("parent", Seq(NamedField("id"))),
    LevelSpec("child", Seq(NamedField("id")), parentKeys = Seq("parent_id"))))

  private def pcFlat(rows: Seq[Row], extraChildCols: Seq[StructField] = Nil): DataFrame =
    spark.createDataFrame(new java.util.ArrayList(rows.asJava), StructType(Seq(
      StructField("parent.id", StringType),
      StructField("parent.name", StringType),
      StructField("parent.child.id", StringType),
      StructField("parent.child.value", LongType)) ++ extraChildCols))

  test("parent with a null child packs to one row and unpack preserves the null") {
    val p = new Packer(pcSpec)
    val df = pcFlat(Seq(
      Row("p1", "Parent 1", "c1", 10L),
      Row("p2", "Parent 2", null, null)))
    val packed = p.pack(df, "parent")
    assert(packed.count() == 2)
    val unpacked = p.unpack(packed, "child")
    val nullChild = unpacked.filter(ColName.topCol("parent.id") === "p2").collect()
    assert(nullChild.length == 1)
    assert(nullChild(0).isNullAt(nullChild(0).fieldIndex("parent.child.id")))
  }

  test("parent whose children are all null still packs (one row per parent)") {
    val p = new Packer(pcSpec)
    val df = pcFlat(Seq(
      Row("p1", "Parent 1", null, null),
      Row("p1", "Parent 1", null, null)))
    assert(p.pack(df, "parent").count() == 1)
  }

  test("buildFromTables drops orphan children; childless parents survive left but not inner") {
    val p = new Packer(pcSpec)
    val parents = spark.createDataFrame(
      new java.util.ArrayList(Seq(Row("p1", "Parent 1"), Row("p2", "Parent 2")).asJava),
      StructType(Seq(StructField("id", StringType), StructField("name", StringType))))
    // c2's parent does not exist → orphan, dropped under BOTH join types
    val children = spark.createDataFrame(
      new java.util.ArrayList(Seq(Row("c1", "p1"), Row("c2", "p_unknown")).asJava),
      StructType(Seq(StructField("id", StringType), StructField("parent_id", StringType))))

    val left = p.unpack(p.buildFromTables(
      Map("parent" -> parents, "child" -> children), joinType = "left"), "child")
    assert(left.count() == 2) // c1 + childless p2 as a null-child row
    val leftIds = left.select(ColName.topCol("parent.child.id")).collect().map(_.getString(0))
    assert(leftIds.toSet == Set("c1", null))

    val inner = p.unpack(p.buildFromTables(
      Map("parent" -> parents, "child" -> children), joinType = "inner"), "child")
    val innerRows = inner.select(ColName.topCol("parent.id"), ColName.topCol("parent.child.id"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(innerRows.toSeq == Seq(("p1", "c1"))) // p2 dropped, c2 dropped
  }

  test("buildFromTables carries extra non-key columns through to unpack") {
    val p = new Packer(pcSpec)
    val parents = spark.createDataFrame(
      new java.util.ArrayList(Seq(Row("p1", "Parent 1", "a"), Row("p2", "Parent 2", "b")).asJava),
      StructType(Seq(StructField("id", StringType), StructField("name", StringType),
        StructField("extra_parent_col", StringType))))
    val children = spark.createDataFrame(
      new java.util.ArrayList(Seq(Row("c1", "p1", 1L), Row("c2", "p1", 2L), Row("c3", "p2", 3L)).asJava),
      StructType(Seq(StructField("id", StringType), StructField("parent_id", StringType),
        StructField("extra_child_col", LongType))))
    val unpacked = p.unpack(p.buildFromTables(Map("parent" -> parents, "child" -> children)), "child")
    val cols = unpacked.schema.fieldNames.toSet
    assert(cols.contains("parent.extra_parent_col"))
    assert(cols.contains("parent.child.extra_child_col"))
    assert(unpacked.count() == 3)
  }

  test("cross-level error paths: coarser from_level, non-adjacent filters, missing attribute") {
    val p = new Packer(deepSpec)
    // attribute_expr: from_level coarser than to_level is a config error
    intercept[HierarchyConfigError](p.attributeExpr("id", "a", "f", Agg.Sum))
    // exists/forall demand immediate parent-child adjacency
    val packed = p.pack(deepDf, "e")
    intercept[HierarchyConfigError](
      p.anyChildSatisfies(packed, "f", "a", _.getField("id") > 0))
    intercept[HierarchyConfigError](
      p.allChildrenSatisfy(packed, "f", "a", _.getField("id") > 0))
    // promote_attribute validates the field exists inside the packed struct
    val e = intercept[HierarchyConfigError](
      p.promoteAttribute(deepDf, "no_such_field", "f", "e", Agg.Sum))
    assert(e.getMessage.contains("no_such_field"))
    assert(e.getMessage.contains("Available fields"))
    // same-level attribute_expr degenerates to the plain qualified column:
    // pack(df, "f") nests only f, so e's own attributes stay flat
    val fPacked = p.pack(deepDf, "f")
    val c = fPacked.select(p.attributeExpr("id", "e", "e").alias("x"))
    assert(c.schema("x").dataType == org.apache.spark.sql.types.LongType)
  }

  test("denormalize left join gives childless parents a null child list; attributes recover") {
    val p = new Packer(pcSpec)
    // per-level tables in normalize's output encoding (qualified names,
    // child rows carry ancestor keys); p2 has NO child rows at all
    val parentTable = spark.createDataFrame(
      new java.util.ArrayList(Seq(Row("p1", "Parent 1"), Row("p2", "Parent 2")).asJava),
      StructType(Seq(StructField("parent.id", StringType), StructField("parent.name", StringType))))
    val childTable = spark.createDataFrame(
      new java.util.ArrayList(Seq(Row("p1", "c1", 10L)).asJava),
      StructType(Seq(StructField("parent.id", StringType),
        StructField("parent.child.id", StringType),
        StructField("parent.child.value", LongType))))
    val rebuilt = p.denormalize(Map("parent" -> parentTable, "child" -> childTable),
      Some("parent"))
    // p2's child list is null (left-join miss), not a fabricated empty struct
    val p2 = rebuilt.filter(ColName.topCol("parent.id") === "p2").collect()(0)
    assert(p2.isNullAt(p2.fieldIndex("parent.child")))
    // unpack keeps the childless parent with its attributes and null child fields
    val unpacked = p.unpack(rebuilt, "child")
    assert(unpacked.count() == 2)
    val r2 = unpacked.filter(ColName.topCol("parent.id") === "p2").collect()(0)
    assert(r2.getString(r2.fieldIndex("parent.name")) == "Parent 2")
    assert(r2.isNullAt(r2.fieldIndex("parent.child.id")))
    assert(r2.isNullAt(r2.fieldIndex("parent.child.value")))
    // the populated parent round-trips exactly
    val r1 = unpacked.filter(ColName.topCol("parent.id") === "p1").collect()(0)
    assert(r1.getString(r1.fieldIndex("parent.child.id")) == "c1")
    assert(r1.getLong(r1.fieldIndex("parent.child.value")) == 10L)
  }

  test("a LIST attribute at the parent level is data, not a child level " +
    "(reference test_hierarchy_with_nested_list_attribute)") {
    val spec = HierarchySpec(Seq(
      LevelSpec("order", Seq(NamedField("id"))),
      LevelSpec("item", Seq(NamedField("sku")))))
    val p = new Packer(spec)
    val schema = StructType(Seq(
      StructField("order.id", StringType),
      StructField("order.customer_tags", ArrayType(StringType)),
      StructField("order.item.sku", StringType),
      StructField("order.item.qty", LongType)))
    val df = spark.createDataFrame(Seq(
      Row("o1", Seq("vip", "repeat"), "SKU001", 2L),
      Row("o1", Seq("vip", "repeat"), "SKU002", 3L)).asJava, schema)
    val packed = p.pack(df, "order")
    assert(packed.count() == 1 && packed.columns.contains("order"))
    val unpacked = p.unpack(packed, "item")
    assert(unpacked.columns.contains("order.customer_tags"))
    assert(unpacked.count() == 2)
    assert(unpacked.select(ColName.topCol("order.customer_tags"))
      .collect()(0).getSeq[String](0).toSeq == Seq("vip", "repeat"))
  }

  test("a LIST-OF-STRUCT attribute inside a level is data, not a packed child " +
    "(reference test_nested_list_of_struct_within_hierarchy_level_preserved)") {
    val spec = HierarchySpec(Seq(
      LevelSpec("store", Seq(NamedField("id"))),
      LevelSpec("product", Seq(NamedField("sku")))))
    val p = new Packer(spec)
    val contactType = ArrayType(StructType(Seq(
      StructField("name", StringType), StructField("phone", StringType))))
    val schema = StructType(Seq(
      StructField("store.id", StringType),
      StructField("store.name", StringType),
      StructField("store.contacts", contactType),
      StructField("store.product.sku", StringType),
      StructField("store.product.price", DoubleType)))
    val contacts = Seq(Row("John", "123"))
    val df = spark.createDataFrame(Seq(
      Row("s1", "Store 1", contacts, "SKU001", 10.0),
      Row("s1", "Store 1", contacts, "SKU002", 20.0)).asJava, schema)
    val packed = p.pack(df, "store")
    assert(packed.count() == 1)
    val unpacked = p.unpack(packed, "product")
    assert(unpacked.columns.contains("store.contacts"))
    val c = unpacked.select(ColName.topCol("store.contacts")).collect()(0).getSeq[Row](0)
    assert(c.map(r => (r.getString(0), r.getString(1))) == Seq(("John", "123")))
    assertSameRows(unpacked, df)
  }

  test("NestedExprs transforms compose over a PACKED hierarchy " +
    "(reference test_apply_nested_operations_on_packed_hierarchy)") {
    val spec = HierarchySpec(Seq(
      LevelSpec("store", Seq(NamedField("id"))),
      LevelSpec("product", Seq(NamedField("sku")))))
    val p = new Packer(spec)
    val schema = StructType(Seq(
      StructField("store.id", StringType),
      StructField("store.name", StringType),
      StructField("store.product.sku", StringType),
      StructField("store.product.price", DoubleType),
      StructField("store.product.cost", DoubleType)))
    val df = spark.createDataFrame(Seq(
      Row("s1", "Store 1", "A", 10.0, 5.0),
      Row("s1", "Store 1", "B", 20.0, 10.0),
      Row("s2", "Store 2", "C", 15.0, 8.0)).asJava, schema)
    val packed = p.pack(df, "store")
    val result = NestedExprs.apply(packed,
      Seq("store" -> Nested(
        "product" -> Nested(
          "profit" -> Derive(e => e.getField("price") - e.getField("cost"))))),
      mode = WithFieldsMode)
    val unpacked = p.unpack(result, "product")
    assert(unpacked.columns.contains("store.product.profit"))
    val profits = unpacked.select(ColName.topCol("store.product.sku"),
      ColName.topCol("store.product.profit")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(profits == Map("A" -> 5.0, "B" -> 10.0, "C" -> 7.0))
  }

  test("wide hierarchy: 20 attribute columns per level round-trip " +
    "(reference test_wide_hierarchy_many_columns_per_level)") {
    val spec = HierarchySpec(Seq(
      LevelSpec("parent", Seq(NamedField("id"))),
      LevelSpec("child", Seq(NamedField("id")))))
    val p = new Packer(spec)
    val fields = Seq(StructField("parent.id", StringType),
      StructField("parent.child.id", StringType)) ++
      (0 until 20).map(i => StructField(s"parent.attr_$i", StringType)) ++
      (0 until 20).map(i => StructField(s"parent.child.field_$i", LongType))
    val rows = Seq(
      Row.fromSeq(Seq("p1", "c1") ++ (0 until 20).map(i => s"val_$i") ++
        (0 until 20).map(_.toLong)),
      Row.fromSeq(Seq("p1", "c2") ++ (0 until 20).map(i => s"val_$i") ++
        (0 until 20).map(i => (i + 1).toLong)))
    val df = spark.createDataFrame(rows.asJava, StructType(fields))
    val unpacked = p.unpack(p.pack(df, "parent"), "child")
    assert(unpacked.columns.length == df.columns.length)
    assert(unpacked.count() == 2)
    assert(unpacked.columns.toSet == df.columns.toSet)
  }
}
