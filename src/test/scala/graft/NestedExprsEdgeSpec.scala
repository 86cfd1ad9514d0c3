package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/**
 * Port of the remaining reference nested-helper edge tests
 * (tests/test_nested_helper.py:201-745): deep struct nesting with
 * original-value references, select-mode transformations, lists of lists,
 * recursion type errors, and expression aliasing.
 */
class NestedExprsEdgeSpec extends SparkSpec {

  test("deeply nested struct: edits, keeps, and NEW fields from ORIGINAL values " +
    "(reference test_deeply_nested_structure)") {
    val innerT = StructType(Seq(StructField("x", LongType), StructField("y", LongType)))
    val outerT = StructType(Seq(StructField("inner", innerT), StructField("z", LongType)))
    val df = spark.createDataFrame(Seq(
      Row(Row(Row(1L, 2L), 3L)), Row(Row(Row(4L, 5L), 6L))).asJava,
      StructType(Seq(StructField("outer", outerT))))

    val fields = Seq("outer" -> Nested(
      "inner" -> Nested(
        "x" -> Fn(_ * 2),
        "y" -> Keep,
        "sum" -> Derive(s => s.getField("x") + s.getField("y"))),
      "z" -> Keep,
      "product" -> Derive(s => s.getField("inner").getField("x") * s.getField("z"))))

    val out = df.select(NestedExprs.generate(fields, df.schema, WithFieldsMode): _*)
    val first = out.collect()(0).getStruct(0)
    val inner = first.getStruct(first.fieldIndex("inner"))
    assert(inner.getLong(inner.fieldIndex("x")) == 2L)   // doubled
    assert(inner.getLong(inner.fieldIndex("y")) == 2L)   // unchanged
    assert(inner.getLong(inner.fieldIndex("sum")) == 3L) // ORIGINAL x+y = 1+2
    assert(first.getLong(first.fieldIndex("z")) == 3L)
    assert(first.getLong(first.fieldIndex("product")) == 3L) // ORIGINAL inner.x * z
  }

  test("select mode transforms listed fields and drops unlisted ones " +
    "(reference test_select_mode_with_transformations)") {
    val st = StructType(Seq(
      StructField("x", LongType), StructField("y", LongType), StructField("z", LongType)))
    val df = spark.createDataFrame(Seq(Row(Row(10L, 20L, 30L)), Row(Row(11L, 21L, 31L))).asJava,
      StructType(Seq(StructField("struct_col", st))))
    val out = df.select(NestedExprs.generate(
      Seq("struct_col" -> Nested("x" -> Fn(_ * 2), "y" -> Keep)),
      df.schema, SelectMode): _*)
    val s = out.collect()(0).getStruct(0)
    assert(s.schema.fieldNames.toSeq == Seq("x", "y")) // z excluded
    assert(s.getLong(0) == 20L && s.getLong(1) == 20L)
  }

  test("lists of lists of primitives transform via nested HOFs " +
    "(reference test_nested_lists)") {
    val df = spark.createDataFrame(
      Seq(Row(Seq(Seq(1L, 2L), Seq(3L, 4L))), Row(Seq(Seq(5L, 6L), Seq(7L, 8L)))).asJava,
      StructType(Seq(StructField("nested_lists", ArrayType(ArrayType(LongType))))))
    val out = NestedExprs.apply(df,
      Seq("nested_lists" -> Fn(c => transform(c, inner => transform(inner, _ * 2)))))
    val v = out.collect()(0).getSeq[scala.collection.Seq[Long]](0)
    assert(v(0).toSeq == Seq(2L, 4L) && v(1).toSeq == Seq(6L, 8L))
  }

  test("recursing into a primitive column raises a type error " +
    "(reference test_recurse_into_non_nested_type)") {
    val df = spark.range(3).toDF("a")
    val e = intercept[IllegalArgumentException] {
      NestedExprs.generate(Seq("a" -> Nested("inner" -> Keep)), df.schema)
    }
    assert(e.getMessage.contains("Cannot recurse into field with type"))
  }

  test("top-level Lit aliases are overridden by the entry name " +
    "(reference test_expr_with_alias)") {
    val df = spark.createDataFrame(Seq(Row(1L, 4L), Row(2L, 5L), Row(3L, 6L)).asJava,
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    val out = df.select(NestedExprs.generate(
      Seq("c" -> Lit((col("a") + col("b")).alias("sum"))), df.schema): _*)
    assert(out.columns.toSeq == Seq("c"))
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(5L, 7L, 9L))
  }

  test("struct field from Derive keeps the SPEC name even when internally aliased " +
    "(reference test_struct_with_pl_expr_field)") {
    val st = StructType(Seq(StructField("x", LongType), StructField("y", LongType)))
    val df = spark.createDataFrame(Seq(Row(Row(10L, 20L)), Row(Row(11L, 21L))).asJava,
      StructType(Seq(StructField("struct_col", st))))
    val out = df.select(NestedExprs.generate(
      Seq("struct_col" -> Nested(
        "x" -> Keep, "y" -> Keep,
        "sum" -> Derive(s => s.getField("x") + s.getField("y")),
        "multiplied" -> Derive(s => (s.getField("x") * s.getField("y")).alias("product")))),
      df.schema, WithFieldsMode): _*)
    val s = out.collect()(0).getStruct(0)
    assert(s.schema.fieldNames.contains("multiplied") && !s.schema.fieldNames.contains("product"))
    assert(s.getLong(s.fieldIndex("sum")) == 30L)
    assert(s.getLong(s.fieldIndex("multiplied")) == 200L)
  }

  test("editing a field in place under the same name " +
    "(reference test_edit_field_same_name / test_create_new_field_based_on_existing)") {
    val st = StructType(Seq(StructField("a", LongType), StructField("b", LongType)))
    val df = spark.createDataFrame(Seq(Row(Row(1L, 2L)), Row(Row(3L, 4L))).asJava,
      StructType(Seq(StructField("data", st))))
    val out = NestedExprs.apply(df,
      Seq("data" -> Nested(
        "a" -> Fn(_ + 100),
        "c" -> Derive(s => s.getField("a") + s.getField("b")))),
      mode = WithFieldsMode)
    val s = out.collect()(0).getStruct(0)
    assert(s.getLong(s.fieldIndex("a")) == 101L)
    assert(s.getLong(s.fieldIndex("b")) == 2L)
    assert(s.getLong(s.fieldIndex("c")) == 3L) // from ORIGINAL a=1, b=2
  }

  test("real-world composite: keeps + list derives + struct Fn/Derive in one " +
    "spec (reference test_complex_real_world_example)") {
    val orderT = StructType(Seq(StructField("item", StringType),
      StructField("price", DoubleType), StructField("quantity", LongType)))
    val profileT = StructType(Seq(StructField("name", StringType),
      StructField("age", LongType)))
    val schema = StructType(Seq(
      StructField("customer_id", LongType),
      StructField("orders", ArrayType(orderT)),
      StructField("profile", profileT)))
    val df = spark.createDataFrame(Seq(
      Row(1L, Seq(Row("apple", 1.0, 5L), Row("banana", 0.5, 10L)), Row("Alice", 30L)),
      Row(2L, Seq(Row("orange", 1.5, 3L)), Row("Bob", 25L)),
      Row(3L, Seq(Row("grape", 2.0, 2L), Row("apple", 1.0, 4L)), Row("Charlie", 35L))
    ).asJava, schema)
    val out = NestedExprs.apply(df, Seq(
      "customer_id" -> Keep,
      "orders" -> Nested(
        "item" -> Keep, "price" -> Keep, "quantity" -> Keep,
        "subtotal" -> Derive(e => e.getField("price") * e.getField("quantity")),
        "discounted_price" -> Derive(e => e.getField("price") * 0.9)),
      "profile" -> Nested(
        "name" -> Keep,
        "age" -> Fn(_ + 1),
        "is_senior" -> Derive(s => s.getField("age") >= 30))),
      mode = WithFieldsMode)
    val r0 = out.filter(col("customer_id") === 1L).collect()(0)
    val firstOrder = r0.getSeq[Row](r0.fieldIndex("orders"))(0)
    assert(firstOrder.getAs[Double]("subtotal") == 5.0)
    assert(math.abs(firstOrder.getAs[Double]("discounted_price") - 0.9) < 1e-9)
    val prof = r0.getStruct(r0.fieldIndex("profile"))
    assert(prof.getAs[Long]("age") == 31L)
    assert(prof.getAs[Boolean]("is_senior")) // ORIGINAL age 30 >= 30
  }
}
