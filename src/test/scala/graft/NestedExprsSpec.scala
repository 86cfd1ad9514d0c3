package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Nested-expression builder coverage mirroring the reference's
  * tests/test_nested_helper.py: create/select/edit fields, deep nesting,
  * list-of-structs, list-of-lists-of-structs, select vs with-fields modes,
  * and error paths. */
class NestedExprsSpec extends AnyFunSuite with SparkSpec {

  private lazy val nestedDf = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("user", StructType(Seq(
        StructField("name", StringType),
        StructField("age", LongType),
        StructField("address", StructType(Seq(
          StructField("city", StringType),
          StructField("zip", StringType))))))),
      StructField("tags", ArrayType(StructType(Seq(
        StructField("k", StringType), StructField("v", LongType))))),
      StructField("matrix", ArrayType(ArrayType(StructType(Seq(
        StructField("x", LongType))))))))
    val rows = Seq(
      Row(1L, Row("ann", 30L, Row("berlin", "10115")),
        Seq(Row("a", 1L), Row("b", 2L)), Seq(Seq(Row(1L), Row(2L)), Seq(Row(3L)))),
      Row(2L, Row("bob", 41L, Row("paris", "75001")),
        Seq(Row("c", 3L)), Seq(Seq(Row(4L)))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("keep, rename-like lit, fn on top level (E4)") {
    val out = NestedExprs(nestedDf, Seq(
      "id" -> Fn(_ * 10),
      "doubled_age" -> Lit(col("user").getField("age") * 2)),
      WithFieldsMode)
    val r = out.orderBy("id").collect()
    assert(r.map(_.getAs[Long]("id")).toSeq == Seq(10L, 20L))
    assert(r.map(_.getAs[Long]("doubled_age")).toSeq == Seq(60L, 82L))
    // untouched columns preserved in with-columns application
    assert(out.columns.contains("tags"))
  }

  test("deep struct recursion edits a leaf two levels down (E5/E9)") {
    val out = NestedExprs(nestedDf, Seq(
      "user" -> Nested(
        "address" -> Nested(
          "city" -> Fn(upper(_))))), WithFieldsMode)
    val cities = out.select(col("user.address.city")).orderBy("id")
      .collect().map(_.getString(0)).toSeq
    assert(cities == Seq("BERLIN", "PARIS"))
    // with-fields mode: untouched sibling fields survive
    assert(out.select(col("user.address.zip")).collect().map(_.getString(0)).toSet ==
      Set("10115", "75001"))
  }

  test("select mode keeps ONLY the listed struct fields (E8)") {
    val out = NestedExprs(nestedDf, Seq(
      "user" -> Nested(
        "name" -> Keep,
        "age_months" -> Derive(s => s.getField("age") * 12))), SelectMode)
    val st = out.schema("user").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("name", "age_months"))
    assert(out.select(col("user.age_months")).orderBy(col("user.name"))
      .collect().map(_.getLong(0)).toSeq == Seq(360L, 492L))
  }

  test("list-of-structs element transform via transform HOF (E6)") {
    val out = NestedExprs(nestedDf, Seq(
      "tags" -> Nested(
        "v" -> Fn(_ + 100),
        "kv" -> Derive(e => concat(e.getField("k"), lit(":"), e.getField("v"))))),
      WithFieldsMode)
    val row1 = out.filter(col("id") === 1).select("tags").collect()(0)
      .getSeq[Row](0)
    assert(row1.map(_.getAs[Long]("v")) == Seq(101L, 102L))
    // Derive resolves against the ORIGINAL element (v before the +100 edit)
    assert(row1.map(_.getAs[String]("kv")) == Seq("a:1", "b:2"))
  }

  test("list-of-lists-of-structs recurses through both array layers (E6 nested)") {
    val out = NestedExprs(nestedDf, Seq(
      "matrix" -> Nested("x" -> Fn(_ * 2))), WithFieldsMode)
    val m = out.filter(col("id") === 1).select("matrix").collect()(0)
      .getSeq[scala.collection.Seq[Row]](0)
    assert(m.map(_.map(_.getLong(0)).toList).toList == List(List(2L, 4L), List(6L)))
  }

  test("new columns require Lit; fn/recurse on missing fields error (E4/E10)") {
    val e1 = intercept[IllegalArgumentException] {
      NestedExprs(nestedDf, Seq("nope" -> Fn(_ * 2)), WithFieldsMode)
    }
    assert(e1.getMessage.contains("not found in schema"))
    val e2 = intercept[IllegalArgumentException] {
      NestedExprs(nestedDf, Seq("user" -> Nested("ghost" -> Fn(_ * 2))), WithFieldsMode)
    }
    assert(e2.getMessage.contains("non-existent field"))
    val e3 = intercept[IllegalArgumentException] {
      NestedExprs(nestedDf, Seq("id" -> Nested("x" -> Keep)), WithFieldsMode)
    }
    assert(e3.getMessage.contains("Cannot recurse"))
  }

  test("select=true projects to exactly the spec'd columns (E2)") {
    val out = NestedExprs(nestedDf, Seq(
      "id" -> Keep,
      "name" -> Lit(col("user").getField("name"))), WithFieldsMode, select = true)
    assert(out.columns.toSeq == Seq("id", "name"))
    assert(out.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("ann", "bob"))
  }

  test("list of primitives: recursion errors, Fn transforms the whole list") {
    val df = nestedDf.withColumn("numbers", array(lit(1L), lit(2L), lit(3L)))
    val e = intercept[IllegalArgumentException] {
      NestedExprs(df, Seq("numbers" -> Nested("inner" -> Keep)), SelectMode)
    }
    assert(e.getMessage.contains("recurse"))
    val out = NestedExprs(df,
      Seq("numbers" -> Fn(a => transform(a, x => x * 2))), WithFieldsMode)
    assert(out.select("numbers").first().getSeq[Long](0) == Seq(2L, 4L, 6L))
  }

  test("empty nested spec: with_fields keeps all fields; select yields empty struct") {
    val wf = NestedExprs(nestedDf, Seq("user" -> Nested()), WithFieldsMode)
    assert(wf.schema("user").dataType == nestedDf.schema("user").dataType)
    // divergence from the reference documented: Polars cannot build empty
    // structs and raises; Spark can, so select mode yields struct<> here
    val sel = NestedExprs(nestedDf, Seq("user" -> Nested()), SelectMode)
    assert(sel.schema("user").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].isEmpty)
  }

  test("multiple top-level columns transform in one call, spec order preserved") {
    val out = NestedExprs(nestedDf, Seq(
      "id" -> Fn(_ * 10),
      "user" -> Nested("age" -> Fn(_ + 1))), WithFieldsMode)
    assert(out.columns.toSeq == nestedDf.columns.toSeq) // with_fields keeps frame shape
    val r = out.orderBy("id").select(col("id"), col("user.age")).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(10L, 20L))
    assert(r.map(_.getLong(1)).toSeq ==
      nestedDf.orderBy("id").select(col("user.age")).collect().map(_.getLong(0) + 1).toSeq)
  }

  test("structuring: unnestAll flattens recursively; schemaToMap round describes") {
    val flat = Structuring.unnestAll(nestedDf.select("id", "user"))
    assert(flat.columns.toSet ==
      Set("id", "user.name", "user.age", "user.address.city", "user.address.zip"))
    val m = Structuring.schemaToMap(nestedDf.schema).asInstanceOf[Map[String, Any]]
    assert(m.contains("matrix"))
  }
}
