package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Structuring-utility parity (reference tests/test_structuring_utils.py):
  * deep unnesting, custom separators, null structs, empty structs, and
  * schema-to-map conversion. */
class StructuringSpec extends AnyFunSuite with SparkSpec {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(new java.util.ArrayList(rows.asJava), schema)

  test("unnestRename flattens one struct with prefixed names; arrays stay") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StructType(Seq(
        StructField("a", LongType),
        StructField("arr", ArrayType(LongType)))))))
    val d = df(schema, Row(1L, Row(10L, Seq(1L, 2L))))
    val out = Structuring.unnestRename(d, "s")
    assert(out.columns.toSeq == Seq("id", "s.a", "s.arr"))
    assert(out.select(ColName.topCol("s.arr")).collect()(0).getSeq[Long](0) == Seq(1L, 2L))
  }

  test("unnestAll recurses until no structs remain; null structs yield null leaves") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("o", StructType(Seq(
        StructField("x", LongType),
        StructField("i", StructType(Seq(StructField("y", StringType)))))))))
    val d = df(schema, Row(1L, Row(5L, Row("deep"))), Row(2L, null))
    val out = Structuring.unnestAll(d)
    assert(out.columns.toSeq == Seq("id", "o.x", "o.i.y"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getLong(1) == 5L && rows(0).getString(2) == "deep")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("unnestAll with a custom separator") {
    val schema = StructType(Seq(
      StructField("s", StructType(Seq(StructField("a", LongType))))))
    val out = Structuring.unnestAll(df(schema, Row(Row(1L))), separator = "/")
    assert(out.columns.toSeq == Seq("s/a"))
  }

  test("empty struct column unnests to zero columns") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("empty", StructType(Nil))))
    val out = Structuring.unnestAll(df(schema, Row(1L, Row())))
    assert(out.columns.toSeq == Seq("id"))
    assert(out.count() == 1)
  }

  test("unnestAll handles sibling structs at multiple depths, preserving column " +
    "and row order (reference test_unnest_all_complex_mixed_nesting/_multiple_struct_columns)") {
    val userT = StructType(Seq(
      StructField("name", StringType),
      StructField("profile", StructType(Seq(
        StructField("bio", StringType),
        StructField("settings", StructType(Seq(StructField("theme", StringType))))))),
      StructField("contact", StructType(Seq(StructField("email", StringType))))))
    val schema = StructType(Seq(StructField("id", LongType), StructField("user", userT)))
    val d = df(schema,
      Row(1L, Row("Alice", Row("Developer", Row("dark")), Row("alice@example.com"))),
      Row(2L, Row("Bob", Row("Designer", Row("light")), Row("bob@example.com"))))
    val out = Structuring.unnestAll(d)
    assert(out.columns.toSeq == Seq("id", "user.name", "user.profile.bio",
      "user.profile.settings.theme", "user.contact.email"))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("Alice", "Bob"))
    assert(rows.map(_.getString(3)).toSeq == Seq("dark", "light"))
    assert(rows.map(_.getString(4)).toSeq == Seq("alice@example.com", "bob@example.com"))
  }

  test("unnestAll five levels deep (reference test_unnest_all_very_deeply_nested_structs)") {
    val l5 = StructType(Seq(StructField("value", LongType)))
    val l4 = StructType(Seq(StructField("e", l5)))
    val l3 = StructType(Seq(StructField("d", l4)))
    val l2 = StructType(Seq(StructField("c", l3)))
    val l1 = StructType(Seq(StructField("b", l2)))
    val schema = StructType(Seq(StructField("a", l1)))
    val out = Structuring.unnestAll(df(schema, Row(Row(Row(Row(Row(Row(42L))))))))
    assert(out.columns.toSeq == Seq("a.b.c.d.e.value"))
    assert(out.collect()(0).getLong(0) == 42L)
  }

  test("unnestAll stops at arrays: structs INSIDE lists keep their shape " +
    "(reference scope: unnest_all flattens structs only)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StructType(Seq(
        StructField("items", ArrayType(StructType(Seq(StructField("v", LongType))))))))))
    val out = Structuring.unnestAll(df(schema, Row(1L, Row(Seq(Row(7L))))))
    assert(out.columns.toSeq == Seq("id", "s.items"))
    assert(out.schema("s.items").dataType.isInstanceOf[ArrayType])
  }

  test("unnestAll on a frame with no structs is the identity " +
    "(reference test_unnest_all_no_struct_columns)") {
    val schema = StructType(Seq(StructField("x", LongType), StructField("y", StringType)))
    val d = df(schema, Row(1L, "a"), Row(2L, "b"))
    val out = Structuring.unnestAll(d)
    assert(out.columns.toSeq == Seq("x", "y"))
    assert(out.count() == 2)
  }

  test("unnestAll preserves row order within a partition " +
    "(reference test_unnest_all_preserves_row_order): it is a pure select") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("person", StructType(Seq(
        StructField("name", StringType), StructField("age", LongType))))))
    val df = spark.createDataFrame(Seq(
      Row(3L, Row("Charlie", 35L)), Row(1L, Row("Alice", 30L)),
      Row(2L, Row("Bob", 25L))).asJava, schema).coalesce(1)
    val out = Structuring.unnestAll(df).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 1L, 2L))
    assert(out.map(_.getString(1)).toSeq == Seq("Charlie", "Alice", "Bob"))
    assert(out.map(_.getLong(2)).toSeq == Seq(35L, 30L, 25L))
  }

  test("schemaToMap mirrors the dtype tree") {
    val schema = StructType(Seq(
      StructField("n", LongType),
      StructField("l", ArrayType(StructType(Seq(StructField("v", DoubleType)))))))
    val m = Structuring.schemaToMap(schema).asInstanceOf[Map[String, Any]]
    assert(m("n") == "bigint")
    val inner = m("l").asInstanceOf[Seq[Any]].head.asInstanceOf[Map[String, Any]]
    assert(inner("v") == "double")
  }

  test("unionEvolve: missing columns null-filled, int widens to bigint") {
    val sp = spark; import sp.implicits._
    val day1 = Seq((1, "a"), (2, "b")).toDF("id", "name") // id: INT
    val day2 = Seq((3L, 9.5), (4L, 8.5)).toDF("id", "score") // id: BIGINT, new col
    val u = Structuring.unionEvolve(Seq(day1, day2))
    assert(u.schema("id").dataType == LongType, u.schema.treeString)
    assert(u.columns.toSeq == Seq("id", "name", "score")) // first-appearance order
    val rows = u.as[(Long, Option[String], Option[Double])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, Some("a"), None), (2L, Some("b"), None),
      (3L, None, Some(9.5)), (4L, None, Some(8.5))))
  }

  test("unionEvolve: incompatible shared types throw with the column named") {
    val sp = spark; import sp.implicits._
    val a = Seq(1).toDF("x")
    val b = Seq("s").toDF("x")
    val err = intercept[IllegalArgumentException](
      Structuring.unionEvolve(Seq(a, b)))
    assert(err.getMessage.contains("'x'"), err.getMessage)
  }

  test("unionEvolve: single frame is identity; three-way drift composes") {
    val sp = spark; import sp.implicits._
    val one = Seq((1L, "x")).toDF("id", "v")
    assert(Structuring.unionEvolve(Seq(one)).collect().toSeq ==
      one.collect().toSeq)
    val f1 = Seq(1).toDF("a")
    val f2 = Seq((2L, "y")).toDF("a", "b")
    val f3 = Seq((3.0, true)).toDF("a", "c")
    val u = Structuring.unionEvolve(Seq(f1, f2, f3))
    assert(u.schema("a").dataType == DoubleType) // int → bigint → double
    assert(u.columns.toSeq == Seq("a", "b", "c"))
    assert(u.count() == 3)
  }
}
