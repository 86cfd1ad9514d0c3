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

  test("schemaToMap mirrors the dtype tree") {
    val schema = StructType(Seq(
      StructField("n", LongType),
      StructField("l", ArrayType(StructType(Seq(StructField("v", DoubleType)))))))
    val m = Structuring.schemaToMap(schema).asInstanceOf[Map[String, Any]]
    assert(m("n") == "bigint")
    val inner = m("l").asInstanceOf[Seq[Any]].head.asInstanceOf[Map[String, Any]]
    assert(inner("v") == "double")
  }
}
