package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.jdk.CollectionConverters._

/** Separator-escaping parity (reference test_hierarchical_packer.py:197-295):
  * fields containing the separator or escape char survive join/split
  * roundtrips, custom separators work end-to-end through pack/unpack, and
  * property-based roundtrips hold for arbitrary segment content. */
class ColNameSpec extends AnyFunSuite with SparkSpec {

  test("escape/unescape roundtrip for fields containing separator and escape chars") {
    val cn = ColName.default
    for (f <- Seq("plain", "with.dot", "with\\esc", "a.b\\c.d", "..", "\\\\", "")) {
      assert(cn.unescapeField(cn.escapeField(f)) == f)
    }
    assert(cn.escapeField("a.b") == "a\\.b")
    assert(cn.escapeField("a\\b") == "a\\\\b")
  }

  test("splitPath is escape-aware and inverse of joinPath") {
    val cn = ColName.default
    val segs = Seq("country", "ci.ty", "str\\eet")
    assert(cn.splitPath(cn.joinPath(segs)) == segs)
    assert(cn.joinPath(segs) == "country.ci\\.ty.str\\\\eet")
  }

  test("property: joinPath/splitPath roundtrip for arbitrary segments") {
    val seg = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', '.', '\\', '-')).map(_.mkString)
    val lists = Gen.nonEmptyListOf(seg)
    (0 until 200).foreach { i =>
      val segs = lists.apply(Gen.Parameters.default, Seed(i.toLong)).get
      assert(ColName.default.splitPath(ColName.default.joinPath(segs)) == segs,
        s"failed for $segs")
    }
  }

  test("custom separator packs and unpacks end-to-end") {
    val cn = ColName("/", "\\")
    val spec = HierarchySpec(
      Seq(
        LevelSpec("order", Seq(NamedField("id"))),
        LevelSpec("item", Seq(NamedField("id")), parentKeys = Seq("order_id"))),
      colName = cn)
    val schema = StructType(Seq(
      StructField("order/id", LongType),
      StructField("order/item/id", LongType),
      StructField("order/item/order_id", LongType),
      StructField("order/item/qty", LongType)))
    val rows = Seq(Row(1L, 10L, 1L, 5L), Row(1L, 11L, 1L, 7L), Row(2L, 20L, 2L, 9L))
    val df = spark.createDataFrame(new java.util.ArrayList(rows.asJava), schema)
    val p = new Packer(spec)
    val packed = p.pack(df, "order")
    assert(packed.schema.fieldNames.toSeq == Seq("order"))
    assertSameRows(p.unpack(packed, "item"), df)
  }

  test("quote doubles embedded backticks so exotic names still resolve") {
    assert(ColName.quote("a`b") == "`a``b`")
    val df = spark.range(1).select(org.apache.spark.sql.functions.lit(7).alias("weird`name.x"))
    assert(df.select(ColName.topCol("weird`name.x")).collect()(0).getInt(0) == 7)
  }

  test("field names containing the separator survive pack via escaping") {
    val cn = ColName.default
    val spec = HierarchySpec(Seq(
      LevelSpec("root", Seq(NamedField("id"))),
      LevelSpec("child", Seq(NamedField("the.id")), parentKeys = Seq("root_id"))))
    // qualified flat name: child id field "the.id" escapes to "the\.id"
    val childIdCol = "root.child." + cn.escapeField("the.id")
    val schema = StructType(Seq(
      StructField("root.id", LongType),
      StructField(childIdCol, LongType),
      StructField("root.child.root_id", LongType)))
    val rows = Seq(Row(1L, 100L, 1L), Row(1L, 101L, 1L))
    val df = spark.createDataFrame(new java.util.ArrayList(rows.asJava), schema)
    val p = new Packer(spec)
    val packed = p.pack(df, "root")
    val inner = packed.schema("root").dataType.asInstanceOf[StructType]("child")
      .dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    // inside the struct the field keeps its ESCAPED short name (prefix stripped)
    assert(inner.fieldNames.contains(cn.escapeField("the.id")))
    assertSameRows(p.unpack(packed, "child"), df)
  }

  test("escape char equal to the separator is rejected (reference :282)") {
    val e = intercept[IllegalArgumentException](ColName(".", "."))
    assert(e.getMessage.contains("must differ"))
    intercept[IllegalArgumentException](ColName("..", "\\")) // multi-char separator
  }
}
