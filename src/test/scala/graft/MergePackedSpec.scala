package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Incremental pack maintenance: `mergePacked(pack(part1), part2)` must be
  * indistinguishable from `pack(part1 ++ part2)` — including multi-level
  * hierarchies, key aliases, brand-new entities at every level, empty
  * deltas, and spec-ordered children arriving out of order. */
class MergePackedSpec extends SparkSpec {

  private def splitRows(df: DataFrame, n: Int): (DataFrame, DataFrame) = {
    // deterministic split: first n rows (in source order) vs the rest —
    // zipWithIndex preserves the local-relation row order
    val schema = df.schema
    val rows = df.collect().toIndexedSeq
    (spark.createDataFrame(rows.take(n).asJava, schema),
      spark.createDataFrame(rows.drop(n).asJava, schema))
  }

  test("merge ≡ direct pack on the 5-level apartment hierarchy (alias, new root in delta)") {
    val p = new Packer(Fixtures.apartmentSpec)
    val df = Fixtures.apartmentDf(spark)
    // part2 = new building for an existing city + a brand-new country
    val (part1, part2) = splitRows(df, 2)
    val merged = p.mergePacked(p.pack(part1, "city"), part2, "city")
    assertSameRows(merged, p.pack(df, "city"))
  }

  test("merge ≡ direct pack on the 3-level streaming hierarchy, new entities at every level") {
    val p = new Packer(Fixtures.streamingSpec)
    val df = Fixtures.streamingDf(spark)
    // 13 rows; first 7 cover cities 0..2 — the delta adds streets to an
    // existing city, new cities to existing countries, and the rest
    val (part1, part2) = splitRows(df, 7)
    val merged = p.mergePacked(p.pack(part1, "city"), part2, "city")
    assertSameRows(merged, p.pack(df, "city"))
  }

  test("empty delta is an exact no-op") {
    val p = new Packer(Fixtures.streamingSpec)
    val df = Fixtures.streamingDf(spark)
    val packed = p.pack(df, "city")
    val empty = df.filter(lit(false))
    assertSameRows(p.mergePacked(packed, empty, "city"), packed)
  }

  test("untouched entities pass through byte-identical; only touched repack") {
    val p = new Packer(Fixtures.streamingSpec)
    val df = Fixtures.streamingDf(spark)
    val delta = df.filter(col("`country.id`") === "C1")
    val base = df.filter(col("`country.id`") =!= "C1")
    val merged = p.mergePacked(p.pack(base, "city"), delta, "city")
    assertSameRows(merged, p.pack(df, "city"))
    // the C0/C2 rows must equal the pre-merge packed rows exactly
    val pre = p.pack(base, "city")
    assertSameRows(merged.filter(col("`country.id`") =!= "C1"), pre)
  }

  test("spec orderBy re-sorts merged children even when the delta arrives out of order") {
    val spec = HierarchySpec(Seq(
      LevelSpec("o", Seq(NamedField("id"))),
      LevelSpec("i", Seq(NamedField("n")), parentKeys = Seq("oid"),
        orderBy = Seq(ColName.topCol("o.i.n")))))
    val p = new Packer(spec)
    val schema = StructType(Seq(
      StructField("o.id", LongType), StructField("o.i.n", LongType),
      StructField("o.i.oid", LongType), StructField("o.i.v", StringType)))
    def frame(rows: Seq[Row]) = spark.createDataFrame(rows.asJava, schema)
    val part1 = frame(Seq(Row(1L, 2L, 1L, "b"), Row(1L, 4L, 1L, "d")))
    // delta's children interleave BEFORE and BETWEEN existing ones
    val part2 = frame(Seq(Row(1L, 3L, 1L, "c"), Row(1L, 1L, 1L, "a")))
    val merged = p.mergePacked(p.pack(part1, "i"), part2, "i")
    val ns = merged.select(transform(col("`o.i`"), x => x.getField("n")).alias("ns"))
      .collect()(0).getSeq[Long](0)
    assert(ns == Seq(1L, 2L, 3L, 4L))
    assertSameRows(merged, p.pack(frame(Seq(
      Row(1L, 2L, 1L, "b"), Row(1L, 4L, 1L, "d"),
      Row(1L, 3L, 1L, "c"), Row(1L, 1L, 1L, "a"))), "i"))
  }

  test("without orderBy, existing children keep packed order and new ones append") {
    val spec = HierarchySpec(Seq(
      LevelSpec("o", Seq(NamedField("id"))),
      LevelSpec("i", Seq(NamedField("n")), parentKeys = Seq("oid"))))
    val p = new Packer(spec) // preserveChildOrder = true by default
    val schema = StructType(Seq(
      StructField("o.id", LongType), StructField("o.i.n", LongType),
      StructField("o.i.oid", LongType)))
    def frame(rows: Seq[Row]) = spark.createDataFrame(rows.asJava, schema)
    val part1 = frame(Seq(Row(1L, 7L, 1L), Row(1L, 5L, 1L)))
    val part2 = frame(Seq(Row(1L, 6L, 1L)))
    val merged = p.mergePacked(p.pack(part1, "i"), part2, "i")
    val ns = merged.select(transform(col("`o.i`"), x => x.getField("n")).alias("ns"))
      .collect()(0).getSeq[Long](0)
    assert(ns == Seq(7L, 5L, 6L), "old order preserved, new appended")
  }

  test("delta missing the top-level key columns is rejected") {
    val p = new Packer(Fixtures.streamingSpec)
    val df = Fixtures.streamingDf(spark)
    val packed = p.pack(df, "city")
    intercept[Exception] {
      p.mergePacked(packed, df.withColumnRenamed("country.id", "nope"), "city")
        .collect()
    }
  }
}
