package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class SkewSpec extends SparkSpec {

  // hot key 1 dominates the left side — the exact saltedJoin target shape
  private def leftDf = {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("lv", LongType)))
    val rows = (1 to 200).map(i => Row(1L, i.toLong)) ++
      Seq(Row(2L, 900L), Row(3L, 901L), Row(99L, 999L)) // 99: no right match
    spark.createDataFrame(rows.asJava, schema)
  }

  private def rightDf = {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("rv", StringType),
      StructField("lv", StringType))) // lv clashes with left → prefixed
    spark.createDataFrame(Seq(
      Row(1L, "one", "x"), Row(1L, "uno", "y"), // duplicate right key: pair fan-out
      Row(2L, "two", "z"), Row(3L, "three", "w"),
      Row(7L, "seven", "v")).asJava, schema) // 7: no left match
  }

  test("saltedJoin ≡ plain inner join (row multiset), incl. duplicate right keys") {
    val plain = leftDf.join(
      rightDf.withColumnRenamed("rv", "rv").withColumnRenamed("lv", "r_lv"),
      Seq("k"), "inner")
    val salted = Skew.saltedJoin(leftDf, rightDf, Seq("k"), buckets = 8)
    assertSameRows(salted, plain)
  }

  test("buckets = 1 degenerates to the plain join") {
    val plain = leftDf.join(rightDf.withColumnRenamed("lv", "r_lv"), Seq("k"), "inner")
    assertSameRows(Skew.saltedJoin(leftDf, rightDf, Seq("k"), buckets = 1), plain)
  }

  test("hot key's rows actually spread across salt buckets") {
    // recompute the salt the operator assigns and count distinct values
    // for the hot key — with 200 rows over 8 buckets all 8 must be hit
    import org.apache.spark.sql.functions._
    val n = leftDf.filter(col("k") === 1L)
      .select(pmod(xxhash64(col("k"), col("lv")), lit(8)).alias("s"))
      .distinct().count()
    assert(n == 8L, s"expected all 8 salt buckets used, got $n")
  }

  test("deterministic: two runs produce identical results") {
    val a = Skew.saltedJoin(leftDf, rightDf, Seq("k"), buckets = 4)
    val b = Skew.saltedJoin(leftDf, rightDf, Seq("k"), buckets = 4)
    assertSameRows(a, b)
  }
}
