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

  // ---- bloomPrunedJoin ----

  test("bloomPrunedJoin ≡ plain inner join (dup right keys, no-match keys, clash prefix)") {
    val plain = leftDf.join(rightDf.withColumnRenamed("lv", "r_lv"), Seq("k"), "inner")
    val pruned = Skew.bloomPrunedJoin(leftDf, rightDf, Seq("k"), expectedItems = 16)
    assertSameRows(pruned, plain)
  }

  test("bloomPrunedJoin: null keys on either side behave like the plain join") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ls = StructType(Seq(StructField("k", LongType), StructField("lv", LongType)))
    val rs = StructType(Seq(StructField("k", LongType), StructField("rv", StringType)))
    val l = spark.createDataFrame(Seq(
      Row(1L, 10L), Row(null, 11L), Row(2L, 12L)).asJava, ls)
    val r = spark.createDataFrame(Seq(
      Row(1L, "one"), Row(null, "nil"), Row(3L, "three")).asJava, rs)
    val plain = l.join(r, Seq("k"), "inner")
    assertSameRows(Skew.bloomPrunedJoin(l, r, Seq("k"), expectedItems = 8), plain)
  }

  test("bloomKeyFilter prunes non-matching probe rows (no false negatives, bounded fp)") {
    import org.apache.spark.sql.functions._
    val probe = spark.range(0, 2000).select(col("id").alias("k"))
    val build = spark.range(0, 20).select(col("id").alias("k")) // keys 0..19
    val pred = Skew.bloomKeyFilter(build, Seq("k"), expectedItems = 32,
      fpp = 0.01)(probe, Seq("k"))
    val kept = probe.filter(pred).count()
    assert(kept >= 20L, s"false negative: kept $kept < 20 matching rows")
    // 1980 non-matching rows at 1% fpp → expect ~20 extras; 10x slack
    assert(kept <= 20L + 200L, s"pruning ineffective: kept $kept of 2000")
  }

  test("bloomPrunedJoin plan: might_contain filter sits below the join") {
    import org.apache.spark.sql.functions._
    // range-backed inputs: a LocalRelation probe would let the optimizer
    // constant-fold the literal-bloom filter at plan time (correct, but
    // invisible); Range keeps the runtime shape a real scan would have
    val probe = spark.range(0, 1000).select(col("id").alias("k"),
      (col("id") * 2).alias("lv"))
    val build = spark.range(0, 10).select(col("id").alias("k"),
      col("id").cast("string").alias("rv"))
    val df = Skew.bloomPrunedJoin(probe, build, Seq("k"), expectedItems = 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom filter missing from plan:\n$plan")
    // the filter must sit on the probe scan side, BEFORE the join
    val joinIdx = plan.indexOf("Join")
    val mcIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && mcIdx > joinIdx,
      s"might_contain not below the join:\n$plan")
  }

  test("bloomPrunedJoin: empty build side yields empty result") {
    val empty = rightDf.filter(org.apache.spark.sql.functions.lit(false))
    assert(Skew.bloomPrunedJoin(leftDf, empty, Seq("k"), expectedItems = 1).count() == 0L)
  }
}
