package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with SparkSpec {

  test("mortonCode interleaves rank bits in closed form") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, 1L), (2L, 3L), (0L, 0L), (3L, 3L)).toDF("x", "y")
    val z = df.select(Layout.mortonCode(Seq(col("x"), col("y")), 2).alias("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit b of dim d lands at position b*2+d
    assert(z == Seq(3L, 14L, 0L, 15L))
  }

  test("zorder preserves content exactly") {
    val sp = spark
    val src = sp.range(1000).select(
      col("id"), (col("id") * 17 % 101).alias("x"),
      (col("id") * 31 % 97).alias("y"))
    val out = Layout.zorder(src, Seq("x", "y"), numFiles = 8)
    assertSameRows(src, out)
  }

  test("z-ordered layout touches fewer files than hash layout on a box query") {
    val sp = spark
    // 20k uniform points on a 100x100 grid
    val src = sp.range(20000).select(
      (col("id") % 100).alias("x"),
      ((col("id") * 7919) % 100).alias("y"),
      col("id").alias("payload"))
    val zPath = "target/tmp/layout_z"
    val hPath = "target/tmp/layout_hash"
    Layout.zorderWrite(src, Seq("x", "y"), zPath, numFiles = 16)
    src.repartition(16).write.mode("overwrite").parquet(hPath)
    val box = col("x") < 25 && col("y") < 25
    val zTouched = Layout.filesTouched(sp.read.parquet(zPath), box)
    val hTouched = Layout.filesTouched(sp.read.parquet(hPath), box)
    // hash layout scatters the box over every file; z-order confines it
    // to the files covering that z-region
    assert(hTouched == 16, s"hash layout should hit all files, got $hTouched")
    assert(zTouched * 2 <= hTouched,
      s"zorder touched $zTouched of 16 files; expected <= half of hash's $hTouched")
    // content parity through the layout
    assert(sp.read.parquet(zPath).count() == 20000)
  }

  test("compactFiles bin-packs a shredded directory to the byte-derived count") {
    val sp = spark
    val src = sp.range(50000).select(col("id"),
      (col("id") % 7).alias("grp"), (col("id") * 3).alias("v"))
    val shredded = "target/tmp/layout_shredded"
    val compacted = "target/tmp/layout_compacted"
    src.repartition(64).write.mode("overwrite").parquet(shredded)
    val (before, _) = Layout.dirStats(sp, shredded)
    val (nIn, nOut) = Layout.compactFiles(sp, shredded, compacted,
      targetBytes = (before / 3) + 1)
    assert(nIn == 64, s"expected 64 shredded input files, saw $nIn")
    assert(nOut == 3, s"expected ceil(bytes/target)=3 output files, got $nOut")
    val (_, outFiles) = Layout.dirStats(sp, compacted)
    assert(outFiles == 3, s"wrote $outFiles files, planned 3")
    // content preserved exactly (order-agnostic)
    assertSameRows(sp.read.parquet(compacted), src)
  }

  test("sortedExport: files are internally sorted AND range-disjoint across files") {
    val sp = spark
    import org.apache.spark.sql.functions.{col, input_file_name, min => fmin, max => fmax}
    val src = sp.range(20000).select(
      ((col("id") * 7919) % 100003).alias("k"), col("id").alias("payload"))
    val out = "target/tmp/layout_sorted"
    Layout.sortedExport(src, Seq("k"), out, numFiles = 6)
    val back = sp.read.parquet(out)
    // content preserved
    assertSameRows(back, src)
    // per-file ranges must be pairwise disjoint (global order across files)
    val ranges = back.groupBy(input_file_name().alias("f"))
      .agg(fmin("k").alias("lo"), fmax("k").alias("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 2, s"expected multiple files, got ${ranges.length}")
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"file ranges overlap: $hi1 > $lo2 in ${ranges.toSeq}")
    }
  }

  test("compactFiles on an already-compact input is a size-preserving no-op shape") {
    val sp = spark
    val src = sp.range(1000).toDF("id")
    val one = "target/tmp/layout_one"
    val out = "target/tmp/layout_one_out"
    src.repartition(1).write.mode("overwrite").parquet(one)
    val (nIn, nOut) = Layout.compactFiles(sp, one, out, targetBytes = 1L << 30)
    assert(nIn == 1 && nOut == 1)
    assertSameRows(sp.read.parquet(out), src)
  }

  test("globalRowIndex == window row_number at several partition counts") {
    val sp = spark
    import org.apache.spark.sql.expressions.Window
    // scrambled input, unique composite (k, id) total order
    val src = sp.range(5000).select(
      col("id"), ((col("id") * 7919) % 257).alias("k")).repartition(13)
    val expected = src.withColumn("row_idx",
      row_number().over(Window.orderBy(col("k"), col("id"))).cast("long") - 1)
    for (n <- Seq(1, 3, 8, 64)) { // 64 > shuffle partitions -> empty parts
      val got = Layout.globalRowIndex(src, Seq("k", "id"), partitions = n)
      assertSameRows(got, expected)
    }
  }

  test("globalRowIndex: deterministic across retries, contiguous, 0-based") {
    val sp = spark
    val src = sp.range(777).select(col("id"), (col("id") % 5).alias("g"))
    val a = Layout.globalRowIndex(src, Seq("g", "id"), partitions = 4)
    val b = Layout.globalRowIndex(src, Seq("g", "id"), partitions = 4)
    assertSameRows(a, b)
    val idx = a.select("row_idx").collect().map(_.getLong(0)).sorted
    assert(idx.toSeq == (0L until 777L))
  }

  test("shuffledIndex: md5-order permutation, partition-independent, scrambling") {
    val sp = spark
    import org.apache.spark.sql.expressions.Window
    val src = sp.range(3000).toDF("id").repartition(7)
    // semantics = the windowed md5 order (the q_shuffled_export oracle)
    val expected = src.withColumn("shuffle_idx",
      row_number().over(Window.orderBy(
        md5(col("id").cast("string")), col("id"))).cast("long") - 1)
    for (n <- Seq(1, 5, 64)) {
      val got = Layout.shuffledIndex(src, Seq("id"), partitions = n)
      assertSameRows(got, expected)
    }
    // it actually scrambles: the permutation is far from the identity
    val fixed = Layout.shuffledIndex(src, Seq("id"))
      .filter(col("id") === col("shuffle_idx")).count()
    assert(fixed < 30, s"$fixed fixed points looks like no shuffle")
    // and it is a permutation of 0..n-1
    val idx = Layout.shuffledIndex(src, Seq("id"))
      .select("shuffle_idx").collect().map(_.getLong(0)).sorted
    assert(idx.toSeq == (0L until 3000L))
    // key-column collision raises loudly
    intercept[IllegalArgumentException](
      Layout.shuffledIndex(src.withColumn("__shuffle_key", lit(1)), Seq("id")))
  }

  test("shuffledIndex: multi-id tuples that concatenate identically get " +
    "DISTINCT keys (explicit separator); null ids raise") {
    val sp = spark
    import sp.implicits._
    // ("1","23") vs ("12","3") — identical under bare concatenation; the
    // \u0001-separated key must keep them apart, so the pair's relative
    // order follows md5(a<sep>b), not a raw-id fallback. The output must
    // still be a permutation of 0..n-1 with all rows present.
    val rows = Seq(("1", "23"), ("12", "3"), ("4", "56"), ("45", "6"),
      ("7", "8"), ("78", ""))
    val df = rows.toDF("a", "b")
    val got = Layout.shuffledIndex(df, Seq("a", "b"))
    val idx = got.select("shuffle_idx").collect().map(_.getLong(0)).sorted
    assert(idx.toSeq == (0L until rows.size.toLong),
      s"not a permutation: ${idx.mkString(",")}")
    // cross-engine semantics: the windowed md5(a || \u0001 || b) order
    import org.apache.spark.sql.expressions.Window
    val expected = df.withColumn("shuffle_idx",
      row_number().over(Window.orderBy(
        md5(concat_ws("\u0001", col("a"), col("b"))), col("a"), col("b")))
        .cast("long") - 1)
    assertSameRows(got, expected)
    // a null id must raise, not silently vanish from the key
    val withNull = Seq(("x", Option("y")), ("z", Option.empty[String]))
      .toDF("a", "b")
    val ex = intercept[Exception](
      Layout.shuffledIndex(withNull, Seq("a", "b")).collect())
    assert(ex.getMessage != null)
  }

  test("globalRowIndex: reserved/existing/empty-key inputs raise loudly") {
    val sp = spark
    val src = sp.range(10).toDF("id")
    intercept[IllegalArgumentException](
      Layout.globalRowIndex(src, Nil))
    intercept[IllegalArgumentException](
      Layout.globalRowIndex(src.withColumn("row_idx", lit(1)), Seq("id")))
    intercept[IllegalArgumentException](
      Layout.globalRowIndex(src.withColumn("__gri_mid", lit(1)), Seq("id")))
  }
}
