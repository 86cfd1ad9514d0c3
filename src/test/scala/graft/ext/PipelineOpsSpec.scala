package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 pipeline operators: deterministic split assignment, per-group
  * winsorization, CDC changelog compaction, trailing-window features, and
  * corpus-level duplicated n-grams. */
class PipelineOpsSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------ hashSplit

  test("hashSplit: total assignment, determinism, and the manual boundary rule") {
    val df = (1L to 1000L).toDF("id")
    val splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val got = Curation.hashSplit(df, "id", splits)
    assert(got.count() == 1000)
    // every row gets exactly one of the three names
    val names = got.select("split").distinct().as[String].collect().toSet
    assert(names.subsetOf(Set("train", "val", "test")))
    // assignment is the manual interval rule on hashUnit
    val manual = df.withColumn("u", Curation.hashUnit(col("id")))
      .withColumn("want",
        when(col("u") < 0.75, "train")
          .when(col("u") < 0.875, "val").otherwise("test"))
    val joined = got.join(manual, "id")
    assert(joined.filter(col("split") =!= col("want")).count() == 0)
    // deterministic under re-evaluation / reordering
    val again = Curation.hashSplit(df.orderBy(col("id").desc), "id", splits)
    assert(got.except(again).count() == 0 && again.except(got).count() == 0)
    // fractions roughly respected (binomial 3-sigma around 750/125/125)
    val byName = got.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(byName("train") - 750L) < 50, byName.toString)
  }

  test("hashSplit: rejects fractions that don't sum to 1") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Curation.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("hashSplit: rejects input that already has a split column (ADVICE r8)") {
    val df = Seq((1L, "old")).toDF("id", "split")
    val e = intercept[IllegalArgumentException] {
      Curation.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.5))
    }
    assert(e.getMessage.contains("split"))
  }

  // ------------------------------------------------------------ winsorize

  test("winsorize: hand-computed percentile band on 1..10") {
    // exact percentile: index = p*(n-1); p=0.1 over 1..10 → 1.9; p=0.9 → 9.1
    val df = (1 to 10).map(v => ("g", v.toDouble)).toDF("g", "v")
    val got = Profile.winsorize(df, Seq("g"), "v", 0.1, 0.9)
      .select(col("v"), col("v_w")).as[(Double, Double)].collect().toMap
    assert(math.abs(got(1.0) - 1.9) < 1e-12, got.toString)
    assert(math.abs(got(10.0) - 9.1) < 1e-12, got.toString)
    assert(got(5.0) == 5.0 && got(2.0) == 2.0 && got(9.0) == 9.0)
  }

  test("winsorize: groups clip independently; approx mode stays in-band") {
    val df = ((1 to 100).map(v => ("a", v.toDouble)) ++
      (1 to 100).map(v => ("b", v.toDouble * 1000))).toDF("g", "v")
    val exact = Profile.winsorize(df, Seq("g"), "v", 0.05, 0.95)
    val aRange = exact.filter(col("g") === "a")
      .agg(min("v_w"), max("v_w")).as[(Double, Double)].head()
    val bRange = exact.filter(col("g") === "b")
      .agg(min("v_w"), max("v_w")).as[(Double, Double)].head()
    assert(aRange._2 < 100 && bRange._1 > 100, (aRange, bRange).toString)
    // approx mode: same shape, clipped range within the true value range
    val approx = Profile.winsorize(df, Seq("g"), "v", 0.05, 0.95, exact = false)
    val aApprox = approx.filter(col("g") === "a")
      .agg(min("v_w"), max("v_w")).as[(Double, Double)].head()
    assert(aApprox._1 >= 1.0 && aApprox._2 <= 100.0)
  }

  test("winsorize: null values stay null; null group keys survive (ADVICE r8)") {
    val df = Seq(
      (Option("a"), Option(1.0)), (Option("a"), Option(100.0)),
      (Option("a"), Option.empty[Double]),      // null value in a real group
      (Option.empty[String], Option(5.0)),      // null GROUP key rows —
      (Option.empty[String], Option(50.0))      // the old inner join dropped these
    ).toDF("g", "v")
    val got = Profile.winsorize(df, Seq("g"), "v", 0.0, 1.0)
    assert(got.count() == 5, "no row loss on null group keys")
    // a null value must NOT become the band edge
    assert(got.filter(col("v").isNull).count() == 1)
    assert(got.filter(col("v").isNull && col("v_w").isNotNull).count() == 0)
    // null-group rows get their own band (identity clip at p=[0,1])
    val nullG = got.filter(col("g").isNull)
      .select("v_w").as[Double].collect().toSet
    assert(nullG == Set(5.0, 50.0), nullG.toString)
  }

  // ------------------------------------------------------------ corrMatrix

  test("corrMatrix: magnitude overflow fails loudly, never null correlations (ADVICE r8)") {
    // 9e18 squared ≈ 8.1e37 per row — three rows overflow decimal(38,0).
    // ANSI mode throws at the aggregation; non-ANSI turns the sum to null
    // and the raise_error guard fires. Either way: loud, never silent null.
    val big = 9.0e18
    val df = Seq((big, big), (big * 0.9, big * 0.9), (big * 0.8, big))
      .toDF("x", "y")
    val e = intercept[Exception] {
      Profile.corrMatrix(df, Seq("x", "y")).collect()
    }
    val m = Option(e.getMessage).getOrElse("").toLowerCase
    assert(m.contains("overflow") || m.contains("decimal") ||
      m.contains("out_of_range") || m.contains("out of range"), m)
  }

  // ------------------------------------------------------------- cdcApply

  test("cdcApply: latest version wins, tombstones delete, output schema preserved") {
    val log = Seq(
      (1L, 1L, "U", 10.0), (1L, 3L, "U", 30.0), (1L, 2L, "U", 20.0),
      (2L, 1L, "U", 11.0), (2L, 2L, "D", 0.0),
      (3L, 5L, "D", 0.0), (3L, 7L, "U", 77.0)
    ).toDF("k", "version", "op", "price")
    val got = Diff.cdcApply(log, Seq("k"), "version", "op")
    assert(got.columns.toSeq == Seq("k", "version", "op", "price"))
    val rows = got.select("k", "version", "price")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // key 1 → version 3; key 2's latest is a delete → gone; key 3 → 7
    assert(rows == Seq((1L, 3L, 30.0), (3L, 7L, 77.0)), rows.toString)
  }

  test("cdcApply: version ties break deterministically (struct lexicographic)") {
    val log = Seq((1L, 1L, "U", 5.0), (1L, 1L, "U", 9.0))
      .toDF("k", "version", "op", "price")
    val got = Diff.cdcApply(log, Seq("k"), "version", "op")
      .select("price").as[Double].collect().toSeq
    // ties fall back to the remaining columns in order: op then price → 9.0
    assert(got == Seq(9.0), got.toString)
  }

  // ----------------------------------------------------- rollingFeatures

  test("rollingFeatures: trailing RANGE window incl. current row; ties are peers") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 10L, 1L), (1L, 20L, 1L), (1L, 100L, 1L),
      (2L, 50L, 2L), (2L, 50L, 3L) // simultaneous events: frame peers
    ).toDF("user_id", "us", "m")
    val got = Temporal.rollingFeatures(df, "user_id", col("us"), col("m"),
      Seq("w" -> 15L))
      .select(col("user_id"), col("us"), col("n_w"), col("sum_w"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // user 1 @0: {0}; @10: {0,10}; @20: {10,20} (0 < 20-15=5); @100: {100}
    val u1 = got.filter(_._1 == 1L).map(r => (r._2, r._3))
    assert(u1 == Seq((0L, 1L), (10L, 2L), (20L, 2L), (100L, 1L)), u1.toString)
    // simultaneous rows see each other: both count 2, both sum 5
    val u2 = got.filter(_._1 == 2L)
    assert(u2.forall(r => r._3 == 2L && r._4 == 5L), u2.toString)
  }

  test("rollingFeatures: multiple spans plan ONE exchange (shared window spec)") {
    val df = spark.range(100).select(
      (col("id") % 5).alias("user_id"), col("id").alias("us"),
      lit(1L).alias("m"))
    val plan = Temporal.rollingFeatures(df, "user_id", col("us"), col("m"),
      Seq("a" -> 10L, "b" -> 50L, "c" -> 90L))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one exchange for all spans:\n$plan")
  }

  // ----------------------------------------------------- crossDocNgrams

  test("crossDocNgrams: doc frequency of shared spans; per-doc repeats count once") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "a quick brown fox sleeps"),
      (3L, "quick brown fox quick brown fox"), // intra-doc repeat: one vote
      (4L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val got = Dedup.crossDocNgrams(docs, "text", n = 3, minDocs = 2)
      .as[(String, Long)].collect().toMap
    assert(got("quick brown fox") == 3L, got.toString)
    assert(!got.contains("brown fox jumps")) // df=1 filtered
    assert(!got.exists(_._2 < 2), got.toString)
  }

  test("crossDocNgrams: docs shorter than n contribute their joined gram") {
    val docs = Seq((1L, "hi there"), (2L, "hi there"), (3L, "hi"))
      .toDF("doc_id", "text")
    val got = Dedup.crossDocNgrams(docs, "text", n = 3, minDocs = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("hi there" -> 2L), got.toString)
  }
}
