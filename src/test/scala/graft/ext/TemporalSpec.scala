package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class LEvent(user_id: Long, l_id: Long, us: Long)
final case class REvent(user_id: Long, r_id: Long, r_us: Long)

class TemporalSpec extends AnyFunSuite with SparkSpec {

  private def leftDf = {
    val sp = spark; import sp.implicits._
    Seq(
      LEvent(1, 10, 1000), // prior right at 900 → match
      LEvent(1, 11, 900),  // tie: right AT 900 matches (inclusive)
      LEvent(1, 12, 100),  // no prior right → null
      LEvent(2, 20, 5000), // prior right at 400, but tolerance-limited
      LEvent(3, 30, 700)   // user with no rights at all → null
    ).toDF()
  }

  private def rightDf = {
    val sp = spark; import sp.implicits._
    Seq(
      REvent(1, 101, 900),
      REvent(1, 100, 200),
      REvent(2, 200, 400)
    ).toDF()
  }

  test("asofJoin: latest prior match, inclusive ties, nulls beyond tolerance") {
    val out = Temporal.asofJoin(leftDf, rightDf, Seq("user_id"),
        "us", "r_us", Seq("r_id"), toleranceUs = Some(1000L))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out == Map(
      10L -> 101L, // 900 <= 1000, within tol 100
      11L -> 101L, // tie at 900 matches
      12L -> -1L,  // nothing prior
      20L -> -1L,  // match at 400 is 4600us old > tol 1000
      30L -> -1L)) // user never clicked
    // without tolerance the stale match comes back
    val noTol = Temporal.asofJoin(leftDf, rightDf, Seq("user_id"),
        "us", "r_us", Seq("r_id"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(noTol(20L) == 200L)
  }

  test("asofJoin forward: earliest NEXT match, inclusive ties, tolerance") {
    // rights per user 1: 200, 900; user 2: 400
    val out = Temporal.asofJoin(leftDf, rightDf, Seq("user_id"),
        "us", "r_us", Seq("r_id"), toleranceUs = Some(1000L),
        direction = "forward")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out == Map(
      10L -> -1L,  // left@1000: no right at or after 1000
      11L -> 101L, // left@900: tie at 900 matches (inclusive)
      12L -> 100L, // left@100: next right is 200, gap 100 <= tol
      20L -> -1L,  // left@5000: rights are all before
      30L -> -1L)) // user never clicked
    // with a tight tolerance the 100-us-away match also nulls
    val tight = Temporal.asofJoin(leftDf, rightDf, Seq("user_id"),
        "us", "r_us", Seq("r_id"), toleranceUs = Some(50L),
        direction = "forward")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(tight(12L) == -1L && tight(11L) == 101L)
  }

  test("asofJoin rejects an unknown direction") {
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(leftDf, rightDf, Seq("user_id"),
        "us", "r_us", Seq("r_id"), direction = "sideways")
    }
  }

  test("asofJoin plan: ONE keys exchange, zero join nodes") {
    val df = Temporal.asofJoin(leftDf.repartition(4), rightDf.repartition(4),
      Seq("user_id"), "us", "r_us", Seq("r_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 keys exchange, got $exchanges:\n$plan")
  }

  test("intervalJoin: band pairs only, no cartesian in the plan") {
    val sp = spark; import sp.implicits._
    val clicks = Seq((1L, 100L), (1L, 5000L), (2L, 0L)).toDF("user_id", "us")
    val buys = Seq((1L, 150L), (1L, 4000L), (1L, 5400L), (2L, 900L))
      .toDF("user_id", "us")
    val out = Temporal.intervalJoin(clicks, buys, Seq("user_id"),
        "us", "us", 0L, 500L)
      .select(col("user_id"), col("us"), col("r_us"))
      .collect().map(_.toSeq).toSet
    // click@100 → buy@150 (in [100,600]); click@5000 → buy@5400;
    // buy@4000 matches NO click (click@100 band ends 600); user 2: 900 > 500
    assert(out == Set(Seq(1L, 100L, 150L), Seq(1L, 5000L, 5400L)))
    val plan = Temporal.intervalJoin(clicks, buys, Seq("user_id"),
      "us", "us", 0L, 500L).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"band must ride the equi-join:\n$plan")
  }

  test("asofJoin equals the brute-force definition on randomized data") {
    // 300×300 seeded-random events over 6 keys with deliberate ts
    // collisions (ts ∈ 0..120): checks the window formulation against the
    // direct "max rightTs <= leftTs" definition, including tie paths.
    // Right (key, ts) pairs are deduped (max r_id) — same determinism
    // contract the scaladoc states and q_asof_join applies.
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(42)
    val lRows = (0 until 300).map(i =>
      LEvent(rnd.nextInt(6), i, rnd.nextInt(121)))
    val rRaw = (0 until 300).map(i =>
      REvent(rnd.nextInt(6), i, rnd.nextInt(121)))
    val rDedup = rRaw.groupBy(r => (r.user_id, r.r_us)).map { case ((u, ts), g) =>
      REvent(u, g.map(_.r_id).max, ts)
    }.toSeq
    for (tol <- Seq(None, Some(10L), Some(0L))) {
      val got = Temporal.asofJoin(lRows.toDF(), rDedup.toDF(), Seq("user_id"),
          "us", "r_us", Seq("r_id"), toleranceUs = tol)
        .collect().map(r => r.getLong(1) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val expected = lRows.map { l =>
        val best = rDedup.filter(r => r.user_id == l.user_id && r.r_us <= l.us &&
            tol.forall(t => l.us - r.r_us <= t))
          .sortBy(r => (r.r_us, r.r_id)).lastOption
        l.l_id -> best.map(_.r_id)
      }.toMap
      assert(got == expected, s"tolerance=$tol")
    }
  }

  test("intervalJoin: shared-lineage sides (self-join) resolve unambiguously") {
    // both sides filtered from ONE frame — the classic ambiguous-self-join
    // hazard where dataset-resolved key columns land on the same attribute
    // ID ("trivially true equals predicate"); alias-scoped resolution
    // inside intervalJoin must keep the key equality REAL. range-backed so
    // constant folding can't collapse the shared lineage away.
    val base = spark.range(0, 20).select(
      (col("id") % 3).alias("user_id"),
      (col("id") * 100).alias("us"),
      (col("id") % 2 === 0).alias("is_click"))
    val clicks = base.filter(col("is_click")).select("user_id", "us")
    val buys = base.filter(!col("is_click")).select("user_id", "us")
    val out = Temporal.intervalJoin(clicks, buys, Seq("user_id"), "us", "us", 0L, 300L)
      .select("user_id", "us", "r_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = (for {
      c <- 0 until 20 if c % 2 == 0
      b <- 0 until 20
      if b % 2 == 1 && c % 3 == b % 3 &&
        b * 100 >= c * 100 && b * 100 <= c * 100 + 300
    } yield ((c % 3).toLong, c * 100L, b * 100L)).toSet
    assert(out == exp)
    // a cross-user pair within the band must NOT appear (the failure mode
    // of a trivially-true key predicate)
    assert(out.forall { case (u, l, r) => (l / 100) % 3 == u && (r / 100) % 3 == u })
  }

  test("intervalJoinStreams: stream-stream band join matches batch") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mkFrame = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("user_id"), timestamp_micros(col("us") * 1000000).alias("t"))
    val clicksData = Seq((1L, 100L), (1L, 5000L), (2L, 0L))
    val buysData = Seq((1L, 150L), (1L, 4000L), (1L, 5400L), (2L, 900L))
    val batch = Temporal.intervalJoinStreams(
        mkFrame(clicksData.toDF("user_id", "us")),
        mkFrame(buysData.toDF("user_id", "us")),
        Seq("user_id"), "t", "t", 0L, 500L)
      .collect().map(_.toSeq).toSet
    assert(batch.size == 2)
    val lMem = MemoryStream[(Long, Long)]
    val rMem = MemoryStream[(Long, Long)]
    val q = Temporal.intervalJoinStreams(
        mkFrame(lMem.toDF().toDF("user_id", "us")),
        mkFrame(rMem.toDF().toDF("user_id", "us")),
        Seq("user_id"), "t", "t", 0L, 500L)
      .writeStream.format("memory").queryName("band_out")
      .outputMode("append").start()
    try {
      lMem.addData(clicksData: _*)
      rMem.addData(buysData: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = sp.table("band_out").collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
