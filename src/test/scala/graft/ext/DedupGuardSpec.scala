package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Guard-path tests that need private[ext] access: the bounded hot-bucket
  * broadcast fallback and the connectedComponents small-graph probe at its
  * exact boundary. */
class DedupGuardSpec extends graft.SparkSpec {

  private def hotRows = {
    val schema = StructType(Seq(StructField("__band", IntegerType),
      StructField("__bucket", LongType), StructField("id", LongType)))
    // group (0,0): 5 rows (hot at cap 3); (0,1): 2 rows; (1,0): 4 rows
    // (hot); (1,9): 1 row
    val rows =
      (0 until 5).map(i => Row(0, 0L, i.toLong)) ++
      (0 until 2).map(i => Row(0, 1L, (10 + i).toLong)) ++
      (0 until 4).map(i => Row(1, 0L, (20 + i).toLong)) ++
      Seq(Row(1, 9L, 30L))
    spark.createDataFrame(rows.asJava, schema)
  }

  test("dropHotBuckets: within the broadcast bound the hot list is a " +
    "collected LOCAL relation; over the bound it falls back to a shuffled " +
    "anti-join with identical output") {
    val expected = Set(10L, 11L, 30L) // survivors of the two cold groups
    val tiny = Dedup.dropHotBuckets(hotRows, Seq("__band", "__bucket"), cap = 3)
    assert(tiny.collect().map(_.getAs[Long]("id")).toSet == expected)
    // the common case anti-joins against the ALREADY-COLLECTED bounded
    // list — no second in-plan evaluation of the count pipeline (the
    // input itself is local in this test, so key off the aggregate)
    assert(!tiny.queryExecution.sparkPlan.toString.contains("HashAggregate"))
    // 2 hot groups > maxBroadcastGroups=1 → fallback keeps the agg
    // pipeline in-plan (no unbounded driver collect), same semantics
    val over = Dedup.dropHotBuckets(hotRows, Seq("__band", "__bucket"),
      cap = 3, maxBroadcastGroups = 1)
    assert(over.collect().map(_.getAs[Long]("id")).toSet == expected)
    assert(over.queryExecution.sparkPlan.toString.contains("HashAggregate"))
    // cap disabled stays the identity
    assert(Dedup.dropHotBuckets(hotRows, Seq("__band", "__bucket"),
      Int.MaxValue).collect().length == hotRows.count())
  }

  test("connectedComponents smallGraphEdges boundary: exactly-at-bound " +
    "takes the driver path, one-under-bound takes the probed distributed " +
    "path (sym reuses the probe cache), both equal the unprobed loop") {
    val rnd = new scala.util.Random(29)
    val edges = Seq.fill(200)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }.distinct
    val n = edges.size
    val df = spark.createDataFrame(edges.map(e => Row(e._1, e._2)).asJava,
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    def comps(bound: Int): Set[(Long, Long)] =
      Dedup.connectedComponents(df, "id_a", "id_b", smallGraphEdges = bound)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val atBound = comps(n)       // n <= bound → driver union-find
    val underBound = comps(n - 1) // probe collects n-1+1 = n rows, over → distributed
    val unprobed = comps(0)      // no probe at all
    assert(atBound == unprobed)
    assert(underBound == unprobed)
  }
}
