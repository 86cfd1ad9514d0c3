package graft

import graft.streaming.{Event, EventStreams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Structured Streaming coverage: the SAME operators SparkEntry oracle-checks
  * in batch (session_window agg, stateful sessionizer, dedup), driven through
  * readStream/MemoryStream with watermarks and multi-batch state. */
class StreamingSpec extends AnyFunSuite with SparkSpec {

  private val Gap = 1800L * 1000000 // 30 min in micros

  private def ev(user: Long, id: Long, us: Long, value: Double = 1.0) =
    Event(user, id, us, value)

  test("streaming session_window agg equals batch on the same data") {
    val sp = spark
    import sp.implicits._
    val events = Seq(
      ev(1, 0, 0), ev(1, 1, 60L * 1000000), // session A: 2 events
      ev(1, 2, Gap * 3), // session B
      ev(2, 3, 0), ev(2, 4, Gap - 1), // under the gap: merges
      ev(2, 5, 2 * Gap - 1)) // gap exactly: touching windows merge too
    val toFrame = (df: org.apache.spark.sql.DataFrame) =>
      EventStreams.sessionAgg(
        EventStreams.watermarked(
          df.select(col("userId").alias("user_id"),
            timestamp_micros(col("us")).alias("event_time"), col("value")),
          delay = "0 seconds"),
        "30 minutes")

    val batchOut = toFrame(events.toDF()).collect().map(_.toSeq).toSet

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[Event]
    val q = toFrame(mem.toDF()).writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark far enough to close and emit all sessions
      mem.addData(ev(1, 99, Gap * 100), ev(2, 98, Gap * 100))
      q.processAllAvailable()
    } finally q.stop()
    val streamOut = sp.table("sess_out")
      .filter(col("session_start_us") < Gap * 100)
      .collect().map(_.toSeq).toSet

    assert(streamOut == batchOut)
    // sanity of the shape itself: user 1 → 2 sessions; user 2 → 1 session
    // (session_window merges both overlapping AND touching windows)
    val byUser = batchOut.groupBy(_.head).view.mapValues(_.size).toMap
    assert(byUser == Map(1L -> 2, 2L -> 1))
  }

  test("stateful sessionizer carries state across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.statefulSessionCounts(mem.toDS(), Gap).writeStream
      .format("memory").queryName("stateful_out").outputMode("update").start()
    try {
      // batch 1: user 1 opens one session (2 close events)
      mem.addData(ev(1, 0, 0), ev(1, 1, 1000000))
      q.processAllAvailable()
      // batch 2: user 1 continues the SAME session (small gap since last),
      // then opens a new one; user 2 appears
      mem.addData(ev(1, 2, 2000000), ev(1, 3, 2000000 + Gap + 1), ev(2, 4, 0))
      q.processAllAvailable()
    } finally q.stop()
    val out = sp.table("stateful_out").as[(Long, Long, Long)].collect()
    // last update per user wins
    val last = out.zipWithIndex.groupBy(_._1._1).view
      .mapValues(g => g.maxBy(_._2)._1).toMap
    assert(last(1L) == ((1L, 2L, 4L))) // 2 sessions, 4 events total
    assert(last(2L) == ((2L, 1L, 1L)))
  }

  test("stateful sessionizer runs on the RocksDB state store (the 100 TB " +
    "state backend: state spills off-heap instead of filling executor memory)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[Event]
    // per-query provider override is not supported — set it on the session
    // conf before the query starts; restore afterwards
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = sp.conf.getOption(key)
    sp.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ck = java.nio.file.Files.createTempDirectory("rocksdb_ck").toString
    val q = EventStreams.statefulSessionCounts(mem.toDS(), Gap).writeStream
      .format("memory").queryName("rocksdb_out").outputMode("update")
      .option("checkpointLocation", ck)
      .start()
    try {
      mem.addData(ev(1, 0, 0), ev(1, 1, 1000000))
      q.processAllAvailable()
      mem.addData(ev(1, 2, 2000000 + Gap + 1), ev(2, 3, 0))
      q.processAllAvailable()
      val out = sp.table("rocksdb_out").as[(Long, Long, Long)].collect()
      val last = out.zipWithIndex.groupBy(_._1._1).view
        .mapValues(g => g.maxBy(_._2)._1).toMap
      assert(last(1L) == ((1L, 2L, 3L))) // second event opened session 2
      assert(last(2L) == ((2L, 1L, 1L)))
      // prove the provider actually engaged: RocksDB checkpoints state as
      // .zip snapshots/changelogs; the default HDFS provider writes .delta
      val stateFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(ck, "state"))
        .iterator().asScala.map(_.getFileName.toString).toSeq
      assert(!stateFiles.exists(_.endsWith(".delta")),
        s"HDFS-provider files present — RocksDB not engaged: $stateFiles")
      assert(stateFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
        s"no RocksDB state artifacts found: $stateFiles")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => sp.conf.set(key, v)
        case None => sp.conf.unset(key)
      }
    }
  }

  test("stateful sessionizer batch mode equals window-function islands") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(7)
    val events = (0 until 500).map { i =>
      ev(rng.nextInt(5).toLong, i.toLong, rng.nextLong(Gap * 20), rng.nextInt(100) / 10.0)
    }
    val got = EventStreams.statefulSessionCounts(events.toDS(), Gap)
      .collect().map(u => u.user_id -> ((u.n_sessions, u.n_events))).toMap

    // independent islands computation in plain Scala
    val expect = events.groupBy(_.userId).map { case (u, es) =>
      val sorted = es.sortBy(e => (e.us, e.eventId))
      val sessions = sorted.zip(Event(u, -1, Long.MinValue, 0) +: sorted.init)
        .count { case (cur, prev) => prev.us == Long.MinValue || cur.us - prev.us > Gap }
      u -> ((sessions.toLong, es.size.toLong))
    }
    assert(got == expect)
  }

  test("tumbling window counts bucket events by width") {
    val sp = spark
    import sp.implicits._
    val minute = 60L * 1000000
    val df = Seq(
      ev(1, 0, 0), ev(1, 1, 30 * minute), ev(1, 2, 59 * minute), // window 0
      ev(1, 3, 61 * minute), // window 1
      ev(2, 4, 200 * minute)) // window 3 for user 2
      .toDF().select(col("userId").alias("user_id"),
        timestamp_micros(col("us")).alias("event_time"))
    val out = EventStreams.tumblingCounts(df, "1 hour")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 0L, 3L), (1L, 60 * minute, 1L), (2L, 180 * minute, 1L)))
  }

  test("single-level pack works as a streaming aggregation") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    // flat order-lines arrive as a stream; pack folds them into nested rows.
    // preserveChildOrder=false: monotonically_increasing_id and multi-stage
    // aggregations are batch-only; a leaf-level unordered pack is one
    // streaming-legal groupBy.
    val spec = HierarchySpec(Seq(
      LevelSpec("order", Seq(NamedField("id"))),
      LevelSpec("line", Seq(NamedField("n")), parentKeys = Seq("order_id"))))
    val p = new Packer(spec, preserveChildOrder = false)
    val mem = MemoryStream[(Long, Long, Double)]
    val flat = mem.toDF().select(col("_1").alias("order.id"),
      col("_2").alias("order.line.n"), col("_1").alias("order.line.order_id"),
      col("_3").alias("order.line.amount"))
    val q = p.pack(flat, "line").writeStream
      .format("memory").queryName("pack_out").outputMode("complete").start()
    try {
      mem.addData((1L, 1L, 10.0), (1L, 2L, 20.0), (2L, 1L, 5.0))
      q.processAllAvailable()
      mem.addData((1L, 3L, 30.0)) // late line joins order 1's list
      q.processAllAvailable()
    } finally q.stop()
    val out = sp.table("pack_out")
    assert(out.count() == 2)
    val lines1 = out.filter(col("`order.id`") === 1L)
      .select(size(col("`order.line`"))).collect()(0).getInt(0)
    assert(lines1 == 3)
  }

  test("multi-level pack over a stream via foreachBatch") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val spec = HierarchySpec(Seq(
      LevelSpec("a", Seq(NamedField("id"))),
      LevelSpec("b", Seq(NamedField("id")), parentKeys = Seq("aid")),
      LevelSpec("c", Seq(NamedField("id")), parentKeys = Seq("bid"))))
    val p = new Packer(spec, preserveChildOrder = false)
    val sink = "target/tmp/stream_pack_out"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File(sink))
    val mem = MemoryStream[(Long, Long, Long)]
    val flat = mem.toDF().select(col("_1").alias("a.id"),
      col("_2").alias("a.b.id"), col("_1").alias("a.b.aid"),
      col("_3").alias("a.b.c.id"), col("_2").alias("a.b.c.bid"))
    val q = EventStreams.packEachBatch(flat, p, "a", sink)
    try {
      mem.addData((1L, 1L, 1L), (1L, 1L, 2L), (1L, 2L, 3L))
      q.processAllAvailable()
      mem.addData((2L, 1L, 1L))
      q.processAllAvailable()
    } finally q.stop()
    val out = sp.read.parquet(sink)
    // 2 micro-batches → root 1 fully in batch 1, root 2 in batch 2
    assert(out.count() == 2)
    val r1 = out.filter(col("a.id") === 1L)
      .select(size(col("a.b")).alias("nb"),
        size(element_at(col("a.b"), 1).getField("c")) +
          size(element_at(col("a.b"), 2).getField("c"))).collect()(0)
    assert(r1.getInt(0) == 2 && r1.getInt(1) == 3) // 2 b-children, 3 c-leaves
  }

  test("packEachBatch cross-batch merge: a keyed merge over the per-batch sink " +
    "reaches batch-pack parity for an entity split across micro-batches (VERDICT r2 #8)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val spec = HierarchySpec(Seq(
      LevelSpec("a", Seq(NamedField("id"))),
      LevelSpec("b", Seq(NamedField("id")), parentKeys = Seq("aid")),
      LevelSpec("c", Seq(NamedField("id")), parentKeys = Seq("bid"))))
    val p = new Packer(spec, preserveChildOrder = false)
    val sink = "target/tmp/stream_pack_merge"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File(sink))
    // root a=1 spans BOTH batches, and so does its child b=1 (leaf c=1 in
    // batch 1, leaf c=2 in batch 2) — the exact case EventStreams.scala:87
    // documents as needing a keyed merge sink
    val batch1 = Seq((1L, 1L, 1L), (1L, 2L, 3L))
    val batch2 = Seq((1L, 1L, 2L), (1L, 2L, 4L), (2L, 1L, 1L))
    val mem = MemoryStream[(Long, Long, Long)]
    def toFlat(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").alias("a.id"),
        col("_2").alias("a.b.id"), col("_1").alias("a.b.aid"),
        col("_3").alias("a.b.c.id"), col("_2").alias("a.b.c.bid"))
    val q = EventStreams.packEachBatch(toFlat(mem.toDF()), p, "a", sink)
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // per-batch rows: root 1 packed TWICE (once per batch) — the raw sink
    // is NOT yet entity-unique
    val perBatch = sp.read.parquet(sink)
    assert(perBatch.filter(col("a.id") === 1L).count() == 2)
    // the keyed merge, reduced to its semantics: gather every packed row
    // of a root, unpack to leaves, repack — one row per root with ALL its
    // descendants (a Delta/Iceberg MERGE sink would do this incrementally
    // keyed on a.id; parquet has no upsert, so the test merges explicitly)
    val merged = p.pack(p.unpack(perBatch.drop("batch_id"), "c"), "a")
    val direct = p.pack(toFlat((batch1 ++ batch2).toDF()), "a")
    // names/types only via catalogString (nullability-free) — a parquet
    // roundtrip legitimately loosens nested-field nullability
    assert(merged.schema.map(f => f.name -> f.dataType.catalogString) ==
      direct.schema.map(f => f.name -> f.dataType.catalogString))
    assert(merged.count() == 2)
    // root 1 now has BOTH leaves of b=1 in one list (the split child healed)
    val nc = merged.filter(col("a.id") === 1L)
      .select(explode(col("a.b")).alias("b")).select(size(col("b.c")))
      .collect().map(_.getInt(0)).sorted
    assert(nc.toSeq == Seq(2, 2))
    // full-contents parity with the batch pack, compared at the leaf level
    // (preserveChildOrder=false leaves list order up to collect_list, so
    // packed rows are set-compared after unpacking, not array-compared)
    def leaves(df: org.apache.spark.sql.DataFrame) =
      p.unpack(df, "c").collect().map(_.toSeq).toSet
    assert(leaves(merged) == leaves(direct))
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[Event]
    val in = mem.toDF().select(col("eventId"), col("userId"),
      timestamp_micros(col("us")).alias("event_time"))
    val q = EventStreams.dedupStream(in, Seq("eventId"), delay = "1 hour")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData(ev(1, 10, 0), ev(1, 10, 5), ev(2, 11, 9))
      q.processAllAvailable()
      mem.addData(ev(1, 10, 20), ev(3, 12, 30)) // 10 is a dup within watermark
      q.processAllAvailable()
    } finally q.stop()
    val ids = sp.table("dedup_out").select("eventId").as[Long].collect().sorted
    assert(ids.toSeq == Seq(10L, 11L, 12L))
  }

  test("file-source STREAM over the real events parquet matches batch") {
    // round 5's regression shipped because the streaming path was only
    // exercised through MemoryStream[Event] (already-micros longs) — the
    // real parquet's physical ts encoding never flowed through a stream in
    // CI. This drives readStream over the actual driver-generated file, so
    // the next encoding change breaks HERE, in streaming mode, loudly.
    val sp = spark
    val src = "/root/testdata/sf0.001/events.parquet"
    assume(new java.io.File(src).exists(), s"$src not present")
    // file streams read DIRECTORIES; stage the single file into one
    val dir = "target/tmp/events_stream_src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val schema = sp.read.parquet(dir).schema
    val pipeline = (df: org.apache.spark.sql.DataFrame) =>
      EventStreams.sessionAgg(
        EventStreams.watermarked(EventStreams.withEventTime(df),
          delay = "0 seconds"), "30 minutes")
    val batchOut = pipeline(sp.read.parquet(dir)).collect().map(_.toSeq).toSet
    assert(batchOut.nonEmpty)
    val q = pipeline(sp.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("file_sess_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // append mode only emits sessions CLOSED by the watermark — the final
    // watermark sits at the max event time, so sessions still open there
    // (per user, the last one) legitimately stay unemitted. Everything
    // emitted must match batch exactly, and coverage must be substantial.
    val streamOut = sp.table("file_sess_out").collect().map(_.toSeq).toSet
    assert(streamOut.subsetOf(batchOut),
      s"stream emitted ${streamOut.size} rows not all present in batch's ${batchOut.size}")
    assert(streamOut.size >= batchOut.size / 2,
      s"stream emitted only ${streamOut.size} of ${batchOut.size} batch sessions")
  }

  test("eventMicros adapts to all three physical ts encodings identically") {
    // round 5's gate-breaker: the driver regenerated events.parquet from
    // int64-nanos to TIMESTAMP_MICROS and the hardcoded nanos path broke.
    // The same instant in each encoding must yield the same micros.
    val us = 1700000000123456L // epoch micros, sub-millisecond precision
    val base = spark.range(1).select(
      lit(us * 1000).alias("ts_nanos"),                       // LongType nanos
      timestamp_micros(lit(us)).alias("ts_ts"),               // TimestampType
      timestamp_micros(lit(us)).cast("timestamp_ntz").alias("ts_ntz"))
    def micros(c: String): Long = {
      val df = base.select(col(c).alias("ts"))
      df.select(EventStreams.eventMicros(df).alias("us")).head().getLong(0)
    }
    assert(micros("ts_nanos") == us)
    assert(micros("ts_ts") == us)
    // NTZ → TS cast applies the session zone; the graft sessions pin UTC,
    // so the naive value IS the UTC epoch value (DuckDB epoch_us semantics)
    assert(micros("ts_ntz") == us)
    // unsupported types fail loudly with the column name
    val bad = spark.range(1).select(lit("x").alias("ts"))
    val e = intercept[IllegalArgumentException](EventStreams.eventMicros(bad))
    assert(e.getMessage.contains("`ts`"))
    // withEventTime produces a proper TimestampType column on each
    for (c <- Seq("ts_nanos", "ts_ts", "ts_ntz")) {
      val df = base.select(col(c).alias("ts"))
      val et = EventStreams.withEventTime(df).schema("event_time").dataType
      assert(et == org.apache.spark.sql.types.TimestampType, s"$c -> $et")
    }
  }
}
