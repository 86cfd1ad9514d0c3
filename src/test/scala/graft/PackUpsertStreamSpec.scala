package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EXACT cross-batch streaming pack: packUpsertEachBatch must converge to
  * batch-pack parity (one row per entity with ALL descendants) even when a
  * root and its children span micro-batches — the case packEachBatch
  * delegates to the storage layer, now handled by mergePacked. */
class PackUpsertStreamSpec extends AnyFunSuite with SparkSpec {

  private val spec = HierarchySpec(Seq(
    LevelSpec("a", Seq(NamedField("id"))),
    LevelSpec("b", Seq(NamedField("id")), parentKeys = Seq("aid")),
    LevelSpec("c", Seq(NamedField("id")), parentKeys = Seq("bid"))))

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  private def toFlat(df: org.apache.spark.sql.DataFrame) =
    df.select(col("_1").alias("a.id"),
      col("_2").alias("a.b.id"), col("_1").alias("a.b.aid"),
      col("_3").alias("a.b.c.id"), col("_2").alias("a.b.c.bid"))

  test("packUpsertEachBatch: entity split across batches converges to batch-pack parity") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val p = new Packer(spec, preserveChildOrder = false)
    val sink = "target/tmp/stream_pack_upsert"
    rmrf(new java.io.File(sink))
    // root a=1 spans both batches; child b=1 gets a leaf in EACH batch
    val batch1 = Seq((1L, 1L, 1L), (1L, 2L, 3L))
    val batch2 = Seq((1L, 1L, 2L), (1L, 2L, 4L), (2L, 1L, 1L))
    val mem = MemoryStream[(Long, Long, Long)]
    val q = EventStreams.packUpsertEachBatch(toFlat(mem.toDF()), p, "a", sink)
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val current = EventStreams.readPackedSink(sp, sink)
    // ONE row per entity in the current version — no per-batch duplicates
    assert(current.count() == 2)
    // root-fold pack: keys live INSIDE the root struct — a.id is field access
    assert(current.filter(col("a.id") === 1L).count() == 1)
    // split child healed: both leaves of b=1 in one list
    val nc = current.filter(col("a.id") === 1L)
      .select(explode(col("a.b")).alias("b")).select(size(col("b.c")))
      .collect().map(_.getInt(0)).sorted
    assert(nc.toSeq == Seq(2, 2))
    // full-contents parity with the direct batch pack at the leaf level
    val direct = p.pack(toFlat((batch1 ++ batch2).toDF()), "a")
    def leaves(df: org.apache.spark.sql.DataFrame) =
      p.unpack(df, "c").collect().map(_.toSeq).toSet
    assert(leaves(current) == leaves(direct))
  }

  test("versioned sink: batches write v=<id>, vacuum respects retention, reader takes latest") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val p = new Packer(spec, preserveChildOrder = false)
    val sink = "target/tmp/stream_pack_upsert_v"
    rmrf(new java.io.File(sink))
    val mem = MemoryStream[(Long, Long, Long)]
    val q = EventStreams.packUpsertEachBatch(toFlat(mem.toDF()), p, "a", sink,
      keepVersions = 1)
    try {
      (1 to 4).foreach { i =>
        mem.addData((i.toLong, 1L, 1L))
        q.processAllAvailable()
      }
    } finally q.stop()
    val dirs = new java.io.File(sink).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).sorted.toSeq
    // 4 batches → v=0..3; retention keepVersions=1 keeps the latest 2
    assert(dirs == Seq("v=2", "v=3"), s"got $dirs")
    // latest version accumulates all four roots
    assert(EventStreams.readPackedSink(sp, sink).count() == 4)
  }
}
