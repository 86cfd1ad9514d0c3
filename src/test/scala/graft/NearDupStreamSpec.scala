package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup with an accumulated survivor corpus: the versioned
  * sink's final state must equal the SEQUENTIAL batch protocol — full
  * dedup of batch 1, then incrementalNearDup of batch 2 against the
  * survivors — and a replayed batch must overwrite, not compound. */
class NearDupStreamSpec extends AnyFunSuite with SparkSpec {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  // near-dup pairs at 2-gram jaccard >= 0.5: (1,2) within batch 1,
  // (3,11) across batches, (10,12) within batch 2; 128 one-row bands =
  // total recall so the LSH path IS the exact semantics
  private val batch1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // ~ doc 1 -> drop
    (3L, "completely different text about spark engines"))
  private val batch2 = Seq(
    (10L, "yet another unrelated document body here"),
    (11L, "completely different text about spark engines!"), // ~ doc 3 -> drop
    (12L, "yet another unrelated document body there"))      // ~ doc 10 -> drop

  private def runStream(sink: String): org.apache.spark.sql.DataFrame = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[(Long, String)]
    val in = mem.toDF().select(col("_1").alias("doc_id"), col("_2").alias("text"))
    val q = EventStreams.nearDupUpsertEachBatch(in, "text", "doc_id", sink,
      threshold = 0.5, shingleN = 2, numHashes = 128, bands = 128)
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    EventStreams.readPackedSink(sp, sink)
  }

  test("nearDupUpsertEachBatch: final sink equals the sequential batch protocol") {
    val sp = spark
    import sp.implicits._
    val sink = "target/tmp/stream_neardup_spec"
    rmrf(new java.io.File(sink))
    val got = runStream(sink).select("doc_id").as[Long].collect().toSet
    // sequential protocol by hand: batch 1 keeps {1, 3}; batch 2 against
    // {1, 3}: 11 ~ 3 drops, 12 ~ 10 drops, 10 survives
    assert(got == Set(1L, 3L, 10L))
    // rows (not just ids) survive with their payload intact
    val texts = runStream(sink + "_b").select("text").as[String].collect()
    assert(texts.length == 3 && texts.forall(_.nonEmpty))
  }

  test("nearDupUpsertEachBatch: the kept corpus matches batch dedup + incremental") {
    val sp = spark
    import sp.implicits._
    val sink = "target/tmp/stream_neardup_spec2"
    rmrf(new java.io.File(sink))
    val got = runStream(sink).select("doc_id").as[Long].collect().toSet
    val b1 = batch1.toDF("doc_id", "text")
    val b2 = batch2.toDF("doc_id", "text")
    val surv1Ids = ext.Dedup.nearDupSurvivors(b1, "text", "doc_id",
      threshold = 0.5, shingleN = 2, numHashes = 128, bands = 128)
    val surv1 = b1.join(surv1Ids, Seq("doc_id"), "left_semi")
    val surv2 = ext.Dedup.incrementalNearDup(surv1, b2, "text", "doc_id",
      threshold = 0.5, shingleN = 2, numHashes = 128, bands = 128)
    val want = surv1.select("doc_id").as[Long].collect().toSet ++
      surv2.select(col("doc_id")).as[Long].collect().toSet
    assert(got == want)
  }

  test("nearDupUpsertEachBatch: versioned sink retains only keepVersions history") {
    val sink = "target/tmp/stream_neardup_spec3"
    rmrf(new java.io.File(sink))
    runStream(sink)
    val versions = new java.io.File(sink).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName).sorted
    // two batches, keepVersions=2 -> both versions still present
    assert(versions.sameElements(Array("v=0", "v=1")))
  }
}
