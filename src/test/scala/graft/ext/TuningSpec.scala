package graft.ext

import graft.SparkSpec

/** Shuffle-partition sizing from input bytes (the sf10 partition lesson
  * as library code): exact arithmetic, clamping, real FS byte walks,
  * session application, and the harness env contract. */
class TuningSpec extends SparkSpec {

  // ------------------------------------------------- partitionsForBytes

  test("partitionsForBytes: ceil division, exact at boundaries") {
    val bpp = 128L << 20
    assert(Tuning.partitionsForBytes(0L, bpp) == 1)
    assert(Tuning.partitionsForBytes(1L, bpp) == 1)
    assert(Tuning.partitionsForBytes(bpp, bpp) == 1)
    assert(Tuning.partitionsForBytes(bpp + 1, bpp) == 2)
    assert(Tuning.partitionsForBytes(10 * bpp, bpp) == 10)
    // the sf10 shape: 2.3 GB of parquet at 128 MB -> 19 partitions raw,
    // floored by a 32-core parallelism to 32
    assert(Tuning.partitionsForBytes(2_300L << 20, bpp, minPartitions = 32) == 32)
  }

  test("partitionsForBytes: clamping and expansion factor") {
    val bpp = 1L << 20
    assert(Tuning.partitionsForBytes(100L << 20, bpp, minPartitions = 200) == 200)
    assert(Tuning.partitionsForBytes(100L << 20, bpp, maxPartitions = 50) == 50)
    // 4x decompression expansion quadruples the width
    assert(Tuning.partitionsForBytes(100L << 20, bpp, expansion = 4.0) == 400)
    // loud on nonsense inputs
    intercept[IllegalArgumentException](Tuning.partitionsForBytes(-1L, bpp))
    intercept[IllegalArgumentException](Tuning.partitionsForBytes(1L, 0L))
    intercept[IllegalArgumentException](
      Tuning.partitionsForBytes(1L, bpp, minPartitions = 5, maxPartitions = 4))
    intercept[IllegalArgumentException](
      Tuning.partitionsForBytes(1L, bpp, expansion = 0.0))
  }

  // -------------------------------------------------------- inputBytes

  test("nlistForCorpus: bounded-cluster rule, ceil + clamps") {
    // below the floor: tiny corpora keep the minimum cluster count
    assert(Similarity.nlistForCorpus(0) == 16)
    assert(Similarity.nlistForCorpus(2000) == 16)
    // proportional past the floor: ceil(rows / target)
    assert(Similarity.nlistForCorpus(200000) == 196)
    assert(Similarity.nlistForCorpus(1024 * 50) == 50)
    assert(Similarity.nlistForCorpus(1024 * 50 + 1) == 51)
    // cap
    assert(Similarity.nlistForCorpus(Long.MaxValue / 4) == (1 << 18))
    // custom target/clamps
    assert(Similarity.nlistForCorpus(10000, targetClusterSize = 100,
      minNlist = 1, maxNlist = 64) == 64)
    intercept[IllegalArgumentException](Similarity.nlistForCorpus(-1))
    intercept[IllegalArgumentException](
      Similarity.nlistForCorpus(10, targetClusterSize = 0))
  }

  test("nprobeForRecall: scan-fraction rule reproduces both committed " +
    "operating points, clamps to [minProbe, nlist]") {
    // the gated q_knn_ivf_recall setting: nlist=16 → nprobe=4 (the old
    // hand-picked literal falls out of the rule)
    assert(Similarity.nprobeForRecall(16) == 4)
    // the sf10 scale arm's ~nlist/16 (ceil, so never under-probing)
    assert(Similarity.nprobeForRecall(1953) == 123)
    assert(Similarity.nprobeForRecall(1024) == 64)
    // floors at minProbe for small list counts, caps at nlist (exact
    // search is the graceful degenerate)
    assert(Similarity.nprobeForRecall(1) == 1)
    assert(Similarity.nprobeForRecall(3) == 3)
    assert(Similarity.nprobeForRecall(8) == 4)
    assert(Similarity.nprobeForRecall(64, scanFraction = 1.0) == 64)
    intercept[IllegalArgumentException](Similarity.nprobeForRecall(0))
    intercept[IllegalArgumentException](
      Similarity.nprobeForRecall(16, scanFraction = 0.0))
    intercept[IllegalArgumentException](
      Similarity.nprobeForRecall(16, minProbe = 0))
  }

  test("inputBytes: sums real file sizes recursively; missing path raises") {
    val dir = java.nio.file.Files.createTempDirectory("tuning").toFile
    try {
      val sub = new java.io.File(dir, "t.parquet"); sub.mkdirs()
      java.nio.file.Files.write(new java.io.File(sub, "part-0").toPath,
        Array.fill[Byte](1000)(1))
      java.nio.file.Files.write(new java.io.File(sub, "part-1").toPath,
        Array.fill[Byte](500)(2))
      assert(Tuning.inputBytes(spark, Seq(sub.getPath)) == 1500L)
      intercept[Exception](
        Tuning.inputBytes(spark, Seq(dir.getPath + "/nope.parquet")))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  // ----------------------------------------------------- scaleShuffleTo

  test("scaleShuffleTo: sets shuffle width and AQE initial width from bytes") {
    val dir = java.nio.file.Files.createTempDirectory("tuning2").toFile
    try {
      val sub = new java.io.File(dir, "t.parquet"); sub.mkdirs()
      java.nio.file.Files.write(new java.io.File(sub, "part-0").toPath,
        Array.fill[Byte](4096)(1))
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        // 4 KB at 1 KB per partition -> 4, above a min of 1
        val n = Tuning.scaleShuffleTo(spark, Seq(sub.getPath),
          bytesPerPartition = 1024L, maxPartitions = 100)
        val expected = math.max(4, spark.sparkContext.defaultParallelism)
        assert(n == expected)
        assert(spark.conf.get("spark.sql.shuffle.partitions") == n.toString)
        assert(spark.conf.get(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum") == n.toString)
      } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  // ------------------------------------------- resolveShuffleSetting env

  test("resolveShuffleSetting: literal passes through, auto sizes from the sf dir") {
    assert(Tuning.resolveShuffleSetting("64", "/nowhere", 32) == "64")
    val dir = java.nio.file.Files.createTempDirectory("tuning3").toFile
    try {
      // a tiny sf-style layout: one table as a bare file, one as a
      // directory of parts — both count, the non-parquet entry doesn't
      java.nio.file.Files.write(new java.io.File(dir, "a.parquet").toPath,
        Array.fill[Byte](2048)(1))
      val sub = new java.io.File(dir, "b.parquet"); sub.mkdirs()
      java.nio.file.Files.write(new java.io.File(sub, "part-0").toPath,
        Array.fill[Byte](2048)(1))
      java.nio.file.Files.write(new java.io.File(dir, "notes.txt").toPath,
        Array.fill[Byte](9999)(1))
      // 4 KB of parquet bytes floors at minPartitions
      assert(Tuning.resolveShuffleSetting("auto", dir.getPath, 32) == "32")
      // empty-of-parquet dir fails loudly with the layout explanation
      val empty = java.nio.file.Files.createTempDirectory("tuning4").toFile
      try intercept[IllegalArgumentException](
        Tuning.resolveShuffleSetting("auto", empty.getPath, 32))
      finally { empty.delete(); () }
      // missing dir fails loudly too
      intercept[IllegalArgumentException](
        Tuning.resolveShuffleSetting("auto", s"${dir.getPath}/missing", 32))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(dir)
    }
  }
}
