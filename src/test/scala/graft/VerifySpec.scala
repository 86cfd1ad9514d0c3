package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The correctness dump must be LOUD on failure (VERDICT r5 #2): a query
  * that throws may never silently shrink the artifact. A broken query gets
  * an ERROR.txt marker inside its result directory (so the driver's parquet
  * read errors → an `err` row) and an errors.json entry; every query name
  * ends up with exactly one of {result parquet, error marker}. */
class VerifySpec extends AnyFunSuite with SparkSpec {

  val outDir = "target/tmp/verify_loud"

  def run(): Map[String, String] = {
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "vq_ok" -> ((s, _) => s.range(3).toDF("n")),
      "vq_broken" -> ((_, _) => throw new IllegalStateException("boom: injected")),
      // breaks at WRITE time (analysis passes, execution throws) — the
      // partial-output case the dir-clearing guard covers
      "vq_exec_fail" -> ((s, _) => {
        import org.apache.spark.sql.functions._
        s.range(3).toDF("n").select(raise_error(lit("exec boom")).alias("x"))
      }))
    Verify.dumpQueries(spark, "/root/testdata/sf0.001", outDir, queries)
  }

  test("broken queries produce loud per-query markers, good ones parquet") {
    val errors = run()
    assert(errors.keySet == Set("vq_broken", "vq_exec_fail"))
    assert(errors("vq_broken").contains("boom: injected"))
    // good query: readable parquet, no marker
    assert(spark.read.parquet(s"$outDir/vq_ok").count() == 3)
    assert(!Files.exists(Paths.get(outDir, "vq_ok", "ERROR.txt")))
    // broken queries: marker present, and the driver's parquet read of the
    // directory FAILS (that is what turns into the err row downstream)
    for (q <- Seq("vq_broken", "vq_exec_fail")) {
      assert(Files.exists(Paths.get(outDir, q, "ERROR.txt")), s"$q marker missing")
      intercept[Exception](spark.read.parquet(s"$outDir/$q").collect())
    }
    // aggregate errors.json lists exactly the broken queries
    val json = Files.readString(Paths.get(outDir, "errors.json"))
    assert(json.contains("vq_broken") && json.contains("vq_exec_fail"))
    assert(!json.contains("vq_ok"))
  }

  test("every query name yields a result dir: artifact can never shrink") {
    run()
    val dirs = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("vq_ok", "vq_broken", "vq_exec_fail"))
  }
}
