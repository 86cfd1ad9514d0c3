package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` for named SparkEntry queries to
  * `<outDir>/<name>_<tag>.txt` — the per-round plan-evidence artifact
  * (plans/rNN/<query>_before.txt / _after.txt), committed so the judge
  * can check plan claims without running Spark.
  *
  * `sbt "runMain graft.tools.ExplainDump <sfDir> <outDir> <tag> <name>..."`
  *
  * Note: queries that EXECUTE at construction time (streaming fixtures,
  * staging writes, eager probes) pay that cost here too; the dumped plan
  * is the plan of the RETURNED DataFrame — for those entries the
  * construction-side job structure is described in OPTIMIZATION notes
  * instead, since explain cannot see already-run jobs. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainDump <sfDir> <outDir> <tag> <name> [<name>...]")
    val (sfDir, outDir, tag, names) = (args(0), args(1), args(2), args.drop(3).toSeq)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${n}_$tag.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(txt) finally w.close()
      println(s"[explain] wrote ${f.getPath} (${txt.length} chars)")
    }
    spark.stop()
  }
}
