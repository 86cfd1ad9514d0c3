package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failures are LOUD (VERDICT r5 #2): a query that throws gets an
  * `ERROR.txt` marker written INSIDE its output directory — the driver's
  * parquet read of that directory then fails and the query surfaces as an
  * `err` row in CORRECTNESS_r{N}.json — plus an aggregate `errors.json`.
  * Verify must never shrink the artifact silently: every query name in
  * SparkEntry.queries has either a parquet result or an error marker. */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Run every query against `sfDir`, writing `outDir/<name>` parquet on
    * success or `outDir/<name>/ERROR.txt` on failure; returns the failure
    * map (name → message). Separated from main() so VerifySpec can prove
    * end-to-end that a broken query yields a loud per-query marker. */
  def dumpQueries(spark: SparkSession, sfDir: String, outDir: String,
                  queries: Map[String, (SparkSession, String) => DataFrame]
                 ): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg
        // marker INSIDE the result dir: the driver's read of this path now
        // errors instead of seeing an absent dir it silently skips. Clear
        // any partial write first — a half-written part-file set could
        // otherwise read back as a plausible (wrong) result.
        val dir = Paths.get(outDir, name)
        if (Files.exists(dir)) {
          import scala.jdk.CollectionConverters._
          Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(Files.delete)
        }
        Files.createDirectories(dir)
        Files.writeString(dir.resolve("ERROR.txt"), msg)
      }
    }
    val errJson = errors.map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    errors.toMap
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated name-substring filter (builder-side
    // focused runs, e.g. re-proving new queries at sf1.0 without the full
    // sweep); the driver's 2-arg call keeps running everything
    val (sfDir, outDir) = (args(0), args(1))
    val filters = args.lift(2)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // SPARK_GRAFT_SHUFFLE: shuffle-partition override for the sf10
      // (100x) proof sweeps — default cpus matches the driver contract;
      // "auto" = data-proportional via ext.Tuning
      .config("spark.sql.shuffle.partitions", ext.Tuning.resolveShuffleSetting(
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus), sfDir, cpus.toInt))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def selected(name: String): Boolean =
      filters.isEmpty || filters.exists(name.contains)
    dumpQueries(spark, sfDir, outDir,
      SparkEntry.queries.filter { case (n, _) => selected(n) })
    val json = SparkEntry.oracleSql
      .filter { case (n, _) => selected(n) }
      .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
