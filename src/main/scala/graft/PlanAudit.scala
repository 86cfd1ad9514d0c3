package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_enrich_aggs", "q_ngram_jaccard", "q_pack_root_unnest", "q_knn_bruteforce",
               "q_dedup_minhash", "q_knn_ivf")
    for (name <- names) {
      println(s"########## $name")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
