package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan auditor: prints the executed plan of named SparkEntry
  * queries so shuffle/broadcast/reuse shape can be reviewed by hand
  * (`sbt "runMain graft.tools.PlanAudit <sfDir> <name> [<name>...]"`). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"==== $n ====")
      println(s"  exchanges=${"Exchange hashpartitioning|Exchange rangepartitioning".r.findAllIn(plan).length}" +
        s" reused=${"ReusedExchange".r.findAllIn(plan).length}" +
        s" broadcasts=${"BroadcastExchange".r.findAllIn(plan).length}" +
        s" sorts=${"Sort \\[".r.findAllIn(plan).length}" +
        s" wscg=${"WholeStageCodegen".r.findAllIn(plan).length}")
      if (sys.env.contains("PLAN_FULL")) println(plan)
    }
    spark.stop()
  }
}
