package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Counts Spark jobs/stages/tasks a named SparkEntry query runs end-to-end
  * (construction + noop materialization) — the measurement companion to
  * [[ExplainDump]] for queries whose cost is CONSTRUCTION-TIME jobs
  * (iterative trainers, eager checkpoints, streaming fixtures) that no
  * final-plan explain can show.
  *
  * `sbt "runMain graft.tools.JobCount <sfDir> <name> [<name>...]"` */
object JobCount {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobCount <sfDir> <name> [<name>...]")
    val sfDir = args.head
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks.toLong)
      }
    })
    names.foreach { n =>
      jobs.set(0); stages.set(0); tasks.set(0L)
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async — wait until the counters are STABLE
      // across consecutive samples (a fixed beat raced late events into
      // the next query's freshly-reset counters on a loaded box), with a
      // hard 5 s cap so a wedged bus can't hang the tool
      var prev = (-1, -1, -1L)
      var waited = 0
      while (prev != ((jobs.get, stages.get, tasks.get)) && waited < 5000) {
        prev = (jobs.get, stages.get, tasks.get)
        Thread.sleep(250); waited += 250
      }
      println(f"[jobcount] $n%-28s jobs=${jobs.get}%-4d stages=${stages.get}%-4d tasks=${tasks.get}%-6d sec=$sec%.2f")
    }
    spark.stop()
  }
}
