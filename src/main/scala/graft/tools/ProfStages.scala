package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Scratch profiler attributing each Spark STAGE of a SparkEntry query to
  * its call site with task-time totals — where ProfJobs says "job at
  * <site> took T", this says which STAGES inside carried the executor time
  * (sum of task run times, so a 32-wide 0.1 s/task stage reads 3.2 s of
  * CPU while costing 0.1 s of wall). Usage:
  * runMain graft.tools.ProfStages <sfDir> <n> <query...>
  */
object ProfStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse {
      if (args.length > 1)
        System.err.println(
          s"usage: ProfStages <sfDir> <n> <query...> — '${args(1)}' is not a count; using 2")
      2
    }
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lock = new Object
    // one row per stage: (id, name, tasks, rows, executorRunTime ms, wall ms)
    val rows = mutable.ArrayBuffer[(Int, String, Int, Long, Long, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          val si = s.stageInfo
          val wall = (for (a <- si.completionTime; b <- si.submissionTime)
            yield a - b).getOrElse(0L)
          Option(si.taskMetrics).foreach { m => // null for never-started stages
            rows += ((si.stageId, si.name, si.numTasks,
              m.outputMetrics.recordsWritten + m.shuffleWriteMetrics.recordsWritten,
              m.executorRunTime, wall))
          }
          ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = qs(name)
      (1 to n).foreach { run =>
        lock.synchronized { rows.clear() }
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerBusDrain.waitUntilEmpty(spark.sparkContext)
        println(f"== $name run $run: $dt%.2f s")
        lock.synchronized {
          rows.sortBy(-_._6).take(14).foreach {
            case (id, site, t, out, r, w) =>
              println(f"   ${w / 1e3}%6.2f s wall ${r / 1e3}%7.2f s cpu  stage $id%3d $t%4d tasks ${out}%9d out  $site")
          }
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        graft.queries.Shared.clear()
      }
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
