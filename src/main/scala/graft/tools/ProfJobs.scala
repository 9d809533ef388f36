package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Scratch profiler attributing each Spark JOB of a SparkEntry query to its
  * submitting call site — where ProfQueries says "N jobs, T seconds", this
  * says WHICH jobs (localCheckpoint rounds, counts, exceptAll confirms, AQE
  * exchange jobs...) carry the time. Usage:
  * runMain graft.tools.ProfJobs <sfDir> <n> <query...>
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(2)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // listener callbacks run on the listener-bus thread while main clears
    // and reads between runs — one shared lock keeps the two maps coherent
    // (waitUntilEmpty drains before each read, but a late onJobEnd racing
    // clear() could otherwise corrupt the maps or misattribute a job)
    val lock = new Object
    val starts = mutable.Map[Int, (Long, String)]()
    val agg = mutable.Map[String, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = lock.synchronized {
        // the result stage's name carries the submitting call site
        // ("count at Foo.scala:123"); properties lack callSite here
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts(j.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = lock.synchronized {
        starts.remove(j.jobId).foreach { case (t0, site) =>
          val (c, t) = agg.getOrElse(site, (0, 0L))
          agg(site) = (c + 1, t + (System.nanoTime() - t0))
        }
      }
    })
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      (1 to n).foreach { run =>
        lock.synchronized { agg.clear(); starts.clear() }
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).count()
        org.apache.spark.graft.ListenerBusDrain.waitUntilEmpty(spark.sparkContext)
        val total = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        val snap = lock.synchronized(agg.toSeq)
        println(f"== $name run $run: $total%.2f s, ${snap.map(_._2._1).sum} jobs")
        snap.sortBy(-_._2._2).take(14).foreach { case (site, (c, t)) =>
          println(f"   ${t / 1e9}%6.2f s  $c%3d jobs  $site")
        }
      }
    }
    spark.stop()
  }
}
