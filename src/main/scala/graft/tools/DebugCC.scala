package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: per-phase job counts for the shared dedup kernel path. */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def phase[T](name: String)(body: => T): T = {
      org.apache.spark.graft.ListenerBusDrain.waitUntilEmpty(spark.sparkContext)
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      org.apache.spark.graft.ListenerBusDrain.waitUntilEmpty(spark.sparkContext)
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ${jobs.get() - j0}%3d jobs")
      r
    }
    val pairs = phase("minhashPairs")(graft.queries.Shared.minhashPairs(spark, sfDir))
    phase("pairs.count")(pairs.count())
    val cc = phase("ccLabels")(graft.queries.Shared.ccLabels(spark, sfDir))
    phase("cc.count")(cc.count())
    phase("dd11 consumer")(
      graft.SparkEntry.queries("dd11_dup_clusters")(spark, sfDir).count())
    phase("dd14 consumer")(
      graft.SparkEntry.queries("dd14_cluster_keep_best")(spark, sfDir).count())
    phase("dd12 consumer")(
      graft.SparkEntry.queries("dd12_cluster_clean")(spark, sfDir).count())
    spark.stop()
  }
}
