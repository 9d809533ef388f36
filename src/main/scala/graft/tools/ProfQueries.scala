package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for individual SparkEntry queries: runs each named query
  * N times (default 3) against the given SF dir and prints per-run times —
  * separates JIT-warmup and ambient-load noise from real plan regressions.
  * Usage: runMain graft.tools.ProfQueries <sfDir> <n> <query...>
  */
object ProfQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("dd6_simhash_hamming", "dd11_dup_clusters", "dd4_ngram_jaccard")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // dev A/B knob: SPARK_GRAFT_PROF_AQE=0 times the same queries with
    // adaptive execution off (job-count vs plan-quality attribution)
    if (sys.env.get("SPARK_GRAFT_PROF_AQE").contains("0"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = qs(name)
      val runs = (1 to n).map { _ =>
        jobs.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9 // time the query, not teardown
        // the listener bus is async — drain before reading the job counter
        org.apache.spark.graft.ListenerBusDrain.waitUntilEmpty(spark.sparkContext)
        val nJobs = jobs.get()
        // free BOTH cache layers between runs so run N+1 doesn't execute
        // under run N's resident blocks (clearCache misses RDD-level caches)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        (dt, nJobs)
      }
      println(f"$name%-28s ${runs.map { case (t, j) => f"$t%6.2f(${j}j)" }.mkString(" ")} s")
    }
    spark.stop()
  }
}
