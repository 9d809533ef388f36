package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler mirroring Bench's per-query telemetry (wall, JIT
  * compiler CPU, jobs) for a NAMED subset of queries in a fresh JVM —
  * Bench only reports these across the full 312-query suite, which takes
  * minutes per iteration. Usage:
  * runMain graft.tools.ProfJit <sfDir> <query...>
  */
object ProfJit {
  private def jitMs(): Long =
    Option(java.lang.management.ManagementFactory.getCompilationMXBean)
      .filter(_.isCompilationTimeMonitoringSupported)
      .map(_.getTotalCompilationTime).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Bench's warmup: parquet footers + a first codegen pass per table
    graft.Tables.names.foreach { n =>
      try graft.Tables(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val j0 = jitMs()
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusDrain.waitUntilEmpty(spark.sparkContext)
      val j1 = jitMs()
      spark.catalog.clearCache()
      val keep = graft.queries.Shared.protectedRddIds
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep.contains(id)) rdd.unpersist(false)
      }
      println(f"== $name%-28s $dt%7.2f s  jit +${j1 - j0}%dms")
    }
    spark.stop()
  }
}
