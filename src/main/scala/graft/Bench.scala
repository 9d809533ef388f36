package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Output protocol (driver-parseable by construction):
  *
  *  - stderr: one progress line per query — elapsed time plus JIT code-cache
  *    occupancy (the environmental failure mode that poisoned the BENCH_r02
  *    record: when the code cache fills, HotSpot stops compiling and the
  *    whole-stage-codegen kernels run interpreted, 5–20× slower). A WARNING
  *    line fires when any CodeHeap pool crosses 90% so a slow record is
  *    self-diagnosing.
  *  - stdout, before the total: the per-query map as short sorted chunks
  *    (`{"metric":"queries_part","part":i,"of":n,...}`, 8 queries per line)
  *    so a bounded tail-window capture holds the COMPLETE map.
  *  - stdout, LAST line: a compact `{"metric":"total",...}` JSON with values
  *    rounded to 3 decimals — short enough that a tail-window capture always
  *    holds the complete line.
  *  - `target/bench_total.json`: the same record (plus the full-precision
  *    map) as a file artifact, in case the stdout protocol ever mismatches.
  */
object Bench {

  /** (used, max, pct) over all JIT code-cache pools ("CodeHeap '...'" on
    * segmented caches, "CodeCache" otherwise).
    */
  private def codeCache(): (Long, Long, Double) = {
    import scala.jdk.CollectionConverters._
    val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("CodeCache"))
    val used = pools.map(_.getUsage.getUsed).sum
    val max = pools.map(p => math.max(p.getUsage.getMax, 0L)).sum
    (used, max, if (max > 0) 100.0 * used / max else 0.0)
  }

  /** Cumulative JIT compilation ms and GC ms — per-query DELTAS of these
    * attribute a slow query to compilation/GC churn in-band, so a ±3× wobble
    * on unchanged code (the r3 sim1–sim4 question) is diagnosable from the
    * bench stderr alone rather than re-run archaeology.
    */
  private def jitGcMs(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val jit = Option(java.lang.management.ManagementFactory.getCompilationMXBean)
      .filter(_.isCompilationTimeMonitoringSupported)
      .map(_.getTotalCompilationTime).getOrElse(0L)
    val gc = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum
    (jit, gc)
  }

  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session (codegen, parquet footers, FS cache) so the first
    // timed query doesn't absorb one-time startup cost.
    Tables.names.foreach { n =>
      try Tables(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = ordered.zipWithIndex.map { case ((name, fn), idx) =>
      val (jit0, gc0) = jitGcMs()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop caches a pipeline persisted for its own reuse so they don't
      // squeeze later queries' memory: CacheManager entries (Dataset.persist)
      // AND RDD-level blocks (the localCheckpoint reuse caches, which
      // clearCache cannot see and ContextCleaner frees only on driver GC)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val (ccUsed, ccMax, ccPct) = codeCache()
      val (jit1, gc1) = jitGcMs()
      System.err.println(
        f"[bench] [${idx + 1}%3d/${ordered.size}%d] $name%-28s ${dt}%8.3f s  codecache ${ccUsed / 1048576}%d/${ccMax / 1048576}%dMB (${ccPct}%.0f%%)  jit +${jit1 - jit0}%dms gc +${gc1 - gc0}%dms")
      if (ccPct > 90.0)
        System.err.println(
          s"[bench] WARNING: JIT code cache ${ccPct.round}% full after $name — " +
            "HotSpot may stop compiling and later queries will run interpreted " +
            "(raise -XX:ReservedCodeCacheSize)")
      name -> dt
    }
    val total = results.map(_._2).sum
    // Per-query times as SHORT sorted chunks (8 queries/line, ms precision),
    // each line self-describing — so a bounded tail-window capture holds the
    // COMPLETE map (BENCH_r01–r04 clipped the head of the old single ~4 KB
    // line, leaving c*/dd*/m*/mx* unauditable four rounds running). The LAST
    // line stays the compact total (~100 bytes).
    val chunks = results.sortBy(_._1).grouped(8).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val qs = chunk.map { case (k, v) => s"\"$k\":${r3(v)}" }.mkString("{", ",", "}")
      println(s"""{"metric":"queries_part","part":${i + 1},"of":${chunks.size},"queries":$qs}""")
    }
    val totalLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}"""
    println(totalLine)
    // File artifact too, so the record survives any stdout-protocol mismatch.
    val qsFull = results.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    new java.io.File("target").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_total.json"),
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"queries":$qsFull,"sf":"$sfDir"}""" + "\n")
    spark.stop()
  }
}
