package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // Optional trailing args: run only these queries (mirrors tools/check.py's
    // `[query ...]` filter — dev loop; the driver passes exactly 2 args).
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Stale-proofing: a query's output dir is DELETED before the attempt and
    // a `_FAILED` marker is written on exception, so a transient mid-suite
    // failure can only ever grade as `err` — never as a hash mismatch against
    // leftover parquet bytes from a previous run (the r4 mx3 signature).
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rmRf)
      f.delete(); ()
    }
    val statuses = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val dest = new java.io.File(s"$outDir/$name")
      rmRf(dest)
      graft.operators.PrefixSum.drainDebug() // clear stale recs from prior queries
      graft.queries.Shared.clear() // hermetic gate: no cross-query reuse here
      val status =
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(dest.getPath)
          "ok"
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          rmRf(dest) // a partial write must not survive either
          dest.mkdirs()
          Files.writeString(Paths.get(dest.getPath, "_FAILED"),
            s"$name: ${e.toString}\n")
          "failed"
        }
      // Execution-evidence sidecar (prefix-sum bounds + per-split pass-1
      // totals) for post-hoc diagnosis of driver-side-only divergences (the
      // mx3 ghost). Underscore prefix: parquet readers skip it as metadata.
      val dbgRecs = graft.operators.PrefixSum.drainDebug()
      if (dbgRecs.nonEmpty && dest.isDirectory)
        Files.writeString(Paths.get(dest.getPath, "_DEBUG.json"),
          dbgRecs.map(_.json).mkString("[", ",\n ", "]\n"))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> status
    }
    // Run manifest: per-query ok/failed, so a grader (or a future round)
    // can distinguish "query errored" from "output disagreed" at a glance.
    Files.writeString(Paths.get(s"$outDir/_MANIFEST.json"),
      statuses.map { case (k, v) => s""""$k": "$v"""" }
        .mkString("{", ", ", "}\n"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
