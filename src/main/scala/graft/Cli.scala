package graft

import org.apache.spark.sql.SparkSession
import graft.core.{Engine, Registries}

/** Command-line entry point mirroring the reference's `__main__.py`:
  * `-c/--config <pipeline.yaml>` runs a pipeline, `-l/--list-modules` prints
  * the plugin registry (and ignores `--config`), `-f/--full-refresh` forces
  * the incremental initial value.
  */
object Cli {
  private case class Args(config: Option[String] = None, listModules: Boolean = false,
      fullRefresh: Boolean = false)

  private def parse(argv: Array[String]): Args = {
    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "-c" | "--config" => a = a.copy(config = Some(argv(i + 1))); i += 2
        case "-l" | "--list-modules" => a = a.copy(listModules = true); i += 1
        case "-f" | "--full-refresh" => a = a.copy(fullRefresh = true); i += 1
        case other =>
          System.err.println(s"Unknown argument: $other"); sys.exit(2)
      }
    }
    a
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv)
    if (args.listModules) {
      println(Registries.listRegistered())
      return
    }
    val configPath = args.config.getOrElse {
      System.err.println("error: --config is required unless --list-modules"); sys.exit(2); ""
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try new Engine(spark).runFile(configPath, args.fullRefresh)
    finally spark.stop()
  }
}
