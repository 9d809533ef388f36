package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.core.Loader
import graft.core.PluginConfig._

/** Distributed columnar sink — the scale-correct counterpart to
  * [[JsonLocalLoader]]'s single-ordered-array contract: written by the
  * executors in parallel (no driver materialization), columnar, splittable,
  * and partitionable by columns so downstream reads prune. One
  * implementation serves both on-classpath columnar formats (parquet and
  * ORC — same writer surface, same pushdown story on read).
  *
  *  - `path` (required)
  *  - `if_exists`: append (default) / replace / fail — same vocabulary as
  *    the sql_database loader
  *  - `partition_by`: optional column list for directory partitioning
  */
abstract class ColumnarLoader(conf: Conf, format: String, plugin: String)
    extends Loader {
  private val path = conf.str("path").getOrElse(
    throw new IllegalArgumentException(s"$plugin: 'path' is required"))
  private val ifExists = conf.strOr("if_exists", "append")
  private val partitionBy = conf.strSeq("partition_by")

  /** Extra format-specific writer options (e.g. the CSV header flag). */
  protected def options: Map[String, String] = Map.empty

  override def load(df: DataFrame): Unit = {
    val mode = ifExists match {
      case "append" => SaveMode.Append
      case "replace" => SaveMode.Overwrite
      case "fail" => SaveMode.ErrorIfExists
      case other => throw new IllegalArgumentException(
        s"$plugin: unknown if_exists '$other'")
    }
    val w = df.write.mode(mode).format(format).options(options)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }
}

class ParquetLoader(conf: Conf) extends ColumnarLoader(conf, "parquet", "parquet_local")

class OrcLoader(conf: Conf) extends ColumnarLoader(conf, "orc", "orc_local")

/** Distributed JSON-Lines sink (one JSON object per line, written by the
  * executors in parallel) — the export format every downstream LLM tooling
  * chain ingests; splittable on the way back in via `jsonl_file`. Same
  * writer surface as the columnar sinks (modes + partition_by).
  */
class JsonlLoader(conf: Conf) extends ColumnarLoader(conf, "json", "jsonl_local")

/** Distributed CSV sink — completes the csv_file round-trip (the reference
  * world's lowest-common-denominator export). Header on by default; same
  * writer surface as the other file sinks (modes + partition_by).
  */
class CsvLoader(conf: Conf) extends ColumnarLoader(conf, "csv", "csv_local") {
  override protected def options: Map[String, String] =
    Map("header" -> conf.strOr("header", "true"))
}
