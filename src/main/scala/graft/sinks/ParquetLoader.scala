package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.core.Loader
import graft.core.PluginConfig._

/** Distributed parquet sink — the scale-correct counterpart to
  * [[JsonLocalLoader]]'s single-ordered-array contract: written by the
  * executors in parallel (no driver materialization), columnar, splittable,
  * and partitionable by columns so downstream reads prune.
  *
  *  - `path` (required)
  *  - `if_exists`: append (default) / replace / fail — same vocabulary as
  *    the sql_database loader
  *  - `partition_by`: optional column list for directory partitioning
  */
class ParquetLoader(conf: Conf) extends Loader {
  private val path = conf.str("path").getOrElse(
    throw new IllegalArgumentException("parquet_local: 'path' is required"))
  private val ifExists = conf.strOr("if_exists", "append")
  private val partitionBy = conf.strSeq("partition_by")

  override def load(df: DataFrame): Unit = {
    val mode = ifExists match {
      case "append" => SaveMode.Append
      case "replace" => SaveMode.Overwrite
      case "fail" => SaveMode.ErrorIfExists
      case other => throw new IllegalArgumentException(
        s"parquet_local: unknown if_exists '$other'")
    }
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
