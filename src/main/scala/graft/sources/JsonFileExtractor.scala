package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Extractor
import graft.core.PluginConfig._

/** Local JSON file source mirroring the reference's `json_file` extractor
  * (`/root/reference/src/data_extractor/extractors/json_file.py:21-34`):
  * a records-orient array file becomes one row per record.
  *
  * `spark.read.option("multiLine", true).json` handles the single-array
  * layout; schema is inferred, like `pd.read_json`.
  */
class JsonFileExtractor(spark: SparkSession, conf: Conf) extends Extractor {
  private val path = conf.str("path").getOrElse(
    throw new IllegalArgumentException("json_file: 'path' is required"))

  override def extract(): DataFrame =
    spark.read.option("multiLine", value = true).json(path)
}
