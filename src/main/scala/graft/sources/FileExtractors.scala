package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Extractor
import graft.core.PluginConfig._

/** Columnar/delimited file sources beyond the reference's json_file — the
  * formats a Spark-native engine reads at scale (both are distributed,
  * splittable scans with pushdown, unlike the reference's pandas readers).
  *
  *  - `csv_file`: header/delimiter/inferSchema configurable (defaults match
  *    `pd.read_csv`: header row, comma, types inferred)
  *  - `parquet_file`: the scale-native format — predicate pushdown, column
  *    pruning and partition pruning all reach the scan
  *
  * Both accept a `path` that may be a file, a directory, or a glob.
  */
class CsvFileExtractor(spark: SparkSession, conf: Conf) extends Extractor {
  private val path = conf.str("path").getOrElse(
    throw new IllegalArgumentException("csv_file: 'path' is required"))
  private val header = conf.bool("header", default = true)
  private val delimiter = conf.strOr("delimiter", ",")
  private val inferSchema = conf.bool("infer_schema", default = true)

  override def extract(): DataFrame =
    spark.read
      .option("header", header)
      .option("sep", delimiter)
      .option("inferSchema", inferSchema)
      .csv(path)
}

class ParquetFileExtractor(spark: SparkSession, conf: Conf) extends Extractor {
  private val path = conf.str("path").getOrElse(
    throw new IllegalArgumentException("parquet_file: 'path' is required"))

  override def extract(): DataFrame = spark.read.parquet(path)
}

/** ORC — the other on-classpath columnar format; same splittable-scan,
  * pushdown and partition-pruning behavior as parquet, so a pipeline can
  * read whichever format its upstream produced without a conversion step.
  */
class OrcFileExtractor(spark: SparkSession, conf: Conf) extends Extractor {
  private val path = conf.str("path").getOrElse(
    throw new IllegalArgumentException("orc_file: 'path' is required"))

  override def extract(): DataFrame = spark.read.orc(path)
}

/** JSON-Lines (ndjson) — the lingua franca of LLM training-data exchange:
  * one JSON object per line, so the file SPLITS (any byte range can find
  * the next newline) and a 100 TB dump reads with full parallelism —
  * unlike the reference's single-array json_file, which is one
  * unsplittable document by construction ([[JsonFileExtractor]] mirrors
  * that contract; this is the scale-correct sibling). Schema inferred
  * across lines like `spark.read.json` always does; `multiline` stays
  * false — that is what keeps the split property.
  */
class JsonlFileExtractor(spark: SparkSession, conf: Conf) extends Extractor {
  private val path = conf.str("path").getOrElse(
    throw new IllegalArgumentException("jsonl_file: 'path' is required"))

  override def extract(): DataFrame = spark.read.json(path)
}
