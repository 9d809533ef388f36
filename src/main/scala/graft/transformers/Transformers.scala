package graft.transformers

import org.apache.spark.sql.DataFrame
import graft.core.{Registries, Transformer}
import graft.core.PluginConfig._
import graft.operators.{Cleaning, Indicators, Validation}

/** Config-driven transformer plugins wrapping the operator library — the four
  * transformer types of the reference
  * (`/root/reference/src/data_extractor/transformers/__init__.py`).
  */
object Transformers {
  @volatile private var done = false

  def register(): Unit = synchronized {
    if (done) return
    done = true
    Registries.transformers.register("pass_through")((_, _) => PassThrough)
    Registries.transformers.register("data_cleaning")((_, c) => new DataCleaningTransformer(c))
    Registries.transformers.register("pydantic_validation")((_, c) => new ValidationTransformer(c))
    Registries.transformers.register("technical_indicators")((_, c) => new IndicatorsTransformer(c))
    Registries.transformers.register("corpus_clean")((_, c) => new CorpusCleanTransformer(c))
  }

  /** Beyond-reference: the dd8 corpus-curation chain (quality gate → exact
    * dedup → MinHash near-dup removal, [[graft.operators.Dedup.cleanCorpus]])
    * as a config-driven transformer — so the SAME YAML engine that runs the
    * reference's pipelines runs an LLM-curation pipeline
    * (`configs/corpus_pipeline.yaml`): jsonl in → curated jsonl out.
    */
  class CorpusCleanTransformer(conf: Conf) extends Transformer {
    private val idCol = conf.strOr("id_column", "doc_id")
    private val textCol = conf.strOr("text_column", "text")
    private val maxDupWordFraction = conf.dblOr("max_dup_word_fraction", 0.5)
    private val maxSymbolRatio = conf.dblOr("max_symbol_ratio", 0.3)
    private val minTokens = conf.intOr("min_tokens", 5)
    private val threshold = conf.dblOr("jaccard_threshold", 0.8)

    override def validate(df: DataFrame): Unit = {
      val have = df.columns.toSet
      require(have.contains(idCol) && have.contains(textCol),
        s"corpus_clean: requires columns '$idCol' and '$textCol', got ${have.mkString(", ")}")
    }

    def transform(df: DataFrame): DataFrame =
      graft.operators.Dedup.cleanCorpus(df, idCol, textCol,
        maxDupWordFraction = maxDupWordFraction,
        maxSymbolRatio = maxSymbolRatio,
        minTokens = minTokens, threshold = threshold)
  }

  /** P1 — identity (`transformers/pass_through.py:15-20`; the copy contract
    * is free on immutable DataFrames).
    */
  object PassThrough extends Transformer {
    def transform(df: DataFrame): DataFrame = df.select("*")
  }

  /** C1–C11 in the fixed reference order, configured with the reference's
    * YAML keys.
    */
  class DataCleaningTransformer(conf: Conf) extends Transformer {
    private val cfg = Cleaning.Config(
      dropColumns = conf.strSeq("drop_columns"),
      renameColumns = conf.strMap("rename_columns"),
      lowercaseColumns = conf.bool("lowercase_columns"),
      stripWhitespace = conf.bool("strip_whitespace"),
      fillNulls = conf.anyMap("fill_nulls"),
      dropNulls = conf.bool("drop_nulls"),
      dropNullColumns = conf.strSeq("drop_null_columns"),
      deduplicate = conf.bool("deduplicate"),
      deduplicateColumns = conf.strSeq("deduplicate_columns"),
      standardizeDates = conf.strSeq("standardize_dates"),
      castTypes = conf.strMap("cast_types"),
      orderColumn = conf.str("order_column"))

    def transform(df: DataFrame): DataFrame = Cleaning(df, cfg)
  }

  /** V1 — schema-predicate filter; `chunk_size`/`strict` are accepted for
    * config parity but superseded by partitioning / the predicate itself.
    */
  class ValidationTransformer(conf: Conf) extends Transformer {
    private val schemaName = conf.str("schema").orElse(conf.str("model")).getOrElse(
      throw new IllegalArgumentException("pydantic_validation: 'schema' (or 'model') is required"))

    def transform(df: DataFrame): DataFrame = Validation.validate(df, schemaName)
  }

  /** W1–W4 — the finance indicator chain with the reference's config keys and
    * defaults (`finance_transformer.py:35-41`).
    */
  class IndicatorsTransformer(conf: Conf) extends Transformer {
    private val cfg = Indicators.Config(
      rsiPeriod = conf.intOr("rsi_period", 14),
      smaPeriod = conf.intOr("sma_period", 50),
      bbPeriod = conf.intOr("bb_period", 20),
      bbStd = conf.int("bb_std").map(_.toDouble).getOrElse(2.0),
      macdFast = conf.intOr("macd_fast", 12),
      macdSlow = conf.intOr("macd_slow", 26),
      macdSignal = conf.intOr("macd_signal", 9))
    private val partitionCols = conf.strSeq("partition_columns")

    override def validate(df: DataFrame): Unit = {
      val required = Seq("date", "open", "high", "low", "close", "volume")
      val have = df.columns.map(_.toLowerCase).toSet
      val missing = required.filterNot(have.contains)
      require(missing.isEmpty,
        s"technical_indicators: missing required columns: ${missing.mkString(",")}")
    }

    def transform(df: DataFrame): DataFrame =
      Indicators.technicalIndicators(df, cfg, partitionCols)
  }
}
