package graft.sources

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.slf4j.LoggerFactory
import graft.core.Extractor
import graft.core.PluginConfig._

/** Alpha Vantage OHLCV source mirroring the reference
  * (`/root/reference/src/data_extractor/extractors/alpha_vantage.py:36-142`):
  *
  *  - API key injected from env (`api_key_env`) into query params
  *  - JSON-body errors (`Error Message` / `Note` / `Information`) raise
  *  - series key auto-detected as the first non-`Meta Data` key, or forced
  *    via `series_key`
  *  - nested `{date: {"1. open": …}}` flattened to columns
  *    `date, open, high, low, close, volume`
  *  - numeric coercion with null-on-failure (pandas `to_numeric(errors=
  *    "coerce")` ≙ `try_cast` to double)
  *  - empty series → empty 6-column frame
  */
class AlphaVantageExtractor(
    spark: SparkSession, conf: Conf,
    transport: HttpTransport = JdkHttpTransport,
    env: String => Option[String] = sys.env.get) extends Extractor {
  private val log = LoggerFactory.getLogger(getClass)

  private val baseUrl = conf.strOr("base_url", "https://www.alphavantage.co/query")
  private val symbol = conf.str("symbol").getOrElse(
    throw new IllegalArgumentException("alpha_vantage: 'symbol' is required"))
  private val function = conf.strOr("function", "TIME_SERIES_DAILY")
  private val outputSize = conf.strOr("outputsize", "compact")
  private val apiKeyEnv = conf.strOr("api_key_env", "ALPHAVANTAGE_API_KEY")
  private val seriesKeyOverride = conf.str("series_key")

  /** Reference column map (`alpha_vantage.py:36-42`). */
  private val ColumnMap = Seq(
    "1. open" -> "open", "2. high" -> "high", "3. low" -> "low",
    "4. close" -> "close", "5. volume" -> "volume")

  private val OutSchema = StructType(
    StructField("date", StringType) +:
      ColumnMap.map { case (_, c) => StructField(c, StringType) })

  private[sources] def url: String = {
    val key = env(apiKeyEnv).getOrElse {
      log.warn(s"alpha_vantage: api key env '$apiKeyEnv' not set")
      "demo"
    }
    s"$baseUrl?function=$function&symbol=$symbol&outputsize=$outputSize&apikey=$key"
  }

  override def extract(): DataFrame = {
    val res = transport.get(url, Map("Accept" -> "application/json"))
    if (res.status >= 400)
      throw new RuntimeException(s"alpha_vantage: HTTP ${res.status}")
    parseBody(res.body)
  }

  private[sources] def parseBody(body: String): DataFrame = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(body)
    // JSON-body error mapping (`alpha_vantage.py:88-97`)
    Seq("Error Message", "Note", "Information").foreach { k =>
      if (root.has(k))
        throw new RuntimeException(s"alpha_vantage: API error ($k): ${root.get(k).asText()}")
    }
    val seriesKey = seriesKeyOverride.orElse {
      root.fieldNames().asScala.find(_ != "Meta Data")
    }.getOrElse(throw new RuntimeException("alpha_vantage: no time-series key in response"))
    val series = Option(root.get(seriesKey)).getOrElse(
      throw new RuntimeException(s"alpha_vantage: series key '$seriesKey' missing"))

    val rows = series.properties().asScala.toSeq.map { e =>
      val date = e.getKey
      val bar = e.getValue
      Row.fromSeq(date +: ColumnMap.map { case (apiName, _) =>
        Option(bar.get(apiName)).map(_.asText()).orNull
      })
    }
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, math.max(1, rows.size / 5000).min(32)),
      OutSchema)
    // numeric coercion, null on failure (`alpha_vantage.py:120-122`)
    import org.apache.spark.sql.functions.col
    ColumnMap.map(_._2).foldLeft(raw)((d, c) => d.withColumn(c, col(c).try_cast(DoubleType)))
      .orderBy(col("date"))
  }
}
