package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.core.Extractor
import graft.core.PluginConfig._

/** Web-scrape source mirroring the reference's `playwright_scraper`
  * (`/root/reference/src/data_extractor/extractors/playwright_scraper.py:35-80`).
  *
  * Browser automation is orthogonal to the engine, so acquisition is a
  * pluggable [[ContentFetcher]] (any headless fetcher, or pre-fetched HTML in
  * tests — the reference never tests against a live browser either).
  * Selectors are interpreted as regexes with one capture group standing in
  * for CSS text_content extraction. The reference's load-bearing contract is
  * preserved: N selectors → N columns, and ALL selectors must match the same
  * element count or the extract fails (`playwright_scraper.py:64-71`).
  */
trait ContentFetcher {
  def fetch(url: String): String
}

final class StaticFetcher(content: Map[String, String]) extends ContentFetcher {
  def fetch(url: String): String = content.getOrElse(url,
    throw new RuntimeException(s"scraper: no content for $url"))
}

class ScraperExtractor(
    spark: SparkSession, conf: Conf,
    fetcher: ContentFetcher) extends Extractor {

  private val url = conf.str("url").getOrElse(
    throw new IllegalArgumentException("scraper: 'url' is required"))
  private val selectors = conf.strSeq("selectors")
  private val columns = {
    val names = conf.strSeq("column_names")
    if (names.nonEmpty) names else selectors.indices.map(i => s"col_$i")
  }
  require(selectors.nonEmpty, "scraper: 'selectors' is required")
  require(columns.size == selectors.size,
    "scraper: column_names must match selectors in length")

  override def extract(): DataFrame = {
    val html = fetcher.fetch(url)
    val extracted: Seq[Seq[String]] = selectors.map { sel =>
      sel.r.findAllMatchIn(html).map(m =>
        if (m.groupCount >= 1) m.group(1) else m.matched).toSeq
    }
    // equal-cardinality contract
    val counts = extracted.map(_.size).distinct
    if (counts.size > 1)
      throw new RuntimeException(
        s"scraper: selectors matched differing element counts: ${extracted.map(_.size).mkString(",")}")
    val n = counts.headOption.getOrElse(0)
    val rows = (0 until n).map(i => Row.fromSeq(extracted.map(_(i))))
    val schema = StructType(columns.map(c => StructField(c, StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
