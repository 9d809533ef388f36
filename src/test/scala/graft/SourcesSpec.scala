package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources._

/** HTTP-source contracts with a scripted fake transport — the same hermetic
  * strategy as the reference's httpx mocks
  * (`tests/test_alpha_vantage_extractor.py:42-59`).
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def restConf(extra: Map[String, Any] = Map.empty): Map[String, Any] =
    Map("base_url" -> "http://api.test", "endpoint" -> "/items") ++ extra

  test("rest_api single request: list body → N rows, object body → 1 row") {
    val t = new FakeHttpTransport({
      case u if u.startsWith("http://api.test/items") =>
        HttpResult(200, """[{"id":1,"v":"a"},{"id":2,"v":"b"}]""", Map.empty)
    })
    val df = new RestApiExtractor(spark, restConf(), t).extract()
    assert(df.count() == 2)

    val t2 = new FakeHttpTransport({
      case _ => HttpResult(200, """{"id":9,"v":"solo"}""", Map.empty)
    })
    assert(new RestApiExtractor(spark, restConf(), t2).extract().count() == 1)
  }

  test("rest_api page_param pagination stops on short page and keeps it") {
    val t = new FakeHttpTransport({
      case u if u.contains("page=1") =>
        HttpResult(200, """[{"id":1},{"id":2},{"id":3}]""", Map.empty)
      case u if u.contains("page=2") =>
        HttpResult(200, """[{"id":4}]""", Map.empty) // short → kept, then stop
      case u if u.contains("page=3") =>
        HttpResult(200, """[{"id":99}]""", Map.empty) // must never be fetched
    })
    val conf = restConf(Map("pagination" -> Map(
      "mode" -> "page_param", "per_page" -> 3, "max_pages" -> 10)))
    val df = new RestApiExtractor(spark, conf, t).extract()
    assert(df.count() == 4)
    assert(t.requests.size == 2)
  }

  test("rest_api page_param stops on empty page, excluding it") {
    val t = new FakeHttpTransport({
      case u if u.contains("page=1") => HttpResult(200, """[{"id":1},{"id":2}]""", Map.empty)
      case u if u.contains("page=2") => HttpResult(200, """[]""", Map.empty)
    })
    val conf = restConf(Map("pagination" -> Map(
      "mode" -> "page_param", "per_page" -> 2, "max_pages" -> 10)))
    val df = new RestApiExtractor(spark, conf, t).extract()
    assert(df.count() == 2)
    assert(t.requests.size == 2)
  }

  test("rest_api page_param respects max_pages") {
    val t = new FakeHttpTransport({
      case _ => HttpResult(200, """[{"id":1},{"id":2}]""", Map.empty)
    })
    val conf = restConf(Map("pagination" -> Map(
      "mode" -> "page_param", "per_page" -> 2, "max_pages" -> 3)))
    assert(new RestApiExtractor(spark, conf, t).extract().count() == 6)
    assert(t.requests.size == 3)
  }

  test("rest_api link_header follows rel=next") {
    val t = new FakeHttpTransport({
      case "http://api.test/items" =>
        HttpResult(200, """[{"id":1}]""",
          Map("link" -> """<http://api.test/items?p=2>; rel="next", <http://x>; rel="last""""))
      case "http://api.test/items?p=2" =>
        HttpResult(200, """[{"id":2}]""", Map.empty)
    })
    val conf = restConf(Map("pagination" -> Map("mode" -> "link_header")))
    val df = new RestApiExtractor(spark, conf, t).extract()
    assert(df.count() == 2)
  }

  test("rest_api link_header stops on empty body without following its link") {
    val t = new FakeHttpTransport({
      case "http://api.test/items" =>
        HttpResult(200, """[{"id":1}]""",
          Map("link" -> """<http://api.test/items?p=2>; rel="next""""))
      case "http://api.test/items?p=2" =>
        HttpResult(200, "[]",
          Map("link" -> """<http://api.test/items?p=3>; rel="next"""")) // link must not be followed
      case "http://api.test/items?p=3" =>
        HttpResult(200, """[{"id":99}]""", Map.empty)
    })
    val conf = restConf(Map("pagination" -> Map("mode" -> "link_header")))
    val df = new RestApiExtractor(spark, conf, t).extract()
    assert(df.count() == 1)
    assert(t.requests.size == 2)
  }

  test("rest_api pagination numbers coerce from Long/string and reject junk") {
    val t = new FakeHttpTransport({
      case _ => HttpResult(200, """[{"id":1},{"id":2}]""", Map.empty)
    })
    val conf = restConf(Map("pagination" -> Map(
      "mode" -> "page_param", "per_page" -> 2L, "max_pages" -> "3")))
    assert(new RestApiExtractor(spark, conf, t).extract().count() == 6)
    val bad = restConf(Map("pagination" -> Map("mode" -> "page_param", "max_pages" -> "lots")))
    intercept[IllegalArgumentException](new RestApiExtractor(spark, bad, t).extract())
  }

  test("rest_api path params interpolate and bearer auth header is attached") {
    val t = new FakeHttpTransport({
      case _ => HttpResult(200, """[{"id":1}]""", Map.empty)
    })
    val conf = Map(
      "base_url" -> "http://api.test", "endpoint" -> "/orgs/{org}/repos",
      "path_params" -> Map("org" -> "acme"), "auth_token_env" -> "FAKE_TOKEN")
    val ex = new RestApiExtractor(spark, conf, t, env = Map("FAKE_TOKEN" -> "s3cr3t").get)
    ex.extract()
    val (url, headers) = t.requests.head
    assert(url == "http://api.test/orgs/acme/repos")
    assert(headers.get("Authorization").contains("Bearer s3cr3t"))
  }

  test("rest_api missing auth env proceeds unauthenticated") {
    val t = new FakeHttpTransport({ case _ => HttpResult(200, "[]", Map.empty) })
    val ex = new RestApiExtractor(spark, restConf(Map("auth_token_env" -> "NOPE")), t, env = _ => None)
    ex.extract()
    assert(!t.requests.head._2.contains("Authorization"))
  }

  test("rest_api HTTP error raises") {
    val t = new FakeHttpTransport({ case _ => HttpResult(500, "boom", Map.empty) })
    intercept[RuntimeException](new RestApiExtractor(spark, restConf(), t).extract())
  }

  private val avBody =
    """{"Meta Data": {"2. Symbol": "TEST"},
      | "Time Series (Daily)": {
      |   "2024-01-03": {"1. open": "102.0", "2. high": "104.5", "3. low": "101.0", "4. close": "103.0", "5. volume": "1200"},
      |   "2024-01-02": {"1. open": "100.0", "2. high": "102.5", "3. low": "99.0", "4. close": "101.5", "5. volume": "1000"}
      | }}""".stripMargin

  test("alpha_vantage flattens nested series into ordered OHLCV columns") {
    val t = new FakeHttpTransport({ case _ => HttpResult(200, avBody, Map.empty) })
    val ex = new AlphaVantageExtractor(spark,
      Map("symbol" -> "TEST"), t, env = Map("ALPHAVANTAGE_API_KEY" -> "k").get)
    val df = ex.extract()
    assert(df.columns.toSeq == Seq("date", "open", "high", "low", "close", "volume"))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.head.getString(0) == "2024-01-02") // sorted ascending
    assert(rows.head.getDouble(4) == 101.5)        // numeric coercion
  }

  test("alpha_vantage maps JSON-body errors to failures") {
    Seq("Error Message", "Note", "Information").foreach { k =>
      val t = new FakeHttpTransport({
        case _ => HttpResult(200, s"""{"$k": "rate limited"}""", Map.empty)
      })
      val ex = new AlphaVantageExtractor(spark, Map("symbol" -> "T"), t, env = _ => Some("k"))
      val e = intercept[RuntimeException](ex.extract())
      assert(e.getMessage.contains(k))
    }
  }

  test("alpha_vantage series_key override and empty series → empty 6-col frame") {
    val t = new FakeHttpTransport({
      case _ => HttpResult(200, """{"Meta Data": {}, "Weekly": {}}""", Map.empty)
    })
    val ex = new AlphaVantageExtractor(spark,
      Map("symbol" -> "T", "series_key" -> "Weekly"), t, env = _ => Some("k"))
    val df = ex.extract()
    assert(df.count() == 0)
    assert(df.columns.length == 6)
  }

  test("alpha_vantage unparseable numerics coerce to null") {
    val body =
      """{"Time Series (Daily)": {
        |  "2024-01-02": {"1. open": "oops", "2. high": "1", "3. low": "1", "4. close": "1", "5. volume": "1"}}}""".stripMargin
    val t = new FakeHttpTransport({ case _ => HttpResult(200, body, Map.empty) })
    val ex = new AlphaVantageExtractor(spark, Map("symbol" -> "T"), t, env = _ => Some("k"))
    val row = ex.extract().head()
    assert(row.isNullAt(1))
  }

  test("alpha_vantage values land in the right columns with API prefixes stripped") {
    val t = new FakeHttpTransport({ case _ => HttpResult(200, avBody, Map.empty) })
    val ex = new AlphaVantageExtractor(spark, Map("symbol" -> "TEST"), t, env = _ => Some("k"))
    val rows = ex.extract().collect()
    assert(rows.length == 2) // one row per date key
    val first = rows.head // 2024-01-02 after ascending sort
    assert(first.getDouble(1) == 100.0)  // "1. open" -> open
    assert(first.getDouble(2) == 102.5)  // "2. high" -> high
    assert(first.getDouble(3) == 99.0)   // "3. low"  -> low
    assert(first.getDouble(4) == 101.5)  // "4. close" -> close
    assert(first.getDouble(5) == 1000.0) // "5. volume" -> volume
  }

  test("alpha_vantage auto-detects a weekly series key and types numerics as double") {
    val body =
      """{"Meta Data": {"2. Symbol": "T"},
        | "Weekly Time Series": {
        |   "2024-01-05": {"1. open": "10", "2. high": "11", "3. low": "9", "4. close": "10.5", "5. volume": "100"}}}""".stripMargin
    val t = new FakeHttpTransport({ case _ => HttpResult(200, body, Map.empty) })
    val df = new AlphaVantageExtractor(spark, Map("symbol" -> "T"), t, env = _ => Some("k")).extract()
    assert(df.count() == 1) // first non-"Meta Data" key detected, no config needed
    import org.apache.spark.sql.types._
    assert(df.schema.fields.map(_.dataType).toSeq ==
      Seq(StringType, DoubleType, DoubleType, DoubleType, DoubleType, DoubleType))
    assert(intercept[RuntimeException] {
      val empty = new FakeHttpTransport({ case _ => HttpResult(200, """{"Meta Data": {}}""", Map.empty) })
      new AlphaVantageExtractor(spark, Map("symbol" -> "T"), empty, env = _ => Some("k")).extract()
    }.getMessage.contains("no time-series key"))
  }

  test("alpha_vantage builds the request URL with the env api key and params") {
    val t = new FakeHttpTransport({
      case _ => HttpResult(200, """{"Meta Data": {}, "S": {}}""", Map.empty)
    })
    new AlphaVantageExtractor(spark,
      Map("symbol" -> "IBM", "function" -> "TIME_SERIES_WEEKLY", "outputsize" -> "full"),
      t, env = Map("ALPHAVANTAGE_API_KEY" -> "s3cr3t").get).extract()
    assert(t.requests.head._1 ==
      "https://www.alphavantage.co/query?function=TIME_SERIES_WEEKLY&symbol=IBM&outputsize=full&apikey=s3cr3t")
  }

  test("scraper: selectors extract equal-cardinality columns; mismatch raises") {
    val html = "<li class=t>alpha</li><li class=t>beta</li><li class=p>1</li><li class=p>2</li>"
    val fetcher = new StaticFetcher(Map("http://x" -> html))
    val conf = Map(
      "url" -> "http://x",
      "selectors" -> Seq("""<li class=t>([^<]*)</li>""", """<li class=p>([^<]*)</li>"""),
      "column_names" -> Seq("title", "price"))
    val df = new ScraperExtractor(spark, conf, fetcher).extract()
    assert(df.columns.toSeq == Seq("title", "price"))
    assert(df.count() == 2)

    val bad = conf + ("selectors" -> Seq("""<li class=t>([^<]*)</li>""", """<li class=zz>([^<]*)</li>"""))
    intercept[RuntimeException](new ScraperExtractor(spark, bad, fetcher).extract())
  }

  test("scraper: reference-shaped CSS selectors extract stripped text_content") {
    // the reference's webscrape_example.yaml selector shapes
    val html =
      """<html><body>
        |<article class="product_pod"><h3><a href="/b1">Book&nbsp;One</a></h3>
        |  <p class="price_color"> &#163;51.77 </p></article>
        |<article class="product_pod"><h3><a href="/b2">Book <em>Two</em></a></h3>
        |  <p class="price_color">£12.00</p></article>
        |<article class="other"><h3><a>Not a product</a></h3>
        |  <p class="price_color">£9</p></article>
        |</body></html>""".stripMargin
    val fetcher = new StaticFetcher(Map("http://books" -> html))
    val conf = Map(
      "url" -> "http://books",
      "selectors" -> Seq(
        Map("name" -> "title", "css" -> "article.product_pod h3 a"),
        Map("name" -> "price", "css" -> "article.product_pod .price_color")))
    val df = new ScraperExtractor(spark, conf, fetcher).extract()
    assert(df.columns.toSeq == Seq("title", "price"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // text_content semantics: nested tags flattened, entities decoded
    // (&nbsp; stays U+00A0 as in a browser), edges stripped
    assert(rows == Seq("Book One" -> "£51.77", "Book Two" -> "£12.00"))

    // equal-cardinality contract holds for CSS selectors too: bare
    // .price_color also matches the non-product article (3 vs 2) → raises
    val bad = conf + ("selectors" -> Seq(
      Map("name" -> "title", "css" -> "article.product_pod h3 a"),
      Map("name" -> "price", "css" -> ".price_color")))
    intercept[RuntimeException](new ScraperExtractor(spark, bad, fetcher).extract())
  }

  test("json_file reads a records-orient array file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json")
    val p = dir.resolve("data.json")
    java.nio.file.Files.writeString(p, """[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]""")
    val df = new JsonFileExtractor(spark, Map("path" -> p.toString)).extract()
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("id", "name"))
  }
}
