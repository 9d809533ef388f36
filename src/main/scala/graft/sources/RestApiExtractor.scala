package graft.sources

import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.slf4j.LoggerFactory
import graft.core.Extractor
import graft.core.PluginConfig._

/** REST/JSON source mirroring the reference's `rest_api` extractor
  * (`/root/reference/src/data_extractor/extractors/rest_api.py`):
  *
  *  - S1 single GET: list body → N rows, object body → 1 row
  *  - S2 `page_param` pagination: pages 1..max_pages, stop on empty or short
  *    page (defaults per_page=100, max_pages=10)
  *  - S3 `link_header` pagination: follow `Link: <url>; rel="next"` up to
  *    max_pages
  *  - S4 path-param interpolation: `/orgs/{org}/repos`
  *  - S5 bearer auth from env var named by `auth_token_env` (warn if unset)
  *
  * Acquisition is driver-side (the remote API is the bottleneck, not the
  * cluster); parsing/inference distributes via `spark.read.json` over the
  * collected page bodies.
  */
class RestApiExtractor(
    spark: SparkSession, conf: Conf,
    transport: HttpTransport = JdkHttpTransport,
    env: String => Option[String] = sys.env.get) extends Extractor {
  private val log = LoggerFactory.getLogger(getClass)

  private val baseUrl = conf.str("base_url").getOrElse("")
  private val endpointRaw = conf.str("endpoint").getOrElse(
    throw new IllegalArgumentException("rest_api: 'endpoint' is required"))
  private val pathParams = conf.strMap("path_params")
  private val queryParams = conf.strMap("query_params")
  private val extraHeaders = conf.strMap("headers")
  private val authTokenEnv = conf.str("auth_token_env")
  private val pagination = conf.anyMap("pagination")

  private[sources] def headers: Map[String, String] = {
    val auth = authTokenEnv.flatMap { name =>
      env(name) match {
        case Some(token) => Some("Authorization" -> s"Bearer $token")
        case None =>
          log.warn(s"rest_api: auth env var '$name' is not set; proceeding unauthenticated")
          None
      }
    }
    Map("Accept" -> "application/json") ++ extraHeaders ++ auth
  }

  /** Path-param interpolation (S4). */
  private[sources] def endpoint: String =
    pathParams.foldLeft(endpointRaw) { case (e, (k, v)) => e.replace(s"{$k}", v) }

  private def urlWith(params: Map[String, String]): String = {
    val base = baseUrl.stripSuffix("/") + endpoint
    if (params.isEmpty) base
    else {
      val qs = params.toSeq.sortBy(_._1).map { case (k, v) =>
        s"${URLEncoder.encode(k, StandardCharsets.UTF_8)}=${URLEncoder.encode(v, StandardCharsets.UTF_8)}"
      }.mkString("&")
      s"$base?$qs"
    }
  }

  private def fetch(url: String): String = {
    val res = transport.get(url, headers)
    if (res.status >= 400)
      throw new RuntimeException(s"rest_api: GET $url returned ${res.status}")
    res.body
  }

  /** Rows in a JSON body: a top-level array counts its elements, an object is
    * one record (pandas `DataFrame(list-or-[dict])`).
    */
  private[sources] def recordCount(body: String): Int = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(body)
    if (node.isArray) node.size() else 1
  }

  private def toDf(bodies: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(bodies))
  }

  override def extract(): DataFrame = {
    val mode = pagination.get("mode") match {
      case Some(s: String) => s
      case _ => "none"
    }
    mode match {
      case "none" => toDf(Seq(fetch(urlWith(queryParams))))
      case "page_param" => paginatePageParam()
      case "link_header" => paginateLinkHeader()
      case other => throw new IllegalArgumentException(s"rest_api: unknown pagination mode '$other'")
    }
  }

  /** Pagination numbers accept any YAML numeric (Int/Long/…) or a numeric
    * string; anything unparseable is an explicit config error rather than a
    * silent fall-back to the default.
    */
  private def pagInt(key: String, default: Int): Int = pagination.get(key) match {
    case Some(n: Number) => n.intValue()
    case Some(s: String) =>
      try s.trim.toInt
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"rest_api: pagination '$key' must be an integer, got '$s'")
      }
    case Some(other) => throw new IllegalArgumentException(
      s"rest_api: pagination '$key' must be an integer, got $other")
    case None => default
  }

  /** S2 — stop on empty page, short page, or max_pages. */
  private def paginatePageParam(): DataFrame = {
    val pageParam = pagination.get("page_param").map(String.valueOf).getOrElse("page")
    val perPageParam = pagination.get("per_page_param").map(String.valueOf).getOrElse("per_page")
    val perPage = pagInt("per_page", 100)
    val maxPages = pagInt("max_pages", 10)
    val bodies = Vector.newBuilder[String]
    var page = 1
    var done = false
    var count = 0
    while (!done && page <= maxPages) {
      val b = fetch(urlWith(queryParams ++ Map(pageParam -> page.toString, perPageParam -> perPage.toString)))
      val n = recordCount(b)
      if (n == 0) done = true // empty page: stop, page excluded
      else {
        bodies += b; count += 1
        if (n < perPage) done = true // short page: keep, then stop
      }
      page += 1
    }
    val all = bodies.result()
    toDf(if (all.isEmpty) Seq("[]") else all)
  }

  /** Parse `Link: <url>; rel="next"` (S3; `rest_api.py:143-150`). */
  private[sources] def parseNextLink(linkHeader: String): Option[String] =
    linkHeader.split(",").iterator
      .map(_.trim)
      .collectFirst {
        case part if part.contains("rel=\"next\"") =>
          part.split(";").head.trim.stripPrefix("<").stripSuffix(">")
      }

  private def paginateLinkHeader(): DataFrame = {
    val maxPages = pagInt("max_pages", 10)
    var url = urlWith(queryParams)
    var bodies = Vector.empty[String]
    var page = 0
    while (url != null && page < maxPages) {
      val res = transport.get(url, headers)
      if (res.status >= 400)
        throw new RuntimeException(s"rest_api: GET $url returned ${res.status}")
      if (recordCount(res.body) == 0) {
        url = null // empty body: stop, exclude the page, don't follow its link
      } else {
        bodies :+= res.body
        page += 1
        url = res.headers.get("link").flatMap(parseNextLink).orNull
      }
    }
    toDf(if (bodies.isEmpty) Seq("[]") else bodies)
  }
}
