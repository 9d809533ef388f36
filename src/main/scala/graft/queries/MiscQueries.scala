package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Temporal
import graft.transformers.Transformers

/** Remaining operator-inventory exercises: the identity transformer (P1),
  * the engine's cursor aggregate (S10), and the as-of temporal join
  * (beyond-reference; oracle = DuckDB's native ASOF JOIN).
  */
object MiscQueries {

  val p1PassThrough: Q = Q(
    "p1_pass_through",
    "SELECT * FROM customer ORDER BY c_custkey") { (spark, dir) =>
    Transformers.PassThrough.transform(Tables.customer(spark, dir))
      .orderBy(col("c_custkey"))
  }

  /** S10 — the incremental engine's new-cursor computation:
    * `max(cursor_field)` over the raw extracted frame.
    */
  val s10CursorMax: Q = Q(
    "s10_cursor_max",
    "SELECT CAST(MAX(event_id) AS BIGINT) AS cursor FROM events") { (spark, dir) =>
    Tables.events(spark, dir).agg(max(col("event_id")).as("cursor"))
  }

  /** As-of join: each purchase matched to the user's latest signup at or
    * before it. Spark side is the union+running-window composition
    * ([[graft.operators.Temporal.asofJoin]]); DuckDB side is its native
    * ASOF JOIN — two very different implementations, same rows.
    */
  val qAsofSignup: Q = Q(
    "q_asof_signup",
    """SELECT p.event_id, p.user_id, p.ts, s.ts AS last_signup_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY p.event_id""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
    val signups = ev.filter(col("event_type") === "signup")
    Temporal.asofJoin(purchases, signups, Seq("user_id"), "ts",
      Map("ts" -> "last_signup_ts"))
      .select("event_id", "user_id", "ts", "last_signup_ts")
      .orderBy(col("event_id"))
  }

  /** Nearest-as-of join ([[graft.operators.Temporal.asofNearest]]): each
    * purchase matched to the user's nearest signup in EITHER direction
    * within a 1-day tolerance (inclusive boundary; symmetric straddle ties
    * go BACKWARD). The oracle restates the same union + two directional
    * ignore-nulls running fills in SQL — backward fill over (t ASC, tag
    * ASC), forward fill over (t DESC, tag ASC), right rows tagged 0 so an
    * equal-time signup is visible to both directions — then replays the
    * pick rule verbatim. Scale shape: one keyed sort, two stacked window
    * passes, no join (see the operator scaladoc).
    */
  val qAsofNearest: Q = Q(
    "q_asof_nearest",
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
      |u AS (
      |  SELECT user_id, epoch_us(ts) AS t, 0 AS tag, epoch_us(ts) AS rus,
      |         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS TIMESTAMP) AS ts
      |  FROM s
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts) AS t, 1 AS tag, CAST(NULL AS BIGINT) AS rus,
      |         event_id, ts
      |  FROM p),
      |f AS (SELECT *,
      |    LAST_VALUE(rus IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t ASC, tag ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bus,
      |    LAST_VALUE(rus IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t DESC, tag ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fus
      |  FROM u),
      |g AS (SELECT *,
      |    (bus IS NOT NULL AND t - bus <= 86400000000) AS bok,
      |    (fus IS NOT NULL AND fus - t <= 86400000000) AS fok FROM f),
      |h AS (SELECT *,
      |    CASE WHEN bok AND ((NOT fok) OR t - bus <= fus - t) THEN bus
      |         WHEN fok THEN fus END AS pick
      |  FROM g WHERE tag = 1)
      |SELECT event_id, user_id, ts,
      |  make_timestamp(pick) AS near_signup_ts,
      |  CASE WHEN pick IS NOT NULL THEN pick - t END AS near_signup_ts_delta_us
      |FROM h ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select("user_id", "ts")
    Temporal.asofNearest(purchases, signups, Seq("user_id"), "ts",
        toleranceUs = 86400000000L, outCol = "near_signup_ts")
      .orderBy(col("event_id"))
  }

  val qOuterJoin: Q = Q(
    "q_outer_join",
    """SELECT COALESCE(c.k, s.k) AS nationkey, c.n_cust, s.n_supp
      |FROM (SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_cust FROM customer GROUP BY c_nationkey) c
      |FULL OUTER JOIN (SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_supp FROM supplier GROUP BY s_nationkey) s
      |  ON c.k = s.k
      |ORDER BY nationkey""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir).groupBy(col("c_nationkey").as("k"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir).groupBy(col("s_nationkey").as("ks"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, col("k") === col("ks"), "full_outer")
      .select(coalesce(col("k"), col("ks")).as("nationkey"), col("n_cust"), col("n_supp"))
      .orderBy(col("nationkey"))
  }

  val qAntiCustomers: Q = Q(
    "q_anti_customers",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy(col("c_custkey"))
  }

  val qSemiCustomers: Q = Q(
    "q_semi_customers",
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |              AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val o97 = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    Tables.customer(spark, dir)
      .join(o97, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy(col("c_custkey"))
  }

  /** Exact median without engine-specific percentile interpolation: the
    * middle one-or-two ranked values averaged through an exact decimal sum
    * (cross-engine percentile functions interpolate with different formula
    * shapes, so the oracle-stable form ranks explicitly).
    */
  val qMedianPrice: Q = Q(
    "q_median_price",
    """WITH r AS (
      |  SELECT c_mktsegment, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey) AS rn,
      |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS cnt
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |SELECT c_mktsegment,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS median_price,
      |  CAST(MIN(cnt) AS BIGINT) AS n_orders
      |FROM r
      |WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val joined = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
    val r = joined.select(col("c_mktsegment"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w.orderBy(col("o_totalprice"), col("o_orderkey"))))
      .withColumn("cnt", count(lit(1)).over(w))
    r.filter(col("rn") === floor((col("cnt") + 1) / 2) ||
        col("rn") === floor((col("cnt") + 2) / 2))
      .groupBy(col("c_mktsegment"))
      .agg(
        (sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1)))
          .as("median_price"),
        min(col("cnt")).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** Sketch-based approximate aggregates — the single-pass, bounded-memory
    * statistics a 100 TB profile pass actually runs: HyperLogLog++ distinct
    * counts (`approx_count_distinct`, rsd 1%) and a mergeable quantile
    * sketch (`percentile_approx`, accuracy 10⁴) per market segment, next to
    * the exact count for scale. Both sketches are partial-aggregable
    * (map-side partials merge associatively), so the plan is one shuffle of
    * fixed-size sketch state per group — no sort, no second pass, unlike
    * the exact-median window plan in [[qMedianPrice]]. No SQL oracle:
    * sketch estimates are implementation-defined (DuckDB's HLL parameters
    * differ), so the driver's rows-only check applies and ApproxAggSpec
    * asserts the error bounds against the exact values instead.
    */
  val qApproxStats: Q = Q.noOracle("q_approx_stats") { (spark, dir) =>
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        approx_count_distinct(col("o_custkey"), 0.01).as("approx_customers"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx_p50"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("approx_p90"))
      .orderBy(col("c_mktsegment"))
  }

  private val ProfileCols = Seq("o_custkey", "o_orderdate", "o_orderkey",
    "o_orderpriority", "o_orderstatus", "o_totalprice")

  private val ProfileColsLi = Seq("l_orderkey", "l_partkey", "l_quantity",
    "l_returnflag", "l_shipdate", "l_suppkey")

  private def profileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct FROM $table""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")

  private def profileDf(
      df: org.apache.spark.sql.DataFrame, cols: Seq[String],
      approx: Boolean): org.apache.spark.sql.DataFrame = {
    val aggs = count(lit(1)).as("n") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
      if (approx) approx_count_distinct(col(c), 0.02).as(s"nd_$c")
      else countDistinct(col(c)).as(s"nd_$c")))
    val stacked = cols.map(c => s"'$c', n, null_$c, nd_$c").mkString(", ")
    val outCol = if (approx) "n_distinct_approx" else "n_distinct"
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stacked) AS " +
        s"(col_name, n_rows, n_null, $outCol)"))
      .orderBy(col("col_name"))
  }

  /** Exact one-pass column profile of `orders`: rows / nulls / distinct per
    * column, unpivoted to one row per column via `stack`. All six
    * `count(distinct)`s run in ONE aggregate — Catalyst plans them with an
    * Expand (each input row fans out once per distinct clause), so the
    * single pass costs a ~7× shuffle inflation. That is the standard exact
    * plan and acceptable for scheduled profiling; at 100 TB the first
    * choice is [[qApproxStats]]-style HLL sketches, which merge WITHOUT
    * Expand (fixed-size partials), trading exactness for a flat shuffle.
    */
  val qProfile: Q = Q("q_profile", profileSql("orders", ProfileCols)) {
    (spark, dir) => profileDf(Tables.orders(spark, dir), ProfileCols, approx = false)
  }

  /** The 100 TB profile plan [[qProfile]]'s scaladoc promises: the SAME
    * per-column rows/nulls/distinct profile with the distinct counts as
    * HyperLogLog++ sketches (`approx_count_distinct`, rsd 2%) instead of
    * exact `COUNT(DISTINCT)`. The exact plan pays an Expand — each input row
    * fans out once per distinct clause, a ~7× shuffle inflation; the sketch
    * plan aggregates ALL columns in one flat pass with fixed-size mergeable
    * partials (no Expand node — pinned by ApproxAggSpec), which is why it is
    * the default at corpus scale. rsd 2% (2^12 registers/sketch) is the
    * measured sweet spot: at rsd 1% the 4× register update cost made the
    * sketch pass ~3× SLOWER than the Expand plan at bench scale — the
    * shuffle-volume win only dominates when partial counts, not per-row
    * update work, are the bottleneck. No SQL oracle (HLL estimates are
    * implementation-defined across engines): the driver applies the
    * rows-only check and ApproxAggSpec bounds every estimate against
    * [[qProfile]]'s exact counts at 3×rsd.
    */
  val qProfileApprox: Q = Q.noOracle("q_profile_approx") { (spark, dir) =>
    profileDf(Tables.orders(spark, dir), ProfileCols, approx = true)
  }

  /** The profile pair on the BIGGEST table (lineitem, 4× orders' rows):
    * where the HLL plan's flat-partial shuffle beats the exact plan's
    * Expand fan-out by input volume, demonstrating the scaling direction
    * the [[qProfileApprox]] scaladoc promises. Measured steady-state at
    * sf0.1: exact 1.76 s vs HLL 1.22 s on lineitem (docs/SCALE.md has the
    * full table). Exact variant oracle-gated; approx rows-only +
    * ApproxAggSpec bounds, as for the orders pair.
    */
  val qProfileLi: Q = Q("q_profile_li", profileSql("lineitem", ProfileColsLi)) {
    (spark, dir) => profileDf(Tables.lineitem(spark, dir), ProfileColsLi, approx = false)
  }

  val qProfileLiApprox: Q = Q.noOracle("q_profile_li_approx") { (spark, dir) =>
    profileDf(Tables.lineitem(spark, dir), ProfileColsLi, approx = true)
  }

  /** In-run error-bound witness for the gate's three `no_oracle` sketch
    * queries (round 15; VERDICT r14 #7): no SQL oracle can pin HLL/KLL
    * estimates (sketch parameters are implementation-defined across
    * engines), so [[graft.Verify]] recomputes the EXACT twin in the same
    * session and bounds every estimate in the WRITTEN result — the driver
    * gate then carries per-run evidence (`_BOUNDS.json` beside the parquet,
    * `bounds_ok` in `_MANIFEST.json`) instead of trusting a spec that ran
    * elsewhere. Bounds are the ApproxAggSpec contract: HLL within 3×rsd of
    * exact COUNT(DISTINCT); percentile_approx(10⁴) within ±10% of the exact
    * percentile; rows/null counts (exact in both plans) equal exactly.
    * Returns (all bounds hold, JSON report) — None for non-sketch queries.
    */
  def approxBounds(name: String, spark: org.apache.spark.sql.SparkSession,
      dir: String, back: org.apache.spark.sql.DataFrame): Option[(Boolean, String)] = {
    def j(d: Double): String =
      if (d.isNaN || d.isInfinite) "null" else f"$d%.6f"
    def check(key: String, estimate: Double, exact: Double, bound: Double) = {
      // max(|exact|, 1) denominator: keeps the equality checks (bound 0)
      // well-defined when the exact value is legitimately 0 (null counts)
      val relErr = math.abs(estimate - exact) / math.max(math.abs(exact), 1.0)
      (relErr <= bound,
        s"""{"key":"$key","estimate":${j(estimate)},"exact":${j(exact)},""" +
          s""""rel_err":${j(relErr)},"bound":${j(bound)},"ok":${relErr <= bound}}""")
    }
    def render(checks: Seq[(Boolean, String)]): (Boolean, String) = {
      val ok = checks.forall(_._1)
      (ok, s"""{"query":"$name","bounds_ok":$ok,"checks":[""" + "\n  " +
        checks.map(_._2).mkString(",\n  ") + "\n]}")
    }
    def profileReport(exactDf: org.apache.spark.sql.DataFrame, rsd: Double) = {
      val exact = exactDf.collect().map(r => r.getString(0) -> r).toMap
      render(back.collect().toSeq.sortBy(_.getString(0)).flatMap { a =>
        val c = a.getString(0); val e = exact(c)
        // rows and nulls are exact in BOTH plans: bound 0 (equality)
        Seq(
          check(s"$c.n_rows", a.getAs[Long]("n_rows").toDouble,
            e.getAs[Long]("n_rows").toDouble, 0.0),
          check(s"$c.n_null", a.getAs[Long]("n_null").toDouble,
            e.getAs[Long]("n_null").toDouble, 0.0),
          check(s"$c.n_distinct", a.getAs[Long]("n_distinct_approx").toDouble,
            e.getAs[Long]("n_distinct").toDouble, 3 * rsd))
      })
    }
    name match {
      case "q_profile_approx" => Some(profileReport(
        profileDf(Tables.orders(spark, dir), ProfileCols, approx = false), 0.02))
      case "q_profile_li_approx" => Some(profileReport(
        profileDf(Tables.lineitem(spark, dir), ProfileColsLi, approx = false), 0.02))
      case "q_approx_stats" =>
        val exact = Tables.orders(spark, dir)
          .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(countDistinct(col("o_custkey")).as("nd"),
            expr("percentile(o_totalprice, 0.5)").as("p50"),
            expr("percentile(o_totalprice, 0.9)").as("p90"))
          .collect().map(r => r.getString(0) -> r).toMap
        Some(render(back.collect().toSeq.sortBy(_.getString(0)).flatMap { a =>
          val seg = a.getString(0); val e = exact(seg)
          Seq(
            check(s"$seg.approx_customers",
              a.getAs[Long]("approx_customers").toDouble,
              e.getAs[Long]("nd").toDouble, 0.03), // 3x the configured rsd 0.01
            check(s"$seg.approx_p50", a.getAs[Double]("approx_p50"),
              e.getAs[Double]("p50"), 0.1),
            check(s"$seg.approx_p90", a.getAs[Double]("approx_p90"),
              e.getAs[Double]("p90"), 0.1))
        }))
      case _ => None
    }
  }

  /** Correlated scalar subquery through the SQL surface — Catalyst
    * decorrelates it into an aggregate + join (no per-row re-execution),
    * which is the 100 TB-safe plan. The inner mean uses the exact-decimal
    * convention so both engines compare against the identical double.
    */
  val qAboveAvgOrders: Q = {
    val sql =
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin
    Q("q_above_avg_orders", sql) { (spark, dir) =>
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      spark.sql(sql)
    }
  }

  /** Banded range join (beyond-reference): clicks within the 30 minutes
    * before each purchase, per user — Spark-side via the bucketized
    * decomposition in [[Temporal.rangeJoin]] (equi-join on (key, time
    * bucket), no per-key cartesian); oracle = the plain inequality join.
    * Zero-click purchases kept via the count-then-left-join composition.
    */
  val qRangeJoin: Q = Q(
    "q_range_join",
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.event_id, CAST(COUNT(c.ts) AS BIGINT) AS n_clicks_30m
      |      FROM p LEFT JOIN c ON c.user_id = p.user_id
      |        AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
      |        AND epoch_us(c.ts) < epoch_us(p.ts)
      |      GROUP BY p.event_id)
      |SELECT p.user_id, p.event_id, j.n_clicks_30m
      |FROM p JOIN j ON j.event_id = p.event_id
      |ORDER BY p.user_id, p.event_id""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val pairs = Temporal.rangeJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
      lowerUs = -1800000000L, upperUs = 0L, rightCols = Map("click_id" -> "click_id"))
    val counts = pairs.groupBy("event_id")
      .agg(count(lit(1)).as("n_clicks_30m"))
    purchases.join(counts, Seq("event_id"), "left")
      .withColumn("n_clicks_30m", coalesce(col("n_clicks_30m"), lit(0L)))
      .select(col("user_id"), col("event_id"), col("n_clicks_30m"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Deterministic hash-threshold Bernoulli sample — the reproducible
    * training-data sampling primitive ([[graft.operators.Sampling]]): pure
    * narrow filter, identical row set on every run and engine.
    */
  val mx1HashSample: Q = Q(
    "mx1_hash_sample",
    """SELECT doc_id, lang FROM documents
      |WHERE CAST(concat('0x', substr(md5(concat('s1:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
      |      < CAST(round(0.25 * 4294967296.0) AS BIGINT)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    graft.operators.Sampling.hashSample(
        Tables.documents(spark, dir), "doc_id", fraction = 0.25, salt = "s1")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Per-language quota (the "mix" of a training-data mix): first `n` docs
    * per group in deterministic hash order — one shuffle on the group key,
    * stable across runs.
    */
  val mx2LangQuota: Q = Q(
    "mx2_lang_quota",
    """SELECT lang, doc_id FROM (
      |  SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang
      |    ORDER BY CAST(concat('0x', substr(md5(concat('s2:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT),
      |             doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 40 ORDER BY lang, doc_id""".stripMargin) { (spark, dir) =>
    graft.operators.Sampling.quotaPerGroup(
        Tables.documents(spark, dir), "lang", "doc_id", n = 40, salt = "s2")
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Per-language quality-quantile gate: drop each language's worst quartile
    * by the [[graft.operators.TextAnalysis.qualityScore]] signal. Rank-based
    * (ties broken by doc_id), so the cut is exact and engine-independent —
    * no percentile interpolation; 0.75 is binary-exact so `floor(cnt·0.75)`
    * agrees bit-for-bit across engines. One shuffle on the language key.
    */
  val mx4QualityGate: Q = Q(
    "mx4_quality_gate",
    """WITH t AS (SELECT doc_id, lang,
      |    len(string_split(text, ' ')) AS n_tokens_i, length(text) AS n_chars_i,
      |    len(list_filter(string_split(lower(text), ' '),
      |        t -> t IN ('the','a','of','and','is'))) AS stop_occ_i
      |  FROM documents),
      |q AS (SELECT doc_id, lang,
      |    0.5 * (LEAST(n_tokens_i, 100) / 100.0)
      |    + 0.3 * (stop_occ_i / n_tokens_i)
      |    + 0.2 * (LEAST((n_chars_i - (n_tokens_i - 1)) / n_tokens_i, 10.0) / 10.0) AS quality
      |  FROM t),
      |r AS (SELECT doc_id, lang, quality,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY lang) AS cnt
      |  FROM q)
      |SELECT doc_id, lang FROM r
      |WHERE rk <= CAST(FLOOR(cnt * 0.75) AS BIGINT)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{Sampling, TextAnalysis}
    Sampling.topQuantileByGroup(
        Tables.documents(spark, dir), "lang",
        TextAnalysis.qualityScore(col("text")), "doc_id", keepFraction = 0.75)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic stratified sample — per-language fractions, the mix-ratio
    * knob ([[graft.operators.Sampling.stratifiedHashSample]]): pure narrow
    * filter, reproducible, each group's sample independent of the others.
    */
  val mx5StratifiedSample: Q = Q(
    "mx5_stratified_sample",
    """SELECT doc_id, lang FROM documents
      |WHERE CAST(concat('0x', substr(md5(concat('s5:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
      |      < CASE WHEN lang = 'en' THEN CAST(round(0.5 * 4294967296.0) AS BIGINT)
      |             WHEN lang = 'de' THEN CAST(round(0.25 * 4294967296.0) AS BIGINT)
      |             ELSE CAST(round(0.1 * 4294967296.0) AS BIGINT) END
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    graft.operators.Sampling.stratifiedHashSample(
        Tables.documents(spark, dir), "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.25), defaultFraction = 0.1, salt = "s5")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Corpus curation report: per (source, lang) — doc counts, token volume,
    * quality range, and an INTEGRITY check (rows whose stored `n_chars`
    * disagrees with the text) — the per-domain mix table every corpus
    * pipeline reviews before weighting sources. One groupBy; aggregate
    * choices are bit-stable across engines (integer sums, min/max of
    * identical doubles — no order-dependent double accumulation).
    */
  val mx6DomainMix: Q = Q(
    "mx6_domain_mix",
    """WITH t AS (SELECT source, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_i,
      |    len(string_split(text, ' ')) AS nt, length(text) AS nc,
      |    len(list_filter(string_split(lower(text), ' '),
      |        t -> t IN ('the','a','of','and','is'))) AS so,
      |    CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END AS bad
      |  FROM documents),
      |q AS (SELECT source, lang, n_tokens_i, bad,
      |    0.5 * (LEAST(nt, 100) / 100.0) + 0.3 * (so / nt)
      |    + 0.2 * (LEAST((nc - (nt - 1)) / nt, 10.0) / 10.0) AS quality
      |  FROM t)
      |SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens_i) AS BIGINT) AS sum_tokens,
      |  MIN(quality) AS min_quality, MAX(quality) AS max_quality,
      |  CAST(SUM(bad) AS BIGINT) AS n_chars_mismatch
      |FROM q GROUP BY source, lang ORDER BY source, lang""".stripMargin) { (spark, dir) =>
    import graft.operators.TextAnalysis
    Tables.documents(spark, dir)
      .withColumn("n_tokens_i", TextAnalysis.tokenCount(col("text")).cast("long"))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("bad", when(length(col("text")) =!= col("n_chars"), 1L).otherwise(0L))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens_i")).as("sum_tokens"),
        min(col("quality")).as("min_quality"), max(col("quality")).as("max_quality"),
        sum(col("bad")).as("n_chars_mismatch"))
      .orderBy(col("source"), col("lang"))
  }

  /** Fixed-size deterministic sample ([[graft.operators.Sampling.fixedSizeSample]]):
    * hash-rank top-n plans as TakeOrderedAndProject (per-partition heads,
    * no global sort) — the reservoir use case without reservoir state.
    * Output re-sorted by doc_id for a stable frame.
    */
  val mx7FixedSample: Q = Q(
    "mx7_fixed_sample",
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang FROM documents
      |  ORDER BY CAST(concat('0x', substr(md5(concat('s7:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT),
      |           doc_id
      |  LIMIT 100)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    graft.operators.Sampling.fixedSizeSample(
        Tables.documents(spark, dir), "doc_id", n = 100, salt = "s7")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Token-stream context-window chunking via the distributed two-pass
    * prefix sum ([[graft.operators.PrefixSum]]) — bit-equal to the oracle's
    * `SUM() OVER (ORDER BY ...)` but runs as range-partitioned narrow passes
    * instead of a single-task global window.
    */
  val mx3ContextWindows: Q = Q(
    "mx3_context_windows",
    """SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
      |  CAST(start_offset // 2048 AS BIGINT) AS window_id,
      |  CAST(start_offset % 2048 AS BIGINT) AS window_offset
      |FROM (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    COALESCE(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
      |      OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{PrefixSum, TextAnalysis}
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    PrefixSum.contextWindows(docs, "doc_id", "n_tokens", budget = 2048L)
      .select("doc_id", "n_tokens", "start_offset", "window_id", "window_offset")
      .orderBy("doc_id")
  }

  /** DuckDB BFD replay fragment: from a CTE `docs(…, rn, nt)` (rn = the
    * pack order, contiguous from 1) produces `pbin(rn, bin_id)` — the
    * sequential best-fit-decreasing state machine as ONE `list_reduce`
    * fold (the WindowQueries fold discipline), state = the open-bin
    * remaining-capacity list. Each appended struct carries that step's
    * bin id; the caps list lives ONLY in the last element (the previous
    * element is re-appended caps-stripped), because carrying the ~|bins|
    * list in every history element made the fold O(n²·|bins|) — 65 s at
    * sf0.1 vs 1.8 s stripped, and the old one-doc-per-recursion CTE it
    * replaces was 122 s. NOTE: a plain-struct accumulator would be
    * cleaner, but DuckDB 1.0's `list_reduce` silently mis-binds struct
    * accumulators that aren't lists (verified: `list_reduce(…, (acc, x)
    * -> {'all': list_append(acc.all, x.v)})` returns only the last
    * element) — hence the list-of-structs shape.
    */
  private def bfdFoldSql(budget: Long): String = {
    val fit = "list_min(list_filter(acc[-1].caps, c -> c >= x[1].nt))"
    s"""parr AS (SELECT list({'nt': nt, 'bin': CAST(0 AS BIGINT), 'caps': [$budget - nt]} ORDER BY rn) AS xs FROM docs),
       |pfold AS (SELECT list_reduce(list_transform(xs, z -> [z]),
       |    (acc, x) -> acc[1:len(acc)-1] ||
       |      [{'nt': acc[-1].nt, 'bin': acc[-1].bin, 'caps': CAST([] AS BIGINT[])}] ||
       |      [{'nt': x[1].nt,
       |      'bin': CASE WHEN $fit IS NULL THEN CAST(len(acc[-1].caps) AS BIGINT)
       |                  ELSE CAST(list_position(acc[-1].caps, $fit) - 1 AS BIGINT) END,
       |      'caps': CASE WHEN $fit IS NULL
       |                   THEN list_append(acc[-1].caps, $budget - x[1].nt)
       |                   ELSE acc[-1].caps[1:list_position(acc[-1].caps, $fit)-1] ||
       |                        [$fit - x[1].nt] ||
       |                        acc[-1].caps[list_position(acc[-1].caps, $fit)+1:] END}]) AS st
       |  FROM parr),
       |pbin AS (SELECT generate_subscripts(st, 1) AS rn, unnest(st).bin AS bin_id FROM pfold)""".stripMargin
  }

  /** Sequence packing under the oracle gate ([[graft.operators.Packing]]):
    * best-fit-decreasing bin assignment, docs sorted (n_tokens DESC, doc_id),
    * capacity ties to the lowest bin id. `numPartitions = 1` pins the exact
    * global-BFD assignment the sequential DuckDB fold ([[bfdFoldSql]])
    * replays (bin id == creation order == caps-list position); the
    * multi-partition scale path — same kernel, range-partitioned — is
    * spec-covered (PackingSpec waste/budget bounds).
    */
  val mx8SequencePacking: Q = Q(
    "mx8_sequence_packing",
    s"""WITH docs AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
      |         row_number() OVER (ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS rn
      |  FROM documents),
      |${bfdFoldSql(256L)}
      |SELECT d.doc_id, d.nt AS n_tokens, p.bin_id
      |FROM docs d JOIN pbin p ON p.rn = d.rn ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{Packing, TextAnalysis}
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    Packing.packSequences(docs, "doc_id", "n_tokens", budget = 256L, numPartitions = 1)
      .select("doc_id", "n_tokens", "bin_id")
      .orderBy("doc_id")
  }

  /** Overlapping sliding-window chunking ([[graft.operators.Chunking]]):
    * window 64 / stride 32 per document — one narrow projection + explode,
    * no shuffle (vs [[mx3ContextWindows]]'s corpus-stream prefix sum). The
    * oracle replays the chunk arithmetic with `generate_series` + list
    * slicing.
    */
  val mx9SlidingWindows: Q = Q(
    "mx9_sliding_windows",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS l,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |           FROM documents),
      |c AS (SELECT doc_id, l, n,
      |             CASE WHEN n <= 64 THEN 1 ELSE (n - 64 + 31) // 32 + 1 END AS nc
      |      FROM d),
      |x0 AS (SELECT doc_id, l, n, unnest(generate_series(0, nc - 1)) AS i FROM c),
      |x AS (SELECT doc_id, l, n, CAST(i AS BIGINT) AS chunk_id FROM x0)
      |SELECT doc_id, chunk_id, chunk_id * 32 AS tok_start,
      |       CAST(LEAST(64, n - chunk_id * 32) AS BIGINT) AS n_chunk_tokens,
      |       array_to_string(l[CAST(chunk_id * 32 + 1 AS BIGINT):CAST(chunk_id * 32 + 64 AS BIGINT)], ' ') AS chunk_text
      |FROM x ORDER BY doc_id, chunk_id""".stripMargin) { (spark, dir) =>
    graft.operators.Chunking.slidingWindows(
        Tables.documents(spark, dir).select("doc_id", "text"),
        "doc_id", "text", window = 64, stride = 32)
      .select("doc_id", "chunk_id", "tok_start", "n_chunk_tokens", "chunk_text")
      .orderBy("doc_id", "chunk_id")
  }

  /** Cross-engine table checksums — the migration-validation primitive:
    * per table, row count plus an order-independent XOR of a 60-bit
    * per-row digest over a CANONICAL row string (integers, cents, epoch
    * days, raw strings — never float formatting, which differs across
    * engines). `bit_xor` is commutative/associative, so the signature is
    * partition-order-free and mergeable — one flat aggregate per table at
    * any scale, and two systems agree on content iff (n, sig) match.
    */
  val qTableChecksum: Q = Q(
    "q_table_checksum",
    """WITH o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(bit_xor(CAST(concat('0x', substr(md5(concat_ws('|',
      |      CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
      |      CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR),
      |      CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS VARCHAR),
      |      o_orderpriority, o_orderstatus)), 1, 15)) AS BIGINT)) AS BIGINT) AS xor_sig
      |  FROM orders),
      |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(bit_xor(CAST(concat('0x', substr(md5(concat_ws('|',
      |      CAST(c_custkey AS VARCHAR), CAST(c_nationkey AS VARCHAR),
      |      c_mktsegment)), 1, 15)) AS BIGINT)) AS BIGINT) AS xor_sig
      |  FROM customer),
      |l AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(bit_xor(CAST(concat('0x', substr(md5(concat_ws('|',
      |      CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
      |      CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
      |      l_returnflag, l_linestatus)), 1, 15)) AS BIGINT)) AS BIGINT) AS xor_sig
      |  FROM lineitem)
      |SELECT 'customer' AS table_name, n_rows, xor_sig FROM c
      |UNION ALL SELECT 'lineitem', n_rows, xor_sig FROM l
      |UNION ALL SELECT 'orders', n_rows, xor_sig FROM o
      |ORDER BY table_name""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Column, DataFrame}
    def sig(df: DataFrame, name: String, canon: Column): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        bit_xor(conv(substring(md5(canon), 1, 15), 16, 10).cast(LongType))
          .as("xor_sig"))
        .select(lit(name).as("table_name"), col("n_rows"), col("xor_sig"))
    val o = sig(Tables.orders(spark, dir), "orders", concat_ws("|",
      col("o_orderkey").cast(StringType), col("o_custkey").cast(StringType),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType).cast(StringType),
      datediff(to_date(col("o_orderdate")), lit(java.sql.Date.valueOf("1970-01-01")))
        .cast(StringType),
      col("o_orderpriority"), col("o_orderstatus")))
    val c = sig(Tables.customer(spark, dir), "customer", concat_ws("|",
      col("c_custkey").cast(StringType), col("c_nationkey").cast(StringType),
      col("c_mktsegment")))
    val l = sig(Tables.lineitem(spark, dir), "lineitem", concat_ws("|",
      col("l_orderkey").cast(StringType), col("l_linenumber").cast(StringType),
      col("l_quantity").cast(LongType).cast(StringType),
      col("l_returnflag"), col("l_linestatus")))
    c.union(l).union(o).orderBy(col("table_name"))
  }

  /** Quality-WEIGHTED deterministic sampling
    * ([[graft.operators.Sampling.weightedHashSample]]): each document kept
    * with probability equal to its quality score — the curation step that
    * up-samples high-quality text without a hard quantile cut (mx4's
    * complement). Selection stays a pure function of (salt, doc_id,
    * quality): rerun- and engine-stable, pure narrow filter.
    */
  val mx10WeightedSample: Q = Q(
    "mx10_weighted_sample",
    """WITH q AS (SELECT doc_id, lang,
      |    0.5 * (LEAST(len(string_split(text, ' ')), 100) / 100.0)
      |    + 0.3 * (len(list_filter(string_split(lower(text), ' '),
      |        t -> t IN ('the','a','of','and','is'))) / len(string_split(text, ' ')))
      |    + 0.2 * (LEAST((length(text) - (len(string_split(text, ' ')) - 1))
      |                   / len(string_split(text, ' ')), 10.0) / 10.0) AS quality
      |  FROM documents)
      |SELECT doc_id, lang, quality FROM q
      |WHERE CAST(CAST(concat('0x', substr(md5(concat('s10:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) AS DOUBLE)
      |      < quality * 4294967296.0
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{Sampling, TextAnalysis}
    val docs = Tables.documents(spark, dir)
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
    Sampling.weightedHashSample(docs, "doc_id", col("quality"), salt = "s10")
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget curation: take documents in descending quality order
    * until a fixed token budget is exhausted (keep a doc iff its INCLUSIVE
    * cumulative BPE-token count fits) — the "best N tokens" selection every
    * pretraining data mix ends with. The global quality-ordered running
    * total is the [[graft.operators.PrefixSum]] two-pass scan keyed by
    * struct(−quality, doc_id) (unique total order, no single-partition
    * window), so the same plan cuts a 100 TB corpus to budget. Quality is
    * the tx3 score (oracle-proven double), tokens the tx6 BPE count;
    * the cumulative sum is exact long arithmetic.
    */
  val mx11TokenBudgetSample: Q = Q(
    "mx11_token_budget_sample",
    s"""WITH t AS (SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.BpePattern}')) AS BIGINT) AS n_tokens,
       |    0.5 * (LEAST(len(string_split(text, ' ')), 100) / 100.0)
       |    + 0.3 * (len(list_filter(string_split(lower(text), ' '),
       |        t -> t IN ('the','a','of','and','is'))) / len(string_split(text, ' ')))
       |    + 0.2 * (LEAST((length(text) - (len(string_split(text, ' ')) - 1))
       |                   / len(string_split(text, ' ')), 10.0) / 10.0) AS q
       |  FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |        CAST(SUM(n_tokens) OVER (ORDER BY q DESC, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |      FROM t)
       |SELECT doc_id, n_tokens, cum_tokens FROM c
       |WHERE cum_tokens <= 12000 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{PrefixSum, TextAnalysis}
    import org.apache.spark.sql.types.LongType
    val docs = Tables.documents(spark, dir).select(
        col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).cast(LongType).as("n_tokens"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .withColumn("ord", struct((-col("q")).as("nq"), col("doc_id").as("id")))
    PrefixSum.withStartOffset(docs, "ord", "n_tokens", "cum0")
      .select(col("doc_id"), col("n_tokens"),
        (col("cum0") + col("n_tokens")).as("cum_tokens"))
      .filter(col("cum_tokens") <= 12000L)
      .orderBy(col("doc_id"))
  }

  /** Group-aware 80/20 holdout split over `events`, keyed by USER hash —
    * the leakage-prevention twin of mx1's row-level sampling: all of a
    * user's events land on one side by construction (the split label is a
    * pure function of (salt, user_id)), so no user's future behavior leaks
    * from test into train. The report is the per-(split, event_type) event
    * and distinct-user census a training pipeline logs before fitting —
    * one grouped aggregate over a narrow projection; at 100 TB the label
    * costs one codegen'd hash per row and the census one shuffle.
    */
  val mx12GroupSplit: Q = Q(
    "mx12_group_split",
    """WITH a AS (SELECT event_type, user_id,
      |  CASE WHEN CAST(concat('0x', substr(md5(concat('gs:', CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT)
      |         < CAST(round(0.8 * 4294967296.0) AS BIGINT)
      |       THEN 'train' ELSE 'test' END AS split
      |  FROM events)
      |SELECT split, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM a GROUP BY split, event_type ORDER BY split, event_type""".stripMargin) {
    (spark, dir) =>
      graft.operators.Sampling.hashSplit(
          Tables.events(spark, dir).select(col("event_type"), col("user_id")),
          "user_id", trainFraction = 0.8, salt = "gs")
        .groupBy(col("split"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("split"), col("event_type"))
  }

  /** Waterfilling token-budget allocation across sources — the
    * source-balancing step of a pretraining data mixer: given per-source
    * token totals and a global budget B (here total÷2), find the uniform
    * per-source cap C maximizing Σ min(tokens_s, C) ≤ B, so small sources
    * keep everything and the surplus spreads evenly over the large ones
    * (the integer waterline). Closed form via the classic sorted-prefix
    * argument: with sources ascending by tokens, j = the last index whose
    * full-keep-at-its-own-level cost p_{j−1} + (k−j+1)·tokens_j fits B,
    * then C = (B − p_j) div (k − j). Everything is integer arithmetic
    * (div / least), so both engines agree bit-for-bit; keep_bp is the
    * per-source downsample rate mx1's hash sampler would then apply.
    * Scale: the doc scan reduces to ONE bounded per-source aggregate
    * (like q_skew_report); the waterline computation runs over #sources
    * rows — the un-partitioned window is bounded by source cardinality,
    * never by corpus size.
    */
  val mx13SourceWaterfill: Q = Q(
    "mx13_source_waterfill",
    s"""WITH t AS (SELECT source,
       |    CAST(SUM(CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.BpePattern}')) AS BIGINT)) AS BIGINT) AS tokens
       |  FROM documents GROUP BY source),
       |r AS (SELECT source, tokens,
       |    CAST(ROW_NUMBER() OVER (ORDER BY tokens, source) AS BIGINT) AS i,
       |    CAST(SUM(tokens) OVER (ORDER BY tokens, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
       |  FROM t),
       |g AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total,
       |             CAST(COUNT(*) AS BIGINT) AS k FROM t),
       |f AS (SELECT r.source, r.tokens, r.i, r.p, g.total, g.k,
       |        g.total // 2 AS b,
       |        r.p - r.tokens + (g.k - r.i + 1) * r.tokens AS cost
       |      FROM r, g),
       |jj AS (SELECT MAX(CASE WHEN cost <= b THEN i ELSE 0 END) AS j,
       |              MAX(CASE WHEN cost <= b THEN p ELSE 0 END) AS pj FROM f),
       |cap AS (SELECT CASE WHEN jj.j >= g.k THEN (SELECT MAX(tokens) FROM t)
       |                    WHEN jj.j = 0 THEN (g.total // 2) // g.k
       |                    ELSE ((g.total // 2) - jj.pj) // (g.k - jj.j)
       |               END AS water_cap
       |        FROM jj, g)
       |SELECT f.source, f.tokens,
       |  LEAST(f.tokens, cap.water_cap) AS kept_tokens,
       |  CAST(CASE WHEN f.tokens = 0 THEN NULL
       |            ELSE LEAST(f.tokens, cap.water_cap) * 10000 // f.tokens
       |       END AS BIGINT) AS keep_bp,
       |  cap.water_cap
       |FROM f, cap ORDER BY f.source""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    import graft.operators.TextAnalysis
    // one bounded aggregate over the corpus, materialized once for its
    // four consumers (ranked frame, totals, max, final projection)
    val t = graft.operators.Dedup.cachedForReuse(
      Tables.documents(spark, dir)
        .groupBy(col("source"))
        .agg(sum(TextAnalysis.bpeTokenCount(col("text")).cast(LongType)).as("tokens")))
    val w = Window.orderBy(col("tokens"), col("source"))
    val r = t.select(col("source"), col("tokens"),
      row_number().over(w).cast(LongType).as("i"),
      sum(col("tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("p"))
    val g = t.agg(sum(col("tokens")).as("total"), count(lit(1)).as("k"))
    val f = r.crossJoin(broadcast(g))
      .withColumn("b", expr("total div 2"))
      .withColumn("cost",
        col("p") - col("tokens") + (col("k") - col("i") + 1) * col("tokens"))
    val jj = f.agg(
      max(when(col("cost") <= col("b"), col("i")).otherwise(0L)).as("j"),
      max(when(col("cost") <= col("b"), col("p")).otherwise(0L)).as("pj"))
    val mxT = t.agg(max(col("tokens")).as("tmax"))
    val cap = jj.crossJoin(broadcast(g)).crossJoin(broadcast(mxT))
      .select(
        when(col("j") >= col("k"), col("tmax"))
          .when(col("j") === 0, expr("(total div 2) div k"))
          .otherwise(expr("((total div 2) - pj) div (k - j)"))
          .as("water_cap"))
    f.crossJoin(broadcast(cap))
      .select(col("source"), col("tokens"),
        least(col("tokens"), col("water_cap")).as("kept_tokens"),
        // tokens = 0 (a source whose docs all tokenize empty) → NULL on both
        // engines: Spark's div would return NULL silently but DuckDB's //
        // raises division-by-zero — guard makes the oracle symmetric.
        expr("case when tokens = 0 then null " +
          "else least(tokens, water_cap) * 10000 div tokens end").as("keep_bp"),
        col("water_cap"))
      .orderBy(col("source"))
  }

  /** Temperature-scaled source mixing (the multinomial-sampling counterpart
    * to mx13's waterfill): per-source weight = isqrt(tokens) — i.e. p^(1/T)
    * with T = 2, the up-weight-the-tail exponent of multilingual/multi-source
    * pretraining mixes — and a global budget B = total÷2 allocated across
    * sources by Hamilton's largest-remainder method (base = B·w div W, the
    * R = B − Σbase leftover units go to the R largest remainders, ties to
    * source name). Unlike the waterfill, a small source's allocation may
    * EXCEED its own tokens — that is the point of temperature mixing
    * (epochs_bp > 10⁴ marks upsampling). floor(sqrt(·)) is engine-portable:
    * BIGINT→DOUBLE is exact below 2⁵³ and IEEE sqrt is correctly rounded,
    * so both engines floor the same double. All windows run over #sources
    * rows — bounded by source cardinality, never corpus size.
    */
  val mx14TemperatureMix: Q = Q(
    "mx14_temperature_mix",
    s"""WITH t AS (SELECT source,
       |    CAST(SUM(CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.BpePattern}')) AS BIGINT)) AS BIGINT) AS tokens
       |  FROM documents GROUP BY source),
       |wts AS (SELECT source, tokens,
       |    CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT) AS wt FROM t),
       |g AS (SELECT CAST(SUM(tokens) AS BIGINT) // 2 AS b,
       |             CAST(SUM(wt) AS BIGINT) AS wsum FROM wts),
       |a AS (SELECT source, tokens, wt, g.b, g.wsum,
       |        CASE WHEN g.wsum = 0 THEN 0 ELSE g.b * wt // g.wsum END AS base,
       |        CASE WHEN g.wsum = 0 THEN 0 ELSE g.b * wt % g.wsum END AS rem
       |      FROM wts, g),
       |r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rr,
       |        CAST(SUM(base) OVER () AS BIGINT) AS base_sum
       |      FROM a)
       |SELECT source, tokens, wt AS weight,
       |  CAST(base + CASE WHEN rr <= b - base_sum THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens,
       |  CASE WHEN b = 0 THEN NULL
       |       ELSE CAST((base + CASE WHEN rr <= b - base_sum THEN 1 ELSE 0 END) * 10000 // b AS BIGINT)
       |  END AS share_bp,
       |  CASE WHEN tokens = 0 THEN NULL
       |       ELSE CAST((base + CASE WHEN rr <= b - base_sum THEN 1 ELSE 0 END) * 10000 // tokens AS BIGINT)
       |  END AS epochs_bp
       |FROM r ORDER BY source""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    import graft.operators.TextAnalysis
    val t = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(TextAnalysis.bpeTokenCount(col("text")).cast(LongType)).as("tokens"))
    val wts = t.withColumn("wt",
      floor(sqrt(col("tokens").cast("double"))).cast(LongType))
    val g = wts.agg(expr("sum(tokens) div 2").as("b"), sum(col("wt")).as("wsum"))
    val a = wts.crossJoin(broadcast(g))
      .withColumn("base",
        when(col("wsum") === 0, 0L).otherwise(expr("b * wt div wsum")))
      .withColumn("rem",
        when(col("wsum") === 0, 0L).otherwise(expr("b * wt % wsum")))
    // un-partitioned windows over #sources rows — the mx13 precedent
    val r = a
      .withColumn("rr", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))).cast(LongType))
      .withColumn("base_sum", sum(col("base")).over(
        Window.orderBy(lit(1)).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    r.withColumn("alloc_tokens",
        col("base") + when(col("rr") <= col("b") - col("base_sum"), 1L).otherwise(0L))
      .select(col("source"), col("tokens"), col("wt").as("weight"),
        col("alloc_tokens"),
        when(col("b") === 0, lit(null).cast(LongType))
          .otherwise(expr("alloc_tokens * 10000 div b")).as("share_bp"),
        when(col("tokens") === 0, lit(null).cast(LongType))
          .otherwise(expr("alloc_tokens * 10000 div tokens")).as("epochs_bp"))
      .orderBy(col("source"))
  }

  /** Interval-union coverage: each event opens a 5-minute activity interval
    * [ts, ts+300s); overlapping/touching intervals per user merge (the
    * classic sweep: a new island starts when this interval's start exceeds
    * the running max end of everything before it), and the output is each
    * user's merged-interval count and total covered microseconds — the
    * "actual active time" metric that naive per-event sums overcount.
    * Two windows per user (running max-end, then island id), same
    * single sort-shuffle shape as sessionize; all arithmetic in epoch-µs
    * integers so the result is bit-exact.
    */
  val qIntervalUnion: Q = Q(
    "q_interval_union",
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e,
      |         event_id
      |  FROM events),
      |m AS (SELECT user_id, s, e, event_id,
      |        MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
      |      FROM iv),
      |isl AS (SELECT user_id, s, e,
      |          SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END)
      |            OVER (PARTITION BY user_id ORDER BY s, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |        FROM m),
      |g AS (SELECT user_id, island, MIN(s) AS st, MAX(e) AS en
      |      FROM isl GROUP BY user_id, island)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
      |  CAST(SUM(en - st) AS BIGINT) AS covered_us
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    graft.operators.Temporal.intervalUnion(
        Tables.events(spark, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("s"), col("event_id")),
        Seq("user_id"), "s", "event_id", durationUs = 300000000L)
      .orderBy(col("user_id"))
  }

  /** CDC log compaction: the LATEST event per key by (event time, id) —
    * the upsert-materialization read of a change stream (c8/c9 cover
    * keep-FIRST; compaction wants keep-last). One rank window per key,
    * same single sort-shuffle shape as sessionize.
    */
  val qCdcCompact: Q = Q(
    "q_cdc_compact",
    """SELECT user_id, event_id, epoch_us(ts) AS t, event_type, value FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"),
        col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** Exact percentile bands per segment WITHOUT percentile builtins: the
    * [[qMedianPrice]] rank-selection technique generalized — one rank
    * window per segment, then each requested quantile q picks the row at
    * `floor(q·(n−1)) + 1` (lower nearest-rank: a stored row value, no
    * interpolation arithmetic to diverge between engines). All three bands
    * come from the SAME window pass — at scale this is one sort-shuffle
    * per key regardless of how many quantiles are requested, where
    * engine-native `percentile(q1..q3)` would hold per-group digests.
    */
  val qPercentileBands: Q = Q(
    "q_percentile_bands",
    """WITH r AS (
      |  SELECT c_mktsegment, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey) AS rn,
      |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS cnt
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |SELECT c_mktsegment,
      |  MIN(CASE WHEN rn = CAST(FLOOR(0.1 * (cnt - 1)) AS BIGINT) + 1 THEN o_totalprice END) AS p10,
      |  MIN(CASE WHEN rn = CAST(FLOOR(0.5 * (cnt - 1)) AS BIGINT) + 1 THEN o_totalprice END) AS p50,
      |  MIN(CASE WHEN rn = CAST(FLOOR(0.9 * (cnt - 1)) AS BIGINT) + 1 THEN o_totalprice END) AS p90,
      |  CAST(MIN(cnt) AS BIGINT) AS n_orders
      |FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val w = Window.partitionBy(col("c_mktsegment"))
    val r = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(
        w.orderBy(col("o_totalprice"), col("o_orderkey"))))
      .withColumn("cnt", count(lit(1)).over(w))
    def band(q: Double, name: String) =
      min(when(col("rn") ===
        floor(lit(q) * (col("cnt") - 1)).cast(LongType) + 1L,
        col("o_totalprice"))).as(name)
    r.groupBy(col("c_mktsegment"))
      .agg(band(0.1, "p10"), band(0.5, "p50"), band(0.9, "p90"),
        min(col("cnt")).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** Data-quality expectation report — the Great-Expectations-style rule
    * sweep a pipeline runs before publishing a dataset: row-local rules
    * (nulls, ranges, vocabulary) evaluated as conditional sums in ONE scan
    * per table, referential rules as broadcast anti-join counts, and one
    * cross-table consistency rule (lineitem shipped before its order
    * date). Every violation count is an exact integer; the report is a
    * union of 1-row aggregates — at 100 TB each rule family stays one
    * scan-agg or one broadcast anti-join, never a second full pass per
    * rule.
    */
  val qDqReport: Q = Q(
    "q_dq_report",
    """SELECT * FROM (
      |  SELECT 'orders' AS table_name, 'nonpositive_price' AS rule,
      |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders
      |  UNION ALL
      |  SELECT 'orders', 'null_orderdate',
      |    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'orders', 'fk_customer',
      |    CAST((SELECT COUNT(*) FROM orders o
      |          WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'lineitem', 'quantity_range',
      |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem', 'fk_orders',
      |    CAST((SELECT COUNT(*) FROM lineitem l
      |          WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem', 'ship_before_order',
      |    CAST((SELECT COUNT(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |          WHERE CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE)) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'events', 'unknown_event_type',
      |    CAST(SUM(CASE WHEN event_type NOT IN ('click','error','purchase','signup','view')
      |                  THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT) FROM events
      |) ORDER BY table_name, rule""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.DataFrame
    def local(df: DataFrame, table: String, rule: String, viol: org.apache.spark.sql.Column): DataFrame =
      df.agg(sum(when(viol, 1L).otherwise(0L)).as("n_violations"),
          count(lit(1)).as("n_rows"))
        .select(lit(table).as("table_name"), lit(rule).as("rule"),
          col("n_violations"), col("n_rows"))
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val orphanOrders = orders.join(
        broadcast(Tables.customer(spark, dir).select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(orders.agg(count(lit(1)).as("n_rows"))))
      .select(lit("orders").as("table_name"), lit("fk_customer").as("rule"),
        col("n_violations"), col("n_rows"))
    val orphanLines = lineitem.join(
        orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(lineitem.agg(count(lit(1)).as("n_rows"))))
      .select(lit("lineitem").as("table_name"), lit("fk_orders").as("rule"),
        col("n_violations"), col("n_rows"))
    val shipBefore = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .agg(sum(when(to_date(col("l_shipdate")) < to_date(col("o_orderdate")), 1L)
        .otherwise(0L)).as("n_violations"))
      .crossJoin(broadcast(lineitem.agg(count(lit(1)).as("n_rows"))))
      .select(lit("lineitem").as("table_name"), lit("ship_before_order").as("rule"),
        col("n_violations"), col("n_rows"))
    local(orders, "orders", "nonpositive_price", col("o_totalprice") <= 0)
      .union(local(orders, "orders", "null_orderdate", col("o_orderdate").isNull))
      .union(orphanOrders)
      .union(local(lineitem, "lineitem", "quantity_range",
        col("l_quantity") < 1 || col("l_quantity") > 50))
      .union(orphanLines)
      .union(shipBefore)
      .union(local(Tables.events(spark, dir), "events", "unknown_event_type",
        !col("event_type").isin("click", "error", "purchase", "signup", "view")))
      .orderBy(col("table_name"), col("rule"))
  }

  /** The skew-mitigation salted join under the oracle gate: orders⋈customer
    * through [[graft.operators.Skew.saltedJoin]] (8 salt buckets — big side
    * salted by row hash, small side exploded ×8, join key extended with the
    * salt) must aggregate to EXACTLY the plain join's result. Salting is
    * the manual fix when one key dominates a shuffle (AQE skew-join splits
    * oversized partitions post-hoc; salting prevents them up front and
    * also works for aggregations). The small side stays broadcastable
    * after the ×8 explode, so the salted plan here is still shuffle-free
    * on the big side.
    */
  val qSaltedJoin: Q = Q(
    "q_salted_join",
    """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types._
    val orders = Tables.orders(spark, dir).withColumnRenamed("o_custkey", "c_custkey")
    graft.operators.Skew.saltedJoin(
        orders, Tables.customer(spark, dir), Seq("c_custkey"), buckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  /** The scalar string/math function library over `part` — the everyday
    * SELECT-clause surface (SURVEY §2.8 lists it as absent from the
    * reference). Every function here is exact-valued cross-engine: string
    * ops are byte-deterministic, integer mod/greatest/least/sign are
    * integers, floor/ceil of a correctly-rounded division are exact, and
    * 2^k for small k is an exact double. Pure narrow map — no shuffle but
    * the final presentation sort.
    */
  val qScalarFns: Q = Q(
    "q_scalar_fns",
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_u, lower(p_type) AS type_l,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  substr(p_name, 1, 5) AS name5,
      |  replace(p_type, ' ', '_') AS type_us,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  split_part(p_type, ' ', 1) AS type_head,
      |  CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos,
      |  reverse(p_brand) AS brand_rev,
      |  CAST(p_size % 7 AS BIGINT) AS size_mod7,
      |  CAST(FLOOR(p_retailprice / 100.0) AS DOUBLE) AS price_c_floor,
      |  CAST(CEIL(p_retailprice / 100.0) AS DOUBLE) AS price_c_ceil,
      |  CAST(SIGN(p_size - 25) AS BIGINT) AS size_sign,
      |  CAST(GREATEST(p_size, 25) AS BIGINT) AS size_hi,
      |  CAST(LEAST(p_size, 25) AS BIGINT) AS size_lo,
      |  CAST(POWER(2, p_size % 10) AS DOUBLE) AS pow2
      |FROM part ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types._
    Tables.part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"), lower(col("p_type")).as("type_l"),
      length(col("p_name")).cast(LongType).as("name_len"),
      substring(col("p_name"), 1, 5).as("name5"),
      regexp_replace(col("p_type"), lit(" "), lit("_")).as("type_us"),
      lpad(col("p_size").cast(StringType), 4, "0").as("size_pad"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      element_at(split(col("p_type"), " "), 1).as("type_head"),
      instr(col("p_name"), "a").cast(LongType).as("a_pos"),
      reverse(col("p_brand")).as("brand_rev"),
      (col("p_size") % 7).cast(LongType).as("size_mod7"),
      floor(col("p_retailprice") / 100.0).cast(DoubleType).as("price_c_floor"),
      ceil(col("p_retailprice") / 100.0).cast(DoubleType).as("price_c_ceil"),
      signum(col("p_size") - 25).cast(LongType).as("size_sign"),
      greatest(col("p_size"), lit(25)).cast(LongType).as("size_hi"),
      least(col("p_size"), lit(25)).cast(LongType).as("size_lo"),
      pow(lit(2), col("p_size") % 10).cast(DoubleType).as("pow2"))
      .orderBy(col("p_partkey"))
  }

  /** Z-order vs linear data layout, measured: cut orders into 64
    * equal-count "files" once in Morton-code order of (custkey, order-day)
    * and once in arrival (orderkey) order, and report each file's min/max
    * span on BOTH dimensions — the statistics a parquet reader prunes by.
    * Z-curve files carry tight spans on both columns (multi-dimensional
    * skipping); linear files bound only their sort key. Each dimension is
    * min-max normalized to the full 16-bit range BEFORE interleaving —
    * without this a wide dimension's high bits dominate the curve and the
    * narrow dimension degrades to linear (Delta's OPTIMIZE ZORDER
    * interleaves per-column range-bucket ranks for the same reason; the
    * min/max pair here is one broadcast scalar agg). The global rank uses
    * the [[graft.operators.PrefixSum]] two-narrow-pass scan, NOT an
    * un-partitioned `ROW_NUMBER` window — at 100 TB this ranking IS the
    * write-side clustering pass (`repartitionByRange(z)` + sorted write),
    * so the demo query and the production layout job share one plan shape.
    * All math is integer (normalize, Morton spread, `div` cut) — bit-exact.
    */
  val qZorderLayout: Q = Q(
    "q_zorder_layout",
    """WITH raw AS (
      |  SELECT o_orderkey, o_custkey AS c0,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS d0
      |  FROM orders),
      |mm AS (SELECT MIN(c0) AS cmin, MAX(c0) AS cmax, MIN(d0) AS dmin, MAX(d0) AS dmax FROM raw),
      |base AS (
      |  SELECT o_orderkey, c0 AS c, d0 AS d,
      |    ((c0 - cmin) * 65535) // (cmax - cmin) AS cn,
      |    ((d0 - dmin) * 65535) // (dmax - dmin) AS dn
      |  FROM raw, mm),
      |s1 AS (SELECT *, (cn | (cn << 8)) & 16711935 AS cx1, (dn | (dn << 8)) & 16711935 AS dx1 FROM base),
      |s2 AS (SELECT *, (cx1 | (cx1 << 4)) & 252645135 AS cx2, (dx1 | (dx1 << 4)) & 252645135 AS dx2 FROM s1),
      |s3 AS (SELECT *, (cx2 | (cx2 << 2)) & 858993459 AS cx3, (dx2 | (dx2 << 2)) & 858993459 AS dx3 FROM s2),
      |s4 AS (SELECT *, (cx3 | (cx3 << 1)) & 1431655765 AS cx4, (dx3 | (dx3 << 1)) & 1431655765 AS dx4 FROM s3),
      |z AS (SELECT o_orderkey, c, d, cx4 | (dx4 << 1) AS z FROM s4),
      |ranked AS (
      |  SELECT 'zorder' AS layout, c, d,
      |    ROW_NUMBER() OVER (ORDER BY z, o_orderkey) - 1 AS rk,
      |    COUNT(*) OVER () AS n
      |  FROM z
      |  UNION ALL
      |  SELECT 'linear' AS layout, c, d,
      |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rk,
      |    COUNT(*) OVER () AS n
      |  FROM z)
      |SELECT layout, (rk * 64) // n AS file_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(c) AS c_lo, MAX(c) AS c_hi, MIN(d) AS d_lo, MAX(d) AS d_hi
      |FROM ranked GROUP BY layout, file_id
      |ORDER BY layout, file_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{Layout, PrefixSum}
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.LongType
    val raw = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("c"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .cast(LongType).as("d"))
    val mm = raw.agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"),
      min(col("d")).as("dmin"), max(col("d")).as("dmax"))
    // base feeds BOTH layout rankings (each a PrefixSum with its own
    // key-bounds pass) — root it on a localCheckpoint so the parquet scan
    // + Morton kernel run once, not once per consumer (the tx13 treatment)
    val base = raw.crossJoin(broadcast(mm))
      .withColumn("cn", expr("((c - cmin) * 65535) div (cmax - cmin)"))
      .withColumn("dn", expr("((d - dmin) * 65535) div (dmax - dmin)"))
      .withColumn("z", Layout.morton16(col("cn"), col("dn")))
      .select("o_orderkey", "c", "d", "z")
      .localCheckpoint(true)
    // z < 2^32 and orderkey < 2^31, so (z << 31) | orderkey is a UNIQUE
    // long that sorts exactly by (z, o_orderkey) — PrefixSum's order key.
    // n comes out of each ranking's pass-1 partition totals as a literal
    // (the q_pareto treatment) — no separate count-aggregate job per layout.
    def files(keyCol: org.apache.spark.sql.Column, label: String): DataFrame = {
      val (rk, n) = PrefixSum.withStartOffsetAndTotal(
        base.withColumn("k", keyCol).withColumn("one", lit(1L)),
        "k", "one", "rk")
      rk.select(lit(label).as("layout"),
          expr(s"(rk * 64) div ${n}L").as("file_id"), col("c"), col("d"))
    }
    files(shiftleft(col("z"), 31).bitwiseOR(col("o_orderkey")), "zorder")
      .union(files(col("o_orderkey"), "linear"))
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("c")).as("c_lo"), max(col("c")).as("c_hi"),
        min(col("d")).as("d_lo"), max(col("d")).as("d_hi"))
      .orderBy(col("layout"), col("file_id"))
  }

  /** Join-key skew diagnostic over `lineitem.l_suppkey` — the pre-join
    * report that decides whether a key needs salting / AQE skew handling
    * before a 100 TB shuffle: the top-20 heaviest keys with their row
    * counts, share and cumulative share of the table (basis points), and
    * skew factor vs the mean key (×1000). All ratios are integer
    * (`div`-floored against broadcast 1-row totals) so the report is
    * bit-exact. Plan shape: one group-by on the key, a 1-row total
    * aggregate broadcast back, and the top-20 selected by
    * `orderBy(...).limit(20)` — which Spark plans as
    * TakeOrderedAndProject (per-partition heaps + driver merge of 20×P
    * rows), NOT a global sort; the rank/cumulative window then runs over
    * 20 rows only. The same plan at 10¹⁰ distinct keys moves 20 rows per
    * partition, nothing else.
    */
  val qSkewReport: Q = Q(
    "q_skew_report",
    """WITH k AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
      |           FROM lineitem GROUP BY l_suppkey),
      |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
      |             CAST(COUNT(*) AS BIGINT) AS nk FROM k),
      |top AS (SELECT l_suppkey, cnt FROM k
      |        ORDER BY cnt DESC, l_suppkey LIMIT 20),
      |r AS (SELECT l_suppkey, cnt,
      |        ROW_NUMBER() OVER (ORDER BY cnt DESC, l_suppkey) AS rn,
      |        CAST(SUM(cnt) OVER (ORDER BY cnt DESC, l_suppkey
      |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |      FROM top)
      |SELECT rn, l_suppkey, cnt,
      |  cnt * 10000 // total AS share_bp,
      |  cum * 10000 // total AS cum_share_bp,
      |  cnt * nk * 1000 // total AS skew_x1000
      |FROM r, t ORDER BY rn""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val k = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
    val t = k.agg(sum(col("cnt")).as("total"), count(lit(1)).as("nk"))
    val w = Window.orderBy(col("cnt").desc, col("l_suppkey"))
    // limit(20) first: the window below sees 20 rows, never the key table
    k.orderBy(col("cnt").desc, col("l_suppkey")).limit(20)
      .withColumn("rn",
        row_number().over(w).cast(org.apache.spark.sql.types.LongType))
      .withColumn("cum", sum(col("cnt"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(t))
      .select(col("rn"), col("l_suppkey"), col("cnt"),
        expr("cnt * 10000 div total").as("share_bp"),
        expr("cum * 10000 div total").as("cum_share_bp"),
        expr("cnt * nk * 1000 div total").as("skew_x1000"))
      .orderBy(col("rn"))
  }

  /** Weighted median extendedprice per return flag (weight = quantity) —
    * the grouped weighted-quantile primitive (median transaction value
    * weighted by units, the robust mid-price a pricing pipeline reports).
    * Exact by construction: prices reduce to per-(flag, price) integer
    * weight sums FIRST (bounded key space — the 100 TB move; the window
    * then runs over distinct prices, not raw rows), the cumulative weight
    * is an integer window sum, and the median is the first price whose
    * doubled cumulative weight reaches the group total — a rank selection,
    * no interpolation, same discipline as q_median_price.
    */
  val qWeightedMedian: Q = Q(
    "q_weighted_median",
    """WITH pw AS (SELECT l_returnflag AS flag,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (SELECT flag, price, w,
      |    SUM(w) OVER (PARTITION BY flag ORDER BY price
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |    SUM(w) OVER (PARTITION BY flag) AS totw
      |  FROM pw)
      |SELECT flag, CAST(MIN(totw) AS BIGINT) AS total_weight,
      |  CAST(MIN(price) AS DOUBLE) AS wmedian_price
      |FROM c WHERE 2 * cumw >= totw
      |GROUP BY flag ORDER BY flag""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val pw = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("price"))
      .agg(sum(col("l_quantity").cast(LongType)).as("w"))
    val wg = Window.partitionBy(col("flag"))
    val c = pw
      .withColumn("cumw", sum(col("w")).over(
        wg.orderBy(col("price")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("totw", sum(col("w")).over(wg))
    c.filter(col("cumw") * 2 >= col("totw"))
      .groupBy(col("flag"))
      .agg(min(col("totw")).as("total_weight"),
        min(col("price")).cast(DoubleType).as("wmedian_price"))
      .orderBy(col("flag"))
  }

  /** Deterministic sharded epoch shuffle — the data-order reproducibility
    * primitive of a pretraining run: for each epoch, every document gets a
    * shard (salted-hash mod nShards) and a position within that shard
    * (rank by a second salted hash), so the read order is (a) pseudorandom
    * per epoch, (b) bit-reproducible across runs/engines, and (c) assigned
    * with windows keyed by (epoch, shard) — Θ(nShards) parallel partitions
    * per epoch, never a global single-task sort (shard-local order is what
    * a distributed data loader consumes anyway).
    */
  val mx15EpochShuffle: Q = Q(
    "mx15_epoch_shuffle",
    """WITH e AS (SELECT d.doc_id, t.epoch FROM documents d
      |           CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) t(epoch)),
      |h AS (SELECT epoch, doc_id,
      |    CAST(concat('0x', substr(md5(concat('ep', CAST(epoch AS VARCHAR), ':',
      |      CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 8 AS shard,
      |    md5(concat('pos', CAST(epoch AS VARCHAR), ':', CAST(doc_id AS VARCHAR))) AS hk
      |  FROM e)
      |SELECT epoch, shard, doc_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY hk, doc_id) AS BIGINT) AS shard_pos
      |FROM h ORDER BY epoch, shard, shard_pos""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val e = Tables.documents(spark, dir).select(col("doc_id"))
      .withColumn("epoch", explode(array(lit(0L), lit(1L))))
    val epochStr = col("epoch").cast(StringType)
    val idStr = col("doc_id").cast(StringType)
    val h = e
      .withColumn("shard",
        conv(substring(md5(concat(lit("ep"), epochStr, lit(":"), idStr)), 1, 8), 16, 10)
          .cast(LongType) % 8)
      .withColumn("hk", md5(concat(lit("pos"), epochStr, lit(":"), idStr)))
    h.withColumn("shard_pos",
        row_number().over(Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("hk"), col("doc_id"))).cast(LongType))
      .select(col("epoch"), col("shard"), col("doc_id"), col("shard_pos"))
      .orderBy(col("epoch"), col("shard"), col("shard_pos"))
  }

  /** Hilbert-curve vs linear data layout ([[graft.operators.Layout.hilbert8]])
    * — the qZorderLayout report run on the better curve: 64 equal-count
    * "files" cut in Hilbert order of (custkey, order-day), each file's
    * min/max span on BOTH dimensions. Hilbert's consecutive-index grid
    * adjacency (no Z-jumps) yields tighter spans than Morton at the same
    * file count — comparable row-for-row against q_zorder_layout's output.
    * Same ranking machinery: [[graft.operators.PrefixSum]] two-pass scan
    * with the total from pass-1 (no count job), 8-bit normalized dims, all
    * integer arithmetic; the oracle states the identical 8 rotation steps
    * as chained CTEs.
    */
  val qHilbertLayout: Q = {
    val steps = Seq(128, 64, 32, 16, 8, 4, 2, 1)
    val stepCtes = steps.zipWithIndex.map { case (s, i) =>
      val (px, py) = (s"x$i", s"y$i")
      val pa = if (i == 0) "CAST(0 AS BIGINT)" else s"acc$i"
      val prev = if (i == 0) "base" else s"h$i"
      val j = i + 1
      s"""h$j AS (SELECT o_orderkey, c, d,
         |  CASE WHEN ($py & $s) > 0 THEN $px
         |       WHEN ($px & $s) > 0 THEN ${s - 1} - $py ELSE $py END AS x$j,
         |  CASE WHEN ($py & $s) > 0 THEN $py
         |       WHEN ($px & $s) > 0 THEN ${s - 1} - $px ELSE $px END AS y$j,
         |  $pa + ${s * s} * xor(3 * (CASE WHEN ($px & $s) > 0 THEN 1 ELSE 0 END),
         |                       (CASE WHEN ($py & $s) > 0 THEN 1 ELSE 0 END)) AS acc$j
         |FROM $prev)""".stripMargin
    }.mkString(",\n")
    Q(
      "q_hilbert_layout",
      s"""WITH raw AS (
         |  SELECT o_orderkey, o_custkey AS c0,
         |    CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS d0
         |  FROM orders),
         |mm AS (SELECT MIN(c0) AS cmin, MAX(c0) AS cmax, MIN(d0) AS dmin, MAX(d0) AS dmax FROM raw),
         |base AS (
         |  SELECT o_orderkey, c0 AS c, d0 AS d,
         |    ((c0 - cmin) * 255) // (cmax - cmin) AS x0,
         |    ((d0 - dmin) * 255) // (dmax - dmin) AS y0
         |  FROM raw, mm),
         |$stepCtes,
         |ranked AS (
         |  SELECT 'hilbert' AS layout, c, d,
         |    ROW_NUMBER() OVER (ORDER BY acc8, o_orderkey) - 1 AS rk,
         |    COUNT(*) OVER () AS n
         |  FROM h8
         |  UNION ALL
         |  SELECT 'linear' AS layout, c, d,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rk,
         |    COUNT(*) OVER () AS n
         |  FROM h8)
         |SELECT layout, (rk * 64) // n AS file_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  MIN(c) AS c_lo, MAX(c) AS c_hi, MIN(d) AS d_lo, MAX(d) AS d_hi
         |FROM ranked GROUP BY layout, file_id
         |ORDER BY layout, file_id""".stripMargin) { (spark, dir) =>
      import graft.operators.{Layout, PrefixSum}
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.types.LongType
      val raw = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey").as("c"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast(LongType).as("d"))
      val mm = raw.agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"),
        min(col("d")).as("dmin"), max(col("d")).as("dmax"))
      val base = Layout.hilbert8(
          raw.crossJoin(broadcast(mm))
            .withColumn("cn", expr("((c - cmin) * 255) div (cmax - cmin)"))
            .withColumn("dn", expr("((d - dmin) * 255) div (dmax - dmin)")),
          "cn", "dn", "h")
        .select(col("o_orderkey"), col("c"), col("d"), col("h"))
        .localCheckpoint(true)
      // h < 2^16 and orderkey < 2^31 → (h << 31) | orderkey sorts exactly
      // by (h, o_orderkey); n rides out of pass 1 as a literal.
      def files(keyCol: org.apache.spark.sql.Column, label: String): DataFrame = {
        val (rk, n) = PrefixSum.withStartOffsetAndTotal(
          base.withColumn("k", keyCol).withColumn("one", lit(1L)),
          "k", "one", "rk")
        rk.select(lit(label).as("layout"),
          expr(s"(rk * 64) div ${n}L").as("file_id"), col("c"), col("d"))
      }
      files(shiftleft(col("h"), 31).bitwiseOR(col("o_orderkey")), "hilbert")
        .union(files(col("o_orderkey"), "linear"))
        .groupBy(col("layout"), col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("c")).as("c_lo"), max(col("c")).as("c_hi"),
          min(col("d")).as("d_lo"), max(col("d")).as("d_hi"))
        .orderBy(col("layout"), col("file_id"))
    }
  }

  /** Curriculum ordering — the data-ordering policy of staged pretraining:
    * documents grouped into quality stages (easy/high-quality first), each
    * stage internally shuffled by a deterministic hash so no source/length
    * run survives, and every doc assigned its serving position WITHIN its
    * stage. Positions come from ONE multi-column [[graft.operators.PrefixSum]]
    * kernel (per-stage indicator columns share the single range shuffle —
    * the ECDF trick), NOT a ROW_NUMBER window partitioned by 3 stage keys,
    * which would funnel a third of the corpus through each of 3 tasks.
    * Stage cutoffs are fixed basis-point thresholds on the tx3 quality
    * score (a config knob, like mx4's keep fraction); the 28-bit md5 hash
    * × 2³¹ + doc_id key is integral and unique, so the kernel takes the
    * exact equal-width path.
    */
  val mx16Curriculum: Q = Q(
    "mx16_curriculum",
    """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS nt,
      |    length(text) AS nc,
      |    len(list_filter(string_split(lower(text), ' '),
      |        t -> t IN ('the','a','of','and','is'))) AS so
      |  FROM documents),
      |q AS (SELECT doc_id, CAST(FLOOR(
      |    (0.5 * (LEAST(nt, 100) / 100.0)
      |     + 0.3 * (so / nt)
      |     + 0.2 * (LEAST((nc - (nt - 1)) / nt, 10.0) / 10.0)) * 10000) AS BIGINT) AS qbp
      |  FROM t),
      |s AS (SELECT doc_id,
      |    CASE WHEN qbp >= 4500 THEN 0 WHEN qbp >= 3000 THEN 1 ELSE 2 END AS stage,
      |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) AS h
      |  FROM q)
      |SELECT doc_id, CAST(stage AS BIGINT) AS stage,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY stage ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
      |FROM s ORDER BY stage, pos""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.{LongType, StringType}
    import graft.operators.{PrefixSum, TextAnalysis}
    val staged = Tables.documents(spark, dir)
      .select(col("doc_id"),
        floor(TextAnalysis.qualityScore(col("text")) * 10000).cast(LongType).as("qbp"))
      .withColumn("stage",
        when(col("qbp") >= 4500, 0L).when(col("qbp") >= 3000, 1L).otherwise(2L))
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast(StringType)), 1, 7), 16, 10).cast(LongType))
      .withColumn("k", expr("h * 2147483648L + doc_id"))
      .withColumn("s0", when(col("stage") === 0, 1L).otherwise(0L))
      .withColumn("s1", when(col("stage") === 1, 1L).otherwise(0L))
      .withColumn("s2", when(col("stage") === 2, 1L).otherwise(0L))
    PrefixSum.withStartOffsets(staged, "k",
        Seq("s0" -> "p0", "s1" -> "p1", "s2" -> "p2"))
      .select(col("doc_id"), col("stage"),
        when(col("stage") === 0, col("p0"))
          .when(col("stage") === 1, col("p1"))
          .otherwise(col("p2")).as("pos"))
      .orderBy(col("stage"), col("pos"))
  }

  /** Join-size estimation by key-hash synopsis — the pre-join planning
    * check that decides broadcast vs shuffle vs "don't run that": the
    * self-join cardinality of `lineitem` on `l_partkey` is Σₖ cₖ², and the
    * estimator keeps only keys whose 32-bit md5 hash falls under 2³²/16
    * (a CORRELATED 1-in-16 key sample: sampling keys, not rows, keeps
    * every pair of a kept key, so the estimate is ×16, not ×256), next to
    * the exact value and the realized error in basis points. One groupBy
    * + one tiny aggregate — the synopsis costs what a key-count costs, at
    * any corpus size; pair counts run in decimal(38,0) (Σcₖ² is n²-scale
    * under skew).
    */
  val qJoinEstimate: Q = Q(
    "q_join_estimate",
    """WITH c AS (SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
      |           FROM lineitem GROUP BY 1),
      |h AS (SELECT k, cnt,
      |    CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
      |  FROM c),
      |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |    CAST(SUM(CASE WHEN hv < 268435456 THEN 1 ELSE 0 END) AS BIGINT) AS sampled_keys,
      |    SUM(CAST(cnt AS HUGEINT) * cnt) AS exact_pairs,
      |    SUM(CASE WHEN hv < 268435456 THEN CAST(cnt AS HUGEINT) * cnt ELSE 0 END) AS samp
      |  FROM h)
      |SELECT n_keys, sampled_keys,
      |  CAST(exact_pairs AS BIGINT) AS exact_pairs,
      |  CAST(samp * 16 AS BIGINT) AS est_pairs,
      |  CAST(abs(samp * 16 - exact_pairs) * 10000 // exact_pairs AS BIGINT) AS err_bp
      |FROM a""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.{DecimalType, LongType, StringType}
    val D = DecimalType(38, 0)
    val c = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("cnt"))
      .withColumn("hv",
        conv(substring(md5(col("k").cast(StringType)), 1, 8), 16, 10).cast(LongType))
    c.agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("hv") < 268435456L, 1L).otherwise(0L)).as("sampled_keys"),
        sum(col("cnt").cast(D) * col("cnt")).cast(D).as("exact_pairs"),
        sum(when(col("hv") < 268435456L, col("cnt").cast(D) * col("cnt"))
          .otherwise(lit(0L).cast(D))).as("samp"))
      .select(col("n_keys"), col("sampled_keys"),
        // long report projection over decimal internals (the Eval.rankAuc
        // discipline): int64 is the one integer dtype both gate lanes keep
        col("exact_pairs").cast(LongType).as("exact_pairs"),
        (col("samp") * 16).cast(LongType).as("est_pairs"),
        expr("abs(samp * 16 - exact_pairs) * 10000 div exact_pairs")
          .cast(LongType).as("err_bp"))
  }

  /** The composed curation DAG as ONE gated query — the end-to-end shape a
    * training-data pipeline actually runs, each stage an operator this
    * library already gates in isolation:
    *
    *   quality filter (three of tx16's C4 rules — length band, stopword
    *   evidence, mean-word-length band; the distinct-fraction rule is
    *   dropped so the synthetic corpus keeps a meaningful survivor set) →
    *   exact dedup keep-first
    *   ([[graft.operators.Dedup.dropExactDuplicates]], dd1's semantics) →
    *   per-source quota (first 10 surviving docs per source — mx2's
    *   shape) → best-fit-decreasing sequence packing at a 256-token budget
    *   ([[graft.operators.Packing.packSequences]], mx8's kernel).
    *
    * The oracle chains the same four stages as CTEs ending in mx8's
    * packing replay over the SURVIVOR set. Emits the packed survivors
    * (doc_id, source, n_tokens, bin_id) — compositions must stay
    * bit-exact end-to-end, not just per stage. Scale: filter/dedup/quota
    * are one projection + two keyed windows; packing is the bounded
    * per-split BFD (the only stage with a size cap, already smoke-tested
    * at 2M rows).
    */
  val mx17CurationPipeline: Q = Q(
    "mx17_curation_pipeline",
    s"""WITH w AS (
      |  SELECT doc_id, source, text, n_chars, string_split(text, ' ') AS ws
      |  FROM documents),
      |kept AS (SELECT doc_id, source, text FROM w
      |  WHERE (len(ws) BETWEEN 30 AND 5000)
      |    AND len(list_distinct(list_filter(ws,
      |      t -> t IN ('the','a','of','and','is')))) >= 2
      |    AND ((n_chars - (len(ws) - 1)) * 2 BETWEEN 9 * len(ws) AND 16 * len(ws))),
      |dd AS (SELECT doc_id, source, text FROM (
      |  SELECT doc_id, source, text,
      |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM kept) WHERE rn = 1),
      |quota AS (SELECT doc_id, source, text FROM (
      |  SELECT doc_id, source, text,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM dd) WHERE rn <= 10),
      |docs AS (
      |  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
      |         row_number() OVER (ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS rn
      |  FROM quota),
      |${bfdFoldSql(256L)}
      |SELECT d.doc_id, d.source, d.nt AS n_tokens, p.bin_id
      |FROM docs d JOIN pbin p ON p.rn = d.rn ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Dedup, Packing, TextAnalysis}
    val ws = split(col("text"), " ")
    val nw = size(ws)
    val halfMean = (col("n_chars") - (nw - 1)) * 2
    val kept = Tables.documents(spark, dir)
      .filter(nw.between(30, 5000) &&
        size(array_distinct(filter(ws,
          t => t.isin("the", "a", "of", "and", "is")))) >= 2 &&
        halfMean >= nw * 9 && halfMean <= nw * 16)
      .select(col("doc_id"), col("source"), col("text"))
    val dd = Dedup.dropExactDuplicates(kept, "doc_id", "text")
    val quota = dd
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .filter(col("__rn") <= 10)
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    Packing.packSequences(quota, "doc_id", "n_tokens", budget = 256L, numPartitions = 1)
      .select("doc_id", "source", "n_tokens", "bin_id")
      .orderBy("doc_id")
  }

  /** Multimodal shard packing — the FOURTH composed curation DAG and the
    * interleaved-loader planning step: mm4's per-example effective
    * sequence lengths (caption tokens + modality token cost under the
    * synthetic-meta conventions) feed the mx8 best-fit-decreasing packer
    * at a 4096-token budget (over-budget examples are excluded — they go
    * to mm5's tiling/truncation path instead), and the report is what a
    * shard builder reads: per bin, example count, token fill (exact ppm)
    * and the modality mix. The oracle composes the mm4 length arithmetic
    * into mx8's [[bfdFoldSql]] caps-list BFD replay, then aggregates per
    * bin — every number exact.
    *
    * Scale note (the mx8 contract): numPartitions = 1 replays the exact
    * single-node BFD; production shards by hash first and runs the same
    * packer per shard (documented on [[graft.operators.Packing]]).
    */
  val mx21MultimodalPacking: Q = Q(
    "mx21_multimodal_packing",
    s"""WITH m AS (SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS txt
      |  FROM documents),
      |lens AS (SELECT media_id, modality,
      |    txt + CASE modality
      |      WHEN 'image' THEN
      |        ((112 + nb % 400 + 13) // 14) * ((112 + (nb * 31) % 400 + 13) // 14)
      |      WHEN 'audio' THEN
      |        CASE WHEN 1 + (nb * 997) % 100000 >= 16000
      |             THEN ((1 + (nb * 997) % 100000 - 16000) // 8000 + 1) * 25
      |             ELSE 0 END
      |      ELSE ((1 + nb % 300 + 4) // 5) * 64
      |    END AS len
      |  FROM m),
      |docs AS (SELECT media_id, modality, len AS nt,
      |    row_number() OVER (ORDER BY len DESC, media_id) AS rn
      |  FROM lens WHERE len <= 4096),
      |${bfdFoldSql(4096L)}
      |SELECT p.bin_id, CAST(COUNT(*) AS BIGINT) AS n_examples,
      |  CAST(SUM(d.nt) AS BIGINT) AS tokens_total,
      |  CAST((1000000 * SUM(d.nt)) // 4096 AS BIGINT) AS fill_ppm,
      |  CAST(SUM(CASE WHEN d.modality = 'image' THEN 1 ELSE 0 END) AS BIGINT) AS n_image,
      |  CAST(SUM(CASE WHEN d.modality = 'audio' THEN 1 ELSE 0 END) AS BIGINT) AS n_audio,
      |  CAST(SUM(CASE WHEN d.modality = 'video' THEN 1 ELSE 0 END) AS BIGINT) AS n_video
      |FROM docs d JOIN pbin p ON p.rn = d.rn
      |GROUP BY p.bin_id ORDER BY p.bin_id""".stripMargin) { (spark, dir) =>
    import graft.multimodal.Multimodal
    import org.apache.spark.sql.types.LongType
    val m = Multimodal.fromDocuments(Tables.documents(spark, dir), "doc_id", "text")
      .withColumn("nb", length(col("payload")).cast(LongType))
      .withColumn("txt", graft.operators.TextAnalysis
        .tokenCount(decode(col("payload"), "UTF-8")).cast(LongType))
    val modalTokens =
      when(col("modality") === "image",
        expr("((112 + nb % 400 + 13) div 14) * ((112 + (nb * 31) % 400 + 13) div 14)"))
      .when(col("modality") === "audio",
        when(lit(1L) + (col("nb") * 997) % 100000 >= 16000,
          (expr("(1 + (nb * 997) % 100000 - 16000) div 8000") + 1) * 25)
          .otherwise(0L))
      .otherwise(expr("((1 + nb % 300 + 4) div 5) * 64"))
    val lens = m.withColumn("len", col("txt") + modalTokens)
      .filter(col("len") <= 4096)
      .select("media_id", "modality", "len")
    graft.operators.Packing
      .packSequences(lens, "media_id", "len", budget = 4096L, numPartitions = 1)
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_examples"),
        sum(col("len")).as("tokens_total"),
        expr("(1000000 * sum(len)) div 4096").as("fill_ppm"),
        sum(when(col("modality") === "image", 1L).otherwise(0L)).as("n_image"),
        sum(when(col("modality") === "audio", 1L).otherwise(0L)).as("n_audio"),
        sum(when(col("modality") === "video", 1L).otherwise(0L)).as("n_video"))
      .orderBy(col("bin_id"))
  }

  /** Manifest-driven incremental curation
    * ([[graft.operators.Incremental.processDelta]]) — the production
    * re-run shape: sources src0..src9 were processed by a "previous run"
    * (recorded in the shard manifest); this run's DAG — a per-document
    * token-count quality filter — executes over ONLY the remaining
    * shards, and the output unions carried-over prior rows (run_id 1)
    * with the fresh delta (run_id 2). The run_id column makes the
    * delta/carried split itself oracle-checked per row, not just the
    * union's contents. Prior results are reconstructed here (production
    * reads them from storage) so the oracle can replay both runs.
    *
    * Scale: the manifest is shard-count-sized and BROADCAST — delta
    * selection is a map-side anti-join filter on one corpus scan, and
    * `process`'s shuffles are sized by the delta, not the corpus (see
    * the operator scaladoc).
    */
  val mx22IncrementalCuration: Q = Q(
    "mx22_incremental_curation",
    """WITH d AS (SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(substr(source, 4) AS INT) AS src_idx
      |  FROM documents),
      |k AS (SELECT doc_id, source, n_tokens,
      |    CASE WHEN src_idx < 10 THEN 1 ELSE 2 END AS run_id
      |  FROM d WHERE n_tokens >= 30)
      |SELECT doc_id, source, n_tokens, CAST(run_id AS BIGINT) AS run_id
      |FROM k ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.DataFrame
    import graft.operators.{Incremental, TextAnalysis}
    val corpus = Tables.documents(spark, dir)
    val srcIdx = Shared.srcIdx
    val manifest = corpus.filter(srcIdx < 10).select("source").distinct()
    def process(run: Long)(df: DataFrame): DataFrame =
      df.select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .filter(col("n_tokens") >= 30)
        .withColumn("run_id", lit(run))
    // prior results: production reads these back from storage; replayed
    // here over the covered shards so the oracle can reconstruct them
    val prior = process(1L)(
      corpus.join(broadcast(manifest), Seq("source"), "left_semi"))
    val (results, _) =
      Incremental.processDelta(corpus, manifest, "source", prior)(process(2L))
    results.orderBy(col("doc_id"))
  }

  /** Incremental EXACT dedup with fingerprint-store state travel
    * ([[graft.operators.Incremental.dedupDelta]]) — the concrete form of
    * the Incremental scaladoc's global-state caveat: content-hash dedup
    * stays exactly incremental when the fingerprint store rides along
    * with the manifest. The delta (sources src10+) is deduplicated
    * against the prior runs' store (every distinct content hash from
    * src0..src9) AND within itself (first occurrence by doc_id); output
    * is the delta's surviving rows. The oracle replays both rules over
    * the same split. Scale: one fp-keyed window over the DELTA, one
    * anti-join against the (bucketable) store — the corpus is never
    * rescanned for history.
    */
  val mx23IncrementalDedup: Q = Q(
    "mx23_incremental_dedup",
    """WITH d AS (SELECT doc_id, source, md5(text) AS fp,
      |    CAST(substr(source, 4) AS INT) AS si FROM documents),
      |prior AS (SELECT DISTINCT fp FROM d WHERE si < 10),
      |delta AS (SELECT doc_id, source, fp FROM d WHERE si >= 10),
      |r AS (SELECT doc_id, source, fp,
      |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM delta)
      |SELECT doc_id, source FROM r
      |WHERE rn = 1 AND fp NOT IN (SELECT fp FROM prior)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.Incremental
    val corpus = Tables.documents(spark, dir)
    val srcIdx = Shared.srcIdx
    val manifest = corpus.filter(srcIdx < 10).select("source").distinct()
    // prior fingerprint store: in production read back from storage
    val priorFps = corpus.join(broadcast(manifest), Seq("source"), "left_semi")
      .select(md5(col("text")).as("fp")).distinct()
    val (survivors, _) =
      Incremental.dedupDelta(corpus, manifest, "source", priorFps, "doc_id", "text")
    survivors.select(col("doc_id"), col("source")).orderBy(col("doc_id"))
  }

  /** The FIFTH composed curation DAG — the full multimodal pretraining
    * ingest: media quality gate ([[graft.multimodal.Multimodal
    * .withModalityVerdict]], mm6's rules as a row filter) → CLIP-score
    * image–text gate (mm8's sequential-fold cosine at ≥ 0.05) → exact text
    * dedup (first occurrence) → mm4 effective-length budget (≤ 4096) →
    * best-fit-decreasing packing (mx8's kernel). Emits the packed
    * examples (media_id, modality, len, bin_id) so the composition is
    * bit-exact END-TO-END per row; the oracle chains all five stages as
    * CTEs ending in the [[bfdFoldSql]] caps-list BFD replay (the old
    * one-doc-per-recursion form re-evaluated the whole gated pipeline per
    * round — 26 s at sf0.1; the fold runs it once).
    *
    * Scale: gates are codegen'd projections (the clip gate's join is the
    * one equi-join, co-partitionable on the id); dedup is one fp-keyed
    * window; packing inherits the per-shard BFD contract. Corpus touched
    * twice (once through the gates, once to pack).
    */
  val mx24MultimodalCuration: Q = Q(
    "mx24_multimodal_curation",
    s"""WITH d AS (SELECT doc_id, text,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality
      |  FROM documents),
      |meta AS (SELECT *, 112 + nb % 400 AS w, 112 + (nb * 31) % 400 AS h,
      |    1 + (nb * 997) % 100000 AS ns, 1 + nb % 300 AS nf FROM d),
      |q AS (SELECT doc_id, text, nb, modality FROM meta WHERE
      |    CASE modality
      |      WHEN 'image' THEN LEAST(w, h) >= 128 AND w <= h * 3 AND h <= w * 3
      |      WHEN 'audio' THEN ns >= 16000
      |      ELSE nf >= 10 END),
      |c AS (SELECT q.doc_id, q.text, q.nb, q.modality,
      |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v,
      |    list_transform(range(0, 64),
      |      i -> ((q.nb * (2*i + 1) * 7919) % 1000003) / 1000003.0 - 0.5) AS t
      |  FROM q JOIN embeddings e ON e.vec_id = q.doc_id),
      |s AS (SELECT doc_id, text, nb, modality FROM c WHERE
      |    list_sum(list_transform(range(1, 65), i -> v[i]*t[i])) /
      |    (sqrt(list_sum(list_transform(range(1, 65), i -> v[i]*v[i]))) *
      |     sqrt(list_sum(list_transform(range(1, 65), i -> t[i]*t[i])))) >= 0.05),
      |dd AS (SELECT doc_id, text, nb, modality FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM s) WHERE rn = 1),
      |lens AS (SELECT doc_id AS media_id, modality,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) + CASE modality
      |      WHEN 'image' THEN
      |        ((112 + nb % 400 + 13) // 14) * ((112 + (nb * 31) % 400 + 13) // 14)
      |      WHEN 'audio' THEN
      |        CASE WHEN 1 + (nb * 997) % 100000 >= 16000
      |             THEN ((1 + (nb * 997) % 100000 - 16000) // 8000 + 1) * 25
      |             ELSE 0 END
      |      ELSE ((1 + nb % 300 + 4) // 5) * 64
      |    END AS len
      |  FROM dd),
      |docs AS (SELECT media_id, modality, len AS nt,
      |    row_number() OVER (ORDER BY len DESC, media_id) AS rn
      |  FROM lens WHERE len <= 4096),
      |${bfdFoldSql(4096L)}
      |SELECT d.media_id, d.modality, d.nt AS len, p.bin_id
      |FROM docs d JOIN pbin p ON p.rn = d.rn ORDER BY d.media_id""".stripMargin) { (spark, dir) =>
    import graft.multimodal.Multimodal
    import graft.operators.{Dedup, Packing, TextAnalysis}
    import org.apache.spark.sql.types.LongType
    val nb = length(encode(col("text"), "UTF-8")).cast(LongType)
    val m = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), col("text"), nb.as("nb"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"))
      .withColumn("w", lit(112L) + col("nb") % 400)
      .withColumn("h", lit(112L) + (col("nb") * 31) % 400)
      .withColumn("nsamples", lit(1L) + (col("nb") * 997) % 100000)
      .withColumn("nframes", lit(1L) + col("nb") % 300)
    val quality = Multimodal.withModalityVerdict(m)
      .filter(col("verdict") === "keep")
      .select("media_id", "text", "nb", "modality")
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("media_id"), col("embedding"))
    val clipped = Multimodal.imageTextGate(
        quality.join(emb, "media_id").withColumn("txt_vec", expr(
          "transform(sequence(0L, 63L), i -> ((nb * (2*i + 1) * 7919) % 1000003) / 1000003.0D - 0.5D)")),
        "embedding", "txt_vec", threshold = 0.05)
      .filter(col("kept"))
      .select("media_id", "text", "nb", "modality")
    val dd = Dedup.dropExactDuplicates(clipped, "media_id", "text")
    val modalTokens =
      when(col("modality") === "image",
        expr("((112 + nb % 400 + 13) div 14) * ((112 + (nb * 31) % 400 + 13) div 14)"))
      .when(col("modality") === "audio",
        when(lit(1L) + (col("nb") * 997) % 100000 >= 16000,
          (expr("(1 + (nb * 997) % 100000 - 16000) div 8000") + 1) * 25)
          .otherwise(0L))
      .otherwise(expr("((1 + nb % 300 + 4) div 5) * 64"))
    val lens = dd
      .withColumn("len",
        TextAnalysis.tokenCount(col("text")).cast(LongType) + modalTokens)
      .filter(col("len") <= 4096)
      .select("media_id", "modality", "len")
    Packing.packSequences(lens, "media_id", "len", budget = 4096L, numPartitions = 1)
      .select("media_id", "modality", "len", "bin_id")
      .orderBy("media_id")
  }

  /** The mx17-style curation DAG run INCREMENTALLY across two deliveries
    * — the production wrapper shape end-to-end: run 1 processes sources
    * src0..src9 (per-doc filter → [[graft.operators.Incremental
    * .dedupDelta]] from an empty store); run 2 processes ONLY the
    * remaining shards, deduping against run 1's carried fingerprint
    * store; the global tail (per-source quota → BFD packing) re-runs
    * over the SURVIVOR union (survivor-sized — the documented cost of
    * global stages under shard-incremental execution). The oracle proves
    * the two-phase dedup equals one global replay: first-occurrence per
    * content hash ordered by (delivery phase, doc_id). Output carries
    * run_id + bin_id per row, so both the incremental split AND the
    * packed layout are bit-checked.
    */
  val mx25IncrementalPipeline: Q = Q(
    "mx25_incremental_pipeline",
    s"""WITH d AS (SELECT doc_id, source, text,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(substr(source, 4) AS INT) AS si FROM documents),
      |f AS (SELECT * FROM d WHERE n_tokens >= 30),
      |r AS (SELECT doc_id, source, n_tokens,
      |    CASE WHEN si < 10 THEN 1 ELSE 2 END AS run_id,
      |    ROW_NUMBER() OVER (PARTITION BY md5(text)
      |      ORDER BY (CASE WHEN si < 10 THEN 0 ELSE 1 END), doc_id) AS rn
      |  FROM f),
      |surv AS (SELECT doc_id, source, n_tokens, CAST(run_id AS BIGINT) AS run_id
      |  FROM r WHERE rn = 1),
      |quota AS (SELECT doc_id, source, n_tokens, run_id FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS qrn
      |    FROM surv) WHERE qrn <= 10),
      |docs AS (SELECT doc_id, source, n_tokens AS nt, run_id,
      |    row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
      |  FROM quota),
      |${bfdFoldSql(256L)}
      |SELECT d.doc_id, d.source, d.nt AS n_tokens, d.run_id, p.bin_id
      |FROM docs d JOIN pbin p ON p.rn = d.rn ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Incremental, Packing, TextAnalysis}
    val corpus = Tables.documents(spark, dir)
    val srcIdx = Shared.srcIdx
    def processFilter(df: DataFrame): DataFrame =
      df.select(col("doc_id"), col("source"), col("text"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .filter(col("n_tokens") >= 30)
    val filtered = processFilter(corpus)
    // run 1: sources src0..src9, empty manifest + empty fingerprint store
    val manifest1 = corpus.filter(srcIdx < 10).select("source").distinct()
    val emptyManifest = manifest1.limit(0)
    val emptyFps = filtered.select(md5(col("text")).as("fp")).limit(0)
    val (surv1, store1) = Incremental.dedupDelta(
      filtered.join(broadcast(manifest1), Seq("source"), "left_semi"),
      emptyManifest, "source", emptyFps, "doc_id", "text")
    // run 2: the remaining shards only, deduped against run 1's store
    val (surv2, _) = Incremental.dedupDelta(
      filtered, manifest1, "source", store1, "doc_id", "text")
    val surv = surv1.withColumn("run_id", lit(1L))
      .unionByName(surv2.withColumn("run_id", lit(2L)))
      .drop("text")
    // global tail re-runs over the survivor union (survivor-sized)
    val quota = surv
      .withColumn("__qrn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .filter(col("__qrn") <= 10).drop("__qrn")
    Packing.packSequences(quota, "doc_id", "n_tokens", budget = 256L, numPartitions = 1)
      .select("doc_id", "source", "n_tokens", "run_id", "bin_id")
      .orderBy("doc_id")
  }

  /** Incremental NEAR-dedup across two deliveries with signature state
    * travel ([[graft.operators.Incremental.nearDedupDelta]]) — the mx25
    * proof shape for the LSH stage: delivery 1 = sources src0..src9 from an
    * empty store, delivery 2 = the rest against delivery 1's carried
    * `(doc_id, sig, bk)` store, so delivery 2's banding joins
    * delta×(delta ∪ store-index) and never re-shingles history. The oracle
    * replays BOTH deliveries as ONE global banded pass over the
    * (delivery, doc_id) order — a document is dropped iff banding surfaces
    * any earlier candidate (kept or not) with ≥ 52/64 equal minhash
    * components (0.8 × 64 → `matches·10 ≥ 64·8`) — proving the two-phase
    * run ≡ the one-shot run, the operator's replay-stability contract.
    */
  val mx26IncrementalNearDedup: Q = Q(
    "mx26_incremental_near_dedup",
    s"""WITH tok AS (SELECT doc_id, source, string_split(lower(text), ' ') AS ts
      |  FROM documents),
      |d AS (SELECT doc_id, source,
      |    CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 1 ELSE 2 END AS run_id,
      |    ts FROM tok),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ts) - 1),
      |         i -> concat(ts[i], ' ', ts[i+1], ' ', ts[i+2]))) AS sh
      |       FROM d WHERE len(ts) >= 3),
      |${DedupQueries.SigSql("doc_id")},
      |bands AS (SELECT doc_id, t.b AS band,
      |    array_to_string(list_slice(sig, t.b*4 + 1, t.b*4 + 4), '-') AS band_key
      |  FROM sig CROSS JOIN range(0, 16) t(b)),
      |cand AS (SELECT DISTINCT a.doc_id AS d_id, b.doc_id AS e_id
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id <> b.doc_id),
      |p AS (SELECT c.d_id, c.e_id FROM cand c
      |      JOIN d od ON od.doc_id = c.d_id
      |      JOIN d oe ON oe.doc_id = c.e_id
      |      WHERE (oe.run_id, oe.doc_id) < (od.run_id, od.doc_id)),
      |est AS (SELECT p.d_id,
      |    len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) AS matches
      |  FROM p JOIN sig sa ON sa.doc_id = p.d_id
      |         JOIN sig sb ON sb.doc_id = p.e_id),
      |dropped AS (SELECT DISTINCT d_id FROM est WHERE matches * 10 >= 64 * 8)
      |SELECT d.doc_id, d.source, CAST(d.run_id AS BIGINT) AS run_id
      |FROM d LEFT JOIN dropped x ON x.d_id = d.doc_id
      |WHERE x.d_id IS NULL
      |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{Dedup, Incremental}
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val srcIdx = Shared.srcIdx
    val manifest1 = corpus.filter(srcIdx < 10).select("source").distinct()
    val emptyManifest = manifest1.limit(0)
    // empty bootstrap store as a LocalRelation (createDataFrame over an
    // empty local list), NOT the minhash kernel over limit(0): a provably
    // empty prior lets Incremental skip the state checkpoint and Catalyst
    // prune every store-side join of delivery 1's candidate kernel
    val emptySigs = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      Dedup.minhashSignaturesWithBands(
        corpus.limit(0), "doc_id", "text", shingleK = 3, k = 64, bands = 16).schema)
    // per-delivery banding kernels from the cross-query memo (shared
    // verbatim with mx27, which consumes the SAME verified pairs): one
    // build per bench session; the Verify gate clears the memo per query
    val kernel1 = (Shared.incrDeliverySigs(spark, dir, 1),
      Shared.incrVerifiedPairs(spark, dir, 1))
    val kernel2 = (Shared.incrDeliverySigs(spark, dir, 2),
      Shared.incrVerifiedPairs(spark, dir, 2))
    val (s1, store1) = Incremental.nearDedupDelta(
      corpus.join(broadcast(manifest1), Seq("source"), "left_semi"),
      emptyManifest, "source", emptySigs, "doc_id", "text",
      sharedKernel = Some(kernel1))
    val (s2, _) = Incremental.nearDedupDelta(
      corpus, manifest1, "source", store1, "doc_id", "text",
      sharedKernel = Some(kernel2))
    s1.withColumn("run_id", lit(1L))
      .unionByName(s2.withColumn("run_id", lit(2L)))
      .select("doc_id", "source", "run_id")
      .orderBy("doc_id")
  }

  /** Incremental near-dup CLUSTER maintenance across two deliveries
    * ([[graft.operators.Incremental.ccDelta]]) — mx26's keep/drop rule
    * upgraded to dd11's min-id component labels with `(doc_id, sig, bk,
    * label)` state travel: delivery 2's verified pairings contract
    * historical endpoints to their carried labels, CC runs over the
    * contracted (delta-sized) graph, and a delivery that bridges two
    * delivery-1 clusters relabels BOTH to the joint min — the retroactive
    * merge exact dedup never needs. Connected components are
    * order-independent, so the oracle replays both deliveries as ONE
    * global banded pass (signature-estimated pairs ≥ 52/64 → transitive
    * closure → min-id labels; the pair CTE is MATERIALIZED so the
    * recursion doesn't re-run the signature pipeline per round). Output:
    * every document with its delivery, final cluster id and cluster size.
    */
  val mx27IncrementalCc: Q = Q(
    "mx27_incremental_cc",
    s"""WITH RECURSIVE tok AS (SELECT doc_id, source, string_split(lower(text), ' ') AS ts
      |  FROM documents),
      |d AS (SELECT doc_id, source,
      |    CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 1 ELSE 2 END AS run_id,
      |    ts FROM tok),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ts) - 1),
      |         i -> concat(ts[i], ' ', ts[i+1], ' ', ts[i+2]))) AS sh
      |       FROM d WHERE len(ts) >= 3),
      |${DedupQueries.SigSql("doc_id")},
      |bands AS (SELECT doc_id, t.b AS band,
      |    array_to_string(list_slice(sig, t.b*4 + 1, t.b*4 + 4), '-') AS band_key
      |  FROM sig CROSS JOIN range(0, 16) t(b)),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |pr AS MATERIALIZED (SELECT c.da, c.db FROM cand c
      |       JOIN sig sa ON sa.doc_id = c.da JOIN sig sb ON sb.doc_id = c.db
      |       WHERE len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) * 10 >= 64 * 8),
      |edges AS (SELECT da AS s, db AS t FROM pr UNION ALL SELECT db, da FROM pr),
      |reach AS (SELECT s AS id, s AS r FROM edges
      |          UNION
      |          SELECT g.t AS id, reach.r AS r FROM reach JOIN edges g ON g.s = reach.id),
      |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
      |lab AS (SELECT d.doc_id, d.source, CAST(d.run_id AS BIGINT) AS run_id,
      |        COALESCE(c.comp, d.doc_id) AS cluster_id
      |    FROM d LEFT JOIN comp c ON c.id = d.doc_id),
      |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      |       FROM lab GROUP BY cluster_id)
      |SELECT lab.doc_id, lab.source, lab.run_id, lab.cluster_id, sz.cluster_size
      |FROM lab JOIN sz USING (cluster_id)
      |ORDER BY lab.doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{Dedup, Incremental}
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val srcIdx = Shared.srcIdx
    val manifest1 = corpus.filter(srcIdx < 10).select("source").distinct()
    val emptyManifest = manifest1.limit(0)
    // provably-empty LocalRelation bootstrap state — see the mx26 note
    val emptyState = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      Dedup.minhashSignaturesWithBands(
          corpus.limit(0), "doc_id", "text", shingleK = 3, k = 64, bands = 16)
        .withColumn("label", col("doc_id")).schema)
    // the mx26 banding kernels, shared via the cross-query memo — the
    // verified pairs are label-independent, so the cluster maintenance
    // reuses them verbatim
    val kernel1 = (Shared.incrDeliverySigs(spark, dir, 1),
      Shared.incrVerifiedPairs(spark, dir, 1))
    val kernel2 = (Shared.incrDeliverySigs(spark, dir, 2),
      Shared.incrVerifiedPairs(spark, dir, 2))
    val (lab1, state1) = Incremental.ccDelta(
      corpus.join(broadcast(manifest1), Seq("source"), "left_semi"),
      emptyManifest, "source", emptyState, "doc_id", "text",
      sharedKernel = Some(kernel1))
    val (lab2, state2) = Incremental.ccDelta(
      corpus, manifest1, "source", state1, "doc_id", "text",
      sharedKernel = Some(kernel2))
    // final labels: the grown state carries every SIGNED doc's current
    // label (delivery-2 merges already applied to delivery-1 members);
    // sig-less docs are their own singletons
    val runId = when(srcIdx < 10, 1L).otherwise(2L).as("run_id")
    // label frame feeds BOTH the size aggregate and the final join —
    // materialize once or the whole two-delivery chain re-evaluates
    val labels = Dedup.cachedForReuse(
      corpus.select(col("doc_id"), col("source"), runId)
        .join(state2.select(col("doc_id"), col("label")), Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"), col("run_id"),
          coalesce(col("label"), col("doc_id")).as("cluster_id")))
    val sz = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sz, "cluster_id")
      .select("doc_id", "source", "run_id", "cluster_id", "cluster_size")
      .orderBy("doc_id")
  }

  /** Incremental IVF index maintenance across two deliveries
    * ([[graft.operators.Incremental.ivfDelta]]) — the ANN-side member of
    * the mx23/mx26/mx27 state-travel family: the carried state is the
    * centroid frame (here the sim3 deterministic quantizer — delivery 1's
    * first 16 vectors by id — so the oracle replays it as plain SQL) plus
    * the per-cell population counts, and delivery 2 assigns ONLY its delta
    * vectors against the carried centroids — history is never re-read or
    * re-clustered. Output: the per-cell maintenance report an index owner
    * watches — historical vs delta population and share drift in exact
    * ppm, the quantizer-staleness / re-train signal. Assignment is
    * per-row stateless, so two deliveries ≡ one global pass exactly; the
    * oracle computes that one global pass. Scale: one k×dims broadcast +
    * one narrow pass over the delta; the counts state is k rows.
    */
  val mx28IncrementalIvf: Q = Q(
    "mx28_incremental_ivf",
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |            vec_id % 2 AS sh FROM embeddings),
      |n AS (SELECT vec_id, sh, v,
      |        sqrt(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i]))) AS nrm
      |      FROM e),
      |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n
      |      WHERE sh = 0 AND nrm > 0 ORDER BY vec_id LIMIT 16),
      |a AS (SELECT vec_id, sh, cell FROM (
      |  SELECT n.vec_id, n.sh, c.c_id AS cell,
      |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
      |      list_sum(list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])) / (n.nrm*c.cn) DESC,
      |      c.c_id) AS rn
      |  FROM n CROSS JOIN c) WHERE rn = 1),
      |cnt AS (SELECT cell,
      |    CAST(SUM(CASE WHEN sh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_prior,
      |    CAST(SUM(CASE WHEN sh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
      |  FROM a GROUP BY cell),
      |f AS (SELECT c.c_id AS cell, COALESCE(cnt.n_prior, 0) AS n_prior,
      |             COALESCE(cnt.n_delta, 0) AS n_delta
      |      FROM c LEFT JOIN cnt ON cnt.cell = c.c_id),
      |t AS (SELECT CAST(SUM(n_prior) AS BIGINT) AS tp,
      |             CAST(SUM(n_delta) AS BIGINT) AS td FROM f)
      |SELECT cell, n_prior, n_delta,
      |  CAST(CASE WHEN t.tp = 0 THEN NULL
      |       ELSE 1000000 * n_prior // t.tp END AS BIGINT) AS share_prior_ppm,
      |  CAST(CASE WHEN t.td = 0 THEN NULL
      |       ELSE 1000000 * n_delta // t.td END AS BIGINT) AS share_delta_ppm,
      |  CAST(CASE WHEN t.tp = 0 OR t.td = 0 THEN NULL
      |       ELSE abs(1000000 * n_prior // t.tp - 1000000 * n_delta // t.td)
      |       END AS BIGINT) AS drift_ppm
      |FROM f, t ORDER BY cell""".stripMargin) { (spark, dir) =>
    import graft.operators.{Dedup, Incremental, Similarity}
    import org.apache.spark.sql.types.{LongType, StructType}
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        concat(lit("s"), col("vec_id") % 2).as("shard"))
    val d1 = corpus.filter(col("shard") === "s0")
    // the carried quantizer: delivery 1's first 16 NONZERO vectors by id
    // (the sim3 rule — deterministic and SQL-replayable; the nrm > 0 guard
    // on BOTH lanes keeps a zero vector from ever becoming a centroid,
    // whose cosine is 0/0 and whose tie-breaking would be engine-
    // dependent). Quantizer, prepared corpus AND the one stateless
    // assignment pass all come from the cross-query memo — mx28 and mx30
    // continue the SAME carried index, so the suite assigns the corpus
    // once and each delivery consumes a vec_id-parity filter
    // (graft.queries.Shared.ivfAssignedAll; Verify clears the memo per
    // query, keeping the gate hermetic). Assignment assumes no zero-norm
    // DATA vectors (a zero vector's cosine to every cell is NaN and its
    // argmax engine-dependent) — holds for the synthetic embeddings table
    // and any L2-normalized corpus.
    val cents = Shared.ivfCarriedCents(spark, dir)
    val asgAll = Shared.ivfAssignedAll(spark, dir)
    val emptyManifest = corpus.select(col("shard")).limit(0)
    val emptyCounts = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      new StructType().add("cell", LongType).add("n", LongType))
    val (_, counts1) = Incremental.ivfDelta(
      d1, emptyManifest, "shard", cents, emptyCounts, "vec_id", "embedding",
      sharedAssigned = Some(asgAll.filter(col("vec_id") % 2 === 0)))
    // prior counts feed delivery 2's grown state AND the report's n_prior
    val counts1M = Dedup.cachedForReuse(counts1)
    val manifest1 = d1.select(col("shard")).distinct()
    val (a2, _) = Incremental.ivfDelta(
      corpus, manifest1, "shard", cents, counts1M, "vec_id", "embedding",
      sharedAssigned = Some(asgAll.filter(col("vec_id") % 2 === 1)))
    val nDelta = a2.groupBy(col("cell")).agg(count(lit(1)).as("n_delta"))
    val joined = cents.select(col("c_id").as("cell"))
      .join(counts1M.select(col("cell"), col("n").as("n_prior")), Seq("cell"), "left")
      .join(nDelta, Seq("cell"), "left")
      .na.fill(0L, Seq("n_prior", "n_delta"))
    val tot = joined.agg(sum(col("n_prior")).cast(LongType).as("tp"),
      sum(col("n_delta")).cast(LongType).as("td"))
    joined.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_prior"), col("n_delta"),
        when(col("tp") === 0, lit(null).cast(LongType))
          .otherwise(expr("1000000 * n_prior div tp")).as("share_prior_ppm"),
        when(col("td") === 0, lit(null).cast(LongType))
          .otherwise(expr("1000000 * n_delta div td")).as("share_delta_ppm"),
        when(col("tp") === 0 || col("td") === 0, lit(null).cast(LongType))
          .otherwise(expr(
            "abs(1000000 * n_prior div tp - 1000000 * n_delta div td)"))
          .as("drift_ppm"))
      .orderBy(col("cell"))
  }

  /** Incremental SemDeDup across two deliveries
    * ([[graft.operators.Incremental.semDedupDelta]]) — dd26's embedding-
    * space semantic dedup with STATE TRAVEL: delivery 1 (even vec_ids)
    * trains the k = 8 / 5-iteration spherical k-means quantizer
    * ([[graft.operators.Similarity.kmeansCentroids]]) and bootstraps the
    * `(vec_id, v, nrm, cell, cell_cos, grp, keep)` state; delivery 2 (odd
    * vec_ids) assigns ONLY its delta vectors to the CARRIED centroids,
    * pairs within touched cells at cosine ≥ 0.7 against (delta ∪ store),
    * contracts historical endpoints to their carried group labels, and
    * recomputes survivor flags only in touched groups. SemDeDup groups are
    * connected components (order-independent) and the keep rule is a pure
    * function of final membership + delivery-independent centroid cosines,
    * so two deliveries ≡ one global pass with the same centroids — which
    * is exactly what the oracle replays: dd26's full Lloyd recursion
    * restricted to shard-0 points, one global assignment, within-cell pair
    * closure, keep = lowest cell_cos (ties → lowest id). Output: every
    * vector with its delivery, final cell, duplicate-group label and
    * survivor flag.
    */
  val mx29IncrementalSemDedup: Q = {
    val cos = (v: String, c: String) =>
      s"""list_sum(list_transform(range(1, 65), i2 -> $v[CAST(i2 AS INT)] * $c[CAST(i2 AS INT)]))"""
    val scores =
      s"""list_transform(range(1, 9), c2 ->
         |  ${cos("z.v", "cents[CAST(c2 AS INT)]")}
         |  / (z.nrm * sqrt(${cos("cents[CAST(c2 AS INT)]", "cents[CAST(c2 AS INT)]")})))""".stripMargin
    val fscores =
      s"""list_transform(range(1, 9), c2 ->
         |  ${cos("x.v", "fc.cents[CAST(c2 AS INT)]")}
         |  / (x.nrm * sqrt(${cos("fc.cents[CAST(c2 AS INT)]", "fc.cents[CAST(c2 AS INT)]")})))""".stripMargin
    Q(
      "mx29_incremental_semdedup",
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, vec_id % 2 AS sh,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (SELECT vec_id, sh, v,
         |        sqrt(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i]))) AS nrm
         |      FROM e),
         |pts AS (SELECT list({'id': vec_id, 'v': v, 'nrm': nrm} ORDER BY vec_id) AS ps
         |        FROM n WHERE sh = 0),
         |lloyd AS (
         |  SELECT 0 AS it, list_transform(ps[1:8], z -> z.v) AS cents, ps FROM pts
         |  UNION ALL
         |  SELECT it + 1,
         |    list_transform(range(1, 9), c ->
         |      CASE WHEN len(list_filter(zp, z -> z.cell = c)) = 0
         |             THEN cents[CAST(c AS INT)]
         |           ELSE list_transform(range(1, 65), i ->
         |             list_sum(list_transform(list_filter(zp, z -> z.cell = c),
         |               z -> z.v[CAST(i AS INT)]))
         |             / len(list_filter(zp, z -> z.cell = c))) END) AS cents,
         |    ps
         |  FROM (
         |    SELECT it, cents, ps,
         |      list_transform(ps, z ->
         |        {'cell': list_position($scores, list_max($scores)),
         |         'v': z.v}) AS zp
         |    FROM lloyd WHERE it < 5)),
         |fc AS (SELECT cents FROM lloyd WHERE it = 5),
         |asg AS (SELECT x.vec_id, x.sh, x.v, x.nrm,
         |    CAST(list_position($fscores, list_max($fscores)) - 1 AS BIGINT) AS cell,
         |    list_max($fscores) AS cell_cos
         |  FROM n x, fc),
         |pr AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib
         |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cos("a.v", "b.v")} / (a.nrm * b.nrm) >= CAST(0.7 AS DOUBLE)),
         |edges AS (SELECT ia AS s, ib AS t FROM pr
         |          UNION ALL SELECT ib, ia FROM pr),
         |reach AS (SELECT s AS id, s AS r FROM edges
         |          UNION
         |          SELECT g.t AS id, reach.r AS r FROM reach JOIN edges g ON g.s = reach.id),
         |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
         |m AS (SELECT a.vec_id, a.sh, a.cell, COALESCE(c.comp, a.vec_id) AS grp, a.cell_cos
         |      FROM asg a LEFT JOIN comp c ON c.id = a.vec_id),
         |r AS (SELECT vec_id, sh, cell, grp,
         |        ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cell_cos ASC, vec_id) AS rn
         |      FROM m)
         |SELECT vec_id, CAST(sh + 1 AS BIGINT) AS run_id, cell, grp, rn = 1 AS keep
         |FROM r ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import graft.operators.{Dedup, Incremental, Similarity}
      import org.apache.spark.sql.types._
      Dedup.withStaticPlan(spark) {
        val corpus = Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding"),
            concat(lit("s"), col("vec_id") % 2).as("shard"))
        val d1 = corpus.filter(col("shard") === "s0")
        // the carried quantizer: trained ONCE on delivery 1 — from the
        // cross-query memo, which also feeds training from the shared
        // prepared corpus and assigns the WHOLE corpus in one stateless
        // pass; each delivery consumes a vec_id-parity filter of that one
        // frame instead of running its own assignment (the mx28/mx30
        // ivfAssignedAll discipline; Verify clears the memo per query)
        val cents = Shared.semKmeansCents(spark, dir)
        val asgAll = Shared.semAssignedAll(spark, dir)
        val emptyManifest = corpus.select(col("shard")).limit(0)
        // provably-empty LocalRelation bootstrap state — see the mx26 note
        val stateSchema = new StructType()
          .add("vec_id", LongType).add("v", ArrayType(DoubleType))
          .add("nrm", DoubleType).add("cell", LongType)
          .add("cell_cos", DoubleType).add("grp", LongType)
          .add("keep", BooleanType)
        val emptyState = spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), stateSchema)
        val (_, state1) = Incremental.semDedupDelta(
          d1, emptyManifest, "shard", cents, emptyState, "vec_id", "embedding", 0.7,
          sharedAsg = Some(asgAll.filter(col("vec_id") % 2 === 0)))
        val manifest1 = d1.select(col("shard")).distinct()
        val (_, state2) = Incremental.semDedupDelta(
          corpus, manifest1, "shard", cents, state1, "vec_id", "embedding", 0.7,
          sharedAsg = Some(asgAll.filter(col("vec_id") % 2 === 1)))
        state2.select(col("vec_id"),
            (col("vec_id") % 2 + 1).cast(LongType).as("run_id"),
            col("cell"), col("grp"), col("keep"))
          .orderBy(col("vec_id"))
      }
    }
  }

  /** Drift-triggered IVF retrain with a measured recall verdict
    * ([[graft.operators.Incremental.ivfRetrainReport]]) — the operator that
    * ACTS on mx28's re-train signal: take the 4 worst cells by prior-vs-
    * delta ppm share drift under the carried quantizer, retrain ONLY those
    * centroids (one Lloyd step over all delta members ∪ a 64-vector
    * md5-sampled historical slice per cell), locally repair the index
    * (drifted cells re-assign against the updated codebook; everything
    * else keeps its cell), and report recall@10 of 2-probe IVF search
    * before vs after against the exact brute-force ground truth on the
    * `vec_id % 50 = 1` query set. The oracle replays the entire chain —
    * mx28's centroid/assignment/drift CTEs, the vec_id-ordered list-fold
    * retrain means, the repaired assignment, both searches and the recall
    * join — so hits/total/recall_bp are exact on both engines.
    */
  val mx30IvfRetrain: Q = Q(
    "mx30_ivf_retrain",
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |            vec_id % 2 AS sh FROM embeddings),
      |n AS (SELECT vec_id, sh, v,
      |        sqrt(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i]))) AS nrm
      |      FROM e),
      |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n
      |      WHERE sh = 0 AND nrm > 0 ORDER BY vec_id LIMIT 16),
      |a AS (SELECT vec_id, sh, v, nrm, cell FROM (
      |  SELECT n.vec_id, n.sh, n.v, n.nrm, c.c_id AS cell,
      |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
      |      list_sum(list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])) / (n.nrm*c.cn) DESC,
      |      c.c_id) AS rn
      |  FROM n CROSS JOIN c) WHERE rn = 1),
      |cnt AS (SELECT cell,
      |    CAST(SUM(CASE WHEN sh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_prior,
      |    CAST(SUM(CASE WHEN sh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
      |  FROM a GROUP BY cell),
      |f AS (SELECT c.c_id AS cell, COALESCE(cnt.n_prior, 0) AS n_prior,
      |             COALESCE(cnt.n_delta, 0) AS n_delta
      |      FROM c LEFT JOIN cnt ON cnt.cell = c.c_id),
      |t AS (SELECT CAST(SUM(n_prior) AS BIGINT) AS tp,
      |             CAST(SUM(n_delta) AS BIGINT) AS td FROM f),
      |drv AS (SELECT f.cell,
      |    abs(COALESCE(1000000 * f.n_prior // nullif(t.tp, 0), 0)
      |      - COALESCE(1000000 * f.n_delta // nullif(t.td, 0), 0)) AS drift
      |  FROM f, t),
      |dr AS (SELECT cell FROM (
      |  SELECT cell, ROW_NUMBER() OVER (ORDER BY drift DESC, cell) AS rn FROM drv)
      |  WHERE rn <= 4),
      |mem AS (
      |  SELECT a.cell, a.vec_id, a.v FROM a JOIN dr USING (cell) WHERE a.sh = 1
      |  UNION ALL
      |  SELECT cell, vec_id, v FROM (
      |    SELECT a.cell, a.vec_id, a.v,
      |      ROW_NUMBER() OVER (PARTITION BY a.cell ORDER BY
      |        CAST(concat('0x', substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 8)) AS BIGINT),
      |        a.vec_id) AS rn
      |    FROM a JOIN dr USING (cell) WHERE a.sh = 0) WHERE rn <= 64),
      |nc AS (SELECT cell, list_transform(range(1, 65), i ->
      |         list_sum(list_transform(ms, z -> z.v[CAST(i AS INT)])) / len(ms)) AS cv2
      |       FROM (SELECT cell, list({'id': vec_id, 'v': v} ORDER BY vec_id) AS ms
      |             FROM mem GROUP BY cell)),
      |c2 AS (SELECT c_id, cv,
      |         sqrt(list_sum(list_transform(range(1, 65), i -> cv[i]*cv[i]))) AS cn
      |       FROM (SELECT c.c_id, COALESCE(nc.cv2, c.cv) AS cv
      |             FROM c LEFT JOIN nc ON nc.cell = c.c_id)),
      |rep AS (SELECT vec_id, v, nrm, cell FROM (
      |  SELECT a.vec_id, a.v, a.nrm, c2.c_id AS cell,
      |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
      |      list_sum(list_transform(range(1, 65), i -> a.v[CAST(i AS INT)]*c2.cv[CAST(i AS INT)]))
      |        / (a.nrm*c2.cn) DESC, c2.c_id) AS rn
      |  FROM a JOIN dr USING (cell) CROSS JOIN c2) WHERE rn = 1),
      |ia AS (SELECT a.vec_id, a.v, a.nrm, a.cell FROM a
      |         LEFT JOIN dr ON dr.cell = a.cell WHERE dr.cell IS NULL
      |       UNION ALL SELECT vec_id, v, nrm, cell FROM rep),
      |q AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM n WHERE vec_id % 50 = 1),
      |tr AS (SELECT q_id, vec_id FROM (
      |  SELECT q.q_id, n.vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
      |      list_sum(list_transform(range(1, 65), i -> q.q_v[CAST(i AS INT)]*n.v[CAST(i AS INT)]))
      |        / (q.q_nrm*n.nrm) DESC, n.vec_id) AS rnk
      |  FROM q CROSS JOIN n WHERE n.vec_id <> q.q_id) WHERE rnk <= 10),
      |pbq AS (SELECT q_id, q_v, q_nrm, cell FROM (
      |  SELECT q.q_id, q.q_v, q.q_nrm, c.c_id AS cell,
      |    ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
      |      list_sum(list_transform(range(1, 65), i -> q.q_v[CAST(i AS INT)]*c.cv[CAST(i AS INT)]))
      |        / (q.q_nrm*c.cn) DESC, c.c_id) AS rn
      |  FROM q CROSS JOIN c) WHERE rn <= 2),
      |fb AS (SELECT q_id, vec_id FROM (
      |  SELECT p.q_id, x.vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY p.q_id ORDER BY
      |      list_sum(list_transform(range(1, 65), i -> p.q_v[CAST(i AS INT)]*x.v[CAST(i AS INT)]))
      |        / (p.q_nrm*x.nrm) DESC, x.vec_id) AS rnk
      |  FROM pbq p JOIN a x ON x.cell = p.cell AND x.vec_id <> p.q_id) WHERE rnk <= 10),
      |paq AS (SELECT q_id, q_v, q_nrm, cell FROM (
      |  SELECT q.q_id, q.q_v, q.q_nrm, c2.c_id AS cell,
      |    ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
      |      list_sum(list_transform(range(1, 65), i -> q.q_v[CAST(i AS INT)]*c2.cv[CAST(i AS INT)]))
      |        / (q.q_nrm*c2.cn) DESC, c2.c_id) AS rn
      |  FROM q CROSS JOIN c2) WHERE rn <= 2),
      |fa AS (SELECT q_id, vec_id FROM (
      |  SELECT p.q_id, x.vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY p.q_id ORDER BY
      |      list_sum(list_transform(range(1, 65), i -> p.q_v[CAST(i AS INT)]*x.v[CAST(i AS INT)]))
      |        / (p.q_nrm*x.nrm) DESC, x.vec_id) AS rnk
      |  FROM paq p JOIN ia x ON x.cell = p.cell AND x.vec_id <> p.q_id) WHERE rnk <= 10),
      |hb AS (SELECT COUNT(*) AS hits FROM fb JOIN tr ON tr.q_id = fb.q_id AND tr.vec_id = fb.vec_id),
      |ha AS (SELECT COUNT(*) AS hits FROM fa JOIN tr ON tr.q_id = fa.q_id AND tr.vec_id = fa.vec_id),
      |tt AS (SELECT COUNT(*) AS total FROM tr)
      |SELECT * FROM (
      |  SELECT 'after' AS phase, CAST(ha.hits AS BIGINT) AS hits,
      |    CAST(tt.total AS BIGINT) AS total,
      |    CAST(CASE WHEN tt.total = 0 THEN NULL
      |         ELSE ha.hits * 10000 // tt.total END AS BIGINT) AS recall_bp
      |  FROM ha, tt
      |  UNION ALL
      |  SELECT 'before', CAST(hb.hits AS BIGINT), CAST(tt.total AS BIGINT),
      |    CAST(CASE WHEN tt.total = 0 THEN NULL
      |         ELSE hb.hits * 10000 // tt.total END AS BIGINT)
      |  FROM hb, tt)
      |ORDER BY phase""".stripMargin) { (spark, dir) =>
    import graft.operators.{Dedup, Incremental, Similarity}
    // stays ADAPTIVE deliberately: the report's many small-frame exchanges
    // cost AQE-future jobs, but the measured static-plan variant was
    // slower (sort-merge fallbacks + per-action broadcast rebuilds
    // outweigh the saved scheduler jobs — profiled r13, 49j/9s static vs
    // 59j/5s adaptive standalone; in the bench shard the memo entries are
    // already built and the adaptive run is ~3-4 s)
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        concat(lit("s"), col("vec_id") % 2).as("shard"))
    val d1 = corpus.filter(col("shard") === "s0")
    // the carried quantizer — mx28's rule verbatim, straight from the
    // cross-query memo: this query CONTINUES mx28's index, so it also
    // consumes the suite's one shared full-corpus assignment pass
    // (Shared.ivfAssignedAll) instead of re-assigning internally
    val cents = Shared.ivfCarriedCents(spark, dir)
    val manifest1 = d1.select(col("shard")).distinct()
    Incremental.ivfRetrainReport(corpus, manifest1, "shard", cents,
      "vec_id", "embedding", queryPred = col("vec_id") % 50 === 1,
      k = 10, nProbe = 2, nDrifted = 4, sampleCap = 64,
      sharedAsg = Some(Shared.ivfAssignedAll(spark, dir)))
  }

  /** Incremental per-language quota with carried counts
    * ([[graft.operators.Incremental.quotaDelta]]) — mx2's "first N per
    * group" as a two-delivery replay: delivery 1 (sources s0–s9) keeps its
    * first ≤ 40 docs per lang by doc_id and emits the `(lang, n_kept)`
    * state; delivery 2 keeps only up to each lang's REMAINING quota.
    * Because every delivery-1 row precedes every delivery-2 row in the
    * (delivery, doc_id) total order, a delta row's global rank is its
    * within-delta rank plus the carried count — so the oracle replays both
    * deliveries as ONE global ROW_NUMBER over (run_id, doc_id) ≤ 40. At
    * sf0.01 the quota FILLS inside delivery 1 for en/de and straddles the
    * boundary for es/fr/zh, exercising both carry cases.
    */
  val mx31IncrementalQuota: Q = Q(
    "mx31_incremental_quota",
    """WITH d AS (SELECT doc_id, lang,
      |    CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 1 ELSE 2 END AS run_id
      |  FROM documents),
      |r AS (SELECT doc_id, lang, run_id,
      |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY run_id, doc_id) AS rn
      |      FROM d)
      |SELECT doc_id, lang, CAST(run_id AS BIGINT) AS run_id
      |FROM r WHERE rn <= 40 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.Incremental
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
    val d1 = corpus.filter(Shared.srcIdx < 10)
    val emptyManifest = corpus.select(col("source")).limit(0)
    val emptyCounts = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      new StructType().add("lang", StringType).add("n_kept", LongType))
    val (k1, counts1) = Incremental.quotaDelta(
      d1, emptyManifest, "source", emptyCounts, "lang", "doc_id", quota = 40L)
    val manifest1 = d1.select(col("source")).distinct()
    val (k2, _) = Incremental.quotaDelta(
      corpus, manifest1, "source", counts1, "lang", "doc_id", quota = 40L)
    k1.withColumn("run_id", lit(1L))
      .unionByName(k2.withColumn("run_id", lit(2L)))
      .select("doc_id", "lang", "run_id")
      .orderBy("doc_id")
  }

  /** Incremental vocabulary / document-frequency store across two
    * deliveries ([[graft.operators.Incremental.vocabDelta]]) — the carried
    * ADDITIVE-aggregate state member of the incremental family: delivery 1
    * (sources s0–s9) bootstraps the `(term, df)` store from an empty
    * LocalRelation, delivery 2 tokenizes ONLY its delta and merges per-term
    * document counts by one keyed sum. Per-term document counts are
    * additive over the disjoint deliveries in any order, so the oracle
    * replays both deliveries as ONE global pass with per-run conditional
    * sums — the strongest two-deliveries ≡ one-global equivalence in the
    * family (no survivor policy, no tie-breaking). Output: each delivery's
    * top-10 touched terms by cumulative document frequency (ties → term) —
    * the vocabulary-drift report a tokenizer health monitor consumes —
    * with `is_new` flagging terms delivery saw first.
    */
  val mx32IncrementalVocab: Q = Q(
    "mx32_incremental_vocab",
    """WITH d AS (SELECT doc_id,
      |    CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 1 ELSE 2 END AS run_id,
      |    list_distinct(string_split(lower(text), ' ')) AS ts
      |  FROM documents),
      |t AS (SELECT run_id, unnest(ts) AS term FROM d),
      |c AS (SELECT term,
      |        CAST(SUM(CASE WHEN run_id = 1 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
      |        CAST(SUM(CASE WHEN run_id = 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      |      FROM t WHERE term <> '' GROUP BY term),
      |u AS (SELECT 1 AS run_id, term, 0 AS df_prior, df1 AS df_delta, df1 AS df_total
      |        FROM c WHERE df1 > 0
      |      UNION ALL
      |      SELECT 2, term, df1, df2, df1 + df2 FROM c WHERE df2 > 0),
      |rk AS (SELECT *, ROW_NUMBER() OVER (
      |         PARTITION BY run_id ORDER BY df_total DESC, term) AS rnk FROM u)
      |SELECT CAST(run_id AS BIGINT) AS run_id, term,
      |  CAST(df_prior AS BIGINT) AS df_prior, CAST(df_delta AS BIGINT) AS df_delta,
      |  CAST(df_total AS BIGINT) AS df_total, CAST(rnk AS BIGINT) AS rnk,
      |  df_prior = 0 AS is_new
      |FROM rk WHERE rnk <= 10 ORDER BY run_id, rnk""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    import graft.operators.Incremental
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val d1 = corpus.filter(Shared.srcIdx < 10)
    val emptyManifest = corpus.select(col("source")).limit(0)
    val emptyVocab = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      new StructType().add("term", StringType).add("df", LongType))
    val (rep1, vocab1) = Incremental.vocabDelta(
      d1, emptyManifest, "source", emptyVocab, "text")
    val manifest1 = d1.select(col("source")).distinct()
    val (rep2, _) = Incremental.vocabDelta(
      corpus, manifest1, "source", vocab1, "text")
    val w = Window.partitionBy(col("run_id"))
      .orderBy(col("df_total").desc, col("term"))
    rep1.withColumn("run_id", lit(1L))
      .unionByName(rep2.withColumn("run_id", lit(2L)))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 10)
      .withColumn("is_new", col("df_prior") === 0L)
      .select("run_id", "term", "df_prior", "df_delta", "df_total", "rnk", "is_new")
      .orderBy("run_id", "rnk")
  }

  /** Incremental gram-level contamination across two deliveries
    * ([[graft.operators.Incremental.contaminationDelta]]) — dd30's
    * contamination-depth report with STATE TRAVEL, the decontamination
    * member of the incremental family: delivery 1 (sources s0–s9)
    * bootstraps the train-gram / eval-gram / hit-counter stores from empty
    * LocalRelations; delivery 2 shingles ONLY its delta, retroactively
    * re-probes delivery-1 eval docs against its NEW train grams (the gram
    * that arrives late still contaminates the old benchmark doc), and
    * probes its own eval docs against the grown store. Each (eval doc,
    * gram) hit lands exactly once — in the delivery where both sides first
    * coexist — so two deliveries ≡ one global dd30 pass, which is what the
    * oracle replays (dd30's SQL plus the delivery tag). Output: per eval
    * doc — delivery, gram count, hits, exact-ppm contamination.
    */
  val mx33IncrementalContamination: Q = Q(
    "mx33_incremental_contamination",
    """WITH tok AS (SELECT doc_id,
      |    CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 1 ELSE 2 END AS run_id,
      |    string_split(lower(text), ' ') AS ts FROM documents),
      |sh AS (SELECT doc_id, run_id, list_distinct(list_transform(range(1, len(ts) - 3),
      |         i -> array_to_string(list_slice(ts, i, i + 4), ' '))) AS sh
      |       FROM tok WHERE len(ts) >= 5),
      |train AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 7 <> 0),
      |ev AS (SELECT doc_id, run_id, CAST(len(sh) AS BIGINT) AS n, unnest(sh) AS g
      |       FROM sh WHERE doc_id % 7 = 0),
      |agg AS (SELECT ev.doc_id, MAX(ev.run_id) AS run_id, MAX(ev.n) AS n_grams,
      |    CAST(SUM(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      |  FROM ev LEFT JOIN train t ON t.g = ev.g GROUP BY ev.doc_id)
      |SELECT doc_id, CAST(run_id AS BIGINT) AS run_id, n_grams, n_hit,
      |  CAST((1000000 * n_hit) // n_grams AS BIGINT) AS contaminated_ppm
      |FROM agg ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.Incremental
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val d1 = corpus.filter(Shared.srcIdx < 10)
    val benchPred = col("doc_id") % 7 === 0
    val emptyManifest = corpus.select(col("source")).limit(0)
    def empty(schema: StructType) = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    // (measured round 16: checkpointing h1 to truncate delivery-1's probe
    // plan was a wash on time and +4 jobs — the counters chain roots on
    // delivery-1's cached shingle/gram frames already, so the re-planned
    // subtree is shallow. Left lazy.)
    val (t1, e1, h1) = Incremental.contaminationDelta(
      d1, emptyManifest, "source",
      empty(new StructType().add("g", StringType)),
      empty(new StructType().add("doc_id", LongType).add("g", StringType)),
      empty(new StructType().add("doc_id", LongType)
        .add("n_grams", LongType).add("n_hit", LongType)),
      "doc_id", "text", benchPred)
    val manifest1 = d1.select(col("source")).distinct()
    val (_, _, h2) = Incremental.contaminationDelta(
      corpus, manifest1, "source", t1, e1, h1, "doc_id", "text", benchPred)
    h2.join(corpus.select(col("doc_id"),
        when(Shared.srcIdx < 10, 1L).otherwise(2L).as("run_id")), Seq("doc_id"))
      .select(col("doc_id"), col("run_id"), col("n_grams"), col("n_hit"),
        expr("(1000000 * n_hit) div n_grams").as("contaminated_ppm"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(p1PassThrough, s10CursorMax, qAsofSignup, qAsofNearest,
    qRangeJoin,
    qOuterJoin, qAntiCustomers, qSemiCustomers, qMedianPrice, qApproxStats,
    qProfile, qProfileApprox, qProfileLi, qProfileLiApprox,
    qSaltedJoin, qScalarFns, qAboveAvgOrders,
    mx1HashSample, mx2LangQuota, mx3ContextWindows, mx4QualityGate,
    mx5StratifiedSample, mx6DomainMix, mx7FixedSample, mx8SequencePacking,
    mx9SlidingWindows, mx10WeightedSample, mx11TokenBudgetSample,
    mx12GroupSplit, mx13SourceWaterfill, mx14TemperatureMix,
    qTableChecksum, qDqReport,
    qPercentileBands, qCdcCompact, qIntervalUnion, qZorderLayout, qSkewReport,
    qWeightedMedian, mx15EpochShuffle, qHilbertLayout, mx16Curriculum, qJoinEstimate,
    mx17CurationPipeline, mx21MultimodalPacking, mx22IncrementalCuration,
    mx23IncrementalDedup, mx24MultimodalCuration, mx25IncrementalPipeline,
    mx26IncrementalNearDedup, mx27IncrementalCc, mx28IncrementalIvf,
    mx29IncrementalSemDedup, mx30IvfRetrain, mx31IncrementalQuota,
    mx32IncrementalVocab, mx33IncrementalContamination)
}
