package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.Temporal

/** Analytics-breadth operators beyond the reference's inventory: batch
  * sessionization, multi-level aggregation (ROLLUP/CUBE + grouping id),
  * pivot, the rank/offset window-function family, histogramming, and token
  * document frequency. Each is the composition a warehouse user reaches for
  * daily; all are single-shuffle plans that survive a 100× scale-up (the
  * scaladoc on each query names the shuffle).
  */
object AnalyticsQueries {

  /** Gap-based sessionization of the click-stream (30-minute gap), then a
    * per-session rollup — the canonical web-analytics query. One shuffle on
    * `user_id` for the window pass; the aggregate reuses that partitioning
    * (user_id ⊂ group key), so no second exchange.
    */
  val qSessionize: Q = Q(
    "q_sessionize",
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
      |f AS (SELECT user_id, t,
      |        CASE WHEN LAG(t) OVER w IS NULL OR t - LAG(t) OVER w > 1800000000
      |             THEN 1 ELSE 0 END AS nf
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
      |s AS (SELECT user_id, t,
      |        CAST(SUM(nf) OVER (PARTITION BY user_id ORDER BY t) AS BIGINT) AS session_id
      |      FROM f)
      |SELECT user_id, session_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MIN(t) AS start_us, MAX(t) AS end_us,
      |  MAX(t) - MIN(t) AS duration_us
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (spark, dir) =>
    val sessions = Temporal.sessionize(
      Tables.events(spark, dir), Seq("user_id"), "ts", gapUs = 1800000000L)
    sessions
      .select(col("user_id"), col("session_id"), unix_micros(col("ts")).as("t"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("t")).as("start_us"),
        max(col("t")).as("end_us"),
        (max(col("t")) - min(col("t"))).as("duration_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** ROLLUP with a grouping id — subtotal + grand-total rows in one pass.
    * Spark expands the grouping sets before the aggregate, so it is still a
    * single shuffle; sums use the exact-decimal convention. NULLS FIRST is
    * explicit in the oracle (DuckDB defaults to NULLS LAST, Spark to FIRST).
    */
  val qRollup: Q = Q(
    "q_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast(LongType).as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
      .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** CUBE over two order dimensions — all 2² grouping sets in one shuffle. */
  val qCube: Q = Q(
    "q_cube",
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY CUBE(o_orderpriority, o_orderstatus)
      |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        (grouping(col("o_orderpriority")) * 2 + grouping(col("o_orderstatus")))
          .cast(LongType).as("gid"),
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("revenue"))
      .select("o_orderpriority", "o_orderstatus", "gid", "n", "revenue")
      .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)
  }

  /** Arbitrary GROUPING SETS — the general form ROLLUP/CUBE specialize:
    * two DISJOINT single-dimension sets (per-returnflag and per-linestatus
    * marginals) in ONE aggregate pass. Not expressible as any rollup/cube of
    * the same columns; exercised through the SQL surface (the DataFrame API
    * exposes only the rollup/cube specializations). Still one Expand + one
    * shuffle — the same single-pass plan shape as [[qRollup]].
    */
  val qGroupingSets: Q = {
    val sql =
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
    Q("q_grouping_sets", sql) { (spark, dir) =>
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
      spark.sql(sql)
    }
  }

  /** Pivot: per-user event-type counts as columns, written as conditional
    * aggregation (`count(when(type = v, 1))` per value) rather than
    * `RelationalGroupedDataset.pivot` — the explicit-list pivot still plans
    * TWO hash aggregates/exchanges ((user, type) then user), while the
    * conditional form is one scan + one shuffle on `user_id` with map-side
    * partials, and the value list being static keeps the schema static.
    * That is the at-scale shape (an inferred pivot additionally scans twice
    * for the distinct values). PlanShapeSpec pins the single exchange.
    */
  val qPivot: Q = Q(
    "q_pivot",
    """SELECT user_id,
      |  CAST(COUNT(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
      |  CAST(COUNT(*) FILTER (event_type = 'error')    AS BIGINT) AS error,
      |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
      |  CAST(COUNT(*) FILTER (event_type = 'signup')   AS BIGINT) AS signup,
      |  CAST(COUNT(*) FILTER (event_type = 'view')     AS BIGINT) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === types.head, 1)).as(types.head),
        types.tail.map(t => count(when(col("event_type") === t, 1)).as(t)): _*)
      .orderBy(col("user_id"))
  }

  /** The rank/offset window family over the daily series: lag/lead,
    * row_number/rank/dense_rank/ntile by close, percent_rank/cume_dist.
    * The ratio functions divide two exact integers — IEEE division is
    * correctly rounded, so both engines produce the identical double. One
    * single-partition window (the series is one small group by construction;
    * the per-key variants in WindowQueries cover the partitioned case).
    */
  val qWindowFns: Q = Q(
    "q_window_fns",
    s"""WITH ${Series.DailySql},
       |r AS (
       |  SELECT d, close,
       |    LAG(close, 1)  OVER (ORDER BY d) AS prev_close,
       |    LEAD(close, 1) OVER (ORDER BY d) AS next_close,
       |    CAST(ROW_NUMBER()   OVER (ORDER BY close, d) AS BIGINT) AS rn,
       |    CAST(RANK()         OVER (ORDER BY close)    AS BIGINT) AS rnk,
       |    CAST(DENSE_RANK()   OVER (ORDER BY close)    AS BIGINT) AS drnk,
       |    CAST(NTILE(4)       OVER (ORDER BY close, d) AS BIGINT) AS quartile,
       |    PERCENT_RANK()      OVER (ORDER BY close)    AS pct_rank,
       |    CUME_DIST()         OVER (ORDER BY close)    AS cume
       |  FROM daily)
       |SELECT * FROM r ORDER BY d""".stripMargin) { (spark, dir) =>
    val byD = Window.orderBy(col("d"))
    val byClose = Window.orderBy(col("close"))
    val byCloseD = Window.orderBy(col("close"), col("d"))
    Series.daily(spark, dir)
      .withColumn("prev_close", lag(col("close"), 1).over(byD))
      .withColumn("next_close", lead(col("close"), 1).over(byD))
      .withColumn("rn", row_number().over(byCloseD).cast(LongType))
      .withColumn("rnk", rank().over(byClose).cast(LongType))
      .withColumn("drnk", dense_rank().over(byClose).cast(LongType))
      .withColumn("quartile", ntile(4).over(byCloseD).cast(LongType))
      .withColumn("pct_rank", percent_rank().over(byClose))
      .withColumn("cume", cume_dist().over(byClose))
      .orderBy(col("d"))
  }

  /** Fixed-width histogram of order totals. The bucket is `floor(x / w)` on
    * the SAME parquet double with the SAME constant — IEEE division and
    * floor are deterministic functions of the input bits, so both engines
    * bucket identically even at representability edges. Pure map + one
    * aggregate shuffle on the bucket id.
    */
  val qHistogram: Q = Q(
    "q_histogram",
    """SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / 25000.0).cast(LongType).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .orderBy(col("bucket"))
  }

  /** Token document frequency — the corpus-statistics half of TF-IDF and the
    * vocabulary primitive of a training-data pipeline. Per-doc distinct
    * tokens (narrow explode + distinct fused into the aggregate), then a
    * count per token and a deterministic top-50 (df DESC, token ASC —
    * a total order, so LIMIT is stable). At scale: partial aggregation
    * map-side, one shuffle on token, TakeOrdered for the top-k.
    */
  val tx8DocFreq: Q = Q(
    "tx8_doc_freq",
    """SELECT g AS token, CAST(COUNT(*) AS BIGINT) AS df
      |FROM (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS g
      |      FROM documents)
      |WHERE g <> ''
      |GROUP BY g ORDER BY df DESC, token LIMIT 50""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token"))
      .limit(50)
  }

  /** Time-RANGE window frame: a trailing 7-calendar-day moving sum/count/max
    * over the (gappy) daily series. RANGE frames answer "last 7 DAYS", not
    * "last 7 ROWS" — on a series with missing dates the two differ, and the
    * SMA family (w1/w5) covers the ROWS case. Both engines order by the
    * integer epoch-day so the frame bounds are plain integer arithmetic;
    * sums stay exact because the series is integer-valued. Single window
    * pass, one sort.
    */
  val qRangeFrame: Q = Q(
    "q_range_frame",
    s"""WITH ${Series.DailySql}
       |SELECT d, close,
       |  CAST(SUM(close)  OVER w AS DOUBLE) AS sum_7d,
       |  CAST(COUNT(*)    OVER w AS BIGINT) AS n_7d,
       |  CAST(MAX(close)  OVER w AS DOUBLE) AS max_7d
       |FROM daily
       |WINDOW w AS (ORDER BY (d - DATE '1970-01-01')
       |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
       |ORDER BY d""".stripMargin) { (spark, dir) =>
    val w = Window.orderBy(unix_date(col("d"))).rangeBetween(-6, 0)
    Series.daily(spark, dir)
      .select(col("d"), col("close"),
        sum(col("close")).over(w).cast(DoubleType).as("sum_7d"),
        count(lit(1)).over(w).as("n_7d"),
        max(col("close")).over(w).cast(DoubleType).as("max_7d"))
      .orderBy(col("d"))
  }

  /** SCD Type-2 dimension build ([[Temporal.scd2Versions]]): each customer's
    * order-priority change history as versioned rows with
    * valid_from/valid_to/is_current — the standard slowly-changing-dimension
    * materialization from a raw change feed. The change feed is orders in
    * (o_orderdate, o_orderkey) order per customer — a total order, so
    * version boundaries are deterministic. One keyed sort-shuffle.
    */
  val qScd2: Q = Q(
    "q_scd2_priority",
    """WITH e AS (SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS eff_date,
      |                  o_orderpriority AS priority, o_orderkey AS seq FROM orders),
      |c AS (SELECT *, LAG(priority) OVER w AS prev,
      |             ROW_NUMBER() OVER w AS rn
      |      FROM e WINDOW w AS (PARTITION BY custkey ORDER BY eff_date, seq)),
      |v AS (SELECT custkey, priority, eff_date AS valid_from, seq
      |      FROM c WHERE rn = 1 OR prev <> priority)
      |SELECT custkey, priority, valid_from,
      |       LEAD(valid_from) OVER w2 AS valid_to,
      |       CAST(CASE WHEN LEAD(valid_from) OVER w2 IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM v WINDOW w2 AS (PARTITION BY custkey ORDER BY valid_from, seq)
      |ORDER BY custkey, valid_from, seq""".stripMargin) { (spark, dir) =>
    val events = Tables.orders(spark, dir).select(
      col("o_custkey").as("custkey"),
      to_date(col("o_orderdate")).as("eff_date"),
      col("o_orderpriority").as("priority"),
      col("o_orderkey").as("seq"))
    Temporal.scd2Versions(events, Seq("custkey"), Seq("eff_date", "seq"),
        "priority", "eff_date")
      .select("custkey", "priority", "valid_from", "valid_to", "is_current")
      .orderBy(col("custkey"), col("valid_from"), col("seq"))
  }

  /** Date-spine resample + forward fill over the shared daily series: every
    * calendar day between min and max gets a row, gaps carry the last
    * observed close (`last(..., ignoreNulls)` over an unbounded-preceding
    * frame) plus a fill flag — the time-series regularization step before
    * any fixed-frequency model. Single-series global window, documented
    * like w1–w4 (the per-key variant partitions the same plan by symbol);
    * the spine is a broadcast 1-row `sequence` explode, no generator table.
    */
  val qResampleFfill: Q = Q(
    "q_resample_ffill",
    s"""WITH ${Series.DailySql},
       |b AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
       |spine0 AS (SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS ts FROM b),
       |spine AS (SELECT CAST(ts AS DATE) AS d FROM spine0),
       |j AS (SELECT s.d, daily.close FROM spine s LEFT JOIN daily ON daily.d = s.d)
       |SELECT d,
       |  LAST_VALUE(close IGNORE NULLS) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ffill,
       |  CAST(CASE WHEN close IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
       |FROM j ORDER BY d""".stripMargin) { (spark, dir) =>
    val daily = Series.daily(spark, dir)
    val spine = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("d"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("d"), "left")
      .select(col("d"),
        last(col("close"), ignoreNulls = true).over(w).as("close_ffill"),
        when(col("close").isNull, 1L).otherwise(0L).as("filled"))
      .orderBy(col("d"))
  }

  val all: Seq[Q] = Seq(qSessionize, qRollup, qCube, qGroupingSets, qPivot,
    qWindowFns, qHistogram, qRangeFrame, tx8DocFreq, qScd2, qResampleFfill)
}
