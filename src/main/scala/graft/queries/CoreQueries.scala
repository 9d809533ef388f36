package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.exprs.Exact._

/** Core relational surface: scan/filter/project, hash & broadcast joins,
  * aggregation, top-k, set ops, windows, sessionization, rollup, JSON access.
  *
  * The reference has no joins/group-bys (SURVEY.md §2.8); these queries are
  * the engine's beyond-reference analytics surface, shaped like TPC-H so the
  * plans exercise the scale paths (partial aggregation, broadcast of small
  * dims, sort-limit pushdown). Every query carries a DuckDB oracle.
  */
object CoreQueries {

  private val D2 = DecimalType(18, 2)
  private def one = lit(new java.math.BigDecimal("1.00"))

  /** Per-row revenue in exact decimal: price × (1 − discount). */
  private def discPrice = col("l_extendedprice").cast(D2) * (one - col("l_discount").cast(D2))
  private val DiscPriceSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  val q1PricingSummary: Q = Q(
    "q1_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       |  CAST(SUM($DiscPriceSql) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM(CAST($DiscPriceSql AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       |  CAST(COUNT(*) AS BIGINT) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast(DoubleType).as("sum_disc_price"),
        sum(discPrice.cast(DecimalType(18, 4)) * (one + col("l_tax").cast(D2)))
          .cast(DoubleType).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q3TopRevenueOrders: Q = Q(
    "q3_top_revenue_orders",
    s"""SELECT l_orderkey, CAST(SUM($DiscPriceSql) AS DOUBLE) AS revenue, o_orderdate, o_orderpriority
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00' AND l_shipdate > TIMESTAMP '1996-07-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin) { (spark, dir) =>
    val cutoff = to_timestamp(lit("1996-07-01 00:00:00"))
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discPrice).cast(DoubleType).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val q5NationRevenue: Q = Q(
    "q5_nation_revenue",
    s"""SELECT n_name, CAST(SUM($DiscPriceSql) AS DOUBLE) AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
       |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    val dim = broadcast(
      Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey")))
    Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(dim, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q18LargeOrders: Q = Q(
    "q18_large_orders",
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(150 AS DECIMAL(18,2)))
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (spark, dir) =>
    // One lineitem scan: l_orderkey is the whole group key on the lineitem
    // side, so the per-order sum IS the output aggregate — no re-aggregation
    // after the joins (the oracle SQL keeps the textbook Q18 shape; same rows).
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(D2)).as("q"))
      .filter(col("q") > new java.math.BigDecimal("150.00"))
      .withColumn("sum_qty", col("q").cast(DoubleType))
    big.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val qTopkOrders: Q = Q(
    "q_topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
  }

  val qDistinctUsers: Q = Q(
    "q_distinct_users",
    """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  val qSetOps: Q = Q(
    "q_set_ops",
    """WITH a AS (SELECT c_nationkey AS k FROM customer), b AS (SELECT s_nationkey AS k FROM supplier)
      |SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
      |UNION ALL SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
      |UNION ALL SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
      |ORDER BY op, k""".stripMargin) { (spark, dir) =>
    val a = Tables.customer(spark, dir).select(col("c_nationkey").as("k"))
    val b = Tables.supplier(spark, dir).select(col("s_nationkey").as("k"))
    a.union(b).distinct().select(lit("union").as("op"), col("k"))
      .union(a.intersect(b).select(lit("intersect").as("op"), col("k")))
      .union(a.except(b).select(lit("except").as("op"), col("k")))
      .orderBy(col("op"), col("k"))
  }

  /** Gap-based sessionization (30-minute inactivity) — the standard
    * event-stream operator; windows partition by user so the shuffle is on the
    * natural key and skew-bounded.
    */
  val qSessionize: Q = Q(
    "q_sessionize",
    """WITH x AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |              OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT user_id, ts, value,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM x)
      |SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value,
      |  MIN(ts) AS t0, MAX(ts) AS t1
      |FROM y GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(wRun).cast(LongType))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("session_value"),
        min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val qJsonExtract: Q = Q(
    "q_json_extract",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .orderBy(col("event_id"))
  }

  val qHourlyEvents: Q = Q(
    "q_hourly_events",
    """SELECT date_trunc('hour', ts) AS h, event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY date_trunc('hour', ts), event_type ORDER BY h, event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("h"), col("event_type"))
  }

  val qRankCustomers: Q = Q(
    "q_rank_customers",
    """SELECT c_custkey, c_nationkey, c_acctbal,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
      |  CAST(RANK() OVER w2 AS BIGINT) AS rnk,
      |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |  LAG(c_acctbal) OVER w AS prev_bal,
      |  LEAD(c_acctbal) OVER w AS next_bal
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
      |       w2 AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
      |ORDER BY c_nationkey, rn""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    val w2 = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        row_number().over(w).cast(LongType).as("rn"),
        rank().over(w2).cast(LongType).as("rnk"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        lag(col("c_acctbal"), 1).over(w).as("prev_bal"),
        lead(col("c_acctbal"), 1).over(w).as("next_bal"))
      .orderBy(col("c_nationkey"), col("rn"))
  }

  val qRollupCustomers: Q = Q(
    "q_rollup_customers",
    """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
      |  CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("total_bal"))
      .orderBy(col("region"), col("nation"))
  }

  val q10ReturnedCustomers: Q = Q(
    "q10_returned_top_customers",
    s"""SELECT c_custkey, c_name, CAST(SUM($DiscPriceSql) AS DOUBLE) AS revenue, n_name
       |FROM customer, orders, lineitem, nation
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
    Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(discPrice).cast(DoubleType).as("revenue"))
      .select("c_custkey", "c_name", "revenue", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val qCubeOrders: Q = Q(
    "q_cube_orders",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))
  }

  /** TPC-H Q4 pattern — correlated EXISTS as a left-semi join: orders in a
    * quarter having at least one lineitem shipped after the order date.
    */
  val q4OrderPriorityExists: Q = Q(
    "q4_order_priority_exists",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q12 pattern — CASE aggregation over a fact-fact join: per line
    * status, how many lines belong to high- vs low-priority orders.
    */
  val q12PrioritySplit: Q = Q(
    "q12_priority_split",
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(spark, dir).join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** TPC-H Q14 pattern — conditional revenue ratio: the promo share of one
    * month's revenue. Both operands are exact decimal sums cast to double;
    * the single division and ×100 run in the identical IEEE shape on both
    * engines.
    */
  val q14PromoRevenue: Q = Q(
    "q14_promo_revenue",
    s"""SELECT 100.0 * (
       |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $DiscPriceSql ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       |  / CAST(SUM($DiscPriceSql) AS DOUBLE)) AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-03-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
    l.join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * (
        sum(when(col("p_type") === "PROMO", discPrice)
          .otherwise(lit(new java.math.BigDecimal("0.00")).cast(D2)))
          .cast(DoubleType)
          / sum(discPrice).cast(DoubleType))).as("promo_revenue"))
  }

  /** TPC-H Q19 pattern — OR-of-ANDs predicate over a part join: three
    * brand/size/quantity bands summed as one revenue figure. Exercises
    * disjunctive predicate pushdown through the join.
    */
  val q19BandedRevenue: Q = Q(
    "q19_banded_revenue",
    s"""SELECT CAST(SUM($DiscPriceSql) AS DOUBLE) AS revenue
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (spark, dir) =>
    def band(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("p_partkey") === col("l_partkey"))
      .filter(band("Brand#1", 5, 1, 11) || band("Brand#2", 10, 10, 20) || band("Brand#3", 15, 20, 30))
      .agg(sum(discPrice).cast(DoubleType).as("revenue"))
  }

  val all: Seq[Q] = Seq(
    q1PricingSummary, q3TopRevenueOrders, q5NationRevenue, q10ReturnedCustomers,
    q18LargeOrders, qTopkOrders, qDistinctUsers, qSetOps, qSessionize,
    qJsonExtract, qHourlyEvents, qRankCustomers, qRollupCustomers, qCubeOrders,
    q4OrderPriorityExists, q12PrioritySplit, q14PromoRevenue, q19BandedRevenue)
}
