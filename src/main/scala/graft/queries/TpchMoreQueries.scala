package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.exprs.Exact._

/** Second tranche of TPC-H-pattern relational queries (q2/q6/q7/q8/q9/q11/
  * q13/q15/q17/q21/q22 shapes adapted to the driver's reduced star schema — no
  * partsupp table, no commitdate/receiptdate/phone/comment columns, so the
  * date-lag and country-code predicates are re-expressed over the columns
  * that exist; the PLAN SHAPES are the point and are preserved):
  *
  *  - q6: pure scan-filter-aggregate — predicate pushdown to parquet, one
  *    partial+final agg, no join, no wide shuffle.
  *  - q7: two-nation volume — nation broadcast twice under different
  *    aliases, supplier broadcast, one big l⋈o shuffle join.
  *  - q8: market share — conditional decimal aggregate ratio over a
  *    six-table join tree, dims broadcast.
  *  - q13: outer-join distribution — LEFT join with a pushed non-key
  *    predicate, two-level aggregation.
  *  - q15: top supplier by revenue view — agg once, reuse for the global
  *    max (scalar) and the equality filter.
  *  - q17: correlated avg subquery DECORRELATED to a semi-join-pruned
  *    per-key aggregate + equi-join (the classic rewrite; no per-row
  *    subquery execution).
  *  - q21: EXISTS / NOT EXISTS over the same table → left-semi + left-anti
  *    joins with a non-equi residual (suppkey ≠) on the orderkey equi-key.
  *  - q22: scalar aggregate (exact-decimal mean) broadcast into the filter +
  *    anti-join against orders.
  *
  * Numerics follow [[graft.exprs.Exact]]: money sums in DECIMAL(18,2+),
  * double only at the boundary, so values are bit-identical to DuckDB.
  */
object TpchMoreQueries {

  private val D2 = DecimalType(18, 2)
  private def one = lit(new java.math.BigDecimal("1.00"))
  private def discPrice = col("l_extendedprice").cast(D2) * (one - col("l_discount").cast(D2))
  private val DiscPriceSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  private def ts(s: String) = to_timestamp(lit(s))

  val q6ForecastRevenue: Q = Q(
    "q6_forecast_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(D2) * col("l_discount").cast(D2))
        .cast(DoubleType).as("revenue"))
  }

  val q7NationVolume: Q = Q(
    "q7_nation_volume",
    s"""SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue FROM (
       | SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |   CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year, $DiscPriceSql AS volume
       | FROM supplier, lineitem, orders, customer, nation n1, nation n2
       | WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
       |   AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
       |   AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       |   AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00')
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (spark, dir) =>
    val nations = Tables.nation(spark, dir).filter(col("n_name").isin("NATION_1", "NATION_2"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(nations.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val c = Tables.customer(spark, dir)
      .join(broadcast(nations.select(col("n_nationkey"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "cust_nation")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").between(ts("1996-01-01 00:00:00"), ts("1997-12-31 00:00:00")))
    l.join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .withColumn("l_year", year(col("l_shipdate")).cast(LongType))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(discPrice).cast(DoubleType).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q8MarketShare: Q = Q(
    "q8_market_share",
    s"""SELECT o_year, CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       |  / CAST(SUM(volume) AS DOUBLE) AS mkt_share FROM (
       | SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year, $DiscPriceSql AS volume, n2.n_name AS nation
       | FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
       | WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey AND o_custkey = c_custkey
       |   AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
       |   AND s_nationkey = n2.n_nationkey AND p_type = 'PROMO'
       |   AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00')
       |GROUP BY o_year ORDER BY o_year""".stripMargin) { (spark, dir) =>
    val part = Tables.part(spark, dir).filter(col("p_type") === "PROMO").select("p_partkey")
    val s = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "nation")
    val euroNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val c = Tables.customer(spark, dir)
      .join(broadcast(euroNations), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate").between(ts("1996-01-01 00:00:00"), ts("1997-12-31 00:00:00")))
    Tables.lineitem(spark, dir)
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast(LongType))
      .withColumn("volume", discPrice)
      .groupBy("o_year")
      .agg((sum(when(col("nation") === "NATION_1", col("volume"))
          .otherwise(lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 4)))).cast(DoubleType)
        / sum(col("volume")).cast(DoubleType)).as("mkt_share"))
      .orderBy("o_year")
  }

  val q13OrderCountDist: Q = Q(
    "q13_order_count_dist",
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      | SELECT c_custkey, COUNT(o_orderkey) AS c_count
      | FROM customer LEFT OUTER JOIN orders
      |   ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      | GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
        "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q15TopSupplier: Q = Q(
    "q15_top_supplier",
    s"""WITH revenue AS (SELECT l_suppkey AS supplier_no, CAST(SUM($DiscPriceSql) AS DOUBLE) AS total_revenue
       | FROM lineitem
       | WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       | GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue FROM supplier, revenue
       |WHERE s_suppkey = supplier_no AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin) { (spark, dir) =>
    val revenue = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(discPrice).cast(DoubleType).as("total_revenue"))
    val top = revenue.agg(max(col("total_revenue")).as("max_revenue"))
    revenue.join(broadcast(top), col("total_revenue") === col("max_revenue"))
      .join(Tables.supplier(spark, dir), col("supplier_no") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  val q17SmallQtyRevenue: Q = Q(
    "q17_small_qty_revenue",
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#1' AND p_size < 10
      |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin) { (spark, dir) =>
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#1" && col("p_size") < 10)
      .select("p_partkey")
    val l = Tables.lineitem(spark, dir)
    // decorrelated: per-part mean quantity, computed only for surviving parts
    // (semi-join prune), then one equi-join — no per-row subquery
    val avgQty = l.join(broadcast(part), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("ap_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_limit"))
    l.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < col("qty_limit"))
      .agg((dsum(col("l_extendedprice")) / 7.0).cast(DoubleType).as("avg_yearly"))
  }

  val q21SoleFaultSupplier: Q = Q(
    "q21_sole_fault_supplier",
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numfault FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
      |GROUP BY s_name ORDER BY numfault DESC, s_name LIMIT 20""".stripMargin) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_1")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    val l1 = l.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("lo"), col("l_suppkey").as("ls"))
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
        col("lo") === col("o_orderkey"), "left_semi")
    // EXISTS another supplier on the order → left-semi with non-equi residual
    val withOther = l1.join(l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2")),
      col("lo") === col("o2") && col("ls") =!= col("s2"), "left_semi")
    // NOT EXISTS another supplier who ALSO returned on that order → left-anti
    val soleFault = withOther.join(
      l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3")),
      col("lo") === col("o3") && col("ls") =!= col("s3"), "left_anti")
    soleFault.join(broadcast(s), col("ls") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numfault"))
      .orderBy(col("numfault").desc, col("s_name"))
      .limit(20)
  }

  val q22IdleCustomers: Q = Q(
    "q22_idle_customers",
    """SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY segment""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir)
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    c.join(broadcast(avgBal)) // scalar broadcast, no driver round-trip
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("segment")
  }

  /** q2 pattern — minimum-cost supplier (correlated MIN equality,
    * decorrelated): for each PROMO part, the EUROPE supplier whose cheapest
    * line item for that part is the part's region-wide minimum. The
    * correlated `= (SELECT MIN ...)` becomes a per-(part) min aggregate
    * equi-joined back (the q15/q17 rewrite family, here keyed per group
    * instead of globally); min runs on exact DECIMAL, ties broken by
    * supplier key via a second min — fully deterministic. Plan: one
    * lineitem shuffle on l_partkey after the broadcast dims prune rows;
    * no per-row subquery execution.
    */
  val q2MinCostSupplier: Q = Q(
    "q2_min_cost_supplier",
    """WITH eu AS (SELECT s_suppkey, s_name, n_name FROM supplier, nation, region
      |            WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |              AND r_name = 'EUROPE'),
      |li AS (SELECT l_partkey, l_suppkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      |       FROM lineitem JOIN eu ON l_suppkey = s_suppkey),
      |mn AS (SELECT l_partkey, MIN(price) AS min_price FROM li GROUP BY l_partkey),
      |w AS (SELECT li.l_partkey, MIN(li.l_suppkey) AS s_key, mn.min_price
      |      FROM li JOIN mn ON li.l_partkey = mn.l_partkey AND li.price = mn.min_price
      |      GROUP BY li.l_partkey, mn.min_price)
      |SELECT p_partkey, p_name, s_name, n_name, CAST(min_price AS DOUBLE) AS min_price
      |FROM w JOIN part ON p_partkey = w.l_partkey JOIN eu ON s_suppkey = w.s_key
      |WHERE p_type = 'PROMO'
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    val eu = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(eu.select(col("s_suppkey"))), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice").cast(D2).as("price"))
    val mn = li.groupBy(col("l_partkey")).agg(min(col("price")).as("min_price"))
    val w = li.join(mn.withColumnRenamed("l_partkey", "mk"),
        col("l_partkey") === col("mk") && col("price") === col("min_price"))
      .groupBy(col("l_partkey"), col("min_price"))
      .agg(min(col("l_suppkey")).as("s_key"))
    w.join(broadcast(Tables.part(spark, dir).filter(col("p_type") === "PROMO")),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(eu), col("s_suppkey") === col("s_key"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        col("min_price").cast(DoubleType).as("min_price"))
      .orderBy(col("p_partkey"))
  }

  /** q9 pattern — product-type profit by nation and year: the wide
    * fact-to-many-dims join tree (lineitem ⋈ orders ⋈ supplier ⋈ nation ⋈
    * part) grouped by (nation, year). Dims broadcast; the only shuffle is
    * the l⋈o equi-join plus the final grouped aggregate, exactly the shape
    * AQE keeps at 100 TB. Profit in exact DECIMAL (no supplycost column in
    * this schema — revenue stands in; the PLAN is the point).
    */
  val q9NationProfit: Q = Q(
    "q9_nation_profit",
    s"""SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       |  CAST(SUM($DiscPriceSql) AS DOUBLE) AS profit
       |FROM lineitem, orders, supplier, nation, part
       |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
       |  AND s_nationkey = n_nationkey AND p_partkey = l_partkey
       |  AND p_name LIKE '%a%'
       |GROUP BY 1, 2 ORDER BY nation, o_year""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.part(spark, dir).filter(col("p_name").like("%a%"))),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(sum(discPrice).cast(DoubleType).as("profit"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** q11 pattern — important stock: per-part revenue from one nation's
    * suppliers, kept only where it exceeds the global AVERAGE part value
    * (TPC-H's scalar-subquery HAVING, with the fixed fraction replaced by
    * the scale-adaptive mean so the selectivity survives any SF). The
    * scalar is a one-row broadcast crossJoin — both branches reuse ONE
    * grouped aggregate (cachedForReuse), and the threshold comparison
    * (value > total/n ⇔ value×n > total) stays in integer-exact decimal,
    * no double drift.
    */
  val q11ImportantStock: Q = Q(
    "q11_important_stock",
    s"""WITH de AS (SELECT s_suppkey FROM supplier, nation
       |            WHERE s_nationkey = n_nationkey AND n_name = 'NATION_8'),
       |v AS (SELECT l_partkey, SUM($DiscPriceSql) AS value
       |      FROM lineitem JOIN de ON l_suppkey = s_suppkey GROUP BY l_partkey)
       |SELECT l_partkey AS p_key, CAST(value AS DOUBLE) AS value
       |FROM v, (SELECT SUM(value) AS total, COUNT(*) AS n FROM v)
       |WHERE value * n > total
       |ORDER BY value DESC, p_key""".stripMargin) { (spark, dir) =>
    val de = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_8")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = graft.operators.Dedup.cachedForReuse(
      Tables.lineitem(spark, dir)
        .join(broadcast(de), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(discPrice).as("value")))
    v.crossJoin(broadcast(
        v.agg(sum(col("value")).as("total"), count(lit(1)).as("n"))))
      .filter(col("value") * col("n") > col("total"))
      .select(col("l_partkey").as("p_key"), col("value").cast(DoubleType).as("value"))
      .orderBy(col("value").desc, col("p_key"))
  }

  /** q16 pattern — supplier-part relationship counts with the NOT-IN
    * exclusion DECORRELATED to a broadcast left-anti join. The reduced
    * schema has no partsupp, so the part-supplier relation is the DISTINCT
    * (l_partkey, l_suppkey) projection of lineitem (one shuffle, exactly
    * partsupp's cardinality shape), and no s_comment, so "customer
    * complaints" suppliers are the s_acctbal < 0 ones. Plan: distinct
    * pairs → broadcast join the filtered part dim → broadcast anti-join the
    * excluded suppliers → grouped COUNT(DISTINCT). At 100 TB the only wide
    * exchange is the pair distinct + the final partial-aggregated count;
    * both dims stay broadcast.
    */
  val q16SupplierPartCounts: Q = Q(
    "q16_supplier_part_counts",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM ps JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (spark, dir) =>
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complained = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    ps.join(broadcast(parts), col("p_partkey") === col("l_partkey"))
      .join(broadcast(complained), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast(LongType).as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** q20 pattern — the semi-join chain on a quantity threshold: suppliers
    * who shipped MOST of their PROMO-part volume in 1996 (per (part,
    * supplier) pair, 2·qty_1996 > qty_total — the correlated availqty
    * comparison of the original, decorrelated to ONE conditional grouped
    * aggregate), surfaced as a left-semi join into the supplier dim and
    * restricted to one nation. Both year-window and lifetime sums come out
    * of a single scan (conditional aggregation), quantities in exact
    * DECIMAL so the threshold compare is bit-stable on both engines. Plan:
    * broadcast part filter → one grouped agg on (partkey, suppkey) →
    * threshold filter → distinct suppkeys → semi-join (supplier ⋈ nation
    * broadcast).
    */
  val q20PromoQtySuppliers: Q = Q(
    "q20_promo_qty_suppliers",
    """WITH q AS (
      |  SELECT l_partkey, l_suppkey,
      |    SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |             THEN CAST(l_quantity AS DECIMAL(18,2))
      |             ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty96,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_all
      |  FROM lineitem JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
      |  GROUP BY l_partkey, l_suppkey)
      |SELECT s_name, n_name FROM supplier, nation
      |WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
      |  AND s_suppkey IN (SELECT l_suppkey FROM q WHERE 2 * qty96 > qty_all)
      |ORDER BY s_name""".stripMargin) { (spark, dir) =>
    val pp = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val qualifying = Tables.lineitem(spark, dir)
      .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        sum(when(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00"),
          col("l_quantity").cast(D2)).otherwise(lit(0).cast(D2))).as("qty96"),
        sum(col("l_quantity").cast(D2)).as("qty_all"))
      .filter(col("qty96") * 2 > col("qty_all"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("n_name"))
      .orderBy(col("s_name"))
  }

  val all: Seq[Q] = Seq(q2MinCostSupplier, q6ForecastRevenue, q7NationVolume,
    q8MarketShare, q9NationProfit, q11ImportantStock,
    q13OrderCountDist, q15TopSupplier, q16SupplierPartCounts,
    q17SmallQtyRevenue, q20PromoQtySuppliers,
    q21SoleFaultSupplier, q22IdleCustomers)
}
