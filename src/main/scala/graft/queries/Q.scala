package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the operator
  * is SQL-expressible) the equivalent DuckDB SQL over the same parquet tables.
  * Column names/types and values must match exactly — see
  * [[graft.exprs.Exact]] for the float-determinism rules.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    sql: Option[String])

object Q {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}

/** The shared daily price series derived from `orders`: one row per order
  * date, `close` = floor(exact-decimal daily revenue / 100). This is the
  * single-series stand-in for the reference's OHLCV input (its Alpha Vantage
  * daily bars), reused by the window/indicator/ML queries.
  *
  * `close` is deliberately INTEGER-VALUED: integer-valued doubles below 2^53
  * sum exactly in any accumulation order, so plain window sums over the
  * series (SMA, Bollinger Σx/Σx²) are bit-identical across engines without
  * decimal gymnastics, and an averaged series would land exactly on decimal
  * midpoints (day counts that are powers of two) where Spark and DuckDB round
  * doubles differently.
  */
object Series {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  def daily(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(floor(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType) / 100.0)
        .cast(DoubleType).as("close"))

  /** DuckDB CTE mirroring [[daily]] bit-for-bit. */
  val DailySql: String =
    """daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |         CAST(FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / 100.0) AS DOUBLE) AS close
      |  FROM orders GROUP BY CAST(o_orderdate AS DATE))""".stripMargin
}
