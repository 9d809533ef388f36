package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.{Cleaning, Validation}

/** Oracle-checked exercises of the eleven cleaning rules (SURVEY.md §2.2,
  * C1–C11) and the validation operator (§2.3, V1) over the driver's tables.
  * Each query routes through the [[graft.operators.Cleaning]] /
  * [[graft.operators.Validation]] library operators — the oracle SQL states
  * the expected relational semantics independently.
  */
object CleaningQueries {

  val c1DropColumns: Q = Q(
    "c1_drop_columns",
    "SELECT c_custkey, c_name, c_nationkey FROM customer ORDER BY c_custkey") { (spark, dir) =>
    Cleaning.dropColumns(Tables.customer(spark, dir), Seq("c_acctbal", "c_mktsegment", "not_a_column"))
      .orderBy(col("c_custkey"))
  }

  val c2RenameColumns: Q = Q(
    "c2_rename_columns",
    """SELECT c_custkey, c_name AS customer_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    Cleaning.renameColumns(Tables.customer(spark, dir),
      Map("c_name" -> "customer_name", "missing_col" -> "nope"))
      .orderBy(col("c_custkey"))
  }

  val c3LowercaseColumns: Q = Q(
    "c3_lowercase_columns",
    "SELECT * FROM customer ORDER BY c_custkey") { (spark, dir) =>
    val upper = Tables.customer(spark, dir).toDF(
      "C_CUSTKEY", "C_NAME", "C_NATIONKEY", "C_ACCTBAL", "C_MKTSEGMENT")
    Cleaning.lowercaseColumns(upper).orderBy(col("c_custkey"))
  }

  val c4StripWhitespace: Q = Q(
    "c4_strip_whitespace",
    """SELECT c_custkey, trim(concat('  ', c_name, '  ')) AS c_name, c_acctbal
      |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val padded = Tables.customer(spark, dir)
      .select(col("c_custkey"),
        concat(lit("  "), col("c_name"), lit("  ")).as("c_name"),
        col("c_acctbal"))
    Cleaning.stripWhitespace(padded).orderBy(col("c_custkey"))
  }

  val c5FillNulls: Q = Q(
    "c5_fill_nulls",
    """SELECT c_custkey,
      |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS c_mktsegment,
      |  COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS c_acctbal
      |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val withNulls = Tables.customer(spark, dir)
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("c_mktsegment"),
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("c_acctbal"))
    Cleaning.fillNulls(withNulls, Map("c_mktsegment" -> "UNKNOWN", "c_acctbal" -> 0.0))
      .orderBy(col("c_custkey"))
  }

  private val NulledEventsSql =
    """(SELECT event_id,
      |  CASE WHEN value > 150 THEN NULL ELSE value END AS value,
      |  CASE WHEN event_type = 'error' THEN NULL ELSE props END AS props
      | FROM events) t""".stripMargin

  private def nulledEvents(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(spark, dir).select(
      col("event_id"),
      when(col("value") > 150, lit(null)).otherwise(col("value")).as("value"),
      when(col("event_type") === "error", lit(null)).otherwise(col("props")).as("props"))

  val c6DropNulls: Q = Q(
    "c6_drop_nulls",
    s"""SELECT * FROM $NulledEventsSql
       |WHERE value IS NOT NULL AND props IS NOT NULL ORDER BY event_id""".stripMargin) { (spark, dir) =>
    Cleaning.dropNulls(nulledEvents(spark, dir)).orderBy(col("event_id"))
  }

  val c7DropNullSubset: Q = Q(
    "c7_drop_null_subset",
    s"""SELECT * FROM $NulledEventsSql
       |WHERE value IS NOT NULL ORDER BY event_id""".stripMargin) { (spark, dir) =>
    Cleaning.dropNullColumns(nulledEvents(spark, dir), Seq("value", "ghost_column"))
      .orderBy(col("event_id"))
  }

  val c8Deduplicate: Q = Q(
    "c8_deduplicate",
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (spark, dir) =>
    Cleaning.deduplicate(Tables.orders(spark, dir).select("o_orderstatus", "o_orderpriority"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  val c9DeduplicateColumns: Q = Q(
    "c9_deduplicate_columns",
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM (SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
      |        ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      |      FROM orders)
      |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    Cleaning.deduplicateColumns(
      Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
      Seq("o_custkey"), orderColumn = Some("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  val c10StandardizeDates: Q = Q(
    "c10_standardize_dates",
    """SELECT event_id,
      |  TRY_CAST(strftime(ts, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS ts_str,
      |  TRY_CAST(props AS TIMESTAMP) AS junk
      |FROM events ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val stringy = Tables.events(spark, dir).select(
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
      col("props").as("junk"))
    Cleaning.standardizeDates(stringy, Seq("ts_str", "junk", "absent"))
      .orderBy(col("event_id"))
  }

  val c11CastTypes: Q = Q(
    "c11_cast_types",
    """SELECT event_id, CAST(user_id AS DOUBLE) AS user_id, props
      |FROM events ORDER BY event_id""".stripMargin) { (spark, dir) =>
    // props can never cast to int64 → all-or-nothing keeps it untouched;
    // user_id casts cleanly to float64.
    Cleaning.castTypes(
      Tables.events(spark, dir).select("event_id", "user_id", "props"),
      Map("user_id" -> "float64", "props" -> "int64"))
      .orderBy(col("event_id"))
  }

  val v1ValidateUsers: Q = Q(
    "v1_validate_users",
    """WITH u AS (
      |  SELECT c_custkey AS id, c_name AS name,
      |    CASE WHEN c_custkey % 7 = 0 THEN concat('user', c_custkey, '@example')
      |         ELSE concat('user', c_custkey, '@example.com') END AS email
      |  FROM customer)
      |SELECT * FROM u
      |WHERE id IS NOT NULL AND id >= 1 AND name IS NOT NULL AND length(name) >= 1
      |  AND email IS NOT NULL
      |  AND regexp_matches(email, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$')
      |ORDER BY id""".stripMargin) { (spark, dir) =>
    val users = Tables.customer(spark, dir).select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      when(col("c_custkey") % 7 === 0,
        concat(lit("user"), col("c_custkey").cast(StringType), lit("@example")))
        .otherwise(concat(lit("user"), col("c_custkey").cast(StringType), lit("@example.com")))
        .as("email"))
    Validation.validate(users, "user").orderBy(col("id"))
  }

  val v2ValidateOhlcv: Q = Q(
    "v2_validate_ohlcv",
    s"""WITH ${Series.DailySql},
       |o AS (
       |  SELECT strftime(CAST(d AS TIMESTAMP), '%Y-%m-%dT%H:%M:%SZ') AS date,
       |    close - 12000.0 AS open, close + 1000.0 AS high,
       |    close - 1000.0 AS low, close, CAST(42 AS DOUBLE) AS volume
       |  FROM daily)
       |SELECT * FROM o
       |WHERE date IS NOT NULL AND open IS NOT NULL AND open > 0
       |  AND high IS NOT NULL AND high > 0 AND low IS NOT NULL AND low > 0
       |  AND close IS NOT NULL AND close > 0 AND volume IS NOT NULL AND volume >= 0
       |ORDER BY date""".stripMargin) { (spark, dir) =>
    val ohlcv = Series.daily(spark, dir).select(
      date_format(col("d"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("date"),
      (col("close") - 12000.0).as("open"),
      (col("close") + 1000.0).as("high"),
      (col("close") - 1000.0).as("low"),
      col("close"),
      lit(42.0).as("volume"))
    Validation.validate(ohlcv, "ohlcv").orderBy(col("date"))
  }

  val all: Seq[Q] = Seq(
    c1DropColumns, c2RenameColumns, c3LowercaseColumns, c4StripWhitespace,
    c5FillNulls, c6DropNulls, c7DropNullSubset, c8Deduplicate,
    c9DeduplicateColumns, c10StandardizeDates, c11CastTypes,
    v1ValidateUsers, v2ValidateOhlcv)
}
