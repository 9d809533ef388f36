package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All query entry points receive `(spark, sfDir)` and load inputs from here so
  * that filters/projections written against these frames push down to the
  * parquet scans (verify with `.explain("formatted")` → `PushedFilters`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  /** `events.ts` has shipped in three physical parquet layouts across driver
    * data regenerations; normalize all of them to `TimestampType` (micros,
    * UTC session) so downstream `unix_micros`/`session_window`/JDBC writes
    * see one type:
    *
    *  1. nanosecond timestamps — Spark's vectorized reader rejects these;
    *     read nanos as long (legacy conf) and truncate to micros, the same
    *     truncation DuckDB applies, so oracle comparisons agree.
    *  2. `timestamp[us], isAdjustedToUTC=false` — Spark 4 reads this as
    *     `TIMESTAMP_NTZ`; cast to `TimestampType`. Bench/Verify pin the
    *     session timezone to UTC, so the cast is wall-clock-preserving and
    *     matches DuckDB's naive read exactly.
    *  3. `timestamp[us], isAdjustedToUTC=true` — already `TimestampType`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
