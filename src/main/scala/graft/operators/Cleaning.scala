package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.slf4j.LoggerFactory

/** The eleven data-cleaning rules of the reference's `data_cleaning`
  * transformer, re-expressed as narrow/declarative Spark transformations.
  *
  * Reference: `/root/reference/src/data_extractor/transformers/data_cleaning.py:26-159`.
  * Semantics preserved:
  *   - fixed application order regardless of config order (`data_cleaning.py:26-38`);
  *   - rules referencing missing columns warn and skip, never fail;
  *   - `drop_nulls` is a boolean (any-column dropna), `drop_null_columns` is a
  *     column list (subset dropna) — the reference's README has these inverted,
  *     the code is the truth;
  *   - `cast_types` is all-or-nothing per column: if any non-null value fails
  *     the cast, the column is left untouched (pandas `astype` failure).
  *
  * Every rule is a pure `DataFrame => DataFrame`; Catalyst fuses the chain into
  * single-stage projections/filters, so on a cluster the whole rule chain is
  * one scan (the reference materialized a full copy per rule).
  */
object Cleaning {
  private val log = LoggerFactory.getLogger(getClass)

  case class Config(
      dropColumns: Seq[String] = Nil,
      renameColumns: Map[String, String] = Map.empty,
      lowercaseColumns: Boolean = false,
      stripWhitespace: Boolean = false,
      fillNulls: Map[String, Any] = Map.empty,
      dropNulls: Boolean = false,
      dropNullColumns: Seq[String] = Nil,
      deduplicate: Boolean = false,
      deduplicateColumns: Seq[String] = Nil,
      standardizeDates: Seq[String] = Nil,
      castTypes: Map[String, String] = Map.empty,
      // Spark addition: when set, dedup rules keep the row with the smallest
      // value of this column ("keep first" needs an explicit order on an
      // unordered engine — SURVEY.md §7.4).
      orderColumn: Option[String] = None)

  /** Apply all configured rules in the reference's fixed order. */
  def apply(df: DataFrame, cfg: Config): DataFrame = {
    var d = df
    if (cfg.dropColumns.nonEmpty) d = dropColumns(d, cfg.dropColumns)
    if (cfg.renameColumns.nonEmpty) d = renameColumns(d, cfg.renameColumns)
    if (cfg.lowercaseColumns) d = lowercaseColumns(d)
    if (cfg.stripWhitespace) d = stripWhitespace(d)
    if (cfg.fillNulls.nonEmpty) d = fillNulls(d, cfg.fillNulls)
    if (cfg.dropNulls) d = dropNulls(d)
    if (cfg.dropNullColumns.nonEmpty) d = dropNullColumns(d, cfg.dropNullColumns)
    if (cfg.deduplicate) d = deduplicate(d, cfg.orderColumn)
    if (cfg.deduplicateColumns.nonEmpty)
      d = deduplicateColumns(d, cfg.deduplicateColumns, cfg.orderColumn)
    if (cfg.standardizeDates.nonEmpty) d = standardizeDates(d, cfg.standardizeDates)
    if (cfg.castTypes.nonEmpty) d = castTypes(d, cfg.castTypes)
    d
  }

  private def existing(df: DataFrame, cols: Seq[String], rule: String): Seq[String] = {
    val (have, missing) = cols.partition(df.columns.contains)
    if (missing.nonEmpty) log.warn(s"$rule: skipping missing columns ${missing.mkString(",")}")
    have
  }

  /** C1 — project away listed columns. */
  def dropColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(existing(df, cols, "drop_columns"): _*)

  /** C2 — rename columns; missing sources are skipped. */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to)
      else { log.warn(s"rename_columns: missing column $from"); d }
    }

  /** C3 — lowercase every column name. */
  def lowercaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  /** C4 — trim leading/trailing whitespace on string-typed columns only. */
  def stripWhitespace(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType) trim(col(f.name)).as(f.name) else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** C5 — fill nulls per column with a constant; missing columns skipped. */
  def fillNulls(df: DataFrame, fills: Map[String, Any]): DataFrame = {
    val have = fills.filter { case (c, _) => df.columns.contains(c) }
    (fills.keySet -- have.keySet).foreach(c => log.warn(s"fill_nulls: missing column $c"))
    have.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }
  }

  /** C6 — drop rows with a null in ANY column (boolean rule). */
  def dropNulls(df: DataFrame): DataFrame = df.na.drop("any")

  /** C7 — drop rows with a null in any of the LISTED columns. */
  def dropNullColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    val have = existing(df, cols, "drop_null_columns")
    if (have.isEmpty) df else df.na.drop("any", have)
  }

  /** C8 — drop fully-duplicate rows. With an order column, "keep first" is
    * well-defined (all columns equal ⇒ kept row is identical anyway unless the
    * order column itself differs).
    */
  def deduplicate(df: DataFrame, orderColumn: Option[String] = None): DataFrame =
    orderColumn match {
      case None      => df.dropDuplicates()
      case Some(ord) => deduplicateColumns(df, df.columns.filterNot(_ == ord).toIndexedSeq, Some(ord))
    }

  /** C9 — drop duplicates on a column subset, keeping the first row per key in
    * `orderColumn` order (pandas keep="first"); without an order column this
    * degrades to Spark's arbitrary-row `dropDuplicates(subset)`.
    */
  def deduplicateColumns(df: DataFrame, cols: Seq[String], orderColumn: Option[String] = None): DataFrame = {
    val have = existing(df, cols, "deduplicate_columns")
    if (have.isEmpty) return df
    orderColumn match {
      case None => df.dropDuplicates(have)
      case Some(ord) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(have.map(col): _*).orderBy(col(ord))
        df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** C10 — parse listed string columns to timestamps; unparseable → null
    * (pandas `to_datetime(errors="coerce")`).
    */
  def standardizeDates(df: DataFrame, cols: Seq[String]): DataFrame =
    existing(df, cols, "standardize_dates").foldLeft(df) { (d, c) =>
      d.withColumn(c, try_to_timestamp(col(c)))
    }

  private[graft] def sparkType(dtype: String): DataType = dtype match {
    case "int64" | "int" | "long"      => LongType
    case "float64" | "float" | "double" => DoubleType
    case "bool" | "boolean"            => BooleanType
    case "str" | "string" | "object"   => StringType
    case "datetime64[ns]" | "timestamp" => TimestampType
    case other => throw new IllegalArgumentException(s"cast_types: unsupported dtype $other")
  }

  /** C11 — cast columns to pandas-style dtypes. All-or-nothing per column: a
    * single counting pass decides, for every requested column at once, whether
    * any non-null value fails the cast; failing columns stay untouched
    * (pandas `astype` raises → reference warns and keeps the column).
    */
  def castTypes(df: DataFrame, casts: Map[String, String]): DataFrame = {
    val have = casts.filter { case (c, _) => df.columns.contains(c) }
    (casts.keySet -- have.keySet).foreach(c => log.warn(s"cast_types: missing column $c"))
    if (have.isEmpty) return df
    val checks = have.toSeq.map { case (c, t) =>
      sum(when(col(c).isNotNull && col(c).try_cast(sparkType(t)).isNull, 1L).otherwise(0L)).as(c)
    }
    val failures = df.agg(checks.head, checks.tail: _*).first()
    have.foldLeft(df) { case (d, (c, t)) =>
      if (failures.getAs[Long](c) > 0L) {
        log.warn(s"cast_types: column $c has values that fail cast to $t; keeping original")
        d
      } else d.withColumn(c, col(c).cast(sparkType(t)))
    }
  }
}
