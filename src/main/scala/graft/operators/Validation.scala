package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-validation as a schema registry of declarative predicates.
  *
  * The reference validates rows against Pydantic models resolved by dotted
  * path and DROPS failures with a warning
  * (`/root/reference/src/data_extractor/transformers/pydantic_validation.py:39-84`).
  * On Spark a validation schema is a `StructType` plus one boolean `Column`;
  * validation is a single codegen'd `filter`, so it fuses with neighboring
  * projections instead of iterating rows (the reference's `iterrows` loop).
  * The reference's `chunk_size` is superseded by partitioning and is accepted
  * but ignored by the engine config.
  *
  * Built-in schemas mirror the reference's three models:
  *   - TodoItem  (`schemas/todo.py:12-16`)
  *   - User      (`schemas/user.py:12-15`)
  *   - OHLCVRecord (`schemas/ohlcv.py:8-30`)
  */
object Validation {

  /** Pragmatic RFC-5322-ish subset, same spirit as Pydantic's EmailStr. */
  val EmailRegex = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"

  final case class SchemaDef(name: String, schema: StructType, predicate: Column)

  val Todo: SchemaDef = SchemaDef(
    "todo",
    StructType(Seq(
      StructField("userId", LongType), StructField("id", LongType),
      StructField("title", StringType), StructField("completed", BooleanType))),
    col("userId").isNotNull && col("userId") >= 1 &&
      col("id").isNotNull && col("id") >= 1 &&
      col("title").isNotNull && length(col("title")) >= 1 &&
      col("completed").isNotNull)

  val User: SchemaDef = SchemaDef(
    "user",
    StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("email", StringType))),
    col("id").isNotNull && col("id") >= 1 &&
      col("name").isNotNull && length(col("name")) >= 1 &&
      col("email").isNotNull && col("email").rlike(EmailRegex))

  val Ohlcv: SchemaDef = SchemaDef(
    "ohlcv",
    StructType(Seq(
      StructField("date", StringType), StructField("open", DoubleType),
      StructField("high", DoubleType), StructField("low", DoubleType),
      StructField("close", DoubleType), StructField("volume", DoubleType))),
    col("date").isNotNull &&
      col("open").isNotNull && col("open") > 0 &&
      col("high").isNotNull && col("high") > 0 &&
      col("low").isNotNull && col("low") > 0 &&
      col("close").isNotNull && col("close") > 0 &&
      col("volume").isNotNull && col("volume") >= 0)

  val registry: Map[String, SchemaDef] =
    Seq(Todo, User, Ohlcv).map(s => s.name -> s).toMap ++ Map(
      // dotted-path aliases matching the reference's config strings
      "data_extractor.schemas.todo.TodoItem" -> Todo,
      "data_extractor.schemas.user.User" -> User,
      "data_extractor.schemas.ohlcv.OHLCVRecord" -> Ohlcv)

  /** Filter to rows satisfying the named schema's predicate. Column set and
    * order are preserved even when everything is filtered out (the reference
    * asserts this for the empty case).
    */
  def validate(df: DataFrame, schemaName: String): DataFrame = {
    val s = registry.getOrElse(schemaName,
      throw new IllegalArgumentException(
        s"Unknown validation schema '$schemaName'. Available: ${registry.keys.toSeq.sorted.mkString(", ")}"))
    df.filter(s.predicate)
  }

  /** Validate with a caller-supplied predicate (custom schema extension). */
  def validate(df: DataFrame, predicate: Column): DataFrame = df.filter(predicate)
}
