package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.Cleaning

/** C1–C11 semantics, mirroring the reference's
  * `tests/test_data_cleaning_transformer.py` assertions.
  */
class CleaningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df3 = Seq(
    (1L, "  alice  ", Some(10.0)),
    (2L, "bob", None),
    (2L, "bob", None),
    (3L, "  carol", Some(30.0))).toDF("id", "name", "score")

  test("drop_columns projects away, missing cols skipped") {
    val out = Cleaning.dropColumns(df3, Seq("score", "ghost"))
    assert(out.columns.toSeq == Seq("id", "name"))
  }

  test("rename_columns renames existing, skips missing") {
    val out = Cleaning.renameColumns(df3, Map("name" -> "username", "ghost" -> "x"))
    assert(out.columns.toSeq == Seq("id", "username", "score"))
  }

  test("lowercase_columns lowercases all names") {
    val out = Cleaning.lowercaseColumns(df3.toDF("ID", "Name", "SCORE"))
    assert(out.columns.toSeq == Seq("id", "name", "score"))
  }

  test("strip_whitespace trims string columns only") {
    val out = Cleaning.stripWhitespace(df3)
    val names = out.select("name").as[String].collect().toSet
    assert(names == Set("alice", "bob", "carol"))
    // numeric column untouched
    assert(out.schema("score").dataType == DoubleType)
  }

  test("fill_nulls fills per-column constants") {
    val out = Cleaning.fillNulls(df3, Map("score" -> 0.0))
    assert(out.filter($"score".isNull).count() == 0)
  }

  test("drop_nulls (boolean) drops rows with null in ANY column") {
    assert(Cleaning.dropNulls(df3).count() == 2) // the two bob rows go
  }

  test("drop_null_columns (list) drops rows null in listed columns only") {
    assert(Cleaning.dropNullColumns(df3, Seq("name")).count() == 4)
    assert(Cleaning.dropNullColumns(df3, Seq("score")).count() == 2)
  }

  test("deduplicate drops full-row duplicates") {
    assert(Cleaning.deduplicate(df3).count() == 3)
  }

  test("deduplicate_columns keeps first by order column") {
    val d = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "b", 3L)).toDF("id", "k", "ord")
    val out = Cleaning.deduplicateColumns(d, Seq("k"), orderColumn = Some("ord"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("standardize_dates coerces unparseable to null") {
    val d = Seq(("2024-01-02 10:00:00", "garbage")).toDF("good", "bad")
    val out = Cleaning.standardizeDates(d, Seq("good", "bad", "missing"))
    assert(out.schema("good").dataType == TimestampType)
    val row = out.head()
    assert(row.get(0) != null && row.get(1) == null)
  }

  test("cast_types is all-or-nothing per column") {
    val d = Seq(("1", "x"), ("2", "3")).toDF("clean", "dirty")
    val out = Cleaning.castTypes(d, Map("clean" -> "int64", "dirty" -> "int64"))
    assert(out.schema("clean").dataType == LongType)   // casts
    assert(out.schema("dirty").dataType == StringType) // kept: 'x' fails
  }

  test("empty config is a no-op") {
    val out = Cleaning(df3, Cleaning.Config())
    assert(out.collect().toSeq == df3.collect().toSeq)
  }

  test("lowercase_columns disabled (or absent) leaves names untouched") {
    val mixed = df3.toDF("Id", "Name", "Score")
    val keepCase = new graft.transformers.Transformers.DataCleaningTransformer(
      Map("strip_whitespace" -> true)).transform(mixed)
    assert(keepCase.columns.toSeq == Seq("Id", "Name", "Score"))
    val lowered = new graft.transformers.Transformers.DataCleaningTransformer(
      Map("lowercase_columns" -> true)).transform(mixed)
    assert(lowered.columns.toSeq == Seq("id", "name", "score"))
  }

  test("standardize_dates skips a missing column instead of failing") {
    val df = Seq((1L, "2024-01-02")).toDF("id", "d")
    val out = Cleaning.standardizeDates(df, Seq("d", "ghost"))
    assert(out.columns.toSeq == Seq("id", "d"))
    assert(out.head().getTimestamp(1) != null)
  }

  test("fixed rule order: rename before dedup-subset") {
    val d = Seq((1L, "a"), (2L, "a")).toDF("id", "k")
    val out = Cleaning(d, Cleaning.Config(
      renameColumns = Map("k" -> "key"),
      deduplicateColumns = Seq("key"),
      orderColumn = Some("id")))
    assert(out.count() == 1)
    assert(out.columns.contains("key"))
  }
}
