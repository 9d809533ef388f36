package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Validation

/** V1 semantics, mirroring `tests/test_pydantic_validation_transformer.py`. */
class ValidationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("user schema drops invalid rows") {
    val users = Seq(
      (1L, "alice", "alice@example.com"),  // valid
      (-5L, "bob", "bob@example.com"),     // id < 1
      (3L, "", "c@example.com"),           // empty name
      (4L, "dave", "not-an-email"),        // bad email
      (5L, "eve", "eve@sub.example.org")   // valid
    ).toDF("id", "name", "email")
    val out = Validation.validate(users, "user")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 5L))
  }

  test("user schema edges: bad/empty email, non-positive id, empty name each reject alone") {
    // fine-grained test_schemas.py parity — one failing predicate per row
    def survives(id: Long, name: String, email: String): Boolean =
      Validation.validate(Seq((id, name, email)).toDF("id", "name", "email"), "user")
        .count() == 1
    assert(survives(1L, "alice", "alice@example.com"))
    assert(!survives(1L, "alice", "not-an-email")) // bad email
    assert(!survives(1L, "alice", ""))             // empty email
    assert(!survives(0L, "alice", "a@b.co"))       // id must be >= 1
    assert(!survives(-3L, "alice", "a@b.co"))
    assert(!survives(1L, "", "a@b.co"))            // empty name
  }

  test("ohlcv edges: zero price rejects, zero volume is accepted") {
    val bars = Seq(
      ("2024-01-01", 0.0, 2.0, 0.5, 1.5, 10.0), // open == 0 → reject
      ("2024-01-02", 1.0, 2.0, 0.5, 0.0, 10.0), // close == 0 → reject
      ("2024-01-03", 1.0, 2.0, 0.5, 1.5, 0.0)   // volume == 0 → VALID
    ).toDF("date", "open", "high", "low", "close", "volume")
    val out = Validation.validate(bars, "ohlcv")
    assert(out.select("date").collect().map(_.getString(0)).toSeq == Seq("2024-01-03"))
  }

  test("empty input frame validates to an empty frame with the schema intact") {
    val empty = Seq.empty[(Long, String, String)].toDF("id", "name", "email")
    val out = Validation.validate(empty, "user")
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "name", "email"))
  }

  test("dotted-path alias resolves like the reference config strings") {
    val users = Seq((1L, "a", "a@b.co")).toDF("id", "name", "email")
    assert(Validation.validate(users, "data_extractor.schemas.user.User").count() == 1)
  }

  test("all-invalid input preserves columns (empty frame keeps schema)") {
    val users = Seq((-1L, "", "nope")).toDF("id", "name", "email")
    val out = Validation.validate(users, "user")
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "name", "email"))
  }

  test("todo schema enforces userId/id >= 1, title length, completed non-null") {
    val todos = Seq(
      (1L, 1L, "do it", Some(true)),
      (0L, 2L, "x", Some(false)),   // userId < 1
      (2L, 3L, "", Some(true)),     // empty title
      (3L, 4L, "y", None)           // completed null
    ).toDF("userId", "id", "title", "completed")
    assert(Validation.validate(todos, "todo").count() == 1)
  }

  test("ohlcv schema requires positive prices and non-negative volume") {
    val bars = Seq(
      ("2024-01-01", 1.0, 2.0, 0.5, 1.5, 0.0),   // valid
      ("2024-01-02", -1.0, 2.0, 0.5, 1.5, 10.0), // open <= 0
      ("2024-01-03", 1.0, 2.0, 0.5, 1.5, -1.0)   // volume < 0
    ).toDF("date", "open", "high", "low", "close", "volume")
    assert(Validation.validate(bars, "ohlcv").count() == 1)
  }

  test("unknown schema raises with available list") {
    val e = intercept[IllegalArgumentException] {
      Validation.validate(Seq((1L)).toDF("id"), "nope")
    }
    assert(e.getMessage.contains("Available:"))
  }
}
