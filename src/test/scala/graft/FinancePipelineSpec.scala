package graft

import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Config, Engine}

/** The reference's flagship finance pipeline end-to-end from the shipped
  * example config: JSON OHLCV → validation → technical indicators → SQL
  * upsert; run twice to prove idempotent upsert (reference
  * `tests/test_finance_transformer.py:321-396` + `tests/test_cli.py:403-472`).
  */
class FinancePipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("finance pipeline: configs/finance_pipeline.yaml runs and upserts idempotently") {
    val cfg = Config.load("configs/finance_pipeline.yaml")
    val engine = new Engine(spark)
    engine.run(cfg)
    def counts(): (Long, Long) = {
      val conn = DriverManager.getConnection("jdbc:derby:memory:financedb;create=true")
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT COUNT(*), COUNT(DISTINCT \"date\") FROM daily_price_features")
        rs.next(); (rs.getLong(1), rs.getLong(2))
      } finally conn.close()
    }
    val (n1, d1) = counts()
    assert(n1 == 71)      // 120 bars − 49 sma_50 warmup rows
    assert(n1 == d1)      // date is the upsert key
    // second run: upsert leaves row count unchanged
    engine.run(cfg)
    val (n2, _) = counts()
    assert(n2 == n1)
    // no NaN/null indicator values reached the sink
    val conn = DriverManager.getConnection("jdbc:derby:memory:financedb;create=true")
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT COUNT(*) FROM daily_price_features WHERE \"sma_50\" IS NULL OR \"rsi_14\" IS NULL OR \"macd\" IS NULL")
      rs.next(); assert(rs.getLong(1) == 0)
    } finally conn.close()
  }
}
