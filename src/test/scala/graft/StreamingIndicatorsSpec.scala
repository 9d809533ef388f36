package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IndicatorsStream
import graft.streaming.IndicatorsStream.Bar

/** Streamed indicator values must be BIT-IDENTICAL to the batch operators
  * over the accumulated frame — the contract that lets a pipeline serve the
  * same numbers from its streaming and backfill paths.
  */
class StreamingIndicatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Long) = new java.sql.Timestamp(minute * 60000)

  // deterministic two-symbol walk with both gains and losses
  private val bars: Seq[Bar] =
    for (sym <- Seq("AAA", "BBB"); i <- 0 until 30) yield
      Bar(sym, ts(60 + i), 100.0 + ((i * 37 + sym.hashCode.abs) % 17) - 8.0)

  test("streaming EMA+RSI match the batch operators bit-exactly across micro-batches") {
    val alpha = 2.0 / (10 + 1) // span-10 EMA
    val period = 5
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Bar]
    val q = IndicatorsStream.withIndicators(mem.toDS(), alpha, period).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("ind_stream_test")
      .start()
    // three micro-batches, symbols interleaved — state must carry across
    bars.grouped(20).foreach { chunk => mem.addData(chunk: _*); q.processAllAvailable() }
    val streamed = spark.sql(
        "SELECT symbol, ts, close, ema, rsi FROM ind_stream_test")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2),
        r.getDouble(3), if (r.isNullAt(4)) null else r.getDouble(4): java.lang.Double))
      .toSet
    q.stop()

    val batchDf = bars.toDF()
    val withEma = graft.operators.Ema.withEma(
      batchDf, Seq(graft.operators.Ema.Spec("close", "ema", alpha)),
      orderCols = Seq("ts"), partitionCols = Seq("symbol"))
    val withBoth = graft.operators.Indicators.withRsi(
      withEma, "close", "rsi", period, "ts", Seq("symbol"))
    val batch = withBoth.select("symbol", "ts", "close", "ema", "rsi")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2),
        r.getDouble(3), if (r.isNullAt(4)) null else r.getDouble(4): java.lang.Double))
      .toSet

    assert(streamed.size == bars.size)
    val onlyStream = streamed -- batch
    val onlyBatch = batch -- streamed
    assert(onlyStream.isEmpty && onlyBatch.isEmpty,
      s"stream-only: ${onlyStream.take(3)}; batch-only: ${onlyBatch.take(3)}")
  }
}
