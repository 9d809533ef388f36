package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming technical indicators: the per-symbol recursive smoothing of the
  * batch finance operators ([[graft.operators.Ema]] /
  * [[graft.operators.Indicators]]) carried as keyed O(1) stream state — the
  * form an exchange-feed pipeline runs, where each symbol's bars arrive in
  * order and the indicator must update per tick without re-reading history.
  *
  * The recurrence is EXACTLY the batch pure-recurrence mode
  * (`y ← α·x + (1−α)·y`, seeded with the first value), so on an in-order
  * feed the streamed values are bit-identical to `Ema.withEma` over the
  * accumulated frame — pinned by the parity spec. State per (symbol, spec)
  * is two doubles + a flag; nothing grows with stream length.
  *
  * In-order delivery per key is ASSUMED (exchange feeds are per-symbol
  * ordered; batches sort within themselves). For out-of-order sources,
  * buffer per key behind a watermark with `EventTimeTimeout` — the
  * [[EventsStream.sessionize]] pattern — and fold on timeout instead.
  */
object IndicatorsStream {

  final case class Bar(symbol: String, ts: java.sql.Timestamp, close: Double)
  final case class EmaRsiState(
      ema: Double, emaSeeded: Boolean,
      prevClose: Double, avgGain: Double, avgLoss: Double, nMoves: Long)
  final case class BarOut(
      symbol: String, ts: java.sql.Timestamp, close: Double,
      ema: Double, rsi: Option[Double])

  /** Per-symbol streaming EMA (alpha pure recurrence) + Wilder RSI
    * (period `rsiPeriod`): one output row per input bar, indicator state
    * carried across micro-batches. RSI semantics mirror the batch
    * [[graft.operators.Indicators.withRsi]] BIT-EXACTLY (the parity spec
    * pins it): gain/loss EMAs seeded at the FIRST delta
    * (`ewm(adjust=False)`), RSI masked until `rsiPeriod` deltas
    * (min_periods), all-loss-zero → 100, both-zero → None.
    */
  def withIndicators(
      bars: Dataset[Bar], alpha: Double, rsiPeriod: Int = 14): Dataset[BarOut] = {
    import bars.sparkSession.implicits._
    val rsiAlpha = 1.0 / rsiPeriod
    bars
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (symbol: String, rows: Iterator[Bar], state: GroupState[EmaRsiState]) => {
          var st = state.getOption.getOrElse(
            EmaRsiState(0.0, emaSeeded = false, Double.NaN, 0.0, 0.0, 0L))
          val out = rows.toSeq.sortBy(b => b.ts.getTime).map { b =>
            val ema =
              if (!st.emaSeeded) b.close
              else alpha * b.close + (1.0 - alpha) * st.ema
            var (ag, al, n) = (st.avgGain, st.avgLoss, st.nMoves)
            if (!st.prevClose.isNaN) {
              val diff = b.close - st.prevClose
              val gain = math.max(diff, 0.0)
              val loss = math.max(-diff, 0.0)
              if (n == 0L) { ag = gain; al = loss } // ewm seeds at first delta
              else {
                ag = rsiAlpha * gain + (1.0 - rsiAlpha) * ag
                al = rsiAlpha * loss + (1.0 - rsiAlpha) * al
              }
              n += 1
            }
            val rsi =
              if (n < rsiPeriod) None
              else if (al == 0.0) { if (ag > 0.0) Some(100.0) else None }
              else Some(100.0 - 100.0 / (1.0 + ag / al))
            st = EmaRsiState(ema, emaSeeded = true, b.close, ag, al, n)
            BarOut(symbol, b.ts, b.close, ema, rsi)
          }
          state.update(st)
          out.iterator
        })
  }
}
