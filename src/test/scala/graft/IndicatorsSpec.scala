package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Ema, Indicators}

/** EMA recursion + indicator invariants, mirroring the reference's
  * `tests/test_finance_transformer.py` numeric assertions on seeded
  * synthetic data.
  */
class IndicatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic synthetic daily bars (like the reference's rng(42) walk). */
  private def bars(n: Int): Seq[(String, Double, Double, Double, Double, Double)] = {
    var price = 100.0
    (0 until n).map { i =>
      val step = math.sin(i * 1.7) * 2.0 + math.cos(i * 0.3)
      price = math.max(1.0, price + step)
      val date = java.time.LocalDate.of(2023, 1, 1).plusDays(i).toString
      (date, price - 0.5, price + 1.0, price - 1.0, price, 1000.0 + i)
    }
  }

  private def barsDf(n: Int) =
    bars(n).toDF("date", "open", "high", "low", "close", "volume")

  test("Ema.withEma matches the hand-rolled recurrence, seeds y0=x0") {
    val xs = Seq(10.0, 12.0, 11.0, 15.0, 14.0)
    val df = xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("i", "x")
    val out = Ema.withEma(df, Seq(Ema.Spec("x", "ema", 0.5, 0)), Seq("i"))
      .orderBy("i").select("ema").as[Double].collect()
    var y = xs.head
    val expected = xs.zipWithIndex.map { case (x, i) => if (i == 0) { y = x; y } else { y = 0.5 * x + 0.5 * y; y } }
    assert(out.toSeq == expected)
  }

  test("Ema ignoreNa=false reproduces pandas ignore_na=False gap re-weighting bit-exactly") {
    // ground truth: pandas 2.x  s.ewm(alpha=…, adjust=False, ignore_na=False,
    // min_periods=…).mean()  over  [2.0, NaN, 4.0, 1.0, NaN, NaN, 8.0]
    val xs: Seq[java.lang.Double] = Seq(2.0, null, 4.0, 1.0, null, null, 8.0)
    val df = xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("i", "x")

    def run(alpha: Double, minP: Int): Seq[java.lang.Double] =
      Ema.withEma(df, Seq(Ema.Spec("x", "ema", alpha, minP)), Seq("i"), ignoreNa = false)
        .orderBy("i").select("ema").collect()
        .map(r => if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))).toSeq

    assert(run(0.5, 1) == Seq[java.lang.Double](
      2.0, 2.0, 3.3333333333333335, 2.166666666666667,
      2.166666666666667, 2.166666666666667, 6.833333333333333))
    assert(run(0.5, 3) == Seq[java.lang.Double](
      null, null, null, 2.166666666666667,
      2.166666666666667, 2.166666666666667, 6.833333333333333))
    assert(run(1.0 / 14.0, 1) == Seq[java.lang.Double](
      2.0, 2.0, 2.153005464480874, 2.070647931303669,
      2.070647931303669, 2.070647931303669, 2.5562948203402263))

    // gap-free series: both modes reduce to the pure recurrence (pandas parity)
    val clean = Seq(2.0, 4.0, 1.0, 8.0).zipWithIndex.map { case (x, i) => (i, x) }.toDF("i", "x")
    def mode(ign: Boolean) =
      Ema.withEma(clean, Seq(Ema.Spec("x", "ema", 1.0 / 14.0, 0)), Seq("i"), ignoreNa = ign)
        .orderBy("i").select("ema").as[Double].collect().toSeq
    assert(mode(true) == mode(false))
    assert(mode(false) == Seq(2.0, 2.142857142857143, 2.0612244897959187, 2.4854227405247817))
  }

  test("Ema minPeriods masks early outputs but recursion still advances") {
    val df = Seq((0, 1.0), (1, 2.0), (2, 3.0)).toDF("i", "x")
    val out = Ema.withEma(df, Seq(Ema.Spec("x", "ema", 0.5, 3)), Seq("i"))
      .orderBy("i").select("ema").collect().map(r => Option(r.get(0)))
    assert(out(0).isEmpty && out(1).isEmpty)
    assert(out(2).contains(0.5 * 3.0 + 0.5 * (0.5 * 2.0 + 0.5 * 1.0)))
  }

  test("Ema resets state per partition key") {
    val df = Seq(("a", 0, 10.0), ("a", 1, 20.0), ("b", 0, 100.0), ("b", 1, 200.0))
      .toDF("k", "i", "x")
    val out = Ema.withEma(df, Seq(Ema.Spec("x", "ema", 0.5, 0)), Seq("i"), Seq("k"))
      .orderBy("k", "i").select("ema").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 15.0, 100.0, 150.0))
  }

  test("technicalIndicators: output columns hardcoded regardless of periods") {
    val out = Indicators.technicalIndicators(barsDf(80),
      Indicators.Config(smaPeriod = 5, rsiPeriod = 5, bbPeriod = 5))
    val expected = Seq("sma_50", "rsi_14", "bb_upper", "bb_lower", "macd", "macd_signal", "macd_histogram")
    assert(expected.forall(out.columns.contains))
  }

  test("technicalIndicators invariants on 120 bars") {
    val out = Indicators.technicalIndicators(barsDf(120)).cache()
    val n = out.count()
    // warmup dropped: longest warmup is sma_50 → 120-49 = 71 rows survive
    assert(n == 71)
    // no nulls in any indicator column
    val indCols = Seq("sma_50", "rsi_14", "bb_upper", "bb_lower", "macd", "macd_signal", "macd_histogram")
    indCols.foreach(c => assert(out.filter(col(c).isNull).count() == 0, s"nulls in $c"))
    // RSI in [0, 100]
    assert(out.filter(col("rsi_14") < 0 || col("rsi_14") > 100).count() == 0)
    // Bollinger band ordering
    assert(out.filter(col("bb_upper") <= col("bb_lower")).count() == 0)
    // histogram identity to 1e-10
    assert(out.filter(abs(col("macd_histogram") - (col("macd") - col("macd_signal"))) > 1e-10).count() == 0)
    // dates re-emitted as ISO-8601 Z strings, sorted ascending
    val dates = out.select("date").as[String].collect()
    assert(dates.forall(_.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z""")))
    assert(dates.toSeq == dates.toSeq.sorted)
    // SMA spot check: last sma_50 == mean of last 50 closes
    val closes = bars(120).map(_._5)
    val expectSma = closes.takeRight(50).sum / 50.0
    val gotSma = out.orderBy(desc("date")).select("sma_50").as[Double].head()
    assert(math.abs(gotSma - expectSma) < 1e-9)
    out.unpersist()
  }

  test("technicalIndicators coerces string numerics") {
    val d = bars(80).map(t => (t._1, t._2.toString, t._3.toString, t._4.toString, t._5.toString, t._6.toString))
      .toDF("date", "open", "high", "low", "close", "volume")
    val out = Indicators.technicalIndicators(d)
    assert(out.count() == 31)
    assert(out.schema("close").dataType == org.apache.spark.sql.types.DoubleType)
  }

  test("withAtr matches the hand-rolled Wilder TR recurrence with min_periods masking") {
    val d = barsDf(30)
    val out = Indicators.withAtr(d, "high", "low", "close", "atr", 14, "date")
      .orderBy("date")
      .collect().map(r => if (r.isNullAt(r.fieldIndex("atr"))) null
        else java.lang.Double.valueOf(r.getAs[Double]("atr")))
    val bs = bars(30)
    val alpha = 1.0 / 14.0
    var atr = 0.0
    val expected = bs.zipWithIndex.map { case ((_, _, h, l, c, _), i) =>
      val tr = if (i == 0) h - l
        else math.max(h - l, math.max(math.abs(h - bs(i - 1)._5), math.abs(l - bs(i - 1)._5)))
      atr = if (i == 0) tr else alpha * tr + (1.0 - alpha) * atr
      if (i >= 13) java.lang.Double.valueOf(atr) else null
    }
    assert(out.toSeq == expected)
  }

  test("withVwap: exact window ratio, null until full window, zero-volume guard") {
    val d = barsDf(10)
    val out = Indicators.withVwap(d, "close", "volume", "vwap", 3, "date")
      .orderBy("date").collect()
    val bs = bars(10)
    out.zipWithIndex.foreach { case (r, i) =>
      if (i < 2) assert(r.isNullAt(r.fieldIndex("vwap")))
      else {
        val win = bs.slice(i - 2, i + 1)
        val want = win.map(b => b._5 * b._6).sum / win.map(_._6).sum
        assert(r.getAs[Double]("vwap") == want)
      }
    }
    // all-zero volume window → null, not a division throw
    val z = Seq(("2023-01-01", 5.0, 0.0), ("2023-01-02", 6.0, 0.0))
      .toDF("date", "close", "volume")
    val g = Indicators.withVwap(z, "close", "volume", "vwap", 2, "date")
      .orderBy("date").collect()
    assert(g.forall(_.isNullAt(g.head.fieldIndex("vwap"))))
  }

  test("withCci: exact rational CCI, sign split, constant-window NULL, warmup") {
    // period 3 over 1,2,3,4: both full windows sit at the upper band edge
    // → CCI = +100 (centi 10000); decreasing series mirrors to −10000
    val up = Seq(("d1", 1L), ("d2", 2L), ("d3", 3L), ("d4", 4L))
      .toDF("d", "tp")
    val r = Indicators.withCci(up, "tp", "cci", 3, "d").orderBy("d").collect()
    assert(r(0).isNullAt(2) && r(1).isNullAt(2)) // warmup rows
    assert(r(2).getLong(2) == 10000L && r(3).getLong(2) == 10000L)
    val down = Seq(("d1", 4L), ("d2", 3L), ("d3", 2L), ("d4", 1L))
      .toDF("d", "tp")
    val s = Indicators.withCci(down, "tp", "cci", 3, "d").orderBy("d").collect()
    assert(s(2).getLong(2) == -10000L && s(3).getLong(2) == -10000L)
    // constant window → MAD = 0 → NULL, not a divide throw
    val const = Seq(("d1", 5L), ("d2", 5L), ("d3", 5L)).toDF("d", "tp")
    val c = Indicators.withCci(const, "tp", "cci", 3, "d").orderBy("d").collect()
    assert(c.forall(_.isNullAt(2)))
  }

  test("withAdx: hand-replayed two-stage Wilder recursion, warmup gating, flat-series guard") {
    val period = 2
    val a = 1.0 / period
    val hs = Seq(10.0, 12.0, 11.0, 13.0, 14.0, 12.0, 15.0, 16.0)
    val ls = Seq(8.0, 9.0, 7.0, 10.0, 12.0, 9.0, 13.0, 14.0)
    val cs = Seq(9.0, 11.0, 8.0, 12.0, 13.0, 10.0, 14.0, 15.0)
    val df = hs.indices.map(i => (f"d$i%02d", hs(i), ls(i), cs(i)))
      .toDF("d", "h", "l", "c")
    val out = Indicators.withAdx(df, "h", "l", "c", "adx", period, "d")
      .orderBy("d").collect()

    // Independent scalar replay of the exact double recursion.
    var (str, spdm, smdm, adx) = (0.0, 0.0, 0.0, 0.0)
    var (seenS, seenA) = (0, 0)
    val expect = hs.indices.map { i =>
      if (i == 0) (None, None, None, None)
      else {
        val tr = math.max(hs(i) - ls(i),
          math.max(math.abs(hs(i) - cs(i - 1)), math.abs(ls(i) - cs(i - 1))))
        val up = hs(i) - hs(i - 1); val dn = ls(i - 1) - ls(i)
        val pdm = if (up > dn && up > 0.0) up else 0.0
        val mdm = if (dn > up && dn > 0.0) dn else 0.0
        if (seenS == 0) { str = tr; spdm = pdm; smdm = mdm }
        else {
          str = a * tr + (1.0 - a) * str
          spdm = a * pdm + (1.0 - a) * spdm
          smdm = a * mdm + (1.0 - a) * smdm
        }
        seenS += 1
        if (seenS < period) (None, None, None, None)
        else {
          val pdi = 100.0 * spdm / str
          val mdi = 100.0 * smdm / str
          val dx = if (pdi + mdi != 0.0)
            Some(100.0 * math.abs(pdi - mdi) / (pdi + mdi)) else None
          dx.foreach { d =>
            if (seenA == 0) adx = d else adx = a * d + (1.0 - a) * adx
            seenA += 1
          }
          val adxOut = if (seenA >= period) Some(adx) else None
          (Some(pdi), Some(mdi), dx, adxOut)
        }
      }
    }
    def cell(r: org.apache.spark.sql.Row, c: String): Option[Double] = {
      val i = r.fieldIndex(c); if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }
    hs.indices.foreach { i =>
      val r = out(i)
      assert(cell(r, "adx_pdi") == expect(i)._1, s"pdi row $i")
      assert(cell(r, "adx_mdi") == expect(i)._2, s"mdi row $i")
      assert(cell(r, "adx_dx") == expect(i)._3, s"dx row $i")
      assert(cell(r, "adx_adx") == expect(i)._4, s"adx row $i")
    }
    // warmup gating: ±DI first at row period (0-based), ADX at 2·period − 1
    assert(out.take(period).forall(_.isNullAt(out.head.fieldIndex("adx_pdi"))))
    assert(out.take(2 * period - 1).forall(_.isNullAt(out.head.fieldIndex("adx_adx"))))
    assert(!out(2 * period - 1).isNullAt(out.head.fieldIndex("adx_adx")))

    // flat series: TR = 0 forever → smoothed TR = 0 → ±DI NULL (guarded), not ±Inf
    val flat = (0 until 5).map(i => (f"d$i%02d", 5.0, 5.0, 5.0)).toDF("d", "h", "l", "c")
    val f = Indicators.withAdx(flat, "h", "l", "c", "adx", period, "d")
      .orderBy("d").collect()
    Seq("adx_pdi", "adx_mdi", "adx_dx", "adx_adx").foreach { c =>
      assert(f.forall(_.isNullAt(f.head.fieldIndex(c))), s"flat $c")
    }
  }

  test("withPsar: hand-replayed SAR state machine with reversals, warmup NULL") {
    // up-run, sharp drop (uptrend reversal), down-run, pop (downtrend reversal)
    val hs = Seq(10.0, 12.0, 13.0, 14.0, 9.0, 8.0, 7.0, 12.0, 13.0)
    val ls = Seq(9.0, 10.0, 11.0, 12.0, 7.0, 6.0, 5.0, 10.0, 11.0)
    val df = hs.indices.map(i => (f"d$i%02d", hs(i), ls(i))).toDF("d", "h", "l")
    val out = Indicators.withPsar(df, "h", "l", "psar", "d").orderBy("d").collect()

    val (af0, step, afMax) = (0.02, 0.02, 0.2)
    var (trend, sar, ep, af, ph, pl) = (true, ls(0), hs(0), af0, hs(0), ls(0))
    val expect = hs.indices.map { i =>
      if (i == 0) None
      else {
        val raw = sar + af * (ep - sar)
        val clamped = if (trend) math.min(raw, pl) else math.max(raw, ph)
        val revUp = trend && ls(i) < clamped
        val revDn = !trend && hs(i) > clamped
        val rev = revUp || revDn
        val nTrend = if (revUp) false else if (revDn) true else trend
        val nSar = if (rev) ep else clamped
        val nEp =
          if (revUp) ls(i) else if (revDn) hs(i)
          else if (trend) math.max(ep, hs(i)) else math.min(ep, ls(i))
        val epImp = !rev && (if (trend) hs(i) > ep else ls(i) < ep)
        val nAf = if (rev) af0 else if (epImp) math.min(af + step, afMax) else af
        trend = nTrend; sar = nSar; ep = nEp; af = nAf; ph = hs(i); pl = ls(i)
        Some((sar, trend))
      }
    }
    hs.indices.foreach { i =>
      val r = out(i)
      val si = r.fieldIndex("psar_sar"); val ui = r.fieldIndex("psar_up")
      expect(i) match {
        case None =>
          assert(r.isNullAt(si) && r.isNullAt(ui), s"warmup row $i")
        case Some((s, u)) =>
          assert(r.getDouble(si) == s, s"sar row $i")
          assert(r.getBoolean(ui) == u, s"trend row $i")
      }
    }
    // the series must actually exercise both reversal branches
    val ups = out.drop(1).map(_.getBoolean(out.head.fieldIndex("psar_up")))
    assert(ups.contains(true) && ups.contains(false))

    // null bars leave state untouched and emit null
    val withNull = Seq(("d0", Some(10.0), Some(9.0)), ("d1", None, None),
      ("d2", Some(12.0), Some(10.0)))
      .toDF("d", "h", "l")
    val g = Indicators.withPsar(withNull, "h", "l", "psar", "d").orderBy("d").collect()
    assert(g(1).isNullAt(g.head.fieldIndex("psar_sar")))
    assert(!g(2).isNullAt(g.head.fieldIndex("psar_sar")))
  }

  test("withSupertrend: hand-replayed ATR + final-band recursion, trend flips, warmup") {
    val period = 2; val mult = 2.0; val a = 1.0 / period
    // rise, spike down (flip), recover (flip back)
    val hs = Seq(11.0, 12.0, 13.0, 14.0, 8.0, 7.5, 13.0, 15.0, 16.0)
    val ls = Seq(9.0, 10.0, 11.0, 12.0, 6.0, 6.0, 11.0, 13.0, 14.0)
    val cs = Seq(10.0, 11.0, 12.0, 13.0, 7.0, 6.5, 12.0, 14.0, 15.0)
    val df = hs.indices.map(i => (f"d$i%02d", hs(i), ls(i), cs(i)))
      .toDF("d", "h", "l", "c")
    val out = Indicators.withSupertrend(df, "h", "l", "c", "st", period, mult, "d")
      .orderBy("d").collect()

    var satr = 0.0; var seenA = 0
    var (fub, flb, up, pc) = (0.0, 0.0, false, 0.0)
    var seenS = 0
    val expect = hs.indices.map { i =>
      if (i == 0) None
      else {
        val tr = math.max(hs(i) - ls(i),
          math.max(math.abs(hs(i) - cs(i - 1)), math.abs(ls(i) - cs(i - 1))))
        if (seenA == 0) satr = tr else satr = a * tr + (1.0 - a) * satr
        seenA += 1
        if (seenA < period) None
        else {
          val bub = (hs(i) + ls(i)) / 2.0 + mult * satr
          val blb = (hs(i) + ls(i)) / 2.0 - mult * satr
          if (seenS == 0) { fub = bub; flb = blb; up = cs(i) > bub }
          else {
            val nfub = if (bub < fub || pc > fub) bub else fub
            val nflb = if (blb > flb || pc < flb) blb else flb
            up = if (up) !(cs(i) < nflb) else cs(i) > nfub
            fub = nfub; flb = nflb
          }
          pc = cs(i); seenS += 1
          Some((fub, flb, if (up) flb else fub, up))
        }
      }
    }
    hs.indices.foreach { i =>
      val r = out(i)
      def cell(c: String): Option[Double] = {
        val ix = r.fieldIndex(c); if (r.isNullAt(ix)) None else Some(r.getDouble(ix))
      }
      expect(i) match {
        case None =>
          assert(r.isNullAt(r.fieldIndex("st_line")), s"warmup row $i")
        case Some((f, fl, line, u)) =>
          assert(cell("st_fub").contains(f), s"fub row $i")
          assert(cell("st_flb").contains(fl), s"flb row $i")
          assert(cell("st_line").contains(line), s"line row $i")
          assert(r.getBoolean(r.fieldIndex("st_up")) == u, s"up row $i")
      }
    }
    // the fixture must exercise both flip directions
    val ups = out.drop(period).map(_.getBoolean(out.head.fieldIndex("st_up")))
    assert(ups.contains(true) && ups.contains(false))
  }

  test("withTrix: hand-replayed fused triple-EMA recursion, first-row null, zero guard") {
    val cs = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 18.0, 13.0, 20.0)
    val df = cs.indices.map(i => (f"d$i%02d", cs(i))).toDF("d", "c")
    val out = Indicators.withTrix(df, "c", "trix", 15, "d").orderBy("d").collect()

    // Independent scalar replay: one pass carrying (e1, e2, e3) — e2
    // consumes the CURRENT step's e1, e3 the current e2 (adjust=False,
    // seeded at the first close), exactly the fused-state oracle shape.
    val a = 0.125; val b = 0.875
    var (e1, e2, e3) = (cs.head, cs.head, cs.head)
    var pe3 = Option.empty[Double]
    val expect = cs.indices.map { i =>
      if (i > 0) {
        pe3 = Some(e3)
        e1 = a * cs(i) + b * e1
        e2 = a * e1 + b * e2
        e3 = a * e2 + b * e3
      }
      val trix = pe3.collect { case p if p != 0.0 => 100.0 * (e3 - p) / p }
      (e3, trix)
    }
    cs.indices.foreach { i =>
      val r = out(i)
      assert(r.getDouble(r.fieldIndex("trix_e3")) == expect(i)._1, s"e3 row $i")
      val ix = r.fieldIndex("trix")
      val got = if (r.isNullAt(ix)) None else Some(r.getDouble(ix))
      assert(got == expect(i)._2, s"trix row $i")
    }
    assert(out.head.isNullAt(out.head.fieldIndex("trix"))) // no lag on row 1

    // constant series: e3 constant -> trix exactly 0.0 from row 2
    val const = (0 until 4).map(i => (f"d$i%02d", 7.0)).toDF("d", "c")
    val k = Indicators.withTrix(const, "c", "trix", 15, "d").orderBy("d").collect()
    assert(k.drop(1).forall(r => r.getDouble(r.fieldIndex("trix")) == 0.0))

    // zero-valued e3 lag: division guarded -> null, not Inf/NaN
    val zero = Seq(("d00", 0.0), ("d01", 0.0), ("d02", 8.0), ("d03", 8.0))
      .toDF("d", "c")
    val z = Indicators.withTrix(zero, "c", "trix", 15, "d").orderBy("d").collect()
    // rows 1 AND 2 guard on a zero lagged e3; row 3's lag is positive
    assert(z(1).isNullAt(z(1).fieldIndex("trix")))
    assert(z(2).isNullAt(z(2).fieldIndex("trix")))
    assert(!z(3).isNullAt(z(3).fieldIndex("trix")))

    // per-symbol partitioning: each key replays independently
    val two = Seq(("A", "d0", 10.0), ("A", "d1", 12.0),
      ("B", "d0", 5.0), ("B", "d1", 4.0)).toDF("sym", "d", "c")
    val t = Indicators.withTrix(two, "c", "trix", 15, "d", Seq("sym"))
      .orderBy("sym", "d").collect()
    assert(t(0).isNullAt(t(0).fieldIndex("trix")) && t(2).isNullAt(t(2).fieldIndex("trix")))
    assert(t(1).getDouble(t(1).fieldIndex("trix")) > 0.0)
    assert(t(3).getDouble(t(3).fieldIndex("trix")) < 0.0)
  }

  test("withAroon: recency in bp, ties pin to most recent bar, warmup nulls") {
    val hs = Seq(5L, 9L, 9L, 7L, 6L, 10L)
    val ls = Seq(1L, 2L, 1L, 3L, 4L, 5L)
    val df = hs.indices.map(i => (f"d$i%02d", hs(i), ls(i))).toDF("d", "h", "l")
    val out = Indicators.withAroon(df, "h", "l", "ar", 3, "d").orderBy("d").collect()
    def cell(i: Int, c: String): Option[Long] = {
      val ix = out(i).fieldIndex(c)
      if (out(i).isNullAt(ix)) None else Some(out(i).getLong(ix))
    }
    // warmup: first 3 rows have no full 4-bar window
    (0 to 2).foreach(i => assert(cell(i, "ar_up").isEmpty && cell(i, "ar_dn").isEmpty))
    // row 3: high 9 tied at rows 1,2 -> most recent (row 2) -> 1 bar ago;
    // low 1 tied at rows 0,2 -> row 2 -> 1 bar ago
    assert(cell(3, "ar_up").contains((3L - 1) * 10000 / 3))
    assert(cell(3, "ar_dn").contains((3L - 1) * 10000 / 3))
    assert(cell(3, "ar_osc").contains(0L))
    // row 4: extremes both 2 bars ago
    assert(cell(4, "ar_up").contains((3L - 2) * 10000 / 3))
    assert(cell(4, "ar_dn").contains((3L - 2) * 10000 / 3))
    // row 5: new high THIS bar (10000), low left the window entirely -> min
    // of the window is 3 bars ago -> 0
    assert(cell(5, "ar_up").contains(10000L))
    assert(cell(5, "ar_dn").contains(0L))
    assert(cell(5, "ar_osc").contains(10000L))

    // per-symbol independence
    val two = (hs.indices.map(i => ("A", f"d$i%02d", hs(i), ls(i))) ++
      hs.indices.map(i => ("B", f"d$i%02d", 100L + i, 50L - i)))
      .toDF("sym", "d", "h", "l")
    val t = Indicators.withAroon(two, "h", "l", "ar", 3, "d", Seq("sym"))
      .filter($"sym" === "B").orderBy("d").collect()
    // B: strictly rising highs -> up always 10000 once warm; strictly
    // falling lows -> dn always 10000 once warm
    (3 to 5).foreach { i =>
      assert(t(i).getLong(t(i).fieldIndex("ar_up")) == 10000L)
      assert(t(i).getLong(t(i).fieldIndex("ar_dn")) == 10000L)
    }
  }

  test("withVortex: hand-computed window ratios, warmup/flat guards") {
    // integer bars; period 3 -> first defined at row 3 (three TR terms)
    val hs = Seq(10L, 12L, 11L, 14L, 13L)
    val ls = Seq(8L, 9L, 7L, 10L, 11L)
    val cs = Seq(9L, 11L, 8L, 12L, 12L)
    val df = hs.indices.map(i => (f"d$i%02d", hs(i), ls(i), cs(i)))
      .toDF("d", "h", "l", "c")
    val out = Indicators.withVortex(df, "h", "l", "c", "vi", 3, "d")
      .orderBy("d").collect()
    def cell(i: Int, c: String): Option[Long] = {
      val ix = out(i).fieldIndex(c)
      if (out(i).isNullAt(ix)) None else Some(out(i).getLong(ix))
    }
    // scalar replay
    val vmp = hs.indices.map(i => if (i == 0) None else Some(math.abs(hs(i) - ls(i - 1))))
    val vmm = hs.indices.map(i => if (i == 0) None else Some(math.abs(ls(i) - hs(i - 1))))
    val tr = hs.indices.map(i => if (i == 0) None else Some(
      math.max(hs(i) - ls(i), math.max(math.abs(hs(i) - cs(i - 1)), math.abs(ls(i) - cs(i - 1))))))
    (0 until hs.length).foreach { i =>
      if (i < 3) assert(cell(i, "vi_plus_bp").isEmpty, s"warmup row $i")
      else {
        val idx = (i - 2) to i
        val vps = idx.map(vmp(_).get).sum; val vms = idx.map(vmm(_).get).sum
        val trs = idx.map(tr(_).get).sum
        assert(cell(i, "vi_plus_bp").contains(vps * 10000 / trs), s"row $i")
        assert(cell(i, "vi_minus_bp").contains(vms * 10000 / trs), s"row $i")
      }
    }
    // flat series: TR = 0 everywhere -> guarded NULL, no division throw
    val flat = (0 until 5).map(i => (f"d$i%02d", 5L, 5L, 5L)).toDF("d", "h", "l", "c")
    val f = Indicators.withVortex(flat, "h", "l", "c", "vi", 3, "d").collect()
    assert(f.forall(_.isNullAt(f.head.fieldIndex("vi_plus_bp"))))
  }

  test("withHolt: hand-replayed coupled level/trend recursion, seed row, NULL passthrough, per-key") {
    val cs = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 18.0, 13.0, 20.0)
    val df = cs.indices.map(i => (f"d$i%02d", cs(i))).toDF("d", "c")
    val out = Indicators.withHolt(df, "c", "holt", 0.5, 0.25, "d")
      .orderBy("d").collect()

    // Independent scalar replay of the pinned IEEE sequence: seed (l=y,
    // b=0, fitted null), then l' = α·y + (1−α)·(l+b),
    // b' = β·(l'−l) + (1−β)·b, fitted = old l + old b.
    var l = cs.head; var b = 0.0
    val expect = cs.indices.map { i =>
      if (i == 0) (l, b, Option.empty[Double])
      else {
        val fit = l + b
        val nl = 0.5 * cs(i) + 0.5 * (l + b)
        val nb = 0.25 * (nl - l) + 0.75 * b
        l = nl; b = nb
        (l, b, Some(fit))
      }
    }
    cs.indices.foreach { i =>
      val r = out(i)
      assert(r.getDouble(r.fieldIndex("holt_level")) == expect(i)._1, s"level row $i")
      assert(r.getDouble(r.fieldIndex("holt_trend")) == expect(i)._2, s"trend row $i")
      val ix = r.fieldIndex("holt_fitted")
      val got = if (r.isNullAt(ix)) None else Some(r.getDouble(ix))
      assert(got == expect(i)._3, s"fitted row $i")
    }

    // constant series: level stays at the constant, trend exactly 0,
    // fitted equals the constant from row 2
    val const = (0 until 5).map(i => (f"d$i%02d", 7.0)).toDF("d", "c")
    val k = Indicators.withHolt(const, "c", "holt", 0.5, 0.25, "d")
      .orderBy("d").collect()
    assert(k.forall(r => r.getDouble(r.fieldIndex("holt_level")) == 7.0))
    assert(k.forall(r => r.getDouble(r.fieldIndex("holt_trend")) == 0.0))
    assert(k.drop(1).forall(r => r.getDouble(r.fieldIndex("holt_fitted")) == 7.0))

    // NULL input mid-series: state untouched, row emits NULL, next row
    // resumes from the carried state
    val withNull = Seq(("d00", Some(10.0)), ("d01", Some(12.0)),
      ("d02", None), ("d03", Some(14.0))).toDF("d", "c")
    val z = Indicators.withHolt(withNull, "c", "holt", 0.5, 0.25, "d")
      .orderBy("d").collect()
    assert(z(2).isNullAt(z(2).fieldIndex("holt_level")))
    // replay: seed(10,0); d01: l=11, b=0.25; d03 consumes (11, 0.25)
    val l3 = 0.5 * 14.0 + 0.5 * (11.0 + 0.25)
    assert(z(3).getDouble(z(3).fieldIndex("holt_level")) == l3)
    assert(z(3).getDouble(z(3).fieldIndex("holt_fitted")) == 11.0 + 0.25)

    // per-key: each symbol replays independently (B's seed is its own)
    val two = Seq(("A", "d0", 10.0), ("A", "d1", 12.0),
      ("B", "d0", 5.0), ("B", "d1", 4.0)).toDF("sym", "d", "c")
    val t = Indicators.withHolt(two, "c", "holt", 0.5, 0.25, "d", Seq("sym"))
      .orderBy("sym", "d").collect()
    assert(t(1).getDouble(t(1).fieldIndex("holt_trend")) > 0.0)
    assert(t(3).getDouble(t(3).fieldIndex("holt_trend")) < 0.0)
    assert(t(2).getDouble(t(2).fieldIndex("holt_level")) == 5.0)
  }

  test("w23 rolling beta: scalar replay of the last full window") {
    val dir = "/root/testdata/sf0.01"
    val rows = graft.queries.WindowQueries.w23RollingBeta.run(spark, dir)
      .collect()
    assert(rows.length >= 30, "need at least one full window")
    // rebuild the joined series exactly as the query does
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val bars = graft.Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("sym"), to_date(col("o_orderdate")).as("d"))
      .agg(floor(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double") / 100.0)
        .cast(LongType).as("close"))
    val x = bars.filter($"sym" === "1-URGENT").select($"d", $"close".as("xv"))
    val y = bars.filter($"sym" === "3-MEDIUM").select($"d", $"close".as("yv"))
    val series = x.join(y, "d").orderBy("d")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val win = series.takeRight(30)
    val n = BigInt(30)
    val sx = win.map(t => BigInt(t._1)).sum; val sy = win.map(t => BigInt(t._2)).sum
    val sxx = win.map(t => BigInt(t._1) * t._1).sum
    val sxy = win.map(t => BigInt(t._1) * t._2).sum
    val den = n * sxx - sx * sx
    val want = (n * sxy - sx * sy) * 1000 / den // BigInt / truncates toward zero for positive den
    val last = rows.last
    assert(!last.isNullAt(1))
    assert(BigInt(last.getLong(1)) == want, s"beta ${last.getLong(1)} != $want")
  }

  test("withUlcer: hand-computed drawdowns and quadratic mean, warmup nulls, per-key") {
    import spark.implicits._
    // period=2 trailing window; closes 10, 8, 12, 6
    val df = Seq(("a", "d1", 10L), ("a", "d2", 8L), ("a", "d3", 12L),
      ("a", "d4", 6L), ("b", "d1", 5L)).toDF("sym", "d", "c")
    val out = Indicators.withUlcer(df, "c", "u", 2, "d", Seq("sym"))
      .orderBy("sym", "d").collect()
    val a = out.filter(_.getString(0) == "a")
    def dd(r: org.apache.spark.sql.Row) =
      if (r.isNullAt(r.fieldIndex("u_dd_bp"))) None else Some(r.getLong(r.fieldIndex("u_dd_bp")))
    def ui(r: org.apache.spark.sql.Row) =
      if (r.isNullAt(r.fieldIndex("u_ui"))) None else Some(r.getDouble(r.fieldIndex("u_ui")))
    // rn1: no full window; rn2: rm=10 dd=(10-8)*10000 div 10=2000;
    // rn3: rm=12 dd=0; rn4: rm=12 dd=(12-6)*10000 div 12=5000
    assert(a.map(dd).toSeq == Seq(None, Some(2000L), Some(0L), Some(5000L)))
    // ui needs 2 drawdowns: rn3 sqrt((2000^2+0)/2), rn4 sqrt((0+5000^2)/2)
    assert(a.map(ui).toSeq == Seq(None, None,
      Some(math.sqrt(4000000.0 / 2.0)), Some(math.sqrt(25000000.0 / 2.0))))
    // key isolation: the single-row symbol never reaches a full window
    val b = out.filter(_.getString(0) == "b")
    assert(b.length == 1 && dd(b.head).isEmpty && ui(b.head).isEmpty)
  }

  test("withCmf: hand-computed money flow, flat-bar zero, toward-zero negative div") {
    import spark.implicits._
    val df = Seq(
      ("a", "d1", 10L, 6L, 9L, 5L),  // mfv = (18-16)*1e4*5 div 4 = 25000
      ("a", "d2", 8L, 8L, 8L, 3L),   // flat bar -> mfv = 0
      ("a", "d3", 13L, 6L, 9L, 3L))  // mfv = (-1*30000) div 7 = -4285 (toward zero)
      .toDF("sym", "d", "h", "l", "c", "v")
    val out = Indicators.withCmf(df, "h", "l", "c", "v", "cmf", 2, "d", Seq("sym"))
      .orderBy("d").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("cmf"))) // warmup
    assert(out(1).getLong(out(1).fieldIndex("cmf")) == 25000L / 8L) // 3125
    // window: (0 + -4285) div 6 = -714 (toward zero, not floor's -715)
    assert(out(2).getLong(out(2).fieldIndex("cmf")) == -714L)
  }

  test("withHoltWinters: hand-replayed triple recursion with seasonal rotation, seed, NULL passthrough") {
    import spark.implicits._
    // period 3 so the rotation wraps twice in 8 rows
    val cs = Seq(10.0, 14.0, 12.0, 16.0, 11.0, 15.0, 13.0, 17.0)
    val df = cs.indices.map(i => (f"d$i%02d", cs(i))).toDF("d", "c")
    val out = Indicators.withHoltWinters(df, "c", "hw", 0.5, 0.25, 0.5, 3, "d")
      .orderBy("d").collect()
    // independent scalar replay of the pinned IEEE sequence
    var l = cs.head; var b = 0.0; var s = Array(0.0, 0.0, 0.0)
    cs.indices.foreach { i =>
      var snew = 0.0; var fitted = Option.empty[Double]
      if (i > 0) {
        val sold = s(0)
        fitted = Some(l + b + sold)
        val nl = 0.5 * (cs(i) - sold) + 0.5 * (l + b)
        val nb = 0.25 * (nl - l) + 0.75 * b
        snew = 0.5 * (cs(i) - (l + b)) + 0.5 * sold
        l = nl; b = nb; s = Array(s(1), s(2), snew)
      }
      val r = out(i)
      assert(r.getDouble(r.fieldIndex("hw_level")) == l, s"level row $i")
      assert(r.getDouble(r.fieldIndex("hw_trend")) == b, s"trend row $i")
      assert(r.getDouble(r.fieldIndex("hw_seasonal")) == snew, s"seasonal row $i")
      val ix = r.fieldIndex("hw_fitted")
      val got = if (r.isNullAt(ix)) None else Some(r.getDouble(ix))
      assert(got == fitted, s"fitted row $i")
    }
    // NULL input mid-series: state untouched, row emits NULL, next resumes
    val withNull = Seq(("d00", Some(10.0)), ("d01", Some(14.0)),
      ("d02", None), ("d03", Some(12.0))).toDF("d", "c")
    val z = Indicators.withHoltWinters(withNull, "c", "hw", 0.5, 0.25, 0.5, 3, "d")
      .orderBy("d").collect()
    assert(z(2).isNullAt(z(2).fieldIndex("hw_level")))
    // replay: seed(l=10,b=0,s=[0,0,0]); d01: l=12, b=0.5, s=[0,0,2]
    // d03 consumes (12, 0.5, sold=0): l = 0.5*12 + 0.5*12.5 = 12.25
    assert(z(3).getDouble(z(3).fieldIndex("hw_level")) == 0.5 * 12.0 + 0.5 * 12.5)
    assert(z(3).getDouble(z(3).fieldIndex("hw_fitted")) == 12.5)
    // seasonal slot consumed at d03 is s(0)=0 (rotation advanced once at d01)
    assert(z(1).getDouble(z(1).fieldIndex("hw_seasonal")) == 2.0)
  }

  test("withKama: hand-replayed er/sc/recursion, warmup NULLs, flat-window er=0, per-key") {
    import spark.implicits._
    // period 3 (fast 2, slow 30) keeps the hand replay small: er defined
    // from row 4 (lag-3 change + three one-bar diffs), seed kama at row 4.
    val cs = Seq(10.0, 12.0, 11.0, 15.0, 15.0, 15.0, 15.0, 18.0)
    val df = cs.indices.map(i => ("a", f"d$i%02d", cs(i))).toDF("sym", "d", "c")
    val out = Indicators.withKama(df, "c", "k", 3, 2, 30, "d", Seq("sym"))
      .orderBy("d").collect()
    def g(i: Int, f: String): Option[Double] = {
      val ix = out(i).fieldIndex(f)
      if (out(i).isNullAt(ix)) None else Some(out(i).getDouble(ix))
    }
    // warmup: er/sc/kama all NULL for rows 0..2
    (0 until 3).foreach { i =>
      assert(g(i, "k_er").isEmpty && g(i, "k_sc").isEmpty && g(i, "k").isEmpty, s"row $i")
    }
    // independent scalar replay with the same pinned IEEE sequence
    val fs = 2.0 / 3.0 - 2.0 / 31.0; val ss = 2.0 / 31.0
    var kama = 0.0
    (3 until cs.length).foreach { i =>
      val vol = (i - 2 to i).map(j => math.abs(cs(j) - cs(j - 1))).sum
      val chg = math.abs(cs(i) - cs(i - 3))
      val er = if (vol > 0.0) chg / vol else 0.0
      val t = er * fs + ss; val sc = t * t
      kama = if (i == 3) cs(i) else kama + sc * (cs(i) - kama)
      assert(g(i, "k_er").contains(er), s"er row $i")
      assert(g(i, "k_sc").contains(sc), s"sc row $i")
      assert(g(i, "k").contains(kama), s"kama row $i")
    }
    // rows 4..6 sit on a flat 3-bar window at row 6: vol=0 -> er pinned 0
    assert(g(6, "k_er").contains(0.0))
    // key isolation: a 3-row symbol never defines er, kama stays NULL
    val short = (0 until 3).map(i => ("b", f"d$i%02d", 9.0 + i)).toDF("sym", "d", "c")
    val s = Indicators.withKama(short, "c", "k", 3, 2, 30, "d", Seq("sym"))
      .collect()
    assert(s.forall(_.isNullAt(s.head.fieldIndex("k"))))
  }

  test("withStochRsi: non-null-rsi stream, full-window warmup, flat-range NULL, hand replay") {
    import spark.implicits._
    // rsiPeriod=2 (alpha=0.5 -> exact dyadic ewm states), stochPeriod=3.
    // closes 10,11,10,12,11,12: deltas +1,-1,+2,-1,+1
    //   avg_gain: 1, .5, 1.25, .625, .8125 ; avg_loss: 0, .5, .25, .625, .3125
    //   rsi (min_periods=2 -> defined from d02): 50, 100-100/6, 50, 100-100/3.6
    val closes = Seq(10.0, 11.0, 10.0, 12.0, 11.0, 12.0)
    val df = closes.indices.map(i => ("a", f"d$i%02d", closes(i)))
      .toDF("sym", "d", "c")
    val out = Indicators.withStochRsi(df, "c", "rsi", "sr",
        rsiPeriod = 2, stochPeriod = 3, orderCol = "d", partitionCols = Seq("sym"))
      .orderBy("d").collect()
    // warmup rows (d00: no delta, d01: 1 ewm obs < min_periods) are DROPPED:
    // the output is the non-null-rsi stream only
    assert(out.length == 4, s"expected 4 defined-rsi rows, got ${out.length}")
    assert(out.map(_.getString(1)).toSeq == Seq("d02", "d03", "d04", "d05"))
    def sr(i: Int): Option[Double] = {
      val ix = out(i).fieldIndex("sr")
      if (out(i).isNullAt(ix)) None else Some(out(i).getDouble(ix))
    }
    // full-window-only over the FILTERED stream: the first two defined-rsi
    // rows have < 3 rsi values in the frame (warmup rows occupy NO slots)
    assert(sr(0).isEmpty && sr(1).isEmpty)
    // replay with the identical IEEE op sequence as withRsi/withStochRsi
    val r2 = 50.0                                       // ag=al=.5
    val r3 = 100.0 - 100.0 / (1.0 + 1.25 / 0.25)        // = 100 - 100/6
    val r4 = 100.0 - 100.0 / (1.0 + 0.625 / 0.625)      // = 50
    val r5 = 100.0 - 100.0 / (1.0 + 0.8125 / 0.3125)
    assert(out.map(_.getDouble(out(0).fieldIndex("rsi"))).toSeq ==
      Seq(r2, r3, r4, r5))
    // d04: window [r2, r3, r4], min=50=r4 -> (r4-mn)/(mx-mn) = 0.0 exactly
    assert(sr(2).contains((r4 - 50.0) / (r3 - 50.0)) && sr(2).contains(0.0))
    // d05: window [r3, r4, r5], r5 strictly interior -> exact replayed double
    assert(sr(3).contains((r5 - r4) / (r3 - r4)))
    // flat-range NULL: monotone-up symbol pins rsi=100 everywhere defined,
    // so every full window has max=min -> stoch NULL (and rsi stays 100)
    val up = (0 until 6).map(i => ("c", f"d$i%02d", 1.0 + i)).toDF("sym", "d", "c")
    val flat = Indicators.withStochRsi(up, "c", "rsi", "sr",
        rsiPeriod = 2, stochPeriod = 3, orderCol = "d", partitionCols = Seq("sym"))
      .orderBy("d").collect()
    assert(flat.length == 4)
    assert(flat.forall(r => r.getDouble(r.fieldIndex("rsi")) == 100.0))
    assert(flat.forall(r => r.isNullAt(r.fieldIndex("sr"))))
    // degenerate flat HISTORY: constant closes -> ag=al=0 -> rsi NULL on
    // every row -> the non-null-rsi stream is empty, zero output rows
    val const = (0 until 6).map(i => ("b", f"d$i%02d", 7.0)).toDF("sym", "d", "c")
    val none = Indicators.withStochRsi(const, "c", "rsi", "sr",
        rsiPeriod = 2, stochPeriod = 3, orderCol = "d", partitionCols = Seq("sym"))
    assert(none.count() == 0L)
  }
}
