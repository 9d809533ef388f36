package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventsStream

/** The generalized first-match CEP NFA ([[EventsStream.cepFirstMatchN]]):
  * equivalence with the fixed 3-step machine, the per-key state-size bound
  * (the 100 TB stream concern: state must be bounded by the PATTERN, never
  * by history), hand-checked latest-binding semantics on a repeated-type
  * pattern, and batch/stream parity across a micro-batch boundary.
  */
class CepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventsStream.Event]
  }

  test("cepFirstMatchN(view,click,purchase) equals the fixed 3-step machine") {
    val fixed = EventsStream.cepFirstMatch(events).collect()
      .map(m => (m.user_id, Seq(m.v_us, m.c_us, m.p_us), Seq(m.v_id, m.c_id, m.p_id)))
      .toSet
    val general = EventsStream.cepFirstMatchN(
        events, Seq("view", "click", "purchase")).collect()
      .map(m => (m.user_id, m.step_us, m.step_id)).toSet
    assert(general == fixed)
    assert(fixed.nonEmpty, "test data should contain at least one match")
  }

  test("per-key state stays bounded by the pattern under 10k adversarial events") {
    val pat = IndexedSeq("view", "click", "click", "purchase")
    val within = 86400000000L
    val step = EventsStream.cepStepN(pat, within) _
    // worst case for state growth: an endless view/click alternation that
    // keeps every prefix length populated but (purchases far apart) never
    // completes early; plus stretches of non-pattern types
    val types = Iterator.continually(
      Seq("view", "click", "click", "error", "view", "signup", "click")).flatten
    var st = EventsStream.CepNState(Seq.fill(pat.size - 1)(Seq.empty), done = false)
    var matches = 0
    var us = 0L
    types.take(10000).zipWithIndex.foreach { case (t, i) =>
      us += 1000000L
      val (next, m) = step(st, us, i.toLong, t, 7L)
      st = next
      if (m.isDefined) matches += 1
      // the bound: L-1 partials, partial k holds 0 or exactly 2(k+1) longs
      assert(st.partials.length == pat.size - 1)
      st.partials.zipWithIndex.foreach { case (p, k) =>
        assert(p.isEmpty || p.length == 2 * (k + 1),
          s"partial $k has ${p.length} longs")
      }
      assert(st.partials.map(_.length).sum <= 2 * pat.size * pat.size)
    }
    assert(matches == 0, "no purchase event was ever fed")
    // now a purchase completes, exactly once, and the key goes dormant
    val (st1, m1) = step(st, us + 1000000L, 99990L, "purchase", 7L)
    assert(m1.isDefined && st1.done)
    assert(m1.get.step_us.length == 4 && m1.get.step_id.length == 4)
    val (st2, m2) = step(st1, us + 2000000L, 99991L, "purchase", 7L)
    assert(m2.isEmpty && st2 == st1, "dormant key must not match again")
  }

  test("latest-binding semantics on the repeated-type pattern, hand-checked") {
    val pat = IndexedSeq("view", "click", "click", "purchase")
    val step = EventsStream.cepStepN(pat, 86400000000L) _
    var st = EventsStream.CepNState(Seq.fill(3)(Seq.empty), done = false)
    var out: Option[EventsStream.CepNMatch] = None
    // v(1) c(2) v(3) c(4) c(5) p(6): the purchase binds click-pair (4,5)
    // — click 4 re-binds to the LATER view 3, click 5 extends (3,4) —
    // demonstrating both latest-binding and one click serving both steps
    Seq((1L, "view"), (2L, "click"), (3L, "view"), (4L, "click"),
      (5L, "click"), (6L, "purchase")).foreach { case (i, t) =>
      val (next, m) = step(st, i * 1000000L, i, t, 1L)
      st = next
      m.foreach(x => out = Some(x))
    }
    assert(out.isDefined)
    assert(out.get.step_id == Seq(3L, 4L, 5L, 6L))
    assert(out.get.step_us == Seq(3000000L, 4000000L, 5000000L, 6000000L))
  }

  test("completion window: a too-late final step does not match, the NFA keeps running") {
    val pat = IndexedSeq("view", "purchase")
    val step = EventsStream.cepStepN(pat, withinMicros = 1000000L) _
    var st = EventsStream.CepNState(Seq.fill(1)(Seq.empty), done = false)
    val (st1, m1) = step(st, 0L, 1L, "view", 1L)
    val (st2, m2) = step(st1, 5000000L, 2L, "purchase", 1L) // 5s later: outside
    assert(m2.isEmpty && !st2.done)
    val (st3, m3) = step(st2, 5500000L, 3L, "view", 1L)
    val (st4, m4) = step(st3, 6000000L, 4L, "purchase", 1L) // 0.5s: inside
    assert(m4.isDefined && st4.done)
    assert(m4.get.step_id == Seq(3L, 4L))
    assert(m1.isEmpty && m3.isEmpty)
  }

  test("cepFirstMatchN batch/stream parity across a micro-batch boundary") {
    import spark.implicits._
    val pat = Seq("view", "click", "click", "purchase")
    val evs = events.collect().sortBy(e => (e.ts.getTime, e.event_id))
    val batch = EventsStream.cepFirstMatchN(events, pat).collect()
      .map(m => (m.user_id, m.step_us, m.step_id)).toSet

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[EventsStream.Event]
    val q = EventsStream.cepFirstMatchN(mem.toDS(), pat).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("cepn_test")
      .start()
    val mid = evs.length / 2
    mem.addData(evs.take(mid).toIndexedSeq)
    q.processAllAvailable()
    mem.addData(evs.drop(mid).toIndexedSeq)
    q.processAllAvailable()
    val streamed = spark.sql("SELECT user_id, step_us, step_id FROM cepn_test")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2))).toSet
    q.stop()
    assert(streamed == batch)
    assert(batch.nonEmpty, "test data should contain at least one 4-step match")
  }
}
