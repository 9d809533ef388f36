package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Stream-stream interval join (clickAttribution): batch/stream parity and
  * join-window semantics. The batch side of the parity pair is the st5
  * oracle gate; here the SAME function runs as a genuine two-stream join.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Long) = new java.sql.Timestamp(minute * 60000)

  test("clickAttribution: stream-stream join emits in-window pairs, excludes out-of-window") {
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = EventsStream.clickAttribution(
        pMem.toDF().toDF("event_id", "user_id", "ts"),
        cMem.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("attr_test").start()
    // user 1: clicks at minute 40 and 9 (out of window), purchase at 60
    //   → only the minute-40 click attributes (60-30=30 <= 40 < 60)
    // user 2: click at minute 59 but for a DIFFERENT user → no match
    cMem.addData((101L, 1L, ts(40)), (102L, 1L, ts(9)), (103L, 2L, ts(59)))
    pMem.addData((201L, 1L, ts(60)))
    q.processAllAvailable()
    val got = spark.sql("SELECT purchase_id, click_id FROM attr_test")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((201L, 101L)),
      s"expected only the in-window same-user click, got $got")
    // a click exactly AT the purchase time is excluded (strict upper bound)
    cMem.addData((104L, 3L, ts(100)))
    pMem.addData((202L, 3L, ts(100)))
    q.processAllAvailable()
    val after = spark.sql("SELECT purchase_id, click_id FROM attr_test")
      .as[(Long, Long)].collect().toSet
    assert(after == Set((201L, 101L)), "boundary click must not attribute")
    q.stop()
  }

  test("clickAttributionOuter: unmatched purchase emits nulls only after watermark closes") {
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = EventsStream.clickAttributionOuter(
        pMem.toDF().toDF("event_id", "user_id", "ts"),
        cMem.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("attr_outer_test").start()
    // purchase at minute 60 with an in-window click → inner row immediately;
    // purchase at 61 with NO click → outer row held until watermark passes
    cMem.addData((101L, 1L, ts(40)))
    pMem.addData((201L, 1L, ts(60)), (202L, 2L, ts(61)))
    q.processAllAvailable()
    val inner = spark.sql("SELECT purchase_id, click_id FROM attr_outer_test WHERE click_id IS NOT NULL")
      .as[(Long, Long)].collect().toSet
    assert(inner == Set((201L, 101L)))
    assert(spark.sql("SELECT * FROM attr_outer_test WHERE click_id IS NULL").count() == 0,
      "outer row must not emit while late clicks could still arrive")
    // advance BOTH watermarks far past purchase 202's match window
    cMem.addData((199L, 99L, ts(600))); pMem.addData((299L, 99L, ts(600)))
    q.processAllAvailable()
    cMem.addData((198L, 98L, ts(700))); pMem.addData((298L, 98L, ts(700)))
    q.processAllAvailable()
    val outer = spark.sql("SELECT purchase_id FROM attr_outer_test WHERE click_id IS NULL")
      .as[Long].collect().toSet
    assert(outer.contains(202L), s"expired unmatched purchase must emit a null-click row, got $outer")
    q.stop()
  }

  test("windowedDistinctUsers: chained dedup+count emits exact distinct after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = EventsStream.windowedDistinctUsers(
        mem.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("wdu_test").start()
    // hour 0: user 1 three times, user 2 once → distinct = 2
    mem.addData((1L, 1L, ts(5)), (2L, 1L, ts(10)), (3L, 2L, ts(20)), (4L, 1L, ts(50)))
    q.processAllAvailable()
    // append mode: nothing emits while the window can still receive data
    assert(spark.sql("SELECT * FROM wdu_test").count() == 0)
    // advance the watermark (2h delay) far past hour 0's close
    mem.addData((9L, 9L, ts(300)))
    q.processAllAvailable()
    mem.addData((10L, 9L, ts(400)))
    q.processAllAvailable()
    val got = spark.sql("SELECT h, active_users FROM wdu_test")
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(got.get(ts(0)).contains(2L),
      s"hour-0 window must count 2 distinct users exactly once each, got $got")
    q.stop()
  }

  test("trendingTypes: sketch buffers survive the streaming state store across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = graft.streaming.EventsStream.trendingTypes(
        mem.toDF().toDF("event_id", "event_type", "ts"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("trend_test").start()
    // batch 1: 3 clicks, 1 view in hour 0
    mem.addData((1L, "click", ts(5)), (2L, "click", ts(10)),
      (3L, "click", ts(20)), (4L, "view", ts(30)))
    q.processAllAvailable()
    // batch 2: 2 more views in the SAME window — counts must ACCUMULATE
    // through the serialized sketch state, not restart per batch
    mem.addData((5L, "view", ts(40)), (6L, "view", ts(50)))
    q.processAllAvailable()
    val got = spark.sql("SELECT event_type, n FROM trend_test")
      .as[(String, Long)].collect().toMap
    assert(got == Map("click" -> 3L, "view" -> 3L), s"got $got")
    q.stop()
  }

  test("clickAttribution: batch run equals the plain inequality join") {
    val p = Seq((1L, 10L, ts(60)), (2L, 10L, ts(200))).toDF("event_id", "user_id", "ts")
    val c = Seq((11L, 10L, ts(40)), (12L, 10L, ts(59)), (13L, 10L, ts(171)),
      (14L, 10L, ts(29))).toDF("event_id", "user_id", "ts")
    val got = EventsStream.clickAttribution(p, c)
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // purchase 1 window [30, 60): clicks 40, 59; purchase 2 window [170, 200): click 171
    assert(got == Set((1L, 11L), (1L, 12L), (2L, 13L)))
  }

  test("windowedValueHistogram: streaming histogram equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = EventsStream.windowedValueHistogram(
        mem.toDF().toDF("ts", "value"), bucketCents = 1000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("hist_test").start()
    // hour 0: values 5.00, 7.50 (bucket 0), 12.00 (bucket 1), −3.00 (floor
    // division → bucket −1, NOT collapsed into bucket 0); hour 1: 25.00
    mem.addData((ts(10), 5.0), (ts(20), 7.5), (ts(30), 12.0), (ts(40), -3.0),
      (ts(70), 25.0))
    // advance the watermark far enough to close both hourly windows
    mem.addData((ts(300), 99.0))
    q.processAllAvailable()
    val got = spark.sql("SELECT h, bucket, n FROM hist_test")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1), r.getLong(2)))
      .toSet
    assert(got.contains((0L, 0L, 2L)) && got.contains((0L, 1L, 1L)),
      s"hour-0 buckets wrong: $got")
    assert(got.contains((0L, -1L, 1L)), s"negative value must floor to bucket -1: $got")
    assert(got.contains((60L, 2L, 1L)), s"hour-1 bucket missing: $got")
    q.stop()

    // percentile readout from a hand-built histogram: 10 values in bucket 0,
    // 1 in bucket 9 -> p50 = 0, p99 = 9000
    val hist = Seq((ts(0), 0L, 10L), (ts(0), 9L, 1L)).toDF("h", "bucket", "n")
    val out = EventsStream.histogramPercentiles(hist, 1000L, Seq(50, 99))
      .collect()(0)
    assert(out.getLong(1) == 11L)
    assert(out.getLong(2) == 0L && out.getLong(3) == 9000L)
  }
}
