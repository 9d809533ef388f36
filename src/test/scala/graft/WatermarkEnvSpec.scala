package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventsStream

class WatermarkEnvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("event-time watermark: append mode emits windows only once finalized") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.Event]
    val agg = EventsStream.hourlyCounts(mem.toDF())
    val q = agg.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("wm_test")
      .start()
    def ev(id: Long, hour: Int, min: Int) = EventsStream.Event(
      id, java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00"), 1L, "click", 1.0)
    // batch 1: two events inside the 10:00 window — watermark still at 10:30−2h
    mem.addData(ev(1, 10, 0), ev(2, 10, 30))
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM wm_test").count() == 0) // nothing finalized yet
    // batch 2: an event at 14:00 pushes the watermark to 12:00 → 10:00 window closes
    mem.addData(ev(3, 14, 0))
    q.processAllAvailable()
    mem.addData(ev(4, 18, 0)) // one more advance so 14:00 also finalizes
    q.processAllAvailable()
    val out = spark.sql("SELECT h, n FROM wm_test ORDER BY h")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
    assert(out.head == ("2024-01-01 10:00:00.0", 2L))
    q.stop()
  }

  test("slidingCounts: every event covers two windows; append finalizes with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.Event]
    val q = EventsStream.slidingCounts(mem.toDF()).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("slide_test")
      .start()
    def ev(id: Long, hour: Int, min: Int) = EventsStream.Event(
      id, java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00"), 1L, "click", 2.0)
    // 10:15 → windows [09:30,10:30) and [10:00,11:00); 10:40 → [10:00,11:00) and [10:30,11:30)
    mem.addData(ev(1, 10, 15), ev(2, 10, 40))
    q.processAllAvailable()
    mem.addData(ev(3, 15, 0)) // watermark → 13:00: all three 10:xx windows close
    q.processAllAvailable()
    val out = spark.sql("SELECT w_start, n, total_value FROM slide_test ORDER BY w_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
    q.stop()
    assert(out.toSeq == Seq(
      ("2024-01-01 09:30:00.0", 1L, 2.0),
      ("2024-01-01 10:00:00.0", 2L, 4.0),
      ("2024-01-01 10:30:00.0", 1L, 2.0)))
  }

  test(".env file fills gaps, process env wins") {
    val dir = Files.createTempDirectory("graft-env")
    val f = dir.resolve("custom.env")
    Files.writeString(f, "# comment\nFAKE_API_KEY=from-file\nPATH=should-not-win\nQUOTED=\"hello\"\n")
    val parsed = graft.core.EnvFile.parse(f)
    assert(parsed("FAKE_API_KEY") == "from-file")
    assert(parsed("QUOTED") == "hello")
    // process env wins through EnvFile.get for variables that exist (PATH)
    assert(graft.core.EnvFile.get("PATH").exists(_ != "should-not-win"))
  }
}
