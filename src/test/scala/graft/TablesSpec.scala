package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.events` timestamp normalization across the three physical
  * parquet layouts the driver has shipped (`Tables.scala`): nanos-as-long,
  * micros TIMESTAMP_NTZ, and micros TIMESTAMP (UTC). A data regeneration
  * that changes the physical layout must keep these green — every layout
  * must surface as `TimestampType` with identical micros values so that
  * `unix_micros`, `session_window`, and JDBC sinks behave uniformly.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // One known instant: 2024-01-01T00:00:07.179575Z
  private val micros = 1704067207179575L

  private def writeAndRead(layout: String): (DataType, Long) = {
    val dir = Files.createTempDirectory(s"tables-spec-$layout").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    val base = Seq((1L, micros)).toDF("event_id", "us")
    val ts = layout match {
      case "long-nanos" => (base.col("us") * 1000L).as("ts") // nanos-as-long legacy read shape
      case "ntz"        => timestamp_micros(base.col("us")).cast(TimestampNTZType).as("ts")
      case "utc"        => timestamp_micros(base.col("us")).as("ts")
    }
    base.select(col("event_id"), ts).write.mode("overwrite").parquet(s"$path/events.parquet")
    val normalized = Tables.events(spark, path)
    val value = normalized.select(unix_micros(col("ts"))).as[Long].head()
    (normalized.schema("ts").dataType, value)
  }

  test("nanos-as-long layout normalizes to TimestampType micros") {
    val (dt, v) = writeAndRead("long-nanos")
    assert(dt == TimestampType)
    assert(v == micros)
  }

  test("micros TIMESTAMP_NTZ layout normalizes to TimestampType micros") {
    val (dt, v) = writeAndRead("ntz")
    assert(dt == TimestampType)
    assert(v == micros)
  }

  test("micros TIMESTAMP (UTC) layout passes through unchanged") {
    val (dt, v) = writeAndRead("utc")
    assert(dt == TimestampType)
    assert(v == micros)
  }

  test("driver testdata events.parquet reads as TimestampType and unix_micros works") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    val mn = ev.select(min(unix_micros(col("ts")))).as[Long].head()
    assert(mn > 1500000000000000L) // a sane 2017+ instant in micros
  }
}
