package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Partition-layout demo: writing fact data partitioned by a filter column
  * makes selective scans read only the matching directories — at 100 TB the
  * difference between a full scan and touching one partition.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitionBy write + filter read prunes partitions in the plan") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("event_type"), plan)
    // only the purchase partition directory is scanned
    val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!scanned.contains("event_type=error"))

    // and the count matches the unpartitioned source
    val expected = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase").count()
    assert(q.count() == expected)
  }
}
