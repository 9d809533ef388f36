package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing demo: pre-bucketing both join sides on the join key makes the
  * sort-merge join shuffle-free (co-located) — the technique that turns the
  * repeated big-fact join at 100 TB from a per-query shuffle into a one-time
  * layout cost.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed join on the bucket key plans without shuffle exchanges") {
    val dir = Files.createTempDirectory("graft-buckets")
    val sf = "/root/testdata/sf0.001"
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/li").mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/ord").mode("overwrite").saveAsTable("ord_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert("Bucketed: true".r.findAllIn(plan).size >= 2)
      // every exchange must be the groupBy's (o_orderstatus); the JOIN KEYS
      // must never be shuffled — that's the co-location payoff
      val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(exchanges.nonEmpty && exchanges.forall(_.contains("o_orderstatus")),
        s"join-key shuffle present:\n$plan")
      assert(!exchanges.exists(l => l.contains("l_orderkey") || l.contains("o_orderkey")))

      // and the unbucketed equivalent DOES shuffle the join keys
      val plain = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      plain.collect()
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.linesIterator.exists(l =>
        l.contains("Exchange hashpartitioning") &&
          (l.contains("l_orderkey") || l.contains("o_orderkey"))))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
