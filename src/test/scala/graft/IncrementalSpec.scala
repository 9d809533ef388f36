package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Incremental

class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus: DataFrame = Seq(
    (1L, "s0", "aa"), (2L, "s0", "bb"), (3L, "s1", "cc"), (4L, "s2", "dd")
  ).toDF("id", "shard", "v")

  test("deltaShards splits by manifest; empty manifest → all delta") {
    val manifest = Seq("s0").toDF("shard")
    val (delta, covered) = Incremental.deltaShards(corpus, manifest, "shard")
    assert(delta.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    assert(covered.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val (all, none) = Incremental.deltaShards(corpus,
      Seq.empty[String].toDF("shard"), "shard")
    assert(all.count() == 4L && none.count() == 0L)
  }

  test("processDelta: process sees ONLY the delta; results union; manifest grows; re-run is a no-op") {
    val manifest = Seq("s0").toDF("shard")
    def process(run: String)(df: DataFrame): DataFrame =
      df.select(col("id"), col("shard"), upper(col("v")).as("out"))
        .withColumn("run", lit(run))
    val prior = process("r1")(corpus.filter(col("shard") === "s0"))
    var deltaSeen: Seq[Long] = null
    val (results, newManifest) = Incremental.processDelta(
      corpus, manifest, "shard", prior) { delta =>
      deltaSeen = delta.select("id").as[Long].collect().sorted.toSeq
      process("r2")(delta)
    }
    // the DAG body received exactly the uncovered shards' rows
    assert(deltaSeen == Seq(3L, 4L))
    val byId = results.collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    assert(byId == Map(
      1L -> ("AA", "r1"), 2L -> ("BB", "r1"),
      3L -> ("CC", "r2"), 4L -> ("DD", "r2")))
    // manifest round-trips: old ∪ delta shards, single column, deduped
    assert(newManifest.columns.toSeq == Seq("shard"))
    assert(newManifest.as[String].collect().sorted.toSeq == Seq("s0", "s1", "s2"))
    // idempotent re-run: the new manifest covers everything → empty delta,
    // process over zero rows, results identical to prior
    var rerunDelta = -1L
    val (again, sameManifest) = Incremental.processDelta(
      corpus, newManifest, "shard", results) { delta =>
      rerunDelta = delta.count()
      process("r3")(delta)
    }
    assert(rerunDelta == 0L)
    assert(again.count() == 4L && again.filter(col("run") === "r3").count() == 0L)
    assert(sameManifest.as[String].collect().sorted.toSeq == Seq("s0", "s1", "s2"))
  }

  test("dedupDelta: delta dedups against the store AND itself; store grows by survivors only") {
    // shards: s0 processed; s1/s2 are the delta
    val docs = Seq(
      (1L, "s0", "seen before"),  // prior content
      (2L, "s0", "only in prior"),
      (3L, "s1", "seen before"),  // duplicate of history → dropped
      (4L, "s1", "fresh a"),      // survives
      (5L, "s2", "fresh a"),      // within-delta dup, doc_id 4 wins
      (6L, "s2", "fresh b")       // survives
    ).toDF("id", "shard", "text")
    val manifest = Seq("s0").toDF("shard")
    val priorFps = docs.filter(col("shard") === "s0")
      .select(md5(col("text")).as("fp")).distinct()
    val (survivors, newFps) = Incremental.dedupDelta(
      docs, manifest, "shard", priorFps, "id", "text")
    assert(survivors.select("id").as[Long].collect().sorted.toSeq == Seq(4L, 6L))
    // survivor rows keep the delta's full schema
    assert(survivors.columns.toSeq == Seq("id", "shard", "text"))
    // the store gained exactly the survivors' fingerprints
    assert(newFps.count() == 4L) // {seen before, only in prior, fresh a, fresh b}
    // state travel: a second delivery re-using survivor content dedups
    // against the GROWN store without rescanning history
    val docs2 = docs.unionByName(Seq(
      (7L, "s3", "fresh a"),      // now historical → dropped
      (8L, "s3", "fresh c")       // survives
    ).toDF("id", "shard", "text"))
    val manifest2 = Seq("s0", "s1", "s2").toDF("shard")
    val (s2, fps2) = Incremental.dedupDelta(
      docs2, manifest2, "shard", newFps, "id", "text")
    assert(s2.select("id").as[Long].collect().toSeq == Seq(8L))
    assert(fps2.count() == 5L)
  }

  test("delta selection broadcasts the manifest (map-side anti-join, no corpus shuffle)") {
    val manifest = Seq("s0").toDF("shard")
    val (delta, covered) = Incremental.deltaShards(corpus, manifest, "shard")
    for (df <- Seq(delta, covered)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"manifest join must broadcast, got:\n$plan")
      assert(!plan.contains("SortMergeJoin"), "corpus must not shuffle for the manifest")
    }
  }
}
