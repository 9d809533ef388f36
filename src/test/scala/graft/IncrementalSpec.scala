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

  test("nearDedupDelta: signature state travel; two deliveries == one-shot run") {
    import graft.operators.Dedup
    def words(seed: Int, n: Int): String =
      (0 until n).map(i => s"w${(seed * 31 + i * 7) % 997}_$i").mkString(" ")
    val base = words(1, 40)
    val nearBase = base.split(" ").dropRight(1).mkString(" ") + " zzz" // 1 token off
    val docs = Seq(
      (1L, "s0", base),            // phase 1
      (2L, "s0", words(2, 40)),    // phase 1, unrelated
      (3L, "s1", base),            // phase 2: exact dup of history → dropped
      (4L, "s1", nearBase),        // phase 2: near dup of history
      (5L, "s1", words(9, 40)),    // phase 2, unrelated → kept
      (6L, "s1", "too short")      // < 3 tokens: kept, never stored
    ).toDF("id", "shard", "text")
    val emptySigs = Dedup.minhashSignaturesWithBands(
      docs.limit(0), "id", "text", shingleK = 3, k = 64, bands = 16)
    val emptyManifest = Seq.empty[String].toDF("shard")

    // two deliveries with state travel
    val m1 = Seq("s0").toDF("shard")
    val (s1, store1) = Incremental.nearDedupDelta(
      docs.filter(col("shard") === "s0"), emptyManifest, "shard",
      emptySigs, "id", "text")
    val (s2, store2) = Incremental.nearDedupDelta(
      docs, m1, "shard", store1, "id", "text")
    val twoPhase = s1.unionByName(s2).select("id").as[Long].collect().sorted.toSeq

    // one-shot run over everything; phase-1 ids < phase-2 ids, so the
    // (delivery, id) order equals the plain id order and the runs must
    // agree bit-for-bit — the replay-stability contract
    val (oneShot, storeAll) = Incremental.nearDedupDelta(
      docs, emptyManifest, "shard", emptySigs, "id", "text")
    assert(twoPhase == oneShot.select("id").as[Long].collect().sorted.toSeq)

    // exact dup of history always estimates 64/64 → dropped; unrelated kept;
    // the short doc is kept and NOT in the store
    assert(!twoPhase.contains(3L) && twoPhase.contains(5L) && twoPhase.contains(6L))
    assert(store2.filter(col("doc_id") === 6L).count() == 0)
    // the store carries every SIGNED doc (kept or dropped): 5 of 6
    assert(store2.count() == 5L && storeAll.count() == 5L)
    // PRECONDITION audit (idCol globally unique across deliveries): the
    // grown store holds each doc_id exactly once — a re-delivered id would
    // silently duplicate store rows and double-emit verified pairs
    assert(store2.select("doc_id").distinct().count() == store2.count())

    // the near-dup's fate matches the brute-force estimate from the
    // signatures themselves (no hardcoded hash expectations)
    val sigs = Dedup.minhashSignaturesWithBands(
        docs, "id", "text", shingleK = 3, k = 64, bands = 16)
      .select("doc_id", "sig").as[(Long, Array[Long])].collect().toMap
    val est14 = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(twoPhase.contains(4L) == (est14 * 10 < 64 * 8),
      s"doc 4 est=$est14 vs threshold 51.2")

    // idempotence: grown manifest + store → empty delta, nothing changes
    val m2 = Seq("s0", "s1").toDF("shard")
    val (s3, store3) = Incremental.nearDedupDelta(
      docs, m2, "shard", store2, "id", "text")
    assert(s3.count() == 0 && store3.count() == store2.count())

    // broadcastDelta (store scanned, never shuffled) is bit-identical to
    // the default join shape — survivors AND grown store, both deliveries
    val (s2b, store2b) = Incremental.nearDedupDelta(
      docs, m1, "shard", store1, "id", "text", broadcastDelta = true)
    assert(s2b.select("id").as[Long].collect().sorted.toSeq ==
      s2.select("id").as[Long].collect().sorted.toSeq)
    assert(store2b.select("doc_id").as[Long].collect().sorted.toSeq ==
      store2.select("doc_id").as[Long].collect().sorted.toSeq)
    val (lb, _) = Incremental.ccDelta(
      docs, m1, "shard",
      store1.withColumn("label", col("doc_id")), "id", "text",
      broadcastDelta = true)
    val (ld, _) = Incremental.ccDelta(
      docs, m1, "shard",
      store1.withColumn("label", col("doc_id")), "id", "text")
    assert(lb.as[(Long, Long)].collect().sorted.toSeq ==
      ld.as[(Long, Long)].collect().sorted.toSeq)
  }

  test("ccDelta: label state travel; a phase-2 bridge doc retroactively merges two phase-1 clusters") {
    import graft.operators.Dedup
    // base 300 words; B edits span X, C edits span Y (disjoint), the bridge
    // edits BOTH — so est(B,C) < 52/64 (separate clusters in phase 1) while
    // est(bridge,B) and est(bridge,C) both clear the threshold (verified
    // below from the signatures themselves, not assumed). Span width 32 is
    // tuned against the round-14 61-bit splitmix-affine family: the
    // computed estimates land 49 / 54 / 56 around the 51.2 cut — margins
    // ≥ 1.8 components on each side of the threshold (deterministic
    // signatures; re-tune if the permutation constants ever change).
    val base = (0 until 300).map(i => s"w${(31 + i * 7) % 997}_$i").toArray
    def edited(spans: (Range, String)*): String = {
      val w = base.clone()
      spans.foreach { case (r, p) => r.foreach(i => w(i) = s"$p$i") }
      w.mkString(" ")
    }
    val tB = edited((50 until 82) -> "b")
    val tC = edited((190 until 222) -> "c")
    val tBr = edited((50 until 82) -> "b", (190 until 222) -> "c")
    val docs = Seq(
      (10L, "s0", tB), (20L, "s0", tC),   // phase 1: two separate clusters
      (30L, "s1", tBr)                    // phase 2: bridges them
    ).toDF("id", "shard", "text")
    val sigs = Dedup.minhashSignaturesWithBands(
        docs, "id", "text", shingleK = 3, k = 64, bands = 16)
      .select("doc_id", "sig").as[(Long, Array[Long])].collect().toMap
    def est(a: Long, b: Long) = sigs(a).zip(sigs(b)).count(p => p._1 == p._2)
    assert(est(10L, 20L) * 10 < 64 * 8, s"B-C est ${est(10L, 20L)} must be below threshold")
    assert(est(30L, 10L) * 10 >= 64 * 8 && est(30L, 20L) * 10 >= 64 * 8,
      s"bridge ests ${est(30L, 10L)}/${est(30L, 20L)} must clear the threshold")

    val emptyState = Dedup.minhashSignaturesWithBands(
        docs.limit(0), "id", "text", shingleK = 3, k = 64, bands = 16)
      .withColumn("label", col("doc_id"))
    val emptyManifest = Seq.empty[String].toDF("shard")
    val m1 = Seq("s0").toDF("shard")
    val (lab1, state1) = Incremental.ccDelta(
      docs.filter(col("shard") === "s0"), emptyManifest, "shard",
      emptyState, "id", "text")
    // phase 1: two singleton clusters, no merge
    assert(lab1.orderBy("id").as[(Long, Long)].collect().toSeq ==
      Seq((10L, 10L), (20L, 20L)))
    val (lab2, state2) = Incremental.ccDelta(
      docs, m1, "shard", state1, "id", "text")
    assert(lab2.as[(Long, Long)].collect().toSeq == Seq((30L, 10L)))
    // THE RETROACTIVE MERGE: doc 20's carried label is rewritten to 10
    assert(state2.select("doc_id", "label").as[(Long, Long)].collect().sorted.toSeq ==
      Seq((10L, 10L), (20L, 10L), (30L, 10L)))
    // store-id uniqueness (the global-idCol precondition, as on nearDedupDelta)
    assert(state2.select("doc_id").distinct().count() == state2.count())

    // order independence: one-shot run over everything yields the same labels
    val (labAll, stateAll) = Incremental.ccDelta(
      docs, emptyManifest, "shard", emptyState, "id", "text")
    assert(stateAll.select("doc_id", "label").as[(Long, Long)].collect().sorted.toSeq ==
      state2.select("doc_id", "label").as[(Long, Long)].collect().sorted.toSeq)
    assert(labAll.count() == 3)

    // sharedKernel parity: precomputing (deltaSigs, verifiedPairs) outside
    // (the mx26/mx27 cross-query memo shape) must be byte-identical to the
    // operator computing them itself
    val d2 = docs.filter(col("shard") === "s1")
    val sigs2 = Dedup.minhashSignaturesWithBands(
      d2, "id", "text", shingleK = 3, k = 64, bands = 16)
    val pairs2 = Incremental.estVerifiedPairs(
      sigs2, state1.select("doc_id", "sig", "bk"), k = 64, bands = 16,
      thresholdNum = 8, thresholdDen = 10, maxBucket = 100000)
    val (lab2k, state2k) = Incremental.ccDelta(
      docs, m1, "shard", state1, "id", "text",
      sharedKernel = Some((sigs2, pairs2)))
    assert(lab2k.as[(Long, Long)].collect().toSeq ==
      lab2.as[(Long, Long)].collect().toSeq)
    assert(state2k.select("doc_id", "label").as[(Long, Long)].collect().sorted.toSeq ==
      state2.select("doc_id", "label").as[(Long, Long)].collect().sorted.toSeq)
  }

  test("ivfDelta: delta-only assignment against carried centroids; counts travel and re-runs are no-ops") {
    import graft.operators.{Incremental, Similarity}
    import org.apache.spark.sql.types.{LongType, StructType}
    // 2 orthogonal-ish centroid directions; members lean toward one of them
    def vec(a: Double, b: Double): Array[Float] = Array(a.toFloat, b.toFloat)
    val docs = Seq(
      (0L, "s0", vec(1.0, 0.0)),   // centroid 0's direction
      (1L, "s0", vec(0.0, 1.0)),   // centroid 1's direction
      (2L, "s0", vec(0.9, 0.1)),
      (3L, "s1", vec(0.8, 0.2)),   // delta: near centroid 0
      (4L, "s1", vec(0.1, 0.9)),   // delta: near centroid 1
      (5L, "s1", vec(0.2, 0.8))
    ).toDF("vec_id", "shard", "embedding")
    val d1 = docs.filter(col("shard") === "s0")
    val cents = Similarity.preparedCorpus(d1, "vec_id", "embedding")
      .orderBy(col("vec_id")).limit(2)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val emptyManifest = Seq.empty[String].toDF("shard")
    val emptyCounts = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      new StructType().add("cell", LongType).add("n", LongType))
    val (a1, counts1) = Incremental.ivfDelta(
      d1, emptyManifest, "shard", cents, emptyCounts, "vec_id", "embedding")
    val m1 = Seq("s0").toDF("shard")
    val (a2, counts2) = Incremental.ivfDelta(
      docs, m1, "shard", cents, counts1, "vec_id", "embedding")
    // delivery 2 assigned ONLY the delta, to the geometrically right cells
    assert(a2.orderBy("vec_id").as[(Long, Long)].collect().toSeq ==
      Seq((3L, 0L), (4L, 1L), (5L, 1L)))
    // two deliveries ≡ one global pass (stateless per-row assignment)
    val (aAll, countsAll) = Incremental.ivfDelta(
      docs, emptyManifest, "shard", cents, emptyCounts, "vec_id", "embedding")
    assert(a1.unionByName(a2).as[(Long, Long)].collect().sorted.toSeq ==
      aAll.as[(Long, Long)].collect().sorted.toSeq)
    // counts travel: state after delivery 2 == one-shot counts
    assert(counts2.as[(Long, Long)].collect().sorted.toSeq ==
      countsAll.as[(Long, Long)].collect().sorted.toSeq)
    assert(counts2.as[(Long, Long)].collect().toMap == Map(0L -> 3L, 1L -> 3L))
    // idempotent re-run: grown manifest → empty delta, counts unchanged
    val m2 = Seq("s0", "s1").toDF("shard")
    val (a3, counts3) = Incremental.ivfDelta(
      docs, m2, "shard", cents, counts2, "vec_id", "embedding")
    assert(a3.count() == 0)
    assert(counts3.as[(Long, Long)].collect().sorted.toSeq ==
      counts2.as[(Long, Long)].collect().sorted.toSeq)
  }

  test("semDedupDelta: state travel; bridge merges two phase-1 groups and FLIPS a carried keep flag") {
    import graft.operators.Incremental
    import org.apache.spark.sql.types.{ArrayType, BooleanType, DoubleType, LongType, StructType}
    def vec(a: Double, b: Double): Array[Float] = Array(a.toFloat, b.toFloat)
    // carried quantizer: two axis-aligned unit centroids
    val cents = Seq((0L, Array(1.0, 0.0), 1.0), (1L, Array(0.0, 1.0), 1.0))
      .toDF("c_id", "cv", "cn")
    // cell 0: 10 and 20 are ~0.963 apart (below τ = 0.97 → separate phase-1
    // groups); the phase-2 doc 40 sits between them (cos ≈ 0.990 to both →
    // bridge). cell 1: 30 then 50 pair directly (cos ≈ 0.9997).
    val docs = Seq(
      (10L, "s0", vec(1.0, 0.02)), (20L, "s0", vec(1.0, 0.30)),
      (30L, "s0", vec(0.02, 1.0)),
      (40L, "s1", vec(1.0, 0.16)), (50L, "s1", vec(0.05, 1.0))
    ).toDF("vec_id", "shard", "embedding")
    val stateSchema = new StructType()
      .add("vec_id", LongType).add("v", ArrayType(DoubleType))
      .add("nrm", DoubleType).add("cell", LongType)
      .add("cell_cos", DoubleType).add("grp", LongType)
      .add("keep", BooleanType)
    val emptyState = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), stateSchema)
    val emptyManifest = Seq.empty[String].toDF("shard")
    val (r1, state1) = Incremental.semDedupDelta(
      docs.filter(col("shard") === "s0"), emptyManifest, "shard",
      cents, emptyState, "vec_id", "embedding", threshold = 0.97)
    // phase 1: three singleton groups, everyone keeps
    assert(r1.orderBy("vec_id").as[(Long, Long, Long, Boolean)].collect().toSeq ==
      Seq((10L, 0L, 10L, true), (20L, 0L, 20L, true), (30L, 1L, 30L, true)))
    val m1 = Seq("s0").toDF("shard")
    val (r2, state2) = Incremental.semDedupDelta(
      docs, m1, "shard", cents, state1, "vec_id", "embedding", threshold = 0.97)
    // the bridge lands in the merged group {10,20,40}; 20 has the LOWEST
    // centroid cosine so it keeps — the bridge itself does not
    assert(r2.orderBy("vec_id").as[(Long, Long, Long, Boolean)].collect().toSeq ==
      Seq((40L, 0L, 10L, false), (50L, 1L, 30L, true)))
    // THE RETROACTIVE MERGE + KEEP FLIP: doc 10's carried keep=true is
    // rewritten to false (20 is less prototypical), doc 30's flips to 50
    val s2 = state2.select("vec_id", "grp", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(s2 == Seq((10L, 10L, false), (20L, 10L, true), (30L, 30L, false),
      (40L, 10L, false), (50L, 30L, true)))
    // store-id uniqueness (the global-idCol precondition)
    assert(state2.select("vec_id").distinct().count() == state2.count())
    // order independence: one global pass with the same centroids matches
    // the two-delivery state on (vec_id, cell, grp, keep) exactly
    val (_, stateAll) = Incremental.semDedupDelta(
      docs, emptyManifest, "shard", cents, emptyState, "vec_id", "embedding",
      threshold = 0.97)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cell", "grp", "keep")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(snap(stateAll) == snap(state2))
    // idempotent re-run: full manifest → empty delta, state unchanged
    val (r3, state3) = Incremental.semDedupDelta(
      docs, Seq("s0", "s1").toDF("shard"), "shard", cents, state2,
      "vec_id", "embedding", threshold = 0.97)
    assert(r3.count() == 0)
    assert(snap(state3) == snap(state2))
  }

  test("quotaDelta: carried counts travel; quota fills, straddles, and re-runs idempotently") {
    import graft.operators.Incremental
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    // group a: 3 in delivery 1, 2 in delivery 2, quota 4 → straddles (1
    // kept in d2); group b: 2 + 2, quota 4 → never binds; group c: 5 + 1,
    // quota 4 → fills inside d1 (d2 keeps none)
    val docs = Seq(
      (1L, "a", "s0"), (2L, "a", "s0"), (3L, "a", "s0"),
      (4L, "b", "s0"), (5L, "b", "s0"),
      (6L, "c", "s0"), (7L, "c", "s0"), (8L, "c", "s0"), (9L, "c", "s0"), (10L, "c", "s0"),
      (11L, "a", "s1"), (12L, "a", "s1"),
      (13L, "b", "s1"), (14L, "b", "s1"),
      (15L, "c", "s1")
    ).toDF("id", "g", "shard")
    val emptyCounts = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      new StructType().add("g", StringType).add("n_kept", LongType))
    val emptyManifest = Seq.empty[String].toDF("shard")
    val (k1, c1) = Incremental.quotaDelta(
      docs.filter(col("shard") === "s0"), emptyManifest, "shard",
      emptyCounts, "g", "id", quota = 4L)
    assert(k1.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    assert(c1.as[(String, Long)].collect().toMap == Map("a" -> 3L, "b" -> 2L, "c" -> 4L))
    val (k2, c2) = Incremental.quotaDelta(
      docs, Seq("s0").toDF("shard"), "shard", c1, "g", "id", quota = 4L)
    // a gets 1 more (11), b gets both, c is full
    assert(k2.select("id").as[Long].collect().sorted.toSeq == Seq(11L, 13L, 14L))
    assert(c2.as[(String, Long)].collect().toMap == Map("a" -> 4L, "b" -> 4L, "c" -> 4L))
    // two deliveries ≡ one global pass over the (delivery, id) order
    val (kAll, cAll) = Incremental.quotaDelta(
      docs, emptyManifest, "shard", emptyCounts, "g", "id", quota = 4L)
    assert(kAll.select("id").as[Long].collect().sorted.toSeq ==
      (k1.select("id").as[Long].collect() ++ k2.select("id").as[Long].collect())
        .sorted.toSeq)
    assert(cAll.as[(String, Long)].collect().toMap ==
      c2.as[(String, Long)].collect().toMap)
    // idempotent re-run: full manifest → empty delta, counts unchanged
    val (k3, c3) = Incremental.quotaDelta(
      docs, Seq("s0", "s1").toDF("shard"), "shard", c2, "g", "id", quota = 4L)
    assert(k3.count() == 0)
    assert(c3.as[(String, Long)].collect().toMap ==
      c2.as[(String, Long)].collect().toMap)
  }

  test("vocabDelta: df store travels; two deliveries == one global pass; new terms flagged") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    // d1: "aa" in docs 1,2; "bb" in 2; repeated token within a doc counts
    // once ("aa aa"). d2: "aa" in 11; "cc" (new) in 11,12; empty-token
    // noise from a double space is dropped
    val docs = Seq(
      (1L, "s0", "aa aa bb"), (2L, "s0", "bb  aa"),
      (11L, "s1", "aa cc"), (12L, "s1", "cc")
    ).toDF("id", "shard", "text")
    val emptyVocab = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      new StructType().add("term", StringType).add("df", LongType))
    val emptyManifest = Seq.empty[String].toDF("shard")
    val (r1, v1) = Incremental.vocabDelta(
      docs.filter(col("shard") === "s0"), emptyManifest, "shard", emptyVocab, "text")
    assert(r1.select("term", "df_prior", "df_delta", "df_total")
      .as[(String, Long, Long, Long)].collect().toSet ==
      Set(("aa", 0L, 2L, 2L), ("bb", 0L, 2L, 2L)))
    val (r2, v2) = Incremental.vocabDelta(
      docs, Seq("s0").toDF("shard"), "shard", v1, "text")
    // report = touched terms only: bb (untouched by d2) must NOT appear,
    // cc is new (df_prior = 0), aa carries its prior count
    assert(r2.select("term", "df_prior", "df_delta", "df_total")
      .as[(String, Long, Long, Long)].collect().toSet ==
      Set(("aa", 2L, 1L, 3L), ("cc", 0L, 2L, 2L)))
    // the grown store keeps untouched terms
    assert(v2.as[(String, Long)].collect().toMap ==
      Map("aa" -> 3L, "bb" -> 2L, "cc" -> 2L))
    // two deliveries ≡ one global pass — additive, no policy
    val (_, vAll) = Incremental.vocabDelta(
      docs, emptyManifest, "shard", emptyVocab, "text")
    assert(vAll.as[(String, Long)].collect().toMap ==
      v2.as[(String, Long)].collect().toMap)
    // idempotent re-run: full manifest → empty delta report, store unchanged
    val (r3, v3) = Incremental.vocabDelta(
      docs, Seq("s0", "s1").toDF("shard"), "shard", v2, "text")
    assert(r3.count() == 0)
    assert(v3.as[(String, Long)].collect().toMap ==
      v2.as[(String, Long)].collect().toMap)
  }

  test("contaminationDelta: gram store travels; a late train gram retroactively contaminates an old eval doc") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    // benchPred: id % 7 == 0 → eval docs 7, 14, 21. k = 3 keeps texts short.
    //  d1: eval 7 "a b c d" (grams: "a b c", "b c d"); train 1 "x y z w"
    //  d2: train 8 "q a b c" (brings "a b c" — RETROACTIVELY hits doc 7),
    //      eval 14 "x y z p" (hits "x y z" from d1's train store),
    //      eval 21 "m n o" + train 9 "m n o" (same-delivery pair → counted
    //      at doc arrival, not double-counted by the retro probe)
    val docs = Seq(
      (7L, "s0", "a b c d"), (1L, "s0", "x y z w"),
      (8L, "s1", "q a b c"), (14L, "s1", "x y z p"),
      (21L, "s1", "m n o"), (9L, "s1", "m n o")
    ).toDF("doc_id", "shard", "text")
    val benchPred = col("doc_id") % 7 === 0
    def empty(schema: StructType) = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    val emptyT = empty(new StructType().add("g", StringType))
    val emptyE = empty(new StructType().add("doc_id", LongType).add("g", StringType))
    val emptyH = empty(new StructType().add("doc_id", LongType)
      .add("n_grams", LongType).add("n_hit", LongType))
    val emptyManifest = Seq.empty[String].toDF("shard")
    val (t1, e1, h1) = Incremental.contaminationDelta(
      docs.filter(col("shard") === "s0"), emptyManifest, "shard",
      emptyT, emptyE, emptyH, "doc_id", "text", benchPred, shingleK = 3)
    assert(h1.as[(Long, Long, Long)].collect().toSet == Set((7L, 2L, 0L)))
    val (t2, e2, h2) = Incremental.contaminationDelta(
      docs, Seq("s0").toDF("shard"), "shard", t1, e1, h1,
      "doc_id", "text", benchPred, shingleK = 3)
    // doc 7: retroactive hit on "a b c"; doc 14: 2 grams, 1 hit ("x y z");
    // doc 21: its only gram arrives WITH train doc 9 → 1 hit, once
    assert(h2.as[(Long, Long, Long)].collect().toSet ==
      Set((7L, 2L, 1L), (14L, 2L, 1L), (21L, 1L, 1L)))
    // two deliveries ≡ one global pass (the operator's replay contract),
    // and ≡ the one-shot contaminationDepth report
    val (_, _, hAll) = Incremental.contaminationDelta(
      docs, emptyManifest, "shard", emptyT, emptyE, emptyH,
      "doc_id", "text", benchPred, shingleK = 3)
    assert(hAll.as[(Long, Long, Long)].collect().toSet ==
      h2.as[(Long, Long, Long)].collect().toSet)
    assert(graft.operators.Dedup.contaminationDepth(
        docs, "doc_id", "text", benchPred, shingleK = 3)
      .select("doc_id", "n_grams", "n_hit")
      .as[(Long, Long, Long)].collect().toSet ==
      h2.as[(Long, Long, Long)].collect().toSet)
    // idempotent re-run: full manifest → empty delta, all stores unchanged
    val (t3, e3, h3) = Incremental.contaminationDelta(
      docs, Seq("s0", "s1").toDF("shard"), "shard", t2, e2, h2,
      "doc_id", "text", benchPred, shingleK = 3)
    assert(h3.as[(Long, Long, Long)].collect().toSet ==
      h2.as[(Long, Long, Long)].collect().toSet)
    assert(t3.count() == t2.count() && e3.count() == e2.count())
  }

  test("ivfRetrainReport: drifted-cell Lloyd step + local repair lifts recall on a drift fixture") {
    import graft.operators.Incremental
    def vec(a: Double, b: Double, c: Double, d: Double): Array[Float] =
      Array(a.toFloat, b.toFloat, c.toFloat, d.toFloat)
    // prior: one anchor per axis cell, c1 padded with near-e1 points so its
    // retrain mean STAYS near e1; delta: a cluster between e0 and e1 whose
    // bulk lands in c0 and whose tail lands in c1 — the split that caps
    // recall at nProbe = 1 until the retrain pulls the tail into c0
    val docs = Seq(
      (0L, "s0", vec(1, 0, 0, 0)), (1L, "s0", vec(0, 1, 0, 0)),
      (2L, "s0", vec(0, 0, 1, 0)), (3L, "s0", vec(0, 0, 0, 1)),
      (4L, "s0", vec(0, 1, 0.01, 0)), (5L, "s0", vec(0, 1, 0, 0.01)),
      (6L, "s0", vec(0.01, 1, 0, 0)),
      (10L, "s1", vec(1, 0.8, 0.001, 0)), (11L, "s1", vec(1, 0.8, 0, 0.001)),
      (12L, "s1", vec(1, 0.8, 0.002, 0)), (13L, "s1", vec(1, 0.8, 0, 0.002)),
      (14L, "s1", vec(0.8, 1, 0.001, 0)), (15L, "s1", vec(0.8, 1, 0, 0.001))
    ).toDF("vec_id", "shard", "embedding")
    val cents = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0), 1.0), (1L, Array(0.0, 1.0, 0.0, 0.0), 1.0),
      (2L, Array(0.0, 0.0, 1.0, 0.0), 1.0), (3L, Array(0.0, 0.0, 0.0, 1.0), 1.0)
    ).toDF("c_id", "cv", "cn")
    val m1 = Seq("s0").toDF("shard")
    val out = Incremental.ivfRetrainReport(
        docs, m1, "shard", cents, "vec_id", "embedding",
        queryPred = col("vec_id") === 10, k = 5, nProbe = 1, nDrifted = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // before: query 10 probes only c0 = {0, 11, 12, 13} → 3 of its 5 true
    // neighbors; the retrain moves c0 toward the cluster and the repair
    // re-assigns the 14/15 tail out of c1 into c0 → all 5 found
    assert(out("before") == ((3L, 5L, 6000L)), s"before: ${out("before")}")
    assert(out("after") == ((5L, 5L, 10000L)), s"after: ${out("after")}")
    assert(out("after")._3 >= out("before")._3)
  }

  test("nearDedupDelta rejects thresholds whose mismatch budget reaches the band count") {
    import graft.operators.Dedup
    // 16 bands × 4 rows, threshold 5/10: 64 − ceil(64·5/10) = 32 ≥ 16 bands,
    // so a threshold pair need not share any true band slice — the
    // collision-safety argument fails and the operator must refuse loudly
    val docs = Seq((1L, "s0", "a b c d e")).toDF("id", "shard", "text")
    val emptySigs = Dedup.minhashSignaturesWithBands(
      docs.limit(0), "id", "text", shingleK = 3, k = 64, bands = 16)
    val ex = intercept[IllegalArgumentException] {
      Incremental.nearDedupDelta(
        docs, Seq.empty[String].toDF("shard"), "shard", emptySigs, "id", "text",
        thresholdNum = 5, thresholdDen = 10)
    }
    assert(ex.getMessage.contains("bands"))
    // the defaults (8/10) stay accepted
    Incremental.nearDedupDelta(
      docs, Seq.empty[String].toDF("shard"), "shard", emptySigs, "id", "text")
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
