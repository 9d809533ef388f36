package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Eval, Similarity}

/** Crafted-data semantics for the round-7 eval/mix additions (the oracle
  * queries pin cross-engine exactness; these pin the operator contracts —
  * NULL guards, clamping, tie-breaks, span merging — on inputs the synthetic
  * corpus may never produce).
  */
class EvalMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("thresholdMetrics: counts, bp metrics, and degenerate-denominator NULLs") {
    // scores: pos at 10, 20, 30; neg at 5, 20
    val df = Seq((10L, true), (20L, true), (30L, true), (5L, false), (20L, false))
      .toDF("s", "y")
    val out = Eval.thresholdMetrics(df, "s", "y", Seq(0L, 15L, 100L))
      .collect().map(r => r.getLong(0) -> r).toMap
    // t=0: everything predicted positive → tp=3 fp=2 fn=0 tn=0
    assert(out(0L).getLong(1) == 3 && out(0L).getLong(2) == 2)
    assert(out(0L).getLong(5) == 3 * 10000 / 5)  // precision_bp
    assert(out(0L).getLong(6) == 10000)          // recall_bp
    // t=15: tp=2 (20,30), fp=1 (20), fn=1 (10), tn=1 (5)
    val t15 = out(15L)
    assert(t15.getLong(1) == 2 && t15.getLong(2) == 1 &&
      t15.getLong(3) == 1 && t15.getLong(4) == 1)
    assert(t15.getLong(7) == 2 * 2 * 10000 / (2 * 2 + 1 + 1)) // f1_bp
    // t=100: nothing predicted positive → precision NULL, f1 defined (fn>0)
    assert(out(100L).isNullAt(5))
    assert(out(100L).getLong(6) == 0)
  }

  test("calibrationBins: floor-div binning with open top bin") {
    val df = Seq((0L, false), (199L, true), (200L, true), (999L, false),
      (5000L, true)).toDF("s", "y")
    val out = Eval.calibrationBins(df, "s", "y",
        binWidth = 200L, nBins = 3, fullScale = 1000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L).getLong(1) == 2 && out(0L).getLong(2) == 1) // 0,199
    assert(out(1L).getLong(1) == 1)                            // 200
    assert(out(2L).getLong(1) == 2)                            // 999, 5000 clamped
    assert(out(0L).getLong(4) == 5000)                         // pos_rate_bp 1/2
    // mean_score_bp of bin 2: (999+5000)*10⁴ div (2*1000)
    assert(out(2L).getLong(5) == (999L + 5000L) * 10000 / 2000)
  }

  test("retrievalMrr: first same-label rank, no-hit NULL row, hit@k edge") {
    // 2-D embeddings: query q0 label 1 at (1,0). Corpus: c10 label 0 at
    // (1, 0.01) ranks 1st, c11 label 1 at (1, 0.2) ranks 2nd, c12 label 1
    // opposite. Query q1 label 9 has no same-label corpus vector at all.
    val corpus = Seq(
      (10L, Array(1f, 0.01f), 0), (11L, Array(1f, 0.2f), 1),
      (12L, Array(-1f, 0f), 1)).toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (0L, Array(1f, 0f), 1), (1L, Array(0f, 1f), 9))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.retrievalMrr(corpus, queries, "vec_id", "embedding",
        "label", kHit = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 2) // one row per query even with no hit
    assert(out(0L).getLong(2) == 2L)        // first same-label at rank 2
    assert(out(0L).getLong(3) == 5000L)     // 10⁴ div 2
    assert(out(0L).getLong(4) == 1L)        // hit@2 boundary inclusive
    assert(out(1L).isNullAt(2))             // no same-label anywhere
    assert(out(1L).getLong(3) == 0L && out(1L).getLong(4) == 0L)
  }

  test("duplicatedNgramSpans: cross-doc + same-doc repeats merge into maximal spans") {
    val rep = "a b c d e f g h" // the shared 8-gram
    val docs = Seq(
      (1L, s"$rep x y z"),                 // gram at pos 1 duplicated (doc 2 has it)
      (2L, s"p q $rep"),                   // gram at pos 3
      (3L, s"$rep $rep"),                  // positions 1..9 all inside repeats
      (4L, "unique words only here nothing repeated at all"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicatedNgramSpans(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: span covering tokens 1..8 only (grams at pos 2+ include x/y/z)
    assert(spans.contains((1L, 1L, 8L, 1L)))
    // doc 2: gram starts at pos 3, covers tokens 3..10
    assert(spans.contains((2L, 3L, 10L, 1L)))
    // doc 3: "a b c d e f g h a b c d e f g h" — every 8-gram window that
    // equals the repeated gram: pos 1 and pos 9; pos 2..8 are rotations that
    // appear only once, so the islands are {1} and {9}, NOT one merged span
    val d3 = spans.filter(_._1 == 3L)
    assert(d3.toSet == Set((3L, 1L, 8L, 1L), (3L, 9L, 16L, 1L)))
    assert(!spans.exists(_._1 == 4L))
  }

  test("duplicatedNgramSpans: consecutive duplicated positions merge") {
    // two docs sharing a 9-token run → two overlapping duplicated 8-grams
    // (pos 1 and 2) that must merge into ONE span covering tokens 1..9
    val run = "a b c d e f g h i"
    val docs = Seq((1L, s"$run tail1"), (2L, s"$run tail2"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicatedNgramSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSet == Set((1L, 1L, 9L, 2L), (2L, 1L, 9L, 2L)))
  }

  test("mx14 temperature mix: allocations exactly exhaust the budget") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.MiscQueries.mx14TemperatureMix.run(spark, dir).collect()
    val tokens = rows.map(_.getAs[Long]("tokens")).sum
    val alloc = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(alloc == tokens / 2) // largest-remainder exhausts B = total div 2
    assert(rows.forall(_.getAs[Long]("alloc_tokens") >= 0))
    // weight = isqrt(tokens) per row
    assert(rows.forall(r => r.getAs[Long]("weight") ==
      math.sqrt(r.getAs[Long]("tokens").toDouble).floor.toLong))
  }

  test("intervalUnion: overlapping and touching intervals merge, disjoint stay split") {
    import graft.operators.Temporal
    // key 1: [0,100) overlaps [50,150) → one island 0..150; [300,400) separate.
    // key 2: [0,100) then touching [100,200): touching merges (start == max
    // end is NOT > so same island) → one interval of 200.
    val df = Seq(
      (1L, 0L, 1L), (1L, 50L, 2L), (1L, 300L, 3L),
      (2L, 0L, 4L), (2L, 100L, 5L))
      .toDF("k", "s", "id")
    val out = Temporal.intervalUnion(df, Seq("k"), "s", "id", durationUs = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 250L))) // 150 + 100
    assert(out(2L) == ((1L, 200L)))
  }

  test("m20 decile lift: deciles partition the corpus and gain reaches 10000") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.WindowQueries.m20DecileLift.run(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val cums = rows.map(_.getAs[Long]("cum_pos"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(rows.last.getAs[Long]("gain_bp") == 10000L)
    // decile sizes differ by at most one (m14 NTILE contract)
    val sizes = rows.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1)
  }

  test("tx18 source vocab drift: non-negative drift, token totals conserved") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.TextQueries.tx18SourceVocabDrift.run(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("drift_cbp") >= 0L))
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val expected = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").count()
    assert(total == expected)
  }

  test("ingestQuota: state carries across micro-batches (half-used quota resumes)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventsStream
    def ev(id: Long, uid: Long, tMs: Long) = EventsStream.Event(
      id, new java.sql.Timestamp(tMs), uid, "click", 1.0)
    // user 1 has 5 events; quota 3. Split 2 | 3 across micro-batches:
    // batch 1 admits 2 (k=1,2), batch 2 admits only ONE more (k=3).
    val evs = (1L to 5L).map(i => ev(i, 1L, 1000L * i))
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[EventsStream.Event]
    val q = EventsStream.ingestQuota(mem.toDS(), quota = 3).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("quota_test")
      .start()
    mem.addData(evs.take(2))
    q.processAllAvailable()
    mem.addData(evs.drop(2))
    q.processAllAvailable()
    val out = spark.sql("SELECT event_id, k FROM quota_test ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    // batch parity: same function over one batch = first-3 by (ts, id)
    import spark.implicits._
    val batch = EventsStream.ingestQuota(evs.toDS(), quota = 3)
      .collect().map(r => (r.event_id, r.k)).sortBy(_._2)
    assert(batch.toSeq == out.toSeq)
  }

  test("PrefixSum.withLag: distributed LAG(1) equals the window form incl. empty splits") {
    import graft.operators.PrefixSum
    import org.apache.spark.sql.expressions.Window
    // 200 rows over 8 shuffled partitions; values distinct from keys so a
    // seed-vs-key mixup would be caught
    val df = spark.range(0, 200).selectExpr("id AS k", "id * 7 + 3 AS v")
      .repartition(8)
    val got = PrefixSum.withLag(df, "k", "v", "pv")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getLong(2)))
    val want = df.withColumn("pv",
        lag(col("v"), 1).over(Window.orderBy(col("k"))))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getLong(2)))
    assert(got.toSeq == want.toSeq)
    assert(got.head._2 == null) // global first row lags to null
  }

  test("w8 OBV: running sum of sign(delta)*volume, first delta contributes 0") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.WindowQueries.w8Obv.run(spark, dir).collect()
    assert(rows.nonEmpty)
    // replay the recurrence on the driver from the output columns
    var prevClose = Double.NaN; var obv = 0L
    rows.foreach { r =>
      val c = r.getAs[Double]("close"); val v = r.getAs[Long]("vol")
      if (!prevClose.isNaN)
        obv += (if (c > prevClose) v else if (c < prevClose) -v else 0L)
      assert(r.getAs[Long]("obv") == obv, s"at d=${r.get(0)}")
      prevClose = c
    }
  }

  test("m21 feature r2: bounds and ±1bp agreement with Spark's corr()²") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.WindowQueries.m21FeatureR2.run(spark, dir).collect()
    assert(rows.length == 3)
    val r2 = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(r2.values.forall(v => v >= 0L && v <= 10000L))
    // independent reference: builtin corr (Welford accumulation — may differ
    // from the exact-sums formula by one ulp, hence ±1 bp)
    val ref = graft.Tables.lineitem(spark, dir)
      .select(corr(col("l_quantity"), col("l_extendedprice")).as("qp"),
        corr(col("l_quantity"), col("l_discount")).as("qd"),
        corr(col("l_extendedprice"), col("l_discount")).as("pd"))
      .head()
    def bp(c: Double) = math.floor(c * c * 10000).toLong
    assert(math.abs(r2(("quantity", "extendedprice")) - bp(ref.getDouble(0))) <= 1)
    assert(math.abs(r2(("quantity", "discount")) - bp(ref.getDouble(1))) <= 1)
    assert(math.abs(r2(("extendedprice", "discount")) - bp(ref.getDouble(2))) <= 1)
  }

  test("m21 r2 formula: a perfectly linear pair scores exactly 10000 bp") {
    // y = 3x + 7 — r² must be exactly 1; same exact-sums-then-double shape
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val dec = DecimalType(38, 0)
    val df = spark.range(1, 101).selectExpr("id AS x", "id * 3 + 7 AS y")
    val a = df.agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
      sum(col("x").cast(dec) * col("x")).as("sxx"),
      sum(col("y").cast(dec) * col("y")).as("syy"),
      sum(col("x").cast(dec) * col("y")).as("sxy"))
    val out = a.select(expr(
      """cast(floor(
        |  cast(n*sxy - sx*sy as double) * cast(n*sxy - sx*sy as double) * 10000.0
        |  / (cast(n*sxx - sx*sx as double) * cast(n*syy - sy*sy as double))) as bigint)
        |""".stripMargin).as("r2_bp")).head().getLong(0)
    assert(out == 10000L)
  }

  test("mm3 audio windows: aligned hops, exact window length, audio modality only") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.MultimodalQueries.mm3AudioWindows.run(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      r.getAs[Long]("end_sample") - r.getAs[Long]("start_sample") == 16000L &&
      r.getAs[Long]("start_sample") % 8000L == 0L &&
      r.getAs[Long]("media_id") % 3 == 1L
    })
  }

  test("tx19 OOV rate: counts consistent, rate is the floored bp ratio") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.TextQueries.tx19OovRate.run(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (n, o, bp) = (r.getAs[Long]("n_toks"), r.getAs[Long]("n_oov"),
        r.getAs[Long]("oov_bp"))
      o <= n && bp == o * 10000 / n
    })
    // the 31-word synthetic vocabulary: top-25 covers most tokens, so the
    // median OOV rate must sit well below 50%
    val med = rows.map(_.getAs[Long]("oov_bp")).sorted.apply(rows.length / 2)
    assert(med < 5000)
  }

  test("dd22 LSH capacity: 16 bands, pair volumes bound the dd2 candidate set") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.DedupQueries.dd22LshCapacity.run(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("band")).toSeq == (0L to 15L))
    val nDocs = Tables.documents(spark, dir)
      .filter(size(split(lower(col("text")), " ")) >= 3).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_buckets") <= nDocs)
      assert(r.getAs[Long]("max_bucket") >= 1L)
      assert(r.getAs[Long]("n_pairs") >= 0L)
    }
    // any band's pair volume upper-bounds the verified dd2 pair count for
    // that band; the SUM over bands bounds the total candidate multiset
    val totalPairs = rows.map(_.getAs[Long]("n_pairs")).sum
    val verified = queries.Shared.minhashPairs(spark, dir).count()
    assert(totalPairs >= verified)
  }

  test("m22 PR curve: cumulative counts monotone in threshold, lowest point has full recall") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.WindowQueries.m22PrCurve.run(spark, dir).collect()
    assert(rows.length > 1)
    val byThr = rows.map(r => (r.getAs[Long]("threshold"), r.getAs[Long]("tp"),
      r.getAs[Long]("fp"), r.getAs[Long]("recall_bp")))
    // ascending threshold → tp/fp non-increasing (fewer predicted positive)
    assert(byThr.zip(byThr.tail).forall { case (a, b) => a._2 >= b._2 && a._3 >= b._3 })
    assert(byThr.head._4 == 10000L) // lowest threshold predicts everything → recall 1
  }

  test("q_reachability: seeds at 0, everything within 3 hops, triangle inequality vs edges") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.AnalyticsQueries.qReachability.run(spark, dir).collect()
    val dist = rows.map(r => r.getAs[Long]("l_partkey") -> r.getAs[Long]("dist")).toMap
    (1L to 10L).foreach(s => assert(!dist.contains(s) || dist(s) == 0L))
    assert(dist.values.forall(d => d >= 0L && d <= 3L))
  }

  test("st10 join matview: converged MERGE equals the batch join+aggregate") {
    val dir = "/root/testdata/sf0.001"
    val got = queries.StreamingQueries.st10JoinMatview.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    import graft.exprs.Exact
    val want = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n"), Exact.dsum(col("o_totalprice")).as("t"),
        max(unix_micros(col("o_orderdate").cast("timestamp"))).as("l"))
      .orderBy(col("c_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("cohensKappa: perfect agreement = 10000 bp, constant rater = NULL") {
    val perfect = Seq((0L, 0L), (1L, 1L), (2L, 2L), (1L, 1L)).toDF("a", "b")
    val p = Eval.cohensKappa(perfect, "a", "b").head()
    assert(p.getLong(0) == 4 && p.getLong(1) == 4)
    assert(p.getLong(3) == 10000)
    // both raters constant: pe = 1 → denominator zero → NULL kappa
    val const = Seq((1L, 1L), (1L, 1L)).toDF("a", "b")
    assert(Eval.cohensKappa(const, "a", "b").head().isNullAt(3))
    // textbook 2×2: a/b agree 15 (10 yes, 5 no), disagree 5 (4, 1) →
    // po=.75, pe=(14·11 + 6·9)/400=.52 → κ=.23/.48 → 4791 bp truncated
    val mixed = Seq.fill(10)((1L, 1L)) ++ Seq.fill(5)((0L, 0L)) ++
      Seq.fill(4)((1L, 0L)) ++ Seq.fill(1)((0L, 1L))
    val m = Eval.cohensKappa(mixed.toDF("a", "b"), "a", "b").head()
    assert(m.getLong(3) == ((20L * 15 - (14 * 11 + 6 * 9)) * 10000) / (400L - (14 * 11 + 6 * 9)))
  }

  test("groupedRankAuc: per-group AUC matches global rankAuc; single-class NULL") {
    // g1: perfect separation (pos scores 3,4 above neg 1,2) → 10000 bp
    // g2: all ties at one score → 5000 bp; g3: single-class → NULL
    val df = Seq(
      ("g1", 1L, false), ("g1", 2L, false), ("g1", 3L, true), ("g1", 4L, true),
      ("g2", 7L, true), ("g2", 7L, false),
      ("g3", 1L, true), ("g3", 2L, true)).toDF("g", "s", "y")
    val out = Eval.groupedRankAuc(df, "g", "s", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getLong(5) == 10000)
    assert(out("g2").getLong(5) == 5000)
    assert(out("g3").isNullAt(5))
    // one-group frame agrees with the global operator row-for-row
    val single = df.filter(col("g") === "g1")
    val global = Eval.rankAuc(single, "s", "y").head()
    val grouped = out("g1")
    assert(grouped.getLong(1) == global.getLong(0) && // pos_n
      grouped.getLong(2) == global.getLong(1) &&      // neg_n
      grouped.getLong(5) == global.getLong(4))        // auc_bp
  }

  test("retrievalNdcg: perfect ranking = 10000 bp, no-relevant = NULL idcg") {
    // corpus: two label-1 vectors nearest the query, one label-0 opposite
    val corpus = Seq(
      (10L, Array(1f, 0f), 1), (11L, Array(1f, 0.1f), 1),
      (12L, Array(-1f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (0L, Array(1f, 0.05f), 1), (1L, Array(0f, 1f), 9))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.retrievalNdcg(corpus, queries, "vec_id", "embedding", "label", k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // q0: both relevant docs at ranks 1-2 → dcg = idcg → 10000 bp
    assert(out(0L).getLong(2) == 2)
    assert(out(0L).getLong(5) == 10000)
    // q1: no same-label corpus vector → n_rel 0, NULL idcg and ndcg
    assert(out(1L).getLong(2) == 0)
    assert(out(1L).isNullAt(4) && out(1L).isNullAt(5))
  }

  test("softDedupWeights: cluster members split mass, singletons keep 10000") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // labels frame: {1,2,3} one component rooted at 1; 4,5 unlabeled singletons
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "comp")
    val out = Dedup.softDedupWeights(docs, "doc_id", labels)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 3 && out(1L).getLong(3) == 3333)
    assert(out(2L).getLong(1) == 1L) // cluster id = component root
    assert(out(4L).getLong(2) == 1 && out(4L).getLong(3) == 10000)
    assert(out.values.map(_.getLong(3)).forall(w => w >= 1 && w <= 10000))
  }

  test("withStochastic: %K bounds, flat-window NULL, fixed-association %D") {
    import graft.operators.Indicators
    // high=low=close constant for 5 rows → flat window → NULL %K
    val flat = (1 to 5).map(i => (i.toLong, 10.0, 10.0, 10.0)).toDF("t", "high", "low", "close")
    val f = Indicators.withStochastic(flat, "high", "low", "close",
      "pct_k", "pct_d", kPeriod = 3, dPeriod = 2, orderCol = "t")
    assert(f.collect().forall(_.isNullAt(4)))
    // ramp 1..6 with high=close+1, low=close-1, k=3: full window from t=3
    val ramp = (1 to 6).map(i => (i.toLong, i + 1.0, i - 1.0, i.toDouble))
      .toDF("t", "high", "low", "close")
    val r = Indicators.withStochastic(ramp, "high", "low", "close",
        "pct_k", "pct_d", kPeriod = 3, dPeriod = 2, orderCol = "t")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).isNullAt(4) && r(2L).isNullAt(4))
    // t=3: lo=min(low[1..3])=0, hi=max(high[1..3])=4 → k=100*(3-0)/4=75
    assert(r(3L).getDouble(4) == 75.0)
    assert(r(3L).isNullAt(5)) // %D needs 2 full %K values
    // t=4: lo=1, hi=5 → k=75; %D(t=4) = (75+75)/2
    assert(r(4L).getDouble(5) == 75.0)
    val ks = r.values.filterNot(_.isNullAt(4)).map(_.getDouble(4))
    assert(ks.forall(k => k >= 0.0 && k <= 100.0))
  }

  test("spearmanRho: perfect monotone, inverse, midrank ties, degenerate axis") {
    // strictly increasing pairs → rho exactly +1
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("x", "y")
    assert(Eval.spearmanRho(up, "x", "y").collect()(0).getLong(4) == 10000L)
    // strictly decreasing → exactly −1 (floor of −10000.0 is −10000)
    val down = Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L)).toDF("x", "y")
    assert(Eval.spearmanRho(down, "x", "y").collect()(0).getLong(4) == -10000L)
    // midrank ties, hand-computed: x=(1,1,2) y=(5,7,7) → doubled midranks
    // r2x=(3,3,6), r2y=(2,5,5); num=9, var_x=var_y=18 → rho = 0.5
    val tied = Seq((1L, 5L), (1L, 7L), (2L, 7L)).toDF("x", "y")
    val t = Eval.spearmanRho(tied, "x", "y").collect()(0)
    assert(t.getLong(0) == 3)
    assert(t.getDouble(1) == 9.0)
    assert(t.getDouble(2) == 18.0)
    assert(t.getDouble(3) == 18.0)
    assert(t.getLong(4) == 5000L)
    // constant axis → zero variance → NULL rho, not a divide/sqrt throw
    val const = Seq((7L, 1L), (7L, 2L), (7L, 3L)).toDF("x", "y")
    assert(Eval.spearmanRho(const, "x", "y").collect()(0).isNullAt(4))
  }

  test("mcnemar: discordant cells and continuity correction; no-discord NULL") {
    // truth all true; a right on 4 rows where b wrong on 3, b right where a
    // wrong on 1 → b01=3, b10=1, chi2_cc = (|3−1|−1)²/4 → 2500 bp
    val df = Seq(
      (true, true, false), (true, true, false), (true, true, false),
      (true, false, true),
      (true, true, true), (true, false, false)).toDF("t", "a", "b")
    val r = Eval.mcnemar(df, "t", "a", "b").collect()(0)
    assert(r.getLong(0) == 6 && r.getLong(1) == 3 && r.getLong(2) == 1)
    assert(r.getLong(3) == 2500L)
    // perfectly agreeing models → no discordant pairs → NULL statistic
    val agree = Seq((true, true, true), (false, true, true)).toDF("t", "a", "b")
    assert(Eval.mcnemar(agree, "t", "a", "b").collect()(0).isNullAt(3))
  }

  test("mannWhitneyU: hand-computed midranks/U, tie correction, degenerate NULLs") {
    // group1 = {1, 2}, group0 = {2, 3, 4}: midranks 1, 2.5 | 2.5, 4, 5
    // → U₁ = 0.5 (one tie pair), u1_x2 = 2·R₁ − n₁(n₁+1) = 7 − 6 = 1
    val df = Seq((true, 1L), (true, 2L), (false, 2L), (false, 3L), (false, 4L))
      .toDF("g", "v")
    val r = Eval.mannWhitneyU(df, "g", "v").collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 3)
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 6L) // one 2-way tie: 2³ − 2
    // z from the same exact pieces: (1 − 6) / (2·√(684/240)), half-up bp
    val z = (1.0 - 6.0) * 10000.0 / (2.0 * math.sqrt(684.0 / 240.0))
    assert(r.getLong(4) == math.floor(z + 0.5).toLong)

    // every value tied → zero variance → NULL z (u1_x2 still defined)
    val tied = Seq((true, 7L), (false, 7L), (false, 7L)).toDF("g", "v")
    val t = Eval.mannWhitneyU(tied, "g", "v").collect()(0)
    assert(t.isNullAt(4))
    assert(t.getLong(2) == 2L) // R₁ = midrank 2 → 2·2 − 2

    // one group empty → n₁n₂ = 0 → NULL z
    val solo = Seq((false, 1L), (false, 2L)).toDF("g", "v")
    assert(Eval.mannWhitneyU(solo, "g", "v").collect()(0).isNullAt(4))
  }

  test("tx17 gopher filter: keep is the conjunction of the rule booleans") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.TextQueries.tx17GopherFilter.run(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      r.getAs[Boolean]("keep") ==
        (r.getAs[Boolean]("r_wc") && r.getAs[Boolean]("r_mwl") &&
         r.getAs[Boolean]("r_alpha") && r.getAs[Boolean]("r_symbol") &&
         r.getAs[Boolean]("r_stop"))
    })
  }

  test("cramersV: perfect association = 10000 bp, independence = 0, degenerate NULL") {
    // perfect 2x2 association: a fully determines b
    val perfect = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L)).toDF("a", "b")
    val p = Eval.cramersV(perfect, "a", "b").collect()(0)
    assert(p.getLong(0) == 4 && p.getLong(1) == 2 && p.getLong(2) == 2)
    assert(p.getLong(4) == 10000L)
    // exact independence: every cell obs*n == rt*ct -> chi2 = 0 -> V = 0
    val indep = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L)).toDF("a", "b")
    assert(Eval.cramersV(indep, "a", "b").collect()(0).getLong(4) == 0L)
    // single column level: min(r-1, c-1) = 0 -> NULL
    val degen = Seq(("x", 1L), ("y", 1L)).toDF("a", "b")
    assert(Eval.cramersV(degen, "a", "b").collect()(0).isNullAt(4))
  }

  test("percentileCont: numpy-linear interpolation in exact centi-units") {
    // [10,20,30,40]: q25 = 17.5, q50 = 25, q75 = 32.5, q99 = 39.7
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L), ("b", 7L))
      .toDF("g", "v")
    val out = Eval.percentileCont(df, "g", "v", Seq(25, 50, 75, 99))
      .orderBy("g").collect()
    val a = out(0)
    assert(a.getLong(1) == 4)
    assert(a.getLong(2) == 1750L && a.getLong(3) == 2500L)
    assert(a.getLong(4) == 3250L && a.getLong(5) == 3970L)
    // singleton group: every percentile interpolates to the value itself
    val b = out(1)
    assert(b.getLong(1) == 1)
    assert((2 to 5).forall(i => b.getLong(i) == 700L))
    // duplicated values collapse onto the grid but weight the cum counts:
    // [1,1,3] -> q50 at position 1 -> exactly the middle occurrence = 1.0
    val dup = Seq(("c", 1L), ("c", 1L), ("c", 3L)).toDF("g", "v")
    assert(Eval.percentileCont(dup, "g", "v", Seq(50)).collect()(0).getLong(2) == 100L)
  }

  test("welchT: scalar replay of t and Welch dof; degenerate NULLs") {
    // group1 = {10, 20, 30}, group0 = {10, 12}
    val df = Seq((true, 10L), (true, 20L), (true, 30L), (false, 10L), (false, 12L))
      .toDF("g", "v")
    val r = Eval.welchT(df, "g", "v").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getLong(2) == 60L && r.getLong(3) == 22L)
    // scalar replay with the same op order
    val a1 = (3.0 * 1400 - 60.0 * 60) / (3.0 * 2) / 3.0   // s1²/n1 = 100/3
    val a2 = (2.0 * 244 - 22.0 * 22) / (2.0 * 1) / 2.0    // s2²/n2 = 1
    val d = (60.0 * 2 - 22.0 * 3) / (3.0 * 2)             // 20 - 11 = 9
    val t = d / math.sqrt(a1 + a2)
    val dof = (a1 + a2) * (a1 + a2) / (a1 * a1 / 2.0 + a2 * a2 / 1.0)
    assert(r.getLong(4) == math.floor(t * 1000.0 + 0.5).toLong)
    assert(r.getLong(5) == math.floor(dof * 1000.0 + 0.5).toLong)

    // both groups constant -> zero variance on both sides -> NULL
    val const = Seq((true, 5L), (true, 5L), (false, 9L), (false, 9L)).toDF("g", "v")
    val c = Eval.welchT(const, "g", "v").collect()(0)
    assert(c.isNullAt(4) && c.isNullAt(5))
    // a single-row group -> NULL (variance undefined)
    val solo = Seq((true, 5L), (false, 1L), (false, 2L)).toDF("g", "v")
    assert(Eval.welchT(solo, "g", "v").collect()(0).isNullAt(4))
    // one-sided zero variance is fine (se² > 0): defined t
    val half = Seq((true, 5L), (true, 5L), (false, 1L), (false, 3L)).toDF("g", "v")
    assert(!Eval.welchT(half, "g", "v").collect()(0).isNullAt(4))
  }

  test("tx24 langid confusion: rows partition the corpus, shares sum to ~10000") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.TextQueries.tx24LangidConfusion.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[String]("lang") == r.getAs[String]("predicted")))
    }
    // per-truth-language: cell counts sum to the corpus row count for that
    // language, and floor-div shares sum to 10000 minus sub-bp remainders
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    val corpusByLang = Tables.documents(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, cells) =>
      assert(cells.map(_.getAs[Long]("n")).sum == corpusByLang(lang))
      val shares = cells.map(_.getAs[Long]("row_share_bp")).sum
      assert(shares <= 10000 && shares > 10000 - cells.length)
    }
  }

  test("runsTest: hand-counted runs, median-drop convention, degenerate NULL") {
    // values 1..6 in order [1,4,2,5,3,6], median pick = nearest-rank(3) = 3;
    // 3 drops -> signs over [1,4,2,5,6] (ordered by o) = B,A,B,A,A -> 4 runs
    val df = Seq((1L, 1L), (2L, 4L), (3L, 2L), (4L, 5L), (5L, 3L), (6L, 6L))
      .toDF("o", "v")
    val r = Eval.runsTest(df, "o", "v").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2) // above: 4,5,6; below: 1,2
    assert(r.getLong(2) == 4L)
    // z replay with the same op order: R=4, n1=3, n2=2, n=5
    val z = (4.0 * 5 - 2 * 3 * 2 - 5) / 5.0 /
      math.sqrt((2.0 * 3 * 2 * (2 * 3 * 2 - 5)) / (5.0 * 5 * 4))
    assert(r.getLong(3) == math.floor(z * 1000.0 + 0.5).toLong)

    // oscillating pattern (post-drop [B,A,A,B,A,A]) -> more runs than the
    // trend expectation -> positive z
    val alt = Seq((1L, 1L), (2L, 8L), (3L, 2L), (4L, 9L),
      (5L, 1L), (6L, 8L), (7L, 2L), (8L, 9L)).toDF("o", "v")
    val a = Eval.runsTest(alt, "o", "v").collect()(0)
    assert(a.getLong(0) == 4 && a.getLong(1) == 2) // med = 2 drops both 2s
    assert(a.getLong(2) == 4L)
    assert(a.getLong(3) > 0)
    // one-sided after the median drop -> NULL z
    val flat = Seq((1L, 5L), (2L, 5L), (3L, 7L)).toDF("o", "v")
    assert(Eval.runsTest(flat, "o", "v").collect()(0).isNullAt(3))
  }

  test("mx19 dedup-aware mix: allocation exhausts the effective half-budget") {
    val dir = "/root/testdata/sf0.001"
    graft.queries.Shared.clear()
    val rows = queries.DedupQueries.mx19DedupAwareMix.run(spark, dir).collect()
    assert(rows.nonEmpty)
    // effective mass never exceeds raw mass (weights <= 1)
    rows.foreach(r => assert(r.getAs[Long]("eff_tokens") <= r.getAs[Long]("raw_tokens")))
    // largest-remainder exhausts B = sum(eff) div 2 exactly
    val eff = rows.map(_.getAs[Long]("eff_tokens")).sum
    val alloc = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(alloc == eff / 2, s"alloc $alloc != B ${eff / 2}")
    // weights are isqrt of effective mass
    rows.foreach(r => assert(r.getAs[Long]("weight") ==
      math.sqrt(r.getAs[Long]("eff_tokens").toDouble).floor.toLong))
    graft.queries.Shared.clear()
  }

  test("momentsByGroup: symmetric zero skew, uniform kurtosis, crafted skew/kurt") {
    // uniform {1..5}: mean 3, M2 = 2, M3 = 0, M4 = 6.8 -> skew 0, kurt -1.3
    // skewed {0,0,0,0,10}: M2 = 16, M3 = 96, M4 = 832 -> skew 1.5, kurt 0.25
    val df = (Seq(1L, 2L, 3L, 4L, 5L).map(("u", _)) ++
      Seq(0L, 0L, 0L, 0L, 10L).map(("s", _)) ++
      Seq(7L).map(("one", _)) ++ Seq(4L, 4L, 4L).map(("const", _)))
      .toDF("g", "v")
    val out = Eval.momentsByGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("u").getLong(1) == 5 && out("u").getLong(2) == 300L)
    assert(out("u").getLong(3) == 0L && out("u").getLong(4) == -1300L)
    assert(out("s").getLong(2) == 200L)
    assert(out("s").getLong(3) == 1500L && out("s").getLong(4) == 250L)
    // degenerate groups: singleton and zero variance -> NULL shape stats
    assert(out("one").isNullAt(3) && out("one").isNullAt(4))
    assert(out("const").isNullAt(3) && out("const").isNullAt(4))
  }

  test("m38 autocorr: perfect periodicity shows in the ACF head") {
    // invariants over the real series: all five lags present, r within
    // [-1, 1] bp, and each extra lag drops exactly one pair
    val dir = "/root/testdata/sf0.001"
    val rows = queries.WindowQueries.m38Autocorr.run(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 5L))
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      if (!r.isNullAt(2)) {
        val bp = r.getLong(2)
        assert(bp >= -10000 && bp <= 10000, s"r_bp $bp out of range")
      }
    }
    // pair counts shrink by exactly one row per extra lag
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a == b + 1 })
  }

  test("q_resample_interp: filled rows interpolate between anchors on the real spine") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.AnalyticsQueries.qResampleInterp.run(spark, dir).collect()
    assert(rows.nonEmpty)
    // the spine is contiguous daily
    val ds = rows.map(_.getDate(0).toLocalDate)
    ds.zip(ds.tail).foreach { case (a, b) => assert(b == a.plusDays(1)) }
    // every filled value lies within [min, max] of its neighbors' band:
    // linear interpolation never overshoots the anchor interval
    val vals = rows.map(r => (r.getLong(1), r.getLong(2)))
    var lastObs = Option.empty[Long]
    val pending = scala.collection.mutable.ArrayBuffer.empty[Long]
    vals.foreach { case (v, filled) =>
      if (filled == 0L) {
        lastObs.foreach { lo =>
          pending.foreach { pv =>
            val (a, b) = (math.min(lo, v), math.max(lo, v))
            assert(pv >= a && pv <= b, s"fill $pv outside [$a, $b]")
          }
        }
        pending.clear(); lastObs = Some(v)
      } else pending += v
    }
  }

  test("q_dow_seasonality: seven ISO weekdays, shares sum to ~10000, totals conserved") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.AnalyticsQueries.qDowSeasonality.run(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    val shares = rows.map(_.getLong(3)).sum
    assert(shares <= 10000 && shares > 10000 - 7)
    val totalCents = rows.map(_.getLong(2)).sum
    val expect = Tables.orders(spark, dir)
      .agg(sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")))
      .head().getLong(0)
    assert(totalCents == expect)
    rows.foreach(r => assert(r.getLong(4) >= 0)) // squared deviations
  }

  test("q_priority_transitions: 5x5 grid, row shares sum to ~10000, pair conservation") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.AnalyticsQueries.qPriorityTransitions.run(spark, dir).collect()
    assert(rows.length == 25)
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      val shares = cells.map(_.getLong(3)).sum
      assert(shares <= 10000 && shares > 10000 - cells.length)
    }
    // total transitions = total orders - customers with >= 1 order
    val total = rows.map(_.getLong(2)).sum
    val o = Tables.orders(spark, dir)
    val expect = o.count() - o.select("o_custkey").distinct().count()
    assert(total == expect, s"$total != $expect")
  }

  test("giniGain: perfect split gains the full base impurity, uninformative gains zero") {
    // f1 separates the label perfectly; f2 is independent of it
    val df = Seq(("x", "p", "a"), ("x", "q", "a"), ("y", "p", "b"), ("y", "q", "b"))
      .toDF("f1", "f2", "lbl")
    val out = Eval.giniGain(df,
        Seq("f1" -> col("f1"), "f2" -> col("f2")), col("lbl"))
      .collect().map(r => r.getString(0) -> r).toMap
    // base Gini with labels 2/2 of 4: 1 - 2·(1/2)² = 1/2 → 500000 ppm
    assert(out("f1").getLong(2) == 500000 && out("f2").getLong(2) == 500000)
    // f1: both children pure → child Gini 0, gain = full base impurity
    assert(out("f1").getLong(3) == 0 && out("f1").getLong(4) == 500000)
    // f2: children replicate the base mix → no gain
    assert(out("f2").getLong(3) == 500000 && out("f2").getLong(4) == 0)
    // ordering: best feature first
    val ordered = Eval.giniGain(df,
      Seq("f1" -> col("f1"), "f2" -> col("f2")), col("lbl")).collect()
    assert(ordered.head.getString(0) == "f1")
    // n_values per feature
    assert(out("f1").getLong(1) == 2 && out("f2").getLong(1) == 2)

    // three-way feature dominated by a pure majority value
    val df3 = Seq(("u", "a"), ("u", "a"), ("u", "a"), ("v", "b"), ("w", "b"))
      .toDF("f", "lbl")
    val r3 = Eval.giniGain(df3, Seq("f" -> col("f")), col("lbl")).head()
    // base: 1 - (9+4)/25 = 12/25 = 480000 ppm; children all pure → gain = base
    assert(r3.getLong(2) == 480000 && r3.getLong(3) == 0 && r3.getLong(4) == 480000)
  }

  test("brierDecomposition: hand-computed Murphy terms, pinned truncation") {
    // bin0: p_bp 2000,2000,4000,0 with y 0,0,1,0; bin1: 8000,6000,10000 / 1,0,1
    val df = Seq((2000L, 0L, 0L), (2000L, 0L, 0L), (4000L, 1L, 0L), (0L, 0L, 0L),
      (8000L, 1L, 1L), (6000L, 0L, 1L), (10000L, 1L, 1L)).toDF("p", "y", "bin")
    val r = Eval.brierDecomposition(df, col("p"), col("y"), col("bin")).head()
    assert(r.getLong(r.fieldIndex("n")) == 7L && r.getLong(r.fieldIndex("pos")) == 3L)
    // brier = (1/7)*0.84 -> 120000 ppm exactly
    assert(r.getLong(r.fieldIndex("brier_ppm")) == 120000L)
    // rel: bin0 (8000-10000)^2*1e6 div 4e8 = 10000; bin1 4000^2*1e6 div 3e8 = 53333
    assert(r.getLong(r.fieldIndex("rel_ppm")) == (10000L + 53333L) / 7L) // 9047
    // res: bin0 (1*7-3*4)^2*1e6 div (4*49) = 127551; bin1 25e6 div 147 = 170068
    assert(r.getLong(r.fieldIndex("res_ppm")) == (127551L + 170068L) / 7L) // 42517
    // unc: 3*4*1e6 div 49 = 244897
    assert(r.getLong(r.fieldIndex("unc_ppm")) == 244897L)
  }

  test("wilcoxonSignedRank: hand-computed midranks, zero drop, tie correction") {
    // d: +3, -1, +1, +2, +2, 0 (zero drops) -> n=5
    val df = Seq(3L, -1L, 1L, 2L, 2L, 0L).toDF("d")
    val r = Eval.wilcoxonSignedRank(df, "d").head()
    // |d| grid: 1 -> c=2 cpos=1 r2=3; 2 -> c=2 cpos=2 r2=7; 3 -> c=1 cpos=1 r2=10
    assert(r.getLong(r.fieldIndex("n_pairs")) == 5L)
    assert(r.getLong(r.fieldIndex("w_plus_x2")) == 27L) // W+ = 13.5
    assert(r.getLong(r.fieldIndex("tie_sum")) == 12L)
    // var_num = 2*5*6*11 - 12 = 648 (Var = 13.5); num = 27 - 15 = 12
    val want = math.floor(12.0 * 10000.0 / (2.0 * math.sqrt(648.0 / 48.0)) + 0.5).toLong
    assert(r.getLong(r.fieldIndex("z_bp")) == want && want == 16330L)
  }

  test("kruskalWallis: hand-computed midranks, empty group, all-tied NULL correction") {
    // a: [1,2,2], b: [2,3], c: [5]; grid ranks 1, 3(mid), 5, 6 (doubled: 2,6,10,12)
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 2L), ("b", 3L), ("c", 5L))
      .toDF("g", "v")
    val r = Eval.kruskalWallis(df, "g", "v", Seq("a", "b", "c", "z")).head()
    assert(r.getLong(r.fieldIndex("n")) == 6L)
    assert(r.getLong(r.fieldIndex("tie_sum")) == 24L) // 0 + (27-3) + 0 + 0
    assert(r.getLong(r.fieldIndex("n_a")) == 3L && r.getLong(r.fieldIndex("r2x2_a")) == 14L)
    assert(r.getLong(r.fieldIndex("n_b")) == 2L && r.getLong(r.fieldIndex("r2x2_b")) == 16L)
    assert(r.getLong(r.fieldIndex("n_c")) == 1L && r.getLong(r.fieldIndex("r2x2_c")) == 12L)
    // listed-but-empty group contributes exact zeros (and 0.0 to T)
    assert(r.getLong(r.fieldIndex("n_z")) == 0L && r.getLong(r.fieldIndex("r2x2_z")) == 0L)
    // replay the pinned double sequence: T in listed order, then H, H_c
    val t = 14.0 * 14.0 / 3.0 + 16.0 * 16.0 / 2.0 + 12.0 * 12.0 / 1.0 + 0.0
    val h = 3.0 * t / 42.0 - 3.0 * 7.0
    val hc = h / (1.0 - 24.0 / 210.0)
    assert(r.getLong(r.fieldIndex("h_bp")) == math.floor(h * 10000.0 + 0.5).toLong)
    assert(r.getLong(r.fieldIndex("hc_bp")) == math.floor(hc * 10000.0 + 0.5).toLong)
    // all-tied input: H exactly 0, tie correction degenerates to NULL
    val tied = Seq(("a", 7L), ("a", 7L), ("b", 7L), ("b", 7L)).toDF("g", "v")
    val z = Eval.kruskalWallis(tied, "g", "v", Seq("a", "b")).head()
    assert(z.getLong(z.fieldIndex("h_bp")) == 0L)
    assert(z.isNullAt(z.fieldIndex("hc_bp")))
  }

  test("boxplot: exact quartiles, doubled fences, outlier counts, interpolated group") {
    val df = (Seq(10L, 20L, 30L, 40L, 1000L).map(("a", _)) ++
      Seq(10L, 20L).map(("b", _))).toDF("g", "v")
    val out = Eval.boxplot(df, "g", "v").orderBy("g").collect()
    val a = out(0)
    assert(a.getLong(a.fieldIndex("p25_centi")) == 2000L)
    assert(a.getLong(a.fieldIndex("p50_centi")) == 3000L)
    assert(a.getLong(a.fieldIndex("p75_centi")) == 4000L)
    assert(a.getLong(a.fieldIndex("iqr_centi")) == 2000L)
    assert(a.getLong(a.fieldIndex("lo_fence_centi_x2")) == -2000L)
    assert(a.getLong(a.fieldIndex("hi_fence_centi_x2")) == 14000L)
    assert(a.getLong(a.fieldIndex("n_low_outliers")) == 0L)
    assert(a.getLong(a.fieldIndex("n_high_outliers")) == 1L) // the 1000
    // 2-value group exercises the interpolation path: p25 = 12.50
    val b = out(1)
    assert(b.getLong(b.fieldIndex("p25_centi")) == 1250L)
    assert(b.getLong(b.fieldIndex("p75_centi")) == 1750L)
    assert(b.getLong(b.fieldIndex("n_low_outliers")) == 0L)
    assert(b.getLong(b.fieldIndex("n_high_outliers")) == 0L)
  }

  test("friedman: hand-computed doubled midranks, incomplete block dropped, all-tied NULL") {
    // blocks 1-3 complete; block 4 lacks treatment c and must be dropped
    val df = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L),
      (2L, "a", 2L), (2L, "b", 1L), (2L, "c", 3L),
      (3L, "a", 1L), (3L, "b", 1L), (3L, "c", 2L), // a/b tied -> r2 = 3 each
      (4L, "a", 9L), (4L, "b", 9L))
      .toDF("b", "t", "v")
    val r = Eval.friedman(df, "b", "t", "v", Seq("a", "b", "c")).head()
    assert(r.getLong(r.fieldIndex("n_blocks")) == 3L)
    assert(r.getLong(r.fieldIndex("r2_a")) == 9L)  // 2 + 4 + 3
    assert(r.getLong(r.fieldIndex("r2_b")) == 9L)  // 4 + 2 + 3
    assert(r.getLong(r.fieldIndex("r2_c")) == 18L) // 6 + 6 + 6
    // num = 2·((9−12)² + (9−12)² + (18−12)²) = 108; den = 166 − 144 = 22
    assert(r.getLong(r.fieldIndex("chi2_milli")) == 108000L / 22L) // 4909
    // every block internally tied: denominator 0, chi2 pinned NULL
    val tied = Seq(
      (1L, "a", 5L), (1L, "b", 5L), (1L, "c", 5L),
      (2L, "a", 7L), (2L, "b", 7L), (2L, "c", 7L)).toDF("b", "t", "v")
    val z = Eval.friedman(tied, "b", "t", "v", Seq("a", "b", "c")).head()
    assert(z.isNullAt(z.fieldIndex("chi2_milli")))
    assert(z.getLong(z.fieldIndex("n_blocks")) == 2L)
  }

  test("jonckheereTerpstra: hand-computed J2/E2/tie-corrected variance, all-tied NULL") {
    // a: [1,2], b: [2,3], c: [4] -> pairwise doubled U: (a,b)=7, (a,c)=4, (b,c)=4
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L), ("c", 4L)).toDF("g", "v")
    val r = Eval.jonckheereTerpstra(df, "g", "v", Seq("a", "b", "c")).head()
    assert(r.getLong(r.fieldIndex("n")) == 5L)
    assert(r.getLong(r.fieldIndex("j2")) == 15L)
    assert(r.getLong(r.fieldIndex("e2")) == 8L) // n_a·n_b + n_a·n_c + n_b·n_c
    assert(r.getLong(r.fieldIndex("n_a")) == 2L &&
      r.getLong(r.fieldIndex("n_b")) == 2L && r.getLong(r.fieldIndex("n_c")) == 1L)
    // Lehmann pieces: A = 5·4·15 − (18+18+0) − 18 = 246, B = 0·0, C = 60,
    // D = (2+2+0)·2 = 8, E = 20; replay the pinned IEEE sequence
    val vr = 246.0 / 72.0 + 0.0 / (36.0 * 60.0) + 8.0 / (8.0 * 20.0)
    val want = math.floor(7.0 * 10000.0 / (2.0 * math.sqrt(vr)) + 0.5).toLong
    assert(r.getLong(r.fieldIndex("z_bp")) == want && want == 18798L)
    // all values tied: variance pieces cancel to 0, z pinned NULL
    val tied = Seq(("a", 9L), ("b", 9L), ("c", 9L)).toDF("g", "v")
    val t = Eval.jonckheereTerpstra(tied, "g", "v", Seq("a", "b", "c")).head()
    assert(t.isNullAt(t.fieldIndex("z_bp")))
    assert(t.getLong(t.fieldIndex("j2")) == t.getLong(t.fieldIndex("e2"))) // all ties: J2 = E2
  }
}
