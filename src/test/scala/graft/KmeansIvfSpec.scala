package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Spherical k-means coarse quantizer + IVF search against its centroids:
  * the production path the trivial-quantizer `sim3` oracle query stands in
  * for (same assignment/equi-join structure, learned centroids).
  */
class KmeansIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def corpus = Similarity.preparedCorpus(
    Tables.embeddings(spark, sf), "vec_id", "embedding")

  test("kmeans: k centroids, deterministic, objective does not degrade") {
    val c0 = Similarity.kmeansCentroids(Tables.embeddings(spark, sf), "vec_id", "embedding",
      k = 8, iters = 0) // init only
    val c3 = Similarity.kmeansCentroids(Tables.embeddings(spark, sf), "vec_id", "embedding",
      k = 8, iters = 3)
    assert(c3.count() == 8)
    assert(c3.filter(col("cn") <= 0.0 || col("cn").isNull).count() == 0)

    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.assignCells(corpus, cents)
        .agg(sum(col("cell_cos"))).head().getDouble(0)
    // Lloyd improves (or keeps) the summed assignment similarity
    assert(objective(c3) >= objective(c0) - 1e-9)

    // determinism: same inputs, same centroids
    val c3b = Similarity.kmeansCentroids(Tables.embeddings(spark, sf), "vec_id", "embedding",
      k = 8, iters = 3)
    assert(c3.orderBy("c_id").collect().toSeq == c3b.orderBy("c_id").collect().toSeq)
  }

  test("assignCells: a zero-norm (NaN-cosine) centroid never captures rows, at any array position") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{sqrt => _, _}
    // centroid 0 is the ZERO vector (cn = 0 → cosine NaN for every row);
    // centroids 1/2 are the axes. The degenerate centroid must never win —
    // including for the row most aligned with nothing — and the result
    // must not depend on where collect_list happened to place it (the
    // kernel skips NaN; the old window form would have ranked NaN FIRST
    // and given centroid 0 the whole corpus).
    val p = Seq(
      (10L, Array(1.0, 0.0)), (11L, Array(0.0, 1.0)), (12L, Array(1.0, 1.0))
    ).toDF("vec_id", "v").withColumn("nrm",
      org.apache.spark.sql.functions.sqrt(
        org.apache.spark.sql.functions.aggregate(
          transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
    def cents(ids: Seq[(Long, Array[Double])]) = ids.toDF("c_id", "cv")
      .withColumn("cn", org.apache.spark.sql.functions.sqrt(
        org.apache.spark.sql.functions.aggregate(
          transform(col("cv"), x => x * x), lit(0.0), (a, x) => a + x)))
    val zeroFirst = cents(Seq(0L -> Array(0.0, 0.0), 1L -> Array(1.0, 0.0), 2L -> Array(0.0, 1.0)))
    val zeroLast = cents(Seq(1L -> Array(1.0, 0.0), 2L -> Array(0.0, 1.0), 0L -> Array(0.0, 0.0)))
    def asg(c: org.apache.spark.sql.DataFrame) =
      Similarity.assignCells(p, c).select("vec_id", "cell")
        .as[(Long, Long)].collect().toMap
    val a1 = asg(zeroFirst); val a2 = asg(zeroLast)
    assert(a1 == Map(10L -> 1L, 11L -> 2L, 12L -> 1L), a1.toString)
    assert(a1 == a2, "assignment must not depend on centroid array order")
    // all centroids degenerate → deterministic lowest-id fallback, NaN cos
    val allZero = cents(Seq(7L -> Array(0.0, 0.0), 3L -> Array(0.0, 0.0)))
    val fb = Similarity.assignCells(p, allZero)
      .select("vec_id", "cell", "cell_cos").collect()
    assert(fb.forall(r => r.getLong(1) == 3L && r.getDouble(2).isNaN))
  }

  test("kmeans sampleCap: no-op above the cell sizes, deterministic sample below") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count().toInt
    // cap >= every cell: bit-identical centroids to the default kernel
    val full = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 2)
    val capped = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 2,
      sampleCap = n)
    assert(full.orderBy("c_id").collect().toSeq == capped.orderBy("c_id").collect().toSeq)

    // cap below cell sizes: still k valid centroids, and the hash-sample is
    // arrival-order independent — two runs agree bit-for-bit
    val s1 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 2,
      sampleCap = 8)
    val s2 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 2,
      sampleCap = 8)
    assert(s1.count() == 4 && s1.filter(col("cn") <= 0.0 || col("cn").isNull).count() == 0)
    assert(s1.orderBy("c_id").collect().toSeq == s2.orderBy("c_id").collect().toSeq)

    // the capped mean is exactly the mean of the cap members with the
    // smallest (fmix64(id), id) — verified against a driver-side replay of
    // one iteration on the init centroids
    import spark.implicits._
    val p = Similarity.preparedCorpus(emb, "vec_id", "embedding")
    val init = p.orderBy("vec_id").limit(4)
      .select(col("vec_id"), col("v")).as[(Long, Array[Double])].collect()
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    val initDf = init.toSeq.toDF("c_id", "cv")
      .withColumn("cn", org.apache.spark.sql.functions.sqrt(
        org.apache.spark.sql.functions.aggregate(
          org.apache.spark.sql.functions.transform(col("cv"), x => x * x),
          org.apache.spark.sql.functions.lit(0.0), (a, x) => a + x)))
    val assigned = Similarity.assignCells(p, initDf)
      .select(col("cell"), col("vec_id"), col("v"))
      .as[(Long, Long, Array[Double])].collect()
    val cap = 8
    val expected = assigned.groupBy(_._1).map { case (cell, ms) =>
      val sample = ms.map { case (_, id, v) => (Similarity.sampleHash(id), id, v) }
        .sortBy { case (h, id, _) => (h, id) }.take(cap).sortBy(_._2)
      val acc = new Array[Double](sample.head._3.length)
      sample.foreach { case (_, _, v) =>
        var i = 0; while (i < v.length) { acc(i) += v(i); i += 1 }
      }
      cell -> acc.map(_ / sample.length).toSeq
    }
    val got = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 1,
      sampleCap = cap).orderBy("c_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    expected.foreach { case (cell, mean) => assert(got(cell) == mean, s"cell $cell") }
  }

  test("ivf with kmeans centroids: k neighbors per query, all from the query's cell") {
    val cents = Similarity.kmeansCentroids(Tables.embeddings(spark, sf), "vec_id", "embedding",
      k = 8, iters = 2)
    val res = Similarity.ivfTopKWithCentroids(corpus, cents, col("vec_id") < 5, k = 3)
    val byQ = res.groupBy("q_id").count().collect()
    assert(byQ.nonEmpty && byQ.forall(_.getLong(1) <= 3))

    val cells = Similarity.assignCells(corpus, cents).select(col("vec_id"), col("cell"))
    val joined = res
      .join(cells.withColumnRenamed("vec_id", "q_id").withColumnRenamed("cell", "q_cell"), "q_id")
      .join(cells.withColumnRenamed("vec_id", "neighbor").withColumnRenamed("cell", "n_cell"), "neighbor")
    assert(joined.filter(col("q_cell") =!= col("n_cell")).count() == 0)
  }

  test("ANN recall@k: LSH and IVF recall vs brute-force is measured and high") {
    // 500 vectors × 64 dims, 10 queries, k=10 — the self-measurement a user
    // tunes bits/nCells with at scale (recallAtK is the exposed operator).
    val sf01 = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf01)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .persist()
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(sum("hits").cast("double") / sum("total")).head().getDouble(0)
    // single-table LSH at two coarseness points
    def lsh(bits: Int, tables: Int) = mean(Similarity.recallAtK(
      Similarity.lshTopK(emb, queries, "vec_id", "embedding", 10,
        bits = bits, dims = 64, tables = tables), exact))
    val lsh6t1 = lsh(6, 1)
    val lsh3t1 = lsh(3, 1)
    // OR-amplification: 8 independent 3-bit tables — the recall lever that
    // doesn't coarsen buckets (candidate space stays Σ n_b² per table)
    val lsh3t8 = lsh(3, 8)
    val lsh2t8 = lsh(2, 8)
    val lsh3t16 = lsh(3, 16)
    // IVF over 4 kmeans cells: probe-1 vs probe-2
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 2)
    val corpus01 = Similarity.preparedCorpus(emb, "vec_id", "embedding")
    def ivf(nProbe: Int) = mean(Similarity.recallAtK(
      Similarity.ivfTopKWithCentroids(corpus01, cents, col("vec_id") < 10, k = 10,
        nProbe = nProbe), exact))
    val ivf1 = ivf(1)
    val ivf2 = ivf(2)
    val ivf3 = ivf(3)
    // PQ/ADC: codes-only ranking; recall is the quantization-distortion
    // measurement a user sizes m/codebookSize with
    val pq = mean(Similarity.recallAtK(
      Similarity.pqTopK(emb, "vec_id", "embedding", col("vec_id") < 10, k = 10,
        m = 8, codebookSize = 16), exact))
    // production shape: ADC shortlist -> exact rerank; recall is set by the
    // shortlist size, final ordering is exact
    def pqR(shortlist: Int) = mean(Similarity.recallAtK(
      Similarity.pqTopKReranked(emb, "vec_id", "embedding", col("vec_id") < 10,
        k = 10, m = 8, codebookSize = 16, shortlist = shortlist), exact))
    val pq64 = pqR(64)
    val pq128 = pqR(128)
    // Lloyd-trained codebooks: lower quantization distortion than the fixed
    // convention at the same bit budget
    val pqTrained = mean(Similarity.recallAtK(
      Similarity.pqTopKTrained(emb, "vec_id", "embedding", col("vec_id") < 10,
        k = 10, m = 8, codebookSize = 16), exact))
    val pqTrained64 = mean(Similarity.recallAtK(
      Similarity.pqTopKReranked(emb, "vec_id", "embedding", col("vec_id") < 10,
        k = 10, m = 8, codebookSize = 16, shortlist = 64, trained = true), exact))
    val pqTrained128 = mean(Similarity.recallAtK(
      Similarity.pqTopKReranked(emb, "vec_id", "embedding", col("vec_id") < 10,
        k = 10, m = 8, codebookSize = 16, shortlist = 128, trained = true), exact))
    info(f"recall@10 — lsh(6,1): $lsh6t1%.3f lsh(3,1): $lsh3t1%.3f lsh(3,8): $lsh3t8%.3f " +
      f"lsh(2,8): $lsh2t8%.3f lsh(3,16): $lsh3t16%.3f " +
      f"ivf(p=1): $ivf1%.3f ivf(p=2): $ivf2%.3f ivf(p=3): $ivf3%.3f " +
      f"pq(8,16): $pq%.3f pq+rerank(64): $pq64%.3f pq+rerank(128): $pq128%.3f " +
      f"pq-trained: $pqTrained%.3f pq-trained+rerank(64): $pqTrained64%.3f")
    assert(pq > 0.0 && pq <= 1.0)
    assert(pq64 >= pq - 1e-9, "exact rerank of a superset shortlist cannot lose recall")
    assert(pq128 >= pq64 - 1e-9, "a larger shortlist can only add candidates")
    assert(pqTrained64 >= pqTrained - 1e-9)
    assert(pqTrained128 >= pqTrained64 - 1e-9)
    // the sim9 quality floor: trained codebooks + a 128-candidate exact
    // rerank must keep recall@10 ≥ 0.8 (measured 0.92+; floor leaves margin
    // for driver-regenerated corpora)
    assert(pqTrained128 >= 0.8,
      f"trained-PQ rerank recall@10 $pqTrained128%.3f fell below the 0.8 floor")
    // trained codebooks should not quantize WORSE than the fixed convention
    // at the same bit budget (small tolerance: different corpora shuffle
    // which convention wins individual queries)
    assert(pqTrained >= pq - 0.05)
    // OR-amplified PAIR path: multi-table near-dup pairs recover more of the
    // exact pair set than one table at the same per-table coarseness
    val exactPairs = Similarity.nearDuplicatePairs(emb, "vec_id", "embedding", 0.4)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def pairRecall(tables: Int): Double = {
      val found = Similarity.lshNearDuplicatePairs(emb, "vec_id", "embedding", 0.4,
          bits = 6, dims = 64, tables = tables)
        .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert((found -- exactPairs).isEmpty, "verify step must keep LSH pairs exact")
      if (exactPairs.isEmpty) 1.0 else found.intersect(exactPairs).size.toDouble / exactPairs.size
    }
    val pr1 = pairRecall(1)
    val pr4 = pairRecall(4)
    info(f"pair recall @ cos>=0.4 — 1 table: $pr1%.3f, 4 tables: $pr4%.3f (${exactPairs.size} exact pairs)")
    assert(pr4 >= pr1 - 1e-9, "more tables can only add candidate pairs")
    assert(lsh3t1 >= lsh6t1 - 1e-9) // coarser buckets can only add candidates
    assert(lsh3t8 >= lsh3t1 - 1e-9) // more tables can only add candidates
    assert(ivf2 >= ivf1 - 1e-9)     // more probes can only add candidates
    // tuned ≥0.9 operating points on this (near-random, hardest-case) corpus:
    // 8 tables × 2 bits, and probe-3 of 4 cells (measured 0.97 / 0.94)
    assert(lsh2t8 >= 0.9)
    assert(ivf3 >= 0.9)
    exact.unpersist()
  }

  test("ivfRecallReport: recall climbs with probe depth, full probe is exact") {
    val emb = Tables.embeddings(spark, sf)
    val rep = Similarity.ivfRecallReport(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 8, k = 5, nCells = 4, probes = Seq(1, 2, 4))
      .orderBy("n_probe").collect()
    assert(rep.length == 3)
    assert(rep.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    // shared totals: every row reports the same ground-truth set
    assert(rep.map(_.getLong(2)).distinct.length == 1)
    // recall is monotone nondecreasing in probe depth...
    val recalls = rep.map(_.getLong(4)).toSeq
    assert(recalls == recalls.sorted)
    // ...and probing ALL cells is exact search: recall = 10000 bp
    assert(recalls.last == 10000L)
    assert(rep.last.getLong(3) == rep.last.getLong(2)) // n_hit == n_truth
  }

  test("lshRecallReport: identical corpus pins recall 10000 at every width; wider = fewer candidates") {
    import spark.implicits._
    // 30 identical vectors: one bucket at every width -> recall exact,
    // candidates = 10 queries × 29 others
    val one = Array.fill(64)(0.25f)
    val same = (0L until 30L).map(i => (i, one)).toDF("vec_id", "embedding")
    val rep = Similarity.lshRecallReport(same, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 10, widths = Seq(2, 4, 6),
      bits = 6, dims = 64).orderBy("width_bits").collect()
    assert(rep.map(_.getLong(0)).toSeq == Seq(2L, 4L, 6L))
    rep.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_queries")) == 10L)
      assert(r.getLong(r.fieldIndex("n_truth")) == 100L)
      assert(r.getLong(r.fieldIndex("recall_bp")) == 10000L)
      assert(r.getLong(r.fieldIndex("n_candidates")) == 290L)
    }
    // real embeddings: prefix agreement is monotone -> recall non-increasing
    // and candidate volume non-increasing as the width grows
    val emb = Tables.embeddings(spark, sf)
    val r2 = Similarity.lshRecallReport(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 10, widths = Seq(2, 4, 6),
      bits = 6, dims = 64).orderBy("width_bits").collect()
    val recalls = r2.map(_.getLong(r2.head.fieldIndex("recall_bp"))).toSeq
    val cands = r2.map(_.getLong(r2.head.fieldIndex("n_candidates"))).toSeq
    assert(recalls == recalls.sorted.reverse, s"recall must not rise with width: $recalls")
    assert(cands == cands.sorted.reverse, s"candidates must not rise with width: $cands")
  }

  test("sim11 label separation: full 45-pair grid, cosines within [-10000, 10000] bp") {
    import org.apache.spark.sql.functions.col
    val rows = queries.SimilarityQueries.sim11LabelSeparation.run(spark, sf).collect()
    assert(rows.length == 45) // 10 labels -> 45 unordered pairs
    rows.foreach { r =>
      val bp = r.getLong(r.fieldIndex("cos_bp"))
      assert(bp >= -10000 && bp <= 10000)
    }
  }
}
